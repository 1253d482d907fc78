"""Native (C++) runtime components, bound via ctypes.

- csstore: memory-mapped tensor shard store (zero-copy dataset IO + shard
  concatenation). Built on demand with g++ (no pybind11 dependency).
"""
from .tracer import Tracer
from .csstore import (
    write_store,
    read_store,
    concat_stores,
    csstore_available,
)
