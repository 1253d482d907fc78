"""ctypes binding for the C++ span tracer (see tracer.cpp).

Usage:
    tracer = Tracer()
    with tracer.span("replan"):
        ...
    tracer.dump("trace.json")   # open in chrome://tracing / Perfetto
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from contextlib import contextmanager

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tracer.cpp")
_SO = os.path.join(_HERE, "libtracer.so")

_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.tracer_create.restype = ctypes.c_void_p
            lib.tracer_create.argtypes = [ctypes.c_int64]
            lib.tracer_destroy.argtypes = [ctypes.c_void_p]
            lib.tracer_now_ns.restype = ctypes.c_int64
            lib.tracer_now_ns.argtypes = [ctypes.c_void_p]
            lib.tracer_span.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
            lib.tracer_instant.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.tracer_count.restype = ctypes.c_int64
            lib.tracer_count.argtypes = [ctypes.c_void_p]
            lib.tracer_dump.restype = ctypes.c_int
            lib.tracer_dump.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            _lib = lib
        return _lib


class Tracer:
    """Preallocated ring-buffer span recorder (C++ backend)."""

    def __init__(self, capacity: int = 1 << 16):
        self._lib = _load()
        self._h = self._lib.tracer_create(capacity)
        self._stack = []  # open begin()/end() phase spans (LIFO)
        self._dumped = False

    def __del__(self):
        try:
            if self._h:
                self._lib.tracer_destroy(self._h)
                self._h = None
        except Exception:
            pass

    @contextmanager
    def span(self, name: str):
        t0 = self._lib.tracer_now_ns(self._h)
        try:
            yield
        finally:
            t1 = self._lib.tracer_now_ns(self._h)
            self._lib.tracer_span(self._h, name.encode(), t0, t1 - t0)

    def begin(self, name: str) -> None:
        """Explicit begin/end phase pair — for spans over code that a `with`
        block cannot wrap cleanly (e.g. flagship_run's collect/train/eval
        phases). LIFO-nested like chrome-trace expects."""
        self._stack.append((name, self._lib.tracer_now_ns(self._h)))

    def end(self) -> None:
        if not self._stack:
            raise RuntimeError("Tracer.end() without a matching begin()")
        name, t0 = self._stack.pop()
        t1 = self._lib.tracer_now_ns(self._h)
        self._lib.tracer_span(self._h, name.encode(), t0, t1 - t0)

    def instant(self, name: str) -> None:
        self._lib.tracer_instant(self._h, name.encode())

    def count(self) -> int:
        return int(self._lib.tracer_count(self._h))

    def dump(self, path: str) -> None:
        # close any still-open begin() phases first (truncated at now) so a
        # dump from an error path still shows the phase that was running
        while self._stack:
            self.end()
        rc = self._lib.tracer_dump(self._h, path.encode())
        if rc != 0:
            raise IOError(f"tracer_dump failed ({rc}) for {path}")
        self._dumped = True

    def dump_at_exit(self, path: str) -> None:
        """Register an atexit dump so a crash mid-run still leaves a loadable
        trace (open phases are closed at crash time). A later explicit
        `dump()` wins — the handler is then a no-op."""
        import atexit

        def _handler():
            if not self._dumped and self._h:
                try:
                    self.dump(path)
                except Exception:
                    pass  # never mask the original error at interpreter exit

        atexit.register(_handler)
