"""csstore C++ shard store: round trip, zero-copy, concat."""
import numpy as np
import pytest

from mpc_via_diffusion_model_tpu.native import (
    concat_stores,
    csstore_available,
    read_store,
    write_store,
)

pytestmark = pytest.mark.skipif(not csstore_available(), reason="g++ toolchain unavailable")


def test_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "inputs": rng.randn(100, 64, 1).astype(np.float32),
        "condition": rng.randn(100, 5).astype(np.float32),
        "steps": np.arange(100, dtype=np.int64),
    }
    p = str(tmp_path / "shard.css")
    write_store(p, tensors)
    out = read_store(p)
    assert set(out) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])
    # views are read-only (they alias the mmap)
    with pytest.raises(ValueError):
        out["inputs"][0, 0, 0] = 1.0


def test_concat(tmp_path):
    rng = np.random.RandomState(1)
    shards = []
    all_u, all_x = [], []
    for i in range(3):
        u = rng.randn(10 + i, 8, 1).astype(np.float32)
        x = rng.randn(10 + i, 4).astype(np.float32)
        p = str(tmp_path / f"shard{i}.css")
        write_store(p, {"u": u, "x": x})
        shards.append(p)
        all_u.append(u)
        all_x.append(x)
    out_p = str(tmp_path / "merged.css")
    concat_stores(shards, out_p)
    merged = read_store(out_p)
    np.testing.assert_array_equal(merged["u"], np.concatenate(all_u, axis=0))
    np.testing.assert_array_equal(merged["x"], np.concatenate(all_x, axis=0))


def test_concat_shape_mismatch_rejected(tmp_path):
    p1, p2 = str(tmp_path / "a.css"), str(tmp_path / "b.css")
    write_store(p1, {"u": np.zeros((4, 8), np.float32)})
    write_store(p2, {"u": np.zeros((4, 9), np.float32)})
    with pytest.raises(IOError):
        concat_stores([p1, p2], str(tmp_path / "out.css"))


def test_open_missing_file():
    with pytest.raises(IOError):
        read_store("/nope/missing.css")


def test_unsupported_dtype(tmp_path):
    with pytest.raises(TypeError):
        write_store(str(tmp_path / "x.css"), {"u": np.zeros(3, np.float64)})


def test_tracer_spans_and_dump(tmp_path):
    import json
    import time
    from mpc_via_diffusion_model_tpu.native import Tracer

    tr = Tracer(capacity=128)
    with tr.span("outer"):
        time.sleep(0.002)
        with tr.span("inner"):
            time.sleep(0.001)
    tr.instant("marker")
    assert tr.count() == 3
    p = str(tmp_path / "trace.json")
    tr.dump(p)
    data = json.load(open(p))
    names = [e["name"] for e in data["traceEvents"]]
    assert set(names) == {"outer", "inner", "marker"}
    durs = {e["name"]: e.get("dur") for e in data["traceEvents"] if e["ph"] == "X"}
    assert durs["outer"] >= durs["inner"] > 500  # us


def test_store_array_outlives_dict():
    """An array extracted from read_store must keep the mmap alive after the
    dict is dropped (regression for a dangling-mmap hazard)."""
    import gc
    import tempfile, os
    import numpy as np
    from mpc_via_diffusion_model_tpu.native import read_store, write_store

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.css")
        data = np.arange(4096, dtype=np.float32).reshape(64, 64)
        write_store(p, {"x": data})
        arr = read_store(p)["x"]  # dict is immediately collectable
        gc.collect()
        np.testing.assert_array_equal(np.asarray(arr.sum()), data.sum())
        sub = arr[3:5]
        del arr
        gc.collect()
        np.testing.assert_array_equal(sub, data[3:5])


def test_tracer_begin_end_guards(tmp_path):
    """end() without begin() raises a clear error instead of IndexError, and
    dump() closes still-open phases so an error path (flagship_run's
    dump_at_exit) still writes a loadable trace containing the in-flight
    phase."""
    import json
    from mpc_via_diffusion_model_tpu.native import Tracer

    tr = Tracer(capacity=32)
    with pytest.raises(RuntimeError, match="without a matching begin"):
        tr.end()
    tr.begin("collect")
    tr.begin("inner")
    p = str(tmp_path / "t.json")
    tr.dump(p)  # closes both open phases (truncated at now)
    names = sorted(e["name"] for e in json.load(open(p))["traceEvents"])
    assert names == ["collect", "inner"]
