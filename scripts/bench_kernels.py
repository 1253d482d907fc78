"""Micro-benchmark: Pallas fused conv block vs plain XLA, on-device.

Run on TPU: compares `ops.fused_conv1d_gn_mish` (single-kernel Conv1d k5 +
GroupNorm + Mish) against the unfused XLA composition at the denoiser's real
shapes, and checks numerics. Keep both paths: XLA fusion may win at some
shapes (SURVEY.md §7 'Hard parts').
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from mpc_via_diffusion_model_tpu.ops import conv1d_gn_mish_reference, fused_conv1d_gn_mish


def _time_pipelined(fn, x, n_repeat=50):
    """Per-op time with the relay latency amortized: issue n_repeat async
    dispatches, sync once (a block-per-call loop measures this container's
    ~31 ms dispatch latency, not the op — BENCH.md 'Where the time goes')."""
    import time
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(n_repeat)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n_repeat

SHAPES = [
    # (batch, horizon, cin, cout) — U-Net levels for the flagship config
    (2, 32, 1, 32),
    (2, 32, 32, 32),
    (2, 16, 32, 64),
    (2, 8, 64, 128),
    (64, 32, 32, 32),
    (64, 8, 64, 128),
]


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}")
    results = []
    for bsz, h, cin, cout in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (bsz, h, cin))
        w = jax.random.normal(jax.random.PRNGKey(1), (5, cin, cout)) * 0.1
        b = jnp.zeros((cout,))
        gamma, beta = jnp.ones((cout,)), jnp.zeros((cout,))
        groups = 8 if cout % 8 == 0 else 1

        ref = jax.jit(lambda x: conv1d_gn_mish_reference(x, w, b, gamma, beta, groups))
        t_ref = _time_pipelined(ref, x)

        if on_tpu:
            fused = jax.jit(lambda x: fused_conv1d_gn_mish(x, w, b, gamma, beta, groups))
            out_f = fused(x)
            out_r = ref(x)
            err = float(jnp.max(jnp.abs(out_f - out_r)))
            t_fused = _time_pipelined(fused, x)
        else:
            err, t_fused = 0.0, float("nan")

        rec = {
            "shape": [bsz, h, cin, cout],
            "xla_us": round(t_ref * 1e6, 1),
            "pallas_us": round(t_fused * 1e6, 1) if on_tpu else None,
            "max_abs_err": err,
        }
        results.append(rec)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
