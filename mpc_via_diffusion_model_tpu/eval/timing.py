"""Timing harness: wall-clock measurement of jitted programs.

Replaces the reference's TimerCUDA-wrapped per-step prints
(`Diffusion_MPC_Inference.py:231-241,375-379,501-502`) with a
warmup-then-median harness that respects XLA async dispatch
(block_until_ready). Used by scripts and tests for single-program timing;
note `bench.py` does NOT use this harness — the relay's ~31 ms dispatch
latency makes block-per-call timing misleading there, so bench.py times
pipelined dispatch batches inline (see its docstring and BENCH.md's
protocol note). Phase-level spans for whole runs come from
`native.tracer.Tracer` (chrome-trace JSON; wired into flagship_run and
Trainer.fit).
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np

__all__ = ["time_fn", "Timer"]


def time_fn(fn: Callable, *args, n_warmup: int = 1, n_repeat: int = 5) -> Dict[str, float]:
    """Time ``fn(*args)`` (must return jax arrays / pytrees).

    Returns wall-clock stats in seconds: median/mean/min over ``n_repeat``
    post-warmup calls."""
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "median_s": float(np.median(arr)),
        "mean_s": float(arr.mean()),
        "min_s": float(arr.min()),
        "n": n_repeat,
    }


class Timer:
    """Context-manager wall timer (host side)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False
