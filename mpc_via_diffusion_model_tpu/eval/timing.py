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

__all__ = ["time_fn", "pipelined_time_fn", "Timer"]


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


def pipelined_time_fn(fn, args_list, n_batches: int = 3) -> float:
    """Best-of-batches pipelined timing (BENCH.md's protocol): issue the
    whole ``args_list`` batch of dispatches back-to-back, block ONCE, divide
    by the batch size; return the best batch's seconds-per-call.

    This is the one shared definition of the pipelined measurement loop —
    bench_kernels / bench_highdim / bench_quadrotor_student / distill_panda
    all time through it so their numbers stay comparable. Per-call
    block_until_ready would charge every call the relay's ~31 ms dispatch
    latency; pipelining hides it (see BENCH.md's protocol note on its
    run-to-run variance, which is why best-of-batches is taken)."""
    out = fn(*args_list[0])  # warmup / compile
    jax.block_until_ready(out)
    dts = []
    for _ in range(n_batches):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        jax.block_until_ready(outs)
        dts.append((time.perf_counter() - t0) / len(args_list))
    return min(dts)


class Timer:
    """Context-manager wall timer (host side)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False
