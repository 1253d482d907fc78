"""Where tensor/sequence parallelism pays: scaled U-Net single-chip rows.

VERDICT r3 next #5: the TP/SP machinery (`parallel/tp_unet.py`, `sp_unet.py`)
is parity-proven but the 1M-param flagship denoiser never needs it (its TP
cost model is bandwidth-bound — BENCH.md). This bench builds the scaled
configs that machinery was written for — wider channels (unet_input_dim
64/128), deeper mults (1,2,4,8), longer horizons (128/256) — and measures
them single-chip on TPU:

- denoiser FORWARD at serving batch sizes (fp32 + bf16), Hz + FLOPs/MFU
  (FLOPs from XLA's own cost analysis),
- one TRAIN step (loss+grad+Adam+EMA) at batch 256,

then prints the TP cross-over arithmetic for each row: channel-sharding a
ResBlock costs ONE psum of its (B, H_l, C_l) activation per block
(`tp_unet.py` cost model, 4 blocks/level); TP at m ways wins when

    t_psum ~= 2 * sum_l 4 * B * H/2^l * C_l * 4B / ICI_bw
    t_psum < t_compute * (1 - 1/m)

Rows are written to artifacts/scaled_unet/bench.json so BENCH.md's scaling
section pins to a committed measurement.

Reference match: SURVEY §2.4 "design the mesh API so channel-sharding the
U-Net is possible" — this measures where 'possible' becomes 'profitable'.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np


CONFIGS = [
    # name, unet_input_dim, dim_mults, horizon, state_dim, context_dim
    ("flagship", 32, (1, 2, 4), 64, 1, 5),
    ("mid", 64, (1, 2, 4, 8), 128, 4, 12),
    ("wide", 128, (1, 2, 4, 8), 256, 4, 12),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[2, 64])
    p.add_argument("--train-batch", type=int, default=256)
    p.add_argument("--ici-gbps", type=float, default=45.0,
                   help="assumed per-direction ICI allreduce bandwidth "
                        "(GB/s) for the cross-over arithmetic (v5e ring)")
    p.add_argument("--tp-ways", type=int, default=4)
    p.add_argument("--out", default="artifacts/scaled_unet")
    p.add_argument("--configs", nargs="+", default=None,
                   help="subset of config names to run")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.models import TemporalUnet
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)
    rows = []

    def timeit_scanned(step, carry0, reps=20, batches=3):
        """Seconds per step, with `reps` steps CHAINED inside one jitted
        lax.scan so each measurement is a single device dispatch — per-call
        block_until_ready would charge every sub-ms forward the relay's
        ~31 ms dispatch latency (CLAUDE.md quirk 3). Best of `batches`."""
        prog = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (step(cc), None), c, None, length=reps)[0])
        jax.block_until_ready(prog(carry0))
        dts = []
        for _ in range(batches):
            t0 = time.perf_counter()
            jax.block_until_ready(prog(carry0))
            dts.append((time.perf_counter() - t0) / reps)
        return min(dts)

    for name, dim, mults, H, ds_dim, ctx in CONFIGS:
        if args.configs and name not in args.configs:
            continue
        model = TemporalUnet(
            state_dim=ds_dim, n_support_points=H, unet_input_dim=dim,
            dim_mults=mults, context_dim=ctx, conditioning_type="default",
            cfg_indicator=True)
        key = jax.random.PRNGKey(0)
        params = model.init(key, jnp.zeros((2, H, ds_dim)),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, ctx)),
                            jnp.zeros((2, 1)))
        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(params))

        for B in args.batches:
            x = jnp.zeros((B, H, ds_dim))
            t = jnp.zeros((B,), jnp.int32)
            c = jnp.zeros((B, ctx))
            m = jnp.zeros((B, 1))

            fwd = jax.jit(lambda p_, xx, tt, cc, mm: model.apply(
                p_, xx, tt, cc, mm))
            lowered = fwd.lower(params, x, t, c, m).compile()
            ca = lowered.cost_analysis()
            flops = float((ca or {}).get("flops", 0.0))
            # the denoiser output has the input's shape, so chain it as the
            # scan carry — consecutive steps are data-dependent and cannot
            # be dead-code-eliminated or overlapped
            dt32 = timeit_scanned(
                lambda xx: model.apply(params, xx, t, c, m), x)

            p16 = jax.tree_util.tree_map(
                lambda l: l.astype(jnp.bfloat16), params)
            dt16 = timeit_scanned(
                lambda xx: model.apply(p16, xx, t, c.astype(jnp.bfloat16),
                                       m.astype(jnp.bfloat16)
                                       ).astype(jnp.bfloat16),
                x.astype(jnp.bfloat16))

            # TP cross-over arithmetic (tp_unet.py cost model)
            psum_bytes = sum(
                4 * B * (H >> l) * dim * mult * 4
                for l, mult in enumerate(mults))
            t_psum = 2 * psum_bytes / (args.ici_gbps * 1e9)
            ways = args.tp_ways
            tp_wins_fp32 = t_psum < dt32 * (1 - 1.0 / ways)
            row = {
                "config": name, "params": n_params, "horizon": H,
                "unet_input_dim": dim, "dim_mults": list(mults),
                "batch": B,
                "fwd_ms_fp32": round(dt32 * 1e3, 3),
                "fwd_ms_bf16": round(dt16 * 1e3, 3),
                "bf16_speedup": round(dt32 / dt16, 2),
                "gflops": round(flops / 1e9, 2),
                # vs the ~197 TFLOP/s v5e bf16 matmul peak BENCH.md's
                # roofline section uses
                "mfu_bf16_pct": round(
                    100 * flops / dt16 / 197e12, 2) if flops else None,
                "tp_psum_ms_est": round(t_psum * 1e3, 3),
                f"tp{ways}_wins_fp32": bool(tp_wins_fp32),
                "tp_compute_saved_ms": round(dt32 * (1 - 1.0 / ways) * 1e3, 3),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

        # train step at the scaled config
        optimizer = make_optimizer(lr=2e-4)
        step_fn = make_train_step(diffusion, model.apply, optimizer)
        state = TrainState(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=optimizer.init(params), step=jnp.int32(0))
        Bt = args.train_batch
        inputs = jnp.zeros((Bt, H, ds_dim))
        conds = jnp.zeros((Bt, ctx))
        kt = jax.random.PRNGKey(1)
        dtt = timeit_scanned(
            lambda st: step_fn(st, inputs, conds, kt)[0], state,
            reps=10, batches=2)
        row = {
            "config": name, "params": n_params, "horizon": H,
            "train_batch": Bt,
            "train_step_ms": round(dtt * 1e3, 2),
            "train_steps_per_s": round(1.0 / dtt, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(args.out, "bench.json"), "w") as f:
        json.dump({"ici_gbps_assumed": args.ici_gbps,
                   "tp_ways": args.tp_ways, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
