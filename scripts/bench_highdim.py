"""High-dimensional workload benchmarks on TPU (VERDICT r2 #2).

The reference measures Panda per-replan compute time and box-plots it
(`/root/reference/scripts/Panda/efficiency_plot/box_plot.py:8-48`,
`inference_diffusion_panda.py:118-123`); every Hz row in BENCH.md so far is
cart-pole/pendulum. This script measures the two high-dimensional workloads:

- **panda_rbd**: horizon 128, 7 control channels, 20-dim context,
  cfg_indicator — the one config whose CFG doubled batch (256 stacked rows)
  actually stresses the fused-episode kernel's VMEM budget
  (`ops/fused_unet.py` docstring: "B*H <= a few hundred rows").
- **quadrotor**: horizon 48, 4 channels, 12-dim context — guided (obstacle
  cost-gradient in the chain) and unguided.

Uses the committed artifacts (real weights + dataset normalizers) when
present; synthetic weights otherwise (flagged per row). Two timing protocols
per BENCH.md: pipelined best-of-batches (dispatch pipelining hides the ~31 ms
relay latency) and sustained (one long episode per dispatch, stable across
runs). Prints one JSON line per row.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle
import time

import numpy as np

# obstacle layout / task cost / guide shared with every quadrotor script
from quadrotor_task import make_loop_guide_builder, make_task_cost


def _pipelined(run, args_list, n_batches=3):
    """Best-of-batches pipelined timing — the ONE shared protocol
    (`eval.timing.pipelined_time_fn`); imported lazily so the caller's
    `--cpu` platform selection still precedes any backend use."""
    from mpc_via_diffusion_model_tpu.eval.timing import pipelined_time_fn
    return pipelined_time_fn(run, args_list, n_batches)


def _panda_fused(args, jax, jnp, model, params, diffusion, in_stats, c_stats,
                 plant, cost, to_cond, x0_p, key, real):
    # The whole-EPISODE kernel traces the plant step into Mosaic; the panda
    # RNE chain does not lower (Mosaic NotImplementedError on its tiny-matmul
    # link recursions — measured, and the failed compile can wedge the axon
    # relay). The production split for articulated plants is therefore the
    # fused CHAIN kernel per replan (U-Net + sampler algebra in Pallas, 256
    # CFG rows resident in VMEM) with the RNE plant stepped XLA-side.
    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.ops.fused_denoise import make_fused_cfg_chain

    for wd, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        try:
            chain = make_fused_cfg_chain(
                model, params, diffusion.schedule, n_samples=1, w=0.01,
                n_diffusion_steps_without_noise=5, weights_dtype=wd)
            loop = jax.jit(make_closed_loop(
                diffusion, model.apply, in_stats, c_stats, plant, cost,
                horizon=128, n_steps=args.steps, w=0.01,
                n_diffusion_steps_without_noise=5, state_to_condition=to_cond,
                sample_override=chain))
            run = lambda pp, xx, kk: loop(pp, xx, kk).x_track
            argse = [(params, x0_p, jax.random.fold_in(key, 10 + i))
                     for i in range(8)]
            dt = _pipelined(run, argse)
            print(json.dumps({
                "metric": f"panda_rbd_fused_chain_hz_{tag}",
                "value": round(args.steps / dt, 1), "unit": "Hz",
                "real_weights": real,
                "note": "CFG chain in one Pallas kernel, RNE plant XLA-side"}),
                flush=True)
        except Exception as e:  # noqa: BLE001 — report the budget breach
            print(json.dumps({
                "metric": f"panda_rbd_fused_chain_hz_{tag}",
                "value": None, "unit": "Hz",
                "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--sustained-steps", type=int, default=400)
    p.add_argument("--skip-panda-fused", action="store_true")
    p.add_argument("--only-panda-fused", action="store_true",
                   help="run only the fused panda episode rows (iteration)")
    p.add_argument("--panda-episode-kernel", action="store_true",
                   help="ONLY measure the round-5 whole-EPISODE panda CFG "
                        "kernel: dynamics/arm.py panda_rbd_unrolled lowers "
                        "the 7-link RNE + FK context into Mosaic, so the "
                        "TEACHER-grade loop (80 replans x 30 CFG denoise "
                        "steps x 256 rows + articulated plant step) runs as "
                        "ONE kernel dispatch per episode (AOT-probed; "
                        "in-kernel hardware-PRNG noise)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, make_panda_context
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import load_checkpoint

    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    key = jax.random.PRNGKey(0)

    # ================= panda_rbd: horizon 128, 7ch, 20-dim ctx ============ #
    plant, cost = get_plant("panda")
    to_cond = make_panda_context()
    model = TemporalUnet(state_dim=7, n_support_points=128, unet_input_dim=32,
                         dim_mults=UNET_DIM_MULTS[0], context_dim=20,
                         conditioning_type="default", cfg_indicator=True)
    art = "artifacts/flagship_panda_rbd"
    real = os.path.exists(os.path.join(art, "dataset.npz")) and (
        os.path.exists(os.path.join(art, "checkpoints", "final.ckpt"))
        or os.path.exists(os.path.join(art, "ema_params.pkl")))
    if real:
        ds = ControlSequenceDataset.load(os.path.join(art, "dataset.npz"))
        in_stats = ds.normalizer.stats["inputs"]
        c_stats = ds.normalizer.stats["condition"]
        if os.path.exists(os.path.join(art, "checkpoints", "final.ckpt")):
            state, _ = load_checkpoint(os.path.join(art, "checkpoints", "final.ckpt"))
            params = state.ema_params
        else:
            import pickle
            with open(os.path.join(art, "ema_params.pkl"), "rb") as f:
                params = pickle.load(f)["ema_params"]
    else:
        in_stats = NormalizerStats("limits", mins=jnp.full((7,), -30.0),
                                   maxs=jnp.full((7,), 30.0))
        c_stats = NormalizerStats("limits", mins=jnp.full((20,), -10.0),
                                  maxs=jnp.full((20,), 10.0))
        params = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 128, 7)),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 20)),
                            jnp.zeros((2, 1)))
    x0_p = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])

    if args.only_panda_fused:
        _panda_fused(args, jax, jnp, model, params, diffusion, in_stats,
                     c_stats, plant, cost, to_cond, x0_p, key, real)
        return

    if args.panda_episode_kernel:
        import numpy as np
        from mpc_via_diffusion_model_tpu.dynamics import panda_rbd_unrolled
        from mpc_via_diffusion_model_tpu.ops.fused_episode import (
            make_fused_cfg_episode)
        plant_u = panda_rbd_unrolled()
        ep = jax.jit(make_fused_cfg_episode(
            model, params, diffusion.schedule, in_stats, c_stats, plant_u,
            cost, n_steps=args.steps, w=0.01,
            n_diffusion_steps_without_noise=5, state_to_condition=to_cond,
            inkernel_noise=True))
        # quality cross-check: same 10-seed protocol as the flagship eval
        keys10 = jax.random.split(jax.random.PRNGKey(7), 10)
        costs = [float(np.asarray(ep(x0_p, keys10[i])[2]).sum())
                 for i in range(10)]
        argse = [(x0_p, jax.random.fold_in(key, 60 + i)) for i in range(8)]
        hz_p = round(args.steps / _pipelined(
            lambda xx, kk: ep(xx, kk)[0], argse), 1)
        ep_l = jax.jit(make_fused_cfg_episode(
            model, params, diffusion.schedule, in_stats, c_stats, plant_u,
            cost, n_steps=args.sustained_steps, w=0.01,
            n_diffusion_steps_without_noise=5, state_to_condition=to_cond,
            inkernel_noise=True))
        jax.block_until_ready(ep_l(x0_p, key)[0])
        reps = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(ep_l(x0_p, jax.random.fold_in(key, 900 + r))[0])
            reps.append(time.perf_counter() - t0)
        print(json.dumps({
            "metric": "panda_rbd_whole_episode_kernel_hz",
            "value": round(args.sustained_steps / min(reps), 1),
            "unit": "Hz", "pipelined": hz_p,
            "cost_mean10": round(float(np.mean(costs)), 2),
            "real_weights": real,
            "note": "full CFG teacher loop + unrolled RNE plant + FK "
                    "context + hardware-PRNG noise in ONE Mosaic kernel"}),
            flush=True)
        return

    # --- XLA fused-loop path (the flagship_run eval protocol) ---
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=128, n_steps=args.steps, w=0.01,
        n_diffusion_steps_without_noise=5, state_to_condition=to_cond))
    argsl = [(params, x0_p, jax.random.fold_in(key, i)) for i in range(8)]
    run = lambda pp, xx, kk: loop(pp, xx, kk).x_track
    dt = _pipelined(run, argsl)
    print(json.dumps({"metric": "panda_rbd_closed_loop_hz_xla",
                      "value": round(args.steps / dt, 1), "unit": "Hz",
                      "real_weights": real,
                      "config": "H=128 ch=7 ctx=20 CFG 25+5"}), flush=True)

    # --- sustained: one long receding-horizon episode per dispatch ---
    loop_l = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=128, n_steps=args.sustained_steps, w=0.01,
        n_diffusion_steps_without_noise=5, state_to_condition=to_cond))
    jax.block_until_ready(loop_l(params, x0_p, key).x_track)
    reps = []
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop_l(params, x0_p, jax.random.fold_in(key, r)).x_track)
        reps.append(time.perf_counter() - t0)
    print(json.dumps({"metric": "panda_rbd_sustained_hz_xla",
                      "value": round(args.sustained_steps / min(reps), 1),
                      "unit": "Hz", "real_weights": real}), flush=True)

    # --- fused whole-episode Pallas kernel (256 CFG rows), fp32 + bf16 ---
    # The panda plant's RNE step and the 20-dim FK context run IN-kernel;
    # if Mosaic rejects the kernel or VMEM overflows, the row reports the
    # failure instead of a number (the budget that excludes it).
    if not args.skip_panda_fused:
        _panda_fused(args, jax, jnp, model, params, diffusion, in_stats,
                     c_stats, plant, cost, to_cond, x0_p, key, real)

    # ================= quadrotor: horizon 48, 4ch, 12-dim ctx ============ #
    qplant, quad_cost = get_plant("quadrotor")
    qtask_cost = make_task_cost(quad_cost)

    qmodel = TemporalUnet(state_dim=4, n_support_points=48, unet_input_dim=32,
                          dim_mults=UNET_DIM_MULTS[0], context_dim=12,
                          conditioning_type="default", cfg_indicator=True)
    qart = "artifacts/flagship_quadrotor"
    qreal = (os.path.exists(os.path.join(qart, "dataset.npz"))
             and os.path.exists(os.path.join(qart, "ema_params.pkl")))
    if qreal:
        qds = ControlSequenceDataset.load(os.path.join(qart, "dataset.npz"))
        q_in, q_c = qds.normalizer.stats["inputs"], qds.normalizer.stats["condition"]
        with open(os.path.join(qart, "ema_params.pkl"), "rb") as f:
            qparams = pickle.load(f)
    else:
        q_in = NormalizerStats("limits", mins=jnp.full((4,), -5.0),
                               maxs=jnp.full((4,), 15.0))
        q_c = NormalizerStats("limits", mins=jnp.full((12,), -5.0),
                              maxs=jnp.full((12,), 5.0))
        qparams = qmodel.init(jax.random.PRNGKey(2), jnp.zeros((2, 48, 4)),
                              jnp.zeros((2,), jnp.int32), jnp.zeros((2, 12)),
                              jnp.zeros((2, 1)))
    x0_q = jnp.asarray(np.array([2.6, 0.5, 1.0] + [0.0] * 9, np.float32))

    guide_builder = make_loop_guide_builder(qplant, q_in, 0.1)

    for guided, tag in ((False, "unguided"), (True, "guided")):
        qloop = jax.jit(make_closed_loop(
            diffusion, qmodel.apply, q_in, q_c, qplant, qtask_cost,
            horizon=48, n_steps=60, w=0.01, n_diffusion_steps_without_noise=5,
            guide_builder=guide_builder if guided else None,
            n_guide_steps=1, t_start_guide=12.5))
        argsq = [(qparams, x0_q, jax.random.fold_in(key, 20 + i)) for i in range(8)]
        runq = lambda pp, xx, kk: qloop(pp, xx, kk).x_track
        dt = _pipelined(runq, argsq)
        print(json.dumps({"metric": f"quadrotor_closed_loop_hz_{tag}",
                          "value": round(60 / dt, 1), "unit": "Hz",
                          "real_weights": qreal,
                          "config": "H=48 ch=4 ctx=12 CFG 25+5"}), flush=True)

    # sustained quadrotor (guided — the flagship configuration)
    qloop_l = jax.jit(make_closed_loop(
        diffusion, qmodel.apply, q_in, q_c, qplant, qtask_cost,
        horizon=48, n_steps=args.sustained_steps, w=0.01,
        n_diffusion_steps_without_noise=5,
        guide_builder=guide_builder, n_guide_steps=1, t_start_guide=12.5))
    jax.block_until_ready(qloop_l(qparams, x0_q, key).x_track)
    reps = []
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(qloop_l(qparams, x0_q, jax.random.fold_in(key, r)).x_track)
        reps.append(time.perf_counter() - t0)
    print(json.dumps({"metric": "quadrotor_sustained_hz_guided",
                      "value": round(args.sustained_steps / min(reps), 1),
                      "unit": "Hz", "real_weights": qreal}), flush=True)


if __name__ == "__main__":
    main()
