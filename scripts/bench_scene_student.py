"""Scene-conditioned student SERVING bench: the whole scene-aware guided
policy in ONE Pallas kernel.

The scene-conditioned study (artifacts/scene_conditioned, round 4) proved
one FiLM-widened student + scene-aware safety-first best-of-16 beats the
per-scene guided oracle on held-out layouts (CF 1.00 / safe-reach 0.67)
through the XLA runtime loop. This bench runs the SAME policy through
`ops.fused_episode.make_fused_cfg_episode(n_candidates=K, selection_cost=
per-scene make_select_cost, state_to_condition=state||scene_features)` —
round 4 added best-of-K to the CFG episode kernel — so a full 60-step
episode (60 replans x 30 CFG denoise steps x 2K U-Net groups, candidate
rollouts, safety-first selection) is ONE device dispatch. The per-scene
spheres and features ride the kernel's hoisted-capture input list.

Reference role: the guided inference serving loop,
`/root/reference/scripts/inference/inference_(mpd).py:254-343` — which
rebuilds the guide per scene and pays it every denoise step at Hz-scale
rates; here the scene is data, not code.

Writes artifacts/scene_conditioned/bench.json.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene-dir", default="artifacts/scene_conditioned")
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--scene-index", type=int, default=0,
                   help="which held-out scene (sample_scenes seed=99 draw) "
                        "to serve; each scene is one kernel specialization")
    p.add_argument("--candidates", type=int, nargs="+", default=[1, 16])
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--out-name", default="bench.json",
                   help="output filename inside --scene-dir (e.g. "
                        "bench_100step.json for a station-keeping-length "
                        "serving bench without clobbering the pinned rows)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import (
        NormalizerStats, fit_normalizer,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.eval.timing import pipelined_time_fn
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.ops.fused_episode import (
        make_fused_cfg_episode,
    )
    from quadrotor_task import (
        eval_start_states, make_select_cost, sample_scenes, scene_features,
        track_metrics,
    )

    plant, quad_cost = get_plant("quadrotor")
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    # 24-dim condition stats, reconstructed exactly as the training script
    # does (scene_conditioned_quadrotor.py:157-164 — seeded)
    sc_c, sc_r = sample_scenes(50_000, seed=123)
    feat_stats = fit_normalizer(np.asarray(scene_features(sc_c, sc_r)))
    c24_stats = NormalizerStats(
        "limits",
        mins=jnp.concatenate([c_stats.mins, feat_stats.mins]),
        maxs=jnp.concatenate([c_stats.maxs, feat_stats.maxs]))

    with open(os.path.join(args.scene_dir, "scene_student_ema.pkl"), "rb") as f:
        student = pickle.load(f)
    H = args.horizon
    model24 = TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=24,
        conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)

    # the held-out scene (same seed-99 draw as the committed eval)
    ev_c, ev_r = sample_scenes(args.scene_index + 1, seed=99)
    cen = jnp.asarray(ev_c[args.scene_index])
    rad = jnp.asarray(ev_r[args.scene_index])
    feat = scene_features(cen, rad)
    to_cond = lambda x: jnp.concatenate([x, feat])

    starts = jnp.asarray(eval_start_states(args.eval_starts, seed=11))
    ks = jax.random.split(jax.random.PRNGKey(31), args.eval_starts)
    key = jax.random.PRNGKey(3)

    out = {"scene_index": args.scene_index,
           "centers": np.asarray(cen).tolist(),
           "radii": np.asarray(rad).tolist(),
           "steps": args.steps, "eval_starts": args.eval_starts}
    for K in args.candidates:
        sel = (make_select_cost(quad_cost, centers=cen, radii=rad)
               if K > 1 else None)
        episode = jax.jit(make_fused_cfg_episode(
            model24, student, schedule, in_stats, c24_stats, plant,
            quad_cost, n_steps=args.steps, w=args.w,
            n_diffusion_steps_without_noise=5, n_candidates=K,
            selection_cost=sel, state_to_condition=to_cond))
        if K > 1 and args.steps > 60:
            # the K=16 100-step CFG-K kernel's scoped stack is 56.9M vs the
            # 16M default limit (measured: AOT "Ran out of memory in memory
            # space vmem") — compile with the raised cap like the panda
            # K>=8 chains (bench_panda_student.py)
            episode = episode.lower(starts[0], ks[0]).compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": 98304})
        t0 = time.time()
        tracks = np.stack([np.asarray(episode(starts[i], ks[i])[0])
                           for i in range(args.eval_starts)])
        out[f"k{K}"] = track_metrics(tracks, centers=np.asarray(cen),
                                     radii=np.asarray(rad))
        argsk = [(starts[i % args.eval_starts], jax.random.fold_in(key, i))
                 for i in range(8)]
        out[f"k{K}_hz_pipelined"] = round(
            args.steps / pipelined_time_fn(
                lambda xx, kk: episode(xx, kk)[0], argsk), 1)
        # sustained: dependent chain of quality episodes (one continuous
        # long episode; relay RTT between chunks not hidden)
        n_chunks = 10

        def chained(x0v, kk):
            x = x0v
            for i in range(n_chunks):
                xtr, _, _ = episode(x, jax.random.fold_in(kk, i))
                x = xtr[-1]
            return x

        jax.block_until_ready(chained(starts[0], ks[0]))
        sus = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(
                starts[0], jax.random.fold_in(key, 700 + r)))
            sus.append(time.perf_counter() - t0)
        out[f"k{K}_hz_sustained"] = round(
            n_chunks * args.steps / min(sus), 1)
        print(json.dumps({
            "metric": f"scene_student_fused_cfg_episode_k{K}_hz",
            "value": out[f"k{K}_hz_pipelined"], "unit": "Hz",
            "sustained": out[f"k{K}_hz_sustained"], **out[f"k{K}"]}),
            flush=True)
        with open(os.path.join(args.scene_dir, args.out_name), "w") as f:
            json.dump(out, f, indent=2)

    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
