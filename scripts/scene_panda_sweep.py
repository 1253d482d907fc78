"""Sample-budget sweep for the scene-conditioned Panda planner.

The committed artifacts/scene_panda eval draws 25 samples per task; at that
budget every arm solves every task (success 1.0) and the discriminating
metric is per-sample reliability. This sweep answers the PRODUCT question
the 25-sample protocol hides: **how many samples does each arm need per
task?** Re-runs the blind and scene-conditioned arms (committed EMA
pickles, no retraining) on the same held-out worlds/tasks/keys, records the
per-task free counts, and converts them to success@n for n <= 25 via the
exchangeable-draw (hypergeometric) estimator

    success@n(task) = 1 - C(K - f, n) / C(K, n),   f = free draws of K,

i.e. the probability that a random n-subset of the 25 iid draws contains a
collision-free plan — an unbiased success@n estimate without re-sampling.

Reference role: the per-scene guided deployment draws a fixed batch and
takes the best (`inference_(mpd).py:254-343`); conditioning shrinks the
batch the deployment needs. Writes artifacts/scene_panda/
sample_efficiency.json.
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
from math import comb

from scene_panda import N_SPHERES, _C_HI, _C_LO, _R_HI, _R_LO, sample_worlds


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--art", default="artifacts/scene_panda")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--tasks-per-scene", type=int, default=16)
    p.add_argument("--trajs-per-task", type=int, default=8)
    p.add_argument("--gpmp-steps", type=int, default=400)
    p.add_argument("--eval-scenes", type=int, default=6)
    p.add_argument("--eval-tasks", type=int, default=8)
    p.add_argument("--n-samples", type=int, default=25)
    p.add_argument("--n-diffusion-steps", type=int, default=25)
    p.add_argument("--budgets", type=int, nargs="+",
                   default=[1, 2, 4, 8, 16, 25])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.normalization import (
        NormalizerStats, normalize, unnormalize,
    )
    from mpc_via_diffusion_model_tpu.data.trajectories import (
        generate_arm_trajectories_gpmp,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.envs.planning2d import interpolate_points
    from mpc_via_diffusion_model_tpu.envs.planning3d import (
        PANDA_Q_MAX, PANDA_Q_MIN, PandaArmEnv3D, PlanningEnv3D,
    )
    from mpc_via_diffusion_model_tpu.models import TemporalUnet

    H, K = args.horizon, args.n_samples
    HC_IDX = jnp.array([0, H - 1])
    FIXED_BOXES = jnp.array([[0.0, 0.0, -0.17, 1.2, 1.2, 0.05]], jnp.float32)
    q_stats = NormalizerStats("limits", mins=jnp.asarray(PANDA_Q_MIN),
                              maxs=jnp.asarray(PANDA_Q_MAX))
    feat_stats = NormalizerStats(
        "limits",
        mins=jnp.asarray(np.tile(np.append(_C_LO, _R_LO), N_SPHERES)),
        maxs=jnp.asarray(np.tile(np.append(_C_HI, _R_HI), N_SPHERES)))

    def make_env(spheres):
        return PandaArmEnv3D(PlanningEnv3D(spheres, FIXED_BOXES))

    with open(os.path.join(args.art, "cond_ema.pkl"), "rb") as f:
        cond_params = pickle.load(f)
    with open(os.path.join(args.art, "blind_ema.pkl"), "rb") as f:
        blind_params = pickle.load(f)

    cond_model = TemporalUnet(state_dim=7, n_support_points=H,
                              unet_input_dim=32, dim_mults=(1, 2, 4),
                              context_dim=4 * N_SPHERES,
                              conditioning_type="default")
    blind_model = TemporalUnet(state_dim=7, n_support_points=H,
                               unet_input_dim=32, dim_mults=(1, 2, 4),
                               conditioning_type=None)
    diffusion = GaussianDiffusion(
        schedule=make_schedule("exponential", args.n_diffusion_steps))

    cond_apply = lambda p_, x, t, c, m: cond_model.apply(p_, x, t, c, m)
    blind_apply = lambda p_, x, t, c, m: blind_model.apply(p_, x, t)

    def make_arm(apply_fn, use_ctx):
        def run(params, spheres, starts, goals, key):
            env = make_env(spheres)
            T = starts.shape[0]
            hc = jnp.repeat(
                jnp.stack([normalize(q_stats, starts),
                           normalize(q_stats, goals)], axis=1), K, axis=0)
            ctx = (jnp.broadcast_to(
                normalize(feat_stats, spheres.reshape(-1)),
                (T * K, 4 * N_SPHERES)) if use_ctx else None)
            denoise = lambda x, t, c, m: apply_fn(params, x, t, c, m)
            x = diffusion.ddpm_sample(
                denoise, (T * K, H, 7), key, context=ctx,
                hard_conds=(HC_IDX, hc), n_diffusion_steps_without_noise=5)
            trajs = unnormalize(q_stats, x)
            dense = interpolate_points(trajs, 128)
            in_coll = jnp.logical_or(env.in_collision(dense),
                                     jnp.any(jnp.isnan(dense), axis=-1))
            free = ~jnp.any(in_coll, axis=-1)
            return free.reshape(T, K)

        return jax.jit(run)

    # ---- eval tasks: same dense-certified construction as scene_panda ----
    @jax.jit
    def gen_scene(spheres, key):
        return generate_arm_trajectories_gpmp(
            make_env(spheres), key, n_tasks=args.tasks_per_scene,
            n_trajs_per_task=args.trajs_per_task, horizon=H,
            n_opt_steps=args.gpmp_steps)

    @jax.jit
    def dense_free(spheres, trajs):
        env = make_env(spheres)
        dense = interpolate_points(trajs, 128)
        coll = jnp.logical_or(env.in_collision(dense),
                              jnp.any(jnp.isnan(dense), axis=-1))
        return ~jnp.any(coll, axis=-1)

    ev_worlds = sample_worlds(args.eval_scenes, seed=99)
    ev_tasks = []
    for e in range(args.eval_scenes):
        trajs, valid = jax.device_get(
            gen_scene(jnp.asarray(ev_worlds[e]), jax.random.PRNGKey(900 + e)))
        valid = valid & jax.device_get(
            dense_free(jnp.asarray(ev_worlds[e]), jnp.asarray(trajs)))
        tpt = args.trajs_per_task
        starts, goals, n_solved = [], [], 0
        for t in range(args.tasks_per_scene):
            grp = valid[t * tpt:(t + 1) * tpt]
            if grp.any() and n_solved < args.eval_tasks:
                n_solved += 1
                starts.append(trajs[t * tpt, 0])
                goals.append(trajs[t * tpt, -1])
        if not starts:
            continue
        n_real = len(starts)
        while len(starts) < args.eval_tasks:
            starts.append(starts[len(starts) % n_real])
            goals.append(goals[len(goals) % n_real])
        ev_tasks.append((e, np.stack(starts), np.stack(goals), n_real))
        print(f"[eval-tasks] world {e}: {n_solved} tasks", flush=True)
    if not ev_tasks:
        raise SystemExit("no dense-certified eval task")

    arms = {"blind": (make_arm(blind_apply, False), blind_params),
            "cond": (make_arm(cond_apply, True), cond_params)}

    def success_at_n(f, n):
        # P(>= 1 free among a random n-subset of the K exchangeable draws)
        return 1.0 - comb(K - int(f), n) / comb(K, n) if n <= K - f else 1.0

    report = {"protocol": f"{len(ev_tasks)} held-out worlds x <= "
                          f"{args.eval_tasks} dense-certified tasks x "
                          f"{K} samples, PRNGKey(31); success@n via the "
                          f"hypergeometric estimator over the same draws",
              "budgets": args.budgets, "rows": []}
    for tag, (run, prm) in arms.items():
        t0 = time.time()
        counts = []
        for e, starts, goals, n_real in ev_tasks:
            free = np.asarray(run(prm, jnp.asarray(ev_worlds[e]),
                                  jnp.asarray(starts), jnp.asarray(goals),
                                  jax.random.PRNGKey(31)))
            counts += [int(free[t].sum()) for t in range(n_real)]
        row = {"arm": tag, "n_tasks": len(counts),
               "fraction_free": round(float(np.mean(counts)) / K, 4),
               "free_counts": counts}
        for n in args.budgets:
            row[f"success_at_{n}"] = round(
                float(np.mean([success_at_n(f, n) for f in counts])), 4)
        row["eval_seconds"] = round(time.time() - t0, 1)
        report["rows"].append(row)
        print(json.dumps({k: v for k, v in row.items()
                          if k != "free_counts"}), flush=True)

    with open(os.path.join(args.art, "sample_efficiency.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
