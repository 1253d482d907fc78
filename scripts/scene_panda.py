"""Scene-conditioned 7-DoF Panda obstacle-reach planning (one model, ANY
obstacle layout).

Extends the fixed-world arm planner (`infer_planning.py --robot panda`,
artifacts/planning3d) across a DISTRIBUTION of sphere worlds, the way
`scene_conditioned_quadrotor.py` extended the quadrotor: train a
scene-feature-conditioned TemporalUnet on GPMP joint-space trajectories
collected over random worlds, then plan on held-out worlds with hard
inpainting conditions {0: start, H-1: goal}. The reference instantiates its
3-D env/robot per dataset (`/root/reference/mpd/datasets/trajectories.py:44-55`)
and must re-train (or at least re-guide) per environment; here the layout is
an INPUT.

Four eval arms on held-out worlds (same tasks, same keys):
  blind       — unconditioned model trained on the pooled trajectories;
                knows obstacles exist only on average.
  blind+guide — the per-scene guided oracle: the reference's deployment
                mode (FK-differentiated collision guide,
                `/root/reference/scripts/inference/inference_(mpd).py:254-298`).
  cond        — scene-conditioned, NO guide: the layout enters as context.
  cond+guide  — conditioned + per-scene guide (upper bound).

Everything scene-dependent is TRACED: one compiled GPMP generator serves
every training/eval world, one compiled sampler per arm serves every eval
world (the repo-wide pattern; CLAUDE.md quirk 5 makes per-scene recompiles
prohibitive). Collision/success masks are computed inside the jitted
sampler on the interpolated dense path, mirroring
`eval/planning_metrics.planning_metrics`.

Writes artifacts/scene_panda/{cond_ema.pkl, blind_ema.pkl, report.json,
scene0_ee.png}.
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

# random-world sampling bounds: sphere centers in the Panda's front
# workspace shell, radii big enough to force detours but small enough to
# keep tasks feasible
_C_LO = np.array([0.25, -0.45, 0.15], np.float32)
_C_HI = np.array([0.60, 0.45, 0.60], np.float32)
_R_LO, _R_HI = 0.08, 0.16
N_SPHERES = 3


def sample_worlds(n: int, seed: int) -> np.ndarray:
    """(n, N_SPHERES, 4) = (cx, cy, cz, r) random sphere layouts."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(_C_LO, _C_HI, size=(n, N_SPHERES, 3)).astype(np.float32)
    r = rng.uniform(_R_LO, _R_HI, size=(n, N_SPHERES, 1)).astype(np.float32)
    return np.concatenate([c, r], axis=-1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="artifacts/scene_panda")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--train-scenes", type=int, default=24)
    p.add_argument("--tasks-per-scene", type=int, default=16)
    p.add_argument("--trajs-per-task", type=int, default=8)
    p.add_argument("--gpmp-steps", type=int, default=400)
    p.add_argument("--train-steps", type=int, default=20000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--eval-scenes", type=int, default=6)
    p.add_argument("--eval-tasks", type=int, default=8)
    p.add_argument("--n-samples", type=int, default=25,
                   help="sampled plans per (scene, task)")
    p.add_argument("--n-diffusion-steps", type=int, default=25)
    p.add_argument("--guide-scale", type=float, default=0.1)
    p.add_argument("--skip-cond-guide", action="store_true",
                   help="skip the cond+guide arm (one fewer compile)")
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
    from mpc_via_diffusion_model_tpu.diffusion import (
        GaussianDiffusion, config_collision_avoidance_guide,
        first_order_smoothness_guide, make_guide,
    )
    from mpc_via_diffusion_model_tpu.diffusion.gaussian_diffusion import (
        apply_hard_conds,
    )
    from mpc_via_diffusion_model_tpu.envs.planning2d import interpolate_points
    from mpc_via_diffusion_model_tpu.envs.planning3d import (
        PANDA_Q_MAX, PANDA_Q_MIN, PandaArmEnv3D, PlanningEnv3D,
    )
    from mpc_via_diffusion_model_tpu.models import TemporalUnet
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    H, K = args.horizon, args.n_samples
    HC_IDX = jnp.array([0, H - 1])
    # fixed table slab under every world (the ENV_SPHERES_3D slab); the
    # random spheres carry all scene variation
    FIXED_BOXES = jnp.array([[0.0, 0.0, -0.17, 1.2, 1.2, 0.05]], jnp.float32)

    q_stats = NormalizerStats("limits", mins=jnp.asarray(PANDA_Q_MIN),
                              maxs=jnp.asarray(PANDA_Q_MAX))
    feat_stats = NormalizerStats(
        "limits",
        mins=jnp.asarray(np.tile(np.append(_C_LO, _R_LO), N_SPHERES)),
        maxs=jnp.asarray(np.tile(np.append(_C_HI, _R_HI), N_SPHERES)))

    def make_env(spheres):
        return PandaArmEnv3D(PlanningEnv3D(spheres, FIXED_BOXES))

    # ------------------------------------------------------------------ #
    # collection: ONE compiled GPMP generator, worlds traced
    # ------------------------------------------------------------------ #
    @jax.jit
    def gen_scene(spheres, key):
        return generate_arm_trajectories_gpmp(
            make_env(spheres), key, n_tasks=args.tasks_per_scene,
            n_trajs_per_task=args.trajs_per_task, horizon=H,
            n_opt_steps=args.gpmp_steps)

    worlds = sample_worlds(args.train_scenes, seed=0)
    t0 = time.time()
    pool_t, pool_f = [], []
    for s in range(args.train_scenes):
        trajs, valid = jax.device_get(
            gen_scene(jnp.asarray(worlds[s]), jax.random.PRNGKey(100 + s)))
        # ADVICE r4: the via bumps / collision gradients can push waypoints
        # past the joint limits; clamp BEFORE 'limits' normalization so no
        # normalized target leaves [-1, 1] (clip_denoised would silently
        # clip it at sampling and unnormalize would saturate at eval)
        kept = np.clip(trajs[valid], np.asarray(PANDA_Q_MIN),
                       np.asarray(PANDA_Q_MAX))
        pool_t.append(kept)
        pool_f.append(np.tile(worlds[s].reshape(-1), (len(kept), 1)))
        if s == 0:
            print(f"[collect] scene 0: {len(kept)}/{len(trajs)} valid "
                  f"(compile+run {time.time() - t0:.0f}s)", flush=True)
    trajs_all = np.concatenate(pool_t)
    feats_all = np.concatenate(pool_f)
    print(f"[collect] {len(trajs_all)} trajectories from {args.train_scenes} "
          f"worlds ({time.time() - t0:.0f}s)", flush=True)

    trajs_n = np.asarray(normalize(q_stats, jnp.asarray(trajs_all)))
    feats_n = np.asarray(normalize(feat_stats, jnp.asarray(feats_all)))

    # ------------------------------------------------------------------ #
    # train the conditioned model and its scene-blind twin on the SAME pool
    # ------------------------------------------------------------------ #
    schedule = make_schedule("exponential", args.n_diffusion_steps)
    diffusion = GaussianDiffusion(schedule=schedule, drop_prob=0.0)

    cond_model = TemporalUnet(
        state_dim=7, n_support_points=H, unet_input_dim=32,
        dim_mults=(1, 2, 4), context_dim=4 * N_SPHERES,
        conditioning_type="default")
    blind_model = TemporalUnet(
        state_dim=7, n_support_points=H, unet_input_dim=32,
        dim_mults=(1, 2, 4), conditioning_type=None)

    def train(model, apply_fn, ctx_all, tag):
        params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, H, 7)),
                            jnp.zeros((1,), jnp.int32),
                            *(() if ctx_all is None else
                              (jnp.zeros((1, 4 * N_SPHERES)),)))
        opt = make_optimizer(lr=args.lr)
        step = make_train_step(diffusion, apply_fn, opt,
                               step_start_ema=500, update_ema_every=10)
        chunk = make_scanned_train_steps(step, args.chunk)
        chunk_jit = jax.jit(
            lambda st, a, b, k: chunk(st, a, b, k, args.batch_size))
        state = TrainState(params,
                           jax.tree_util.tree_map(jnp.asarray, params),
                           opt.init(params), jnp.int32(0))
        tin = jnp.asarray(trajs_n)
        cin = jnp.asarray(ctx_all if ctx_all is not None
                          else np.zeros((len(trajs_n), 1), np.float32))
        key, loss, t1 = jax.random.PRNGKey(7), float("nan"), time.time()
        for _ in range(max(1, args.train_steps // args.chunk)):
            key, k = jax.random.split(key)
            state, loss = chunk_jit(state, tin, cin, k)
        print(f"[train:{tag}] {args.train_steps} steps, final loss "
              f"{float(loss):.5f} ({time.time() - t1:.0f}s)", flush=True)
        return jax.device_get(state.ema_params)

    cond_apply = lambda p_, x, t, c, m: cond_model.apply(p_, x, t, c, m)
    blind_apply = lambda p_, x, t, c, m: blind_model.apply(p_, x, t)
    cond_params = train(cond_model, cond_apply, feats_n, "cond")
    blind_params = train(blind_model, blind_apply, None, "blind")
    for tag, prm in (("cond", cond_params), ("blind", blind_params)):
        with open(os.path.join(args.out, f"{tag}_ema.pkl"), "wb") as f:
            pickle.dump(prm, f)

    # ------------------------------------------------------------------ #
    # held-out eval: one compiled sampler per arm, worlds + tasks traced
    # ------------------------------------------------------------------ #
    t_start_guide = float(np.ceil(0.25 * args.n_diffusion_steps))

    def make_arm(apply_fn, use_ctx: bool, use_guide: bool):
        def run(params, spheres, starts, goals, key):
            env = make_env(spheres)
            T = starts.shape[0]
            hc = jnp.repeat(
                jnp.stack([normalize(q_stats, starts),
                           normalize(q_stats, goals)], axis=1), K, axis=0)
            ctx = (jnp.broadcast_to(
                normalize(feat_stats, spheres.reshape(-1)),
                (T * K, 4 * N_SPHERES)) if use_ctx else None)
            guide = (make_guide(
                [(config_collision_avoidance_guide(env), 1.0),
                 (first_order_smoothness_guide(), 0.1)],
                unnormalize_fn=lambda x: unnormalize(q_stats, x),
                clip_grad=True, scale=args.guide_scale)
                if use_guide else None)
            denoise = lambda x, t, c, m: apply_fn(params, x, t, c, m)
            x = diffusion.ddpm_sample(
                denoise, (T * K, H, 7), key, context=ctx,
                hard_conds=(HC_IDX, hc), n_diffusion_steps_without_noise=5,
                guide=guide, n_guide_steps=1, t_start_guide=t_start_guide)
            if guide is not None:
                # post-diffusion guide-only refinement (inference_(mpd).py:279-298)
                for _ in range(5):
                    x = apply_hard_conds(x + guide(x), (HC_IDX, hc))
            trajs = unnormalize(q_stats, x)  # (T*K, H, 7)
            dense = interpolate_points(trajs, 128)
            in_coll = jnp.logical_or(env.in_collision(dense),
                                     jnp.any(jnp.isnan(dense), axis=-1))
            free = ~jnp.any(in_coll, axis=-1)
            plen = jnp.sum(jnp.linalg.norm(jnp.diff(trajs, axis=-2), axis=-1),
                           axis=-1)
            return (trajs.reshape(T, K, H, 7), free.reshape(T, K),
                    plen.reshape(T, K))

        return jax.jit(run)

    arms = {
        "blind": make_arm(blind_apply, False, False),
        "blind+guide": make_arm(blind_apply, False, True),
        "cond": make_arm(cond_apply, True, False),
    }
    if not args.skip_cond_guide:
        arms["cond+guide"] = make_arm(cond_apply, True, True)
    arm_params = {"blind": blind_params, "blind+guide": blind_params,
                  "cond": cond_params, "cond+guide": cond_params}

    # eval tasks come from the GPMP generator run on the HELD-OUT worlds, so
    # every task carries a feasibility certificate (>= 1 valid GPMP solve).
    # ADVICE r4: the generator's valid flag checks clearance only at the H
    # waypoints while the eval arms use a 128-point dense interpolation —
    # re-certify with the SAME dense check so a "feasible" task really has a
    # collision-free solution under the eval metric.
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
            print(f"[eval-tasks] world {e}: no GPMP-feasible task — skipped",
                  flush=True)
            continue
        # pad to a FIXED task count (one sampler compile serves every world);
        # padded rows are sliced off the metrics below
        n_real = len(starts)
        while len(starts) < args.eval_tasks:
            starts.append(starts[len(starts) % n_real])
            goals.append(goals[len(goals) % n_real])
        ev_tasks.append((e, np.stack(starts), np.stack(goals), n_real))
        print(f"[eval-tasks] world {e}: {n_solved} GPMP-feasible tasks",
              flush=True)
    if not ev_tasks:
        # ADVICE r4: np.mean([]) would write NaN into report.json
        raise SystemExit(
            "[eval-tasks] no dense-certified GPMP-feasible task in any "
            "held-out world — widen the world bounds or raise --gpmp-steps")

    report = {
        "protocol": f"{args.eval_scenes} held-out worlds (seed 99) x "
                    f"<= {args.eval_tasks} GPMP-feasible tasks x "
                    f"{K} samples, PRNGKey(31)",
        "train": {"scenes": args.train_scenes, "trajectories": len(trajs_all),
                  "steps": args.train_steps, "lr": args.lr},
        "guide_scale": args.guide_scale, "horizon": H,
        "n_diffusion_steps": args.n_diffusion_steps,
        "world_bounds": {"center_lo": _C_LO.tolist(),
                         "center_hi": _C_HI.tolist(),
                         "radius": [_R_LO, _R_HI]},
        "rows": [],
    }

    best_for_plot = None
    for name, run in arms.items():
        t1 = time.time()
        succ, frac, blens = [], [], []
        for e, starts, goals, n_real in ev_tasks:
            trajs, free, plen = jax.device_get(run(
                arm_params[name], jnp.asarray(ev_worlds[e]),
                jnp.asarray(starts), jnp.asarray(goals),
                jax.random.PRNGKey(31)))
            free, plen = free[:n_real], plen[:n_real]
            succ.extend(free.any(axis=1).tolist())
            frac.extend(free.mean(axis=1).tolist())
            for t in range(free.shape[0]):
                if free[t].any():
                    blens.append(float(np.where(free[t], plen[t], np.inf).min()))
            if name == "cond" and e == ev_tasks[0][0]:
                best_for_plot = (e, trajs, free)
        row = {"arm": name,
               "success_rate": float(np.mean(succ)),
               "fraction_free": float(np.mean(frac)),
               "best_path_length_mean": float(np.mean(blens)) if blens
               else None,
               "n_tasks": len(succ),
               "eval_seconds": round(time.time() - t1, 1)}
        report["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(args.out, "report.json"), "w") as f:
            json.dump(report, f, indent=2)

    # render the conditioned arm's plans on held-out world 0 (EE space)
    if best_for_plot is not None:
        from mpc_via_diffusion_model_tpu.dynamics.arm import panda_fk
        from mpc_via_diffusion_model_tpu.eval.plotting import (
            plot_planning_env_3d, save_fig,
        )
        e_sel, trajs, free = best_for_plot
        t_sel = 0
        ee = jax.device_get(jax.vmap(jax.vmap(panda_fk))(
            jnp.asarray(trajs[t_sel])))
        best = (int(np.argmax(free[t_sel])) if free[t_sel].any() else 0)
        fig = plot_planning_env_3d(
            PlanningEnv3D(jnp.asarray(ev_worlds[e_sel]), FIXED_BOXES),
            np.asarray(ee), best)
        save_fig(fig, os.path.join(args.out, "scene0_ee"))

    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
