"""Best-of-K self-distillation of the SCENE-conditioned student across the
scene distribution.

Compounds two round-4 results: the scene-conditioned student beats the
per-scene guided oracle only WITH scene-aware best-of-16 selection
(artifacts/scene_conditioned: K=1 CF 0.77 / safe-reach 0.34 held-out;
K=16 CF 1.00 / 0.67), and best-of-K self-distillation at on-policy states
bakes a selection into the weights (artifacts/onpolicy_quadrotor:
single-draw safe-reach 0.34 -> 0.875 on the canonical scene). Here the
same recipe runs across RANDOM scenes, so the improvement generalizes to
never-seen layouts:

1. Sample training-distribution scenes; roll the K=16 scene-aware
   selection loop from random starts on each (scenes are TRACED values —
   one compiled program serves every scene, like the study's eval).
2. At each visited (state, scene) draw 16 candidates from the scene
   student and keep the argmin of task cost + hard per-scene collision
   penalty.
3. Fine-tune the scene student with the standard diffusion loss on
   (selected plan, state||scene) pairs, mixed with the original curated
   scene dataset; aggregate and repeat.
4. Eval on the committed held-out protocol (8 seed-99 scenes x 16 starts
   x 60 steps, PRNGKey(31)): K=1 and K=16, before/after.

Writes artifacts/onpolicy_scene/{scene_student_ema.pkl, report.json}.
Reference role: the per-scene guided serving loop,
`/root/reference/scripts/inference/inference_(mpd).py:254-343`.
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
    p.add_argument("--out", default="artifacts/onpolicy_scene")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--collect-scenes", type=int, default=16)
    p.add_argument("--collect-starts", type=int, default=8,
                   help="starts per collection scene")
    p.add_argument("--collect-steps", type=int, default=None,
                   help="collection-episode length (default --steps); longer "
                        "than --steps makes the policy VISIT near-goal and "
                        "post-arrival drift states so station-keeping labels "
                        "exist to learn from (the round-5 fix for the 0.75 "
                        "safe-reach ceiling)")
    p.add_argument("--lqr-candidate", action="store_true",
                   help="append the analytic LQR hover-regulator plan "
                        "(quadrotor_task.make_lqr_hover_plan) to every "
                        "best-of-K label set — the expert for exactly the "
                        "near-goal regime the sampled candidates miss")
    p.add_argument("--collect-chunk", type=int, default=256,
                   help="episodes per collection dispatch — long-episode "
                        "K=16 collection at 256 can approach the ~10-min "
                        "dispatch crash limit (CLAUDE.md quirk 6)")
    p.add_argument("--eval-steps-long", type=int, default=0,
                   help="if >0, add eval rows at this episode length too "
                        "(the station-keeping diagnostic: goal-reach at 100 "
                        "steps collapsed to 0.0 before this fix)")
    p.add_argument("--label-k", type=int, default=16)
    p.add_argument("--label-margin", type=float, default=0.0,
                   help="clearance margin in the label curation score: "
                        "plans entering the margin shell are penalized like "
                        "the deployment selector's margin-inflated spheres "
                        "(make_select_cost margin=0.15), not just actual "
                        "penetration — 0.0 reproduces the v1/v2 runs")
    p.add_argument("--train-steps", type=int, default=4000)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--onpolicy-frac", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--eval-scenes", type=int, default=8)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--init-student", default=None,
                   help="start the fine-tune from this pkl instead of the "
                        "scene_conditioned student — chains a scaled run on "
                        "top of a committed one (VERDICT r4 #4); the "
                        "report's 'before' rows then eval THIS init")
    p.add_argument("--iter-offset", type=int, default=0,
                   help="offset for all per-iteration seeds so a chained "
                        "run collects FRESH scenes/starts/keys (set to the "
                        "prior run's --iterations)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import (
        NormalizerStats, fit_normalizer, normalize, unnormalize,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout_with_cost
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
    )
    from quadrotor_task import (
        eval_start_states, make_lqr_hover_plan, make_select_cost,
        min_clearance_jax, sample_scenes, scene_features, track_metrics,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    sc_c, sc_r = sample_scenes(50_000, seed=123)
    feat_stats = fit_normalizer(np.asarray(scene_features(sc_c, sc_r)))
    c24_stats = NormalizerStats(
        "limits",
        mins=jnp.concatenate([c_stats.mins, feat_stats.mins]),
        maxs=jnp.concatenate([c_stats.maxs, feat_stats.maxs]))

    mix = np.load(os.path.join(args.scene_dir, "scene_dataset.npz"))
    mix_u = jnp.asarray(mix["inputs_normalized"])
    mix_c = jnp.asarray(mix["condition_normalized"])
    init_path = (args.init_student if args.init_student
                 else os.path.join(args.scene_dir, "scene_student_ema.pkl"))
    with open(init_path, "rb") as f:
        student0 = pickle.load(f)

    H = args.horizon
    model24 = TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=24,
        conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # one jitted program per (params, K, steps): scenes are TRACED args
    def make_scene_runner(params, K, steps=None):
        steps = args.steps if steps is None else steps

        def run(cen, rad, x0, k):
            feat = scene_features(cen, rad)
            c = (make_select_cost(quad_cost, centers=cen, radii=rad)
                 if K > 1 else quad_cost)
            loop = make_closed_loop(
                diffusion, model24.apply, in_stats, c24_stats, plant, c,
                horizon=H, n_steps=steps, w=args.w,
                n_diffusion_steps_without_noise=5, n_candidates=K,
                state_to_condition=lambda x: jnp.concatenate([x, feat]))
            return loop(params, x0, k)

        return jax.jit(jax.vmap(run))

    lqr_plan = (make_lqr_hover_plan(plant, quad_cost, in_stats, H)
                if args.lqr_candidate else None)

    # held-out eval (the committed protocol, seed-99 scenes / PRNGKey(31))
    E, S = args.eval_scenes, args.eval_starts
    ev_c, ev_r = sample_scenes(E, seed=99)
    ev_starts = jnp.asarray(eval_start_states(S, seed=11))
    pc = jnp.repeat(jnp.asarray(ev_c), S, axis=0)
    pr = jnp.repeat(jnp.asarray(ev_r), S, axis=0)
    px = jnp.tile(ev_starts, (E, 1))
    pk = jax.random.split(jax.random.PRNGKey(31), E * S)

    def eval_student(params, K, steps=None):
        runner = make_scene_runner(params, K, steps)
        tracks = np.concatenate([
            np.asarray(runner(pc[e * S:(e + 1) * S], pr[e * S:(e + 1) * S],
                              px[e * S:(e + 1) * S], pk[e * S:(e + 1) * S])
                       .x_track)
            for e in range(E)])  # per-scene dispatches: 64-start evals stay
        # within the one-dispatch budget (CLAUDE.md quirk 6)
        m = track_metrics(tracks, centers=np.asarray(pc),
                          radii=np.asarray(pr))
        per_scene = [
            track_metrics(tracks[e * S:(e + 1) * S],
                          centers=np.asarray(ev_c[e]),
                          radii=np.asarray(ev_r[e]))["collision_free_fraction"]
            for e in range(E)]
        m["per_scene_cf"] = per_scene
        return m

    # labeler: 16 candidates at (state, scene), curation score with the
    # PER-SCENE penalty (scenes traced)
    def make_labeler(params):
        @jax.jit
        def label(x0s, cens, rads, keys):
            def per_row(x0, cen, rad, key):
                feat = scene_features(cen, rad)
                ctx = normalize(c24_stats, jnp.concatenate([x0, feat]))
                ctx_b = jnp.broadcast_to(ctx[None],
                                         (args.label_k, ctx.shape[-1]))
                denoise = lambda x, t, c, m: model24.apply(params, x, t, c, m)
                plans = diffusion.ddpm_cfg_sample(
                    denoise, (args.label_k, H, 4), key, ctx_b, w=args.w,
                    n_diffusion_steps_without_noise=5)
                if lqr_plan is not None:
                    plans = jnp.concatenate([plans, lqr_plan(x0)[None]])

                def score(u_n):
                    u = unnormalize(in_stats, jnp.clip(u_n, -1.0, 1.0))
                    xs, c = rollout_with_cost(plant, quad_cost, x0, u)
                    clear = min_clearance_jax(xs, centers=cen, radii=rad)
                    pen = jnp.maximum(args.label_margin - clear, 0.0)
                    s = c + 1e5 * pen + 1e5 * pen * pen
                    # a candidate whose rollout overflows (LQR far from the
                    # linearization point, or any plan from a drift state)
                    # scores NaN — and NaN WINS jnp.argmin, so it would be
                    # selected exactly when it is worthless; make it lose
                    return jnp.where(jnp.isfinite(s), s, jnp.inf)

                return plans[jnp.argmin(jax.vmap(score)(plans))]

            return jax.vmap(per_row)(x0s, cens, rads, keys)

        return label

    ft_opt = make_optimizer(lr=args.lr)
    step_fn = make_train_step(diffusion, model24.apply, ft_opt,
                              step_start_ema=0, update_ema_every=1)
    chunk_fn = make_scanned_train_steps(step_fn, args.chunk)
    chunk_jit = jax.jit(
        lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
    _rng = lambda v: f"{v[0]:.4f}->{v[-1]:.4f}" if v else "n/a"

    report = {
        "protocol": f"{E} held-out scenes (seed 99) x {S} starts x "
                    f"{args.steps} steps, PRNGKey(31) — the committed "
                    f"scene_conditioned eval",
        "init_student": init_path,
        "iter_offset": args.iter_offset,
        "label_margin": args.label_margin,
        "label_k": args.label_k, "w": args.w,
        "collect_steps": args.collect_steps or args.steps,
        "lqr_candidate": bool(args.lqr_candidate),
        "collect": {"scenes_per_iter": args.collect_scenes,
                    "starts_per_scene": args.collect_starts,
                    "iterations": args.iterations},
        "train": {"steps_per_iteration": args.train_steps,
                  "total_steps": args.train_steps * args.iterations,
                  "lr": args.lr, "onpolicy_frac": args.onpolicy_frac},
        "rows": [],
    }

    cur = student0
    pool_u, pool_c = [], []
    for it in range(args.iterations):
        t0 = time.time()
        M, S2 = args.collect_scenes, args.collect_starts
        gi = it + args.iter_offset  # global iteration index for chained runs
        cc, cr = sample_scenes(M, seed=500 + gi)
        col_c = jnp.repeat(jnp.asarray(cc), S2, axis=0)   # (M*S2, 3, 3)
        col_r = jnp.repeat(jnp.asarray(cr), S2, axis=0)
        col_x = jnp.tile(jnp.asarray(
            eval_start_states(S2, seed=60 + gi)), (M, 1))
        col_k = jax.random.split(jax.random.PRNGKey(300 + gi), M * S2)
        print(f"[it {it}] collecting ({M} scenes x {S2} starts, "
              f"K={args.label_k} loop compile)...", flush=True)
        runner = make_scene_runner(cur, args.label_k, args.collect_steps)
        CHC = args.collect_chunk
        vis_l = [np.asarray(runner(col_c[i:i + CHC], col_r[i:i + CHC],
                                   col_x[i:i + CHC], col_k[i:i + CHC])
                            .x_track[:, :-1])
                 for i in range(0, col_c.shape[0], CHC)]
        visited = np.concatenate(vis_l)                    # (M*S2, T, 12)
        T = visited.shape[1]
        vx_np = visited.reshape(-1, 12)
        vc_np = np.asarray(jnp.repeat(col_c, T, axis=0))
        vr_np = np.asarray(jnp.repeat(col_r, T, axis=0))
        # long collection episodes can DIVERGE (the pre-fix policy drifts off
        # the goal and the attitude can blow up); a single non-finite state
        # poisons its label and then EVERY on-policy train chunk (the NaN
        # guard skips the update, so the whole fine-tune silently no-ops —
        # observed live: "onp nan->nan"). Keep finite, plausibly-bounded
        # states only; diverged tails are unrecoverable and carry no signal.
        ok = np.isfinite(vx_np).all(-1) & (np.abs(vx_np) < 100.0).all(-1)
        vx = jnp.asarray(vx_np[ok])
        vc = jnp.asarray(vc_np[ok])
        vr = jnp.asarray(vr_np[ok])
        print(f"[it {it}] collect: {vx.shape[0]} (state, scene) pairs from "
              f"{M} scenes ({(~ok).sum()} diverged dropped, "
              f"{time.time() - t0:.0f}s)", flush=True)

        t1 = time.time()
        print(f"[it {it}] labeling (best-of-{args.label_k} CFG sampler "
              f"compile)...", flush=True)
        labeler = make_labeler(cur)
        base_key = jax.random.PRNGKey(400 + gi)
        CH = 256
        lab = []
        for i in range(0, vx.shape[0], CH):
            keys = jax.vmap(lambda j: jax.random.fold_in(base_key, j))(
                jnp.arange(i, min(i + CH, vx.shape[0])))
            lab.append(np.asarray(labeler(
                vx[i:i + CH], vc[i:i + CH], vr[i:i + CH], keys)))
        labels = np.concatenate(lab)
        print(f"[it {it}] label: best-of-{args.label_k} at {len(labels)} "
              f"pairs ({time.time() - t1:.0f}s)", flush=True)

        feats = scene_features(vc, vr)
        ctx24 = np.asarray(jax.vmap(
            lambda x, f: normalize(c24_stats, jnp.concatenate([x, f])))(
                vx, feats))
        # insurance: an LQR rollout from an extreme (finite) state can still
        # overflow, and clip(NaN) stays NaN — drop non-finite label rows
        lab_ok = np.isfinite(labels).all(axis=(1, 2))
        pool_u.append(np.clip(labels[lab_ok], -1.0, 1.0))
        pool_c.append(ctx24[lab_ok])
        onp_u = jnp.asarray(np.concatenate(pool_u))
        onp_c = jnp.asarray(np.concatenate(pool_c))

        state = TrainState(
            params=cur, ema_params=jax.tree_util.tree_map(jnp.copy, cur),
            opt_state=ft_opt.init(cur), step=jnp.int32(0))
        key = jax.random.PRNGKey(77 + gi)
        n_chunks = args.train_steps // args.chunk
        n_onp = int(round(args.onpolicy_frac * n_chunks))
        slots = (set(np.round(np.linspace(0, n_chunks - 1, n_onp)).astype(int))
                 if n_onp else set())
        t2 = time.time()
        ls = {"onp": [], "ds": []}
        for c in range(n_chunks):
            key, k = jax.random.split(key)
            if c in slots:
                state, loss = chunk_jit(state, onp_u, onp_c, k)
                ls["onp"].append(float(loss))
            else:
                state, loss = chunk_jit(state, mix_u, mix_c, k)
                ls["ds"].append(float(loss))
        cur = jax.device_get(state.ema_params)
        print(f"[it {it}] train {args.train_steps} steps "
              f"({time.time() - t2:.0f}s): onp {_rng(ls['onp'])}, "
              f"ds {_rng(ls['ds'])}", flush=True)

    student = cur
    with open(os.path.join(args.out, "scene_student_ema.pkl"), "wb") as f:
        pickle.dump(student, f)

    eval_lengths = [args.steps]
    if args.eval_steps_long:
        eval_lengths.append(args.eval_steps_long)
    for tag, params in (("before", student0), ("onpolicy", student)):
        for steps in eval_lengths:
            for K in (1, args.label_k):
                m = eval_student(params, K, steps)
                row = {"student": tag, "K": K, "steps": steps, **m}
                report["rows"].append(row)
                print(json.dumps(row), flush=True)
                with open(os.path.join(args.out, "report.json"), "w") as f:
                    json.dump(report, f, indent=2)

    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
