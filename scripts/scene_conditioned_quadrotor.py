"""Scene-CONDITIONED quadrotor planning: one student, any obstacle layout.

The guided-distillation line (distill_quadrotor_guided_data.py) bakes ONE
scene into the weights: the canonical 3-sphere layout is implicit in the
curated data, and a new scene needs a new teacher+student. The reference
handles new scenes by paying the guide at sampling time, every time
(`inference_(mpd).py:254-298` rebuilds the SDF guide per environment).

This script amortizes over the SCENE DISTRIBUTION instead:

1. SAMPLE scene-conditioned guided data: every drawn plan gets its own
   random scene (quadrotor_task.sample_scenes) and its own per-scene
   obstacle guide; plans that clip their OWN scene are rejected.
2. WIDEN the flagship teacher's conditioning from 12 (state) to 24
   (state + scene features) by FiLM-kernel surgery — zero rows for the new
   dims make the widened model function-identical to the teacher at init,
   so this is a warm start, not from-scratch training.
3. FINE-TUNE on the curated (plan, state+scene) pairs: full unguided CFG
   sampling of the widened model now reproduces guided behavior FOR THE
   SCENE IN ITS CONTEXT — planning on a never-seen layout costs zero guide
   evaluations.
4. EVAL on held-out scenes: scene-blind teacher (floor), per-scene guided
   teacher (oracle, pays the guide), scene-conditioned student (ours).

Writes <out>/report.json, scene_student_ema.pkl, scene_dataset.npz.
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

from quadrotor_task import (
    eval_start_states, make_penalty_grad, sample_scenes, scene_features,
    track_metrics,
)


def widen_film_params(params12, params24, old_ctx, new_ctx, cfg_indicator):
    """Copy teacher params into the widened-context param tree.

    The only context-shaped leaves are the per-ResBlock FiLM Dense kernels
    ``(t_dim + old_ctx + cfg, C)``; the new scene dims get ZERO rows (the
    cond MLP's mish is elementwise, so zero out-weights make the widened
    model compute exactly the teacher's function at init). Everything else
    is copied verbatim."""
    import jax
    import jax.numpy as jnp

    cfg = 1 if cfg_indicator else 0
    extra = new_ctx - old_ctx

    def splice(old, new):
        if old.shape == new.shape:
            return old
        assert old.ndim == 2 and new.shape[0] == old.shape[0] + extra, (
            f"unexpected widened leaf {old.shape} -> {new.shape}")
        t_dim = old.shape[0] - old_ctx - cfg
        return jnp.concatenate([
            old[: t_dim + old_ctx],
            jnp.zeros((extra, old.shape[1]), old.dtype),
            old[t_dim + old_ctx:],
        ], axis=0)

    return jax.tree_util.tree_map(splice, params12, params24)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--out", default="artifacts/scene_conditioned")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--guide-scale", type=float, default=0.1)
    p.add_argument("--t-start-guide", type=float, default=6.25)
    p.add_argument("--n-sample-chunks", type=int, default=24)
    p.add_argument("--chunk-rows", type=int, default=2048)
    p.add_argument("--clear-margin", type=float, default=0.05,
                   help="curation: reject plans whose open-loop rollout "
                        "clears its own scene by less than this margin "
                        "(0.0 reproduces the round-3 filter)")
    p.add_argument("--progress-keep", type=float, default=0.85,
                   help="if >0, additionally require the plan's final state "
                        "to close the goal distance to this fraction (or "
                        "start already near the goal) — the curation knob "
                        "that recovered reach on the guided student "
                        "(distill_quadrotor_guided_data.py)")
    p.add_argument("--select-k", type=int, default=16,
                   help="if >1, add a best-of-K eval row: the scene student "
                        "with scene-aware margin-inflated safety-first "
                        "candidate selection (quadrotor_task."
                        "make_select_cost(centers=..., radii=...))")
    p.add_argument("--finetune-steps", type=int, default=30000)
    p.add_argument("--chunk", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--finetune-lr", type=float, default=1e-3)
    p.add_argument("--eval-scenes", type=int, default=8)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--eval-steps", type=int, default=60)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="pipeline smoke: 2x256 rows, 400 ft steps, 2x4 eval")
    args = p.parse_args()
    if args.quick:
        args.n_sample_chunks, args.chunk_rows = 2, 256
        args.finetune_steps, args.chunk, args.batch_size = 400, 100, 64
        args.eval_scenes, args.eval_starts, args.eval_steps = 2, 4, 20
        args.select_k = 4

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import (
        NormalizerStats, fit_normalizer, normalize,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout
    from mpc_via_diffusion_model_tpu.data.normalization import unnormalize
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
    )
    from quadrotor_task import min_clearance_jax

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    with open(os.path.join(args.teacher, "ema_params.pkl"), "rb") as f:
        teacher12 = pickle.load(f)

    H = args.horizon
    mk_model = lambda ctx: TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=ctx,
        conditioning_type="default", cfg_indicator=True)
    model12, model24 = mk_model(12), mk_model(24)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # scene-feature normalizer: limits of the sampling distribution
    sc_c, sc_r = sample_scenes(50_000, seed=123)
    feat_stats = fit_normalizer(np.asarray(scene_features(sc_c, sc_r)))
    # 24-dim condition stats: [teacher's 12 | scene features 12]
    c24_stats = NormalizerStats(
        "limits",
        mins=jnp.concatenate([c_stats.mins, feat_stats.mins]),
        maxs=jnp.concatenate([c_stats.maxs, feat_stats.maxs]))

    # ------------- 1) scene-conditioned guided sampling -------------
    t0 = time.time()
    x0_pool, cn_pool = ds.condition, ds.condition_normalized
    n_pool = x0_pool.shape[0]
    per_grad = make_penalty_grad(plant, in_stats, args.guide_scale,
                                 scene_args=True)

    B = args.chunk_rows

    def sample_chunk(x0s, cen, rad, key):
        ctx12 = jax.vmap(lambda x: normalize(c_stats, x))(x0s)
        denoise = lambda x, t, c, m: model12.apply(teacher12, x, t, c, m)

        def guide(u_norm_b):
            return jax.vmap(per_grad)(u_norm_b, x0s, cen, rad)

        u_norm = diffusion.ddpm_cfg_sample(
            denoise, (B, H, 4), key, ctx12, w=args.w,
            n_diffusion_steps_without_noise=5, guide=guide,
            n_guide_steps=1, t_start_guide=args.t_start_guide)

        def plan_stats(u_n, x0, c, r):
            u_seq = unnormalize(in_stats, u_n)
            states = rollout(plant, x0, u_seq, unroll=H)
            d0 = jnp.linalg.norm(x0[0:3])
            d1 = jnp.linalg.norm(states[-1, 0:3])
            return min_clearance_jax(states, c, r), d0, d1

        clear, d0, d1 = jax.vmap(plan_stats)(u_norm, x0s, cen, rad)
        return u_norm, clear, d0, d1

    sample_jit = jax.jit(sample_chunk)
    rng = np.random.RandomState(5)
    train_c, train_r = sample_scenes(args.n_sample_chunks * B, seed=1)
    u_keep, c_keep = [], []
    n_drawn = 0
    key = jax.random.PRNGKey(17)
    for c in range(args.n_sample_chunks):
        idx = rng.randint(0, n_pool, B)
        x0s = x0_pool[jnp.asarray(idx)]
        cen = jnp.asarray(train_c[c * B:(c + 1) * B])
        rad = jnp.asarray(train_r[c * B:(c + 1) * B])
        key, k = jax.random.split(key)
        u_norm, clear, d0, d1 = sample_jit(x0s, cen, rad, k)
        # curation on both eval axes: safe WITH margin, and progressing
        # toward the goal (the guided-student recipe's --progress-keep)
        keep = np.asarray(clear) > args.clear_margin
        if args.progress_keep > 0:
            d0, d1 = np.asarray(d0), np.asarray(d1)
            keep &= (d1 <= args.progress_keep * d0) | (d0 < 0.5)
        n_drawn += len(keep)
        feat_n = normalize(feat_stats, scene_features(cen, rad))
        ctx24 = np.concatenate(
            [np.asarray(cn_pool[jnp.asarray(idx)]), np.asarray(feat_n)], axis=1)
        u_keep.append(np.asarray(u_norm)[keep])
        c_keep.append(ctx24[keep])
        print(f"[sample] chunk {c + 1}/{args.n_sample_chunks}: kept "
              f"{int(keep.sum())}/{len(keep)} ({time.time() - t0:.0f}s)",
              flush=True)
    data_u = jnp.asarray(np.concatenate(u_keep))
    data_c = jnp.asarray(np.concatenate(c_keep))
    t_sample = time.time() - t0
    print(f"[sample] {data_u.shape[0]}/{n_drawn} scene-conditioned plans "
          f"kept in {t_sample:.0f}s", flush=True)

    # ------------- 2) widen the teacher's conditioning -------------
    k0 = jax.random.PRNGKey(0)
    shape_args = [jnp.zeros((1, H, 4)), jnp.zeros((1,), jnp.int32),
                  jnp.zeros((1, 24)), jnp.zeros((1, 1))]
    init24 = model24.init(k0, *shape_args)
    params24 = widen_film_params(teacher12, init24, 12, 24, cfg_indicator=True)
    # warm-start sanity: widened model == teacher when scene dims are zero
    probe = jnp.ones((2, H, 4)) * 0.1
    tprobe = jnp.array([5, 17])
    cp12 = jnp.tile(jnp.linspace(-0.5, 0.5, 12)[None], (2, 1))
    cp24 = jnp.concatenate([cp12, jnp.zeros((2, 12))], axis=1)
    mask = jnp.zeros((2, 1))
    o12 = model12.apply(teacher12, probe, tprobe, cp12, mask)
    o24 = model24.apply(params24, probe, tprobe, cp24, mask)
    warm_err = float(jnp.max(jnp.abs(o12 - o24)))
    assert warm_err < 1e-5, f"widening surgery broke the warm start: {warm_err}"
    print(f"[widen] warm-start max err {warm_err:.2e}", flush=True)

    # ------------- 3) fine-tune on (plan, state+scene) -------------
    t0 = time.time()
    ft_opt = make_optimizer(lr=args.finetune_lr)
    step_fn = make_train_step(diffusion, model24.apply, ft_opt)
    chunk_fn = make_scanned_train_steps(step_fn, args.chunk)
    chunk_jit = jax.jit(
        lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
    state = TrainState(
        params=params24,
        ema_params=jax.tree_util.tree_map(jnp.copy, params24),
        opt_state=ft_opt.init(params24),
        step=jnp.int32(0),
    )
    key = jax.random.PRNGKey(23)
    loss = None
    for c in range(args.finetune_steps // args.chunk):
        key, k = jax.random.split(key)
        state, loss = chunk_jit(state, data_u, data_c, k)
        if (c + 1) % max(1, (args.finetune_steps // args.chunk) // 5) == 0:
            print(f"[finetune] {int(state.step)} steps, loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    student = jax.device_get(state.ema_params)
    t_ft = time.time() - t0
    with open(os.path.join(args.out, "scene_student_ema.pkl"), "wb") as f:
        pickle.dump(student, f)
    np.savez_compressed(os.path.join(args.out, "scene_dataset.npz"),
                        inputs_normalized=np.asarray(data_u),
                        condition_normalized=np.asarray(data_c))

    # ------------- 4) eval on held-out scenes -------------
    E, S, T = args.eval_scenes, args.eval_starts, args.eval_steps
    ev_c, ev_r = sample_scenes(E, seed=99)          # held-out scene draw
    starts = jnp.asarray(eval_start_states(S, seed=11))
    # (E*S,) pairs
    pc = jnp.repeat(jnp.asarray(ev_c), S, axis=0)   # (E*S, 3, 3)
    pr = jnp.repeat(jnp.asarray(ev_r), S, axis=0)   # (E*S, 3)
    px = jnp.tile(starts, (E, 1))                   # (E*S, 12)
    pk = jax.random.split(jax.random.PRNGKey(31), E * S)

    def metrics_by_scene(x_tracks):
        xt = np.asarray(x_tracks)
        rows = track_metrics(xt, centers=np.asarray(pc), radii=np.asarray(pr))
        per_scene = [
            track_metrics(xt[e * S:(e + 1) * S],
                          centers=np.asarray(ev_c[e]),
                          radii=np.asarray(ev_r[e]))["collision_free_fraction"]
            for e in range(E)]
        rows["per_scene_cf"] = per_scene
        return rows

    # (a) scene-blind unguided teacher (floor)
    loop12 = make_closed_loop(
        diffusion, model12.apply, in_stats, c_stats, plant, quad_cost,
        horizon=H, n_steps=T, w=args.w, n_diffusion_steps_without_noise=5)
    t0 = time.time()
    runs = jax.jit(jax.vmap(lambda x0, k: loop12(teacher12, x0, k)))(px, pk)
    m_blind = metrics_by_scene(runs.x_track)
    print(f"[eval blind ] CF {m_blind['collision_free_fraction']:.3f} "
          f"safe-reach {m_blind['safe_reach_fraction']:.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # (b) per-scene guided teacher (oracle — pays the guide every replan)
    def run_guided(cen, rad, x0, k):
        def guide_builder(xc):
            def guide(u_norm_b):
                return jax.vmap(
                    lambda u: per_grad(u, xc, cen, rad))(u_norm_b)
            return guide

        loop = make_closed_loop(
            diffusion, model12.apply, in_stats, c_stats, plant, quad_cost,
            horizon=H, n_steps=T, w=args.w, n_diffusion_steps_without_noise=5,
            guide_builder=guide_builder, n_guide_steps=1,
            t_start_guide=args.t_start_guide)
        return loop(teacher12, x0, k)

    t0 = time.time()
    runs = jax.jit(jax.vmap(run_guided))(pc, pr, px, pk)
    m_oracle = metrics_by_scene(runs.x_track)
    print(f"[eval oracle] CF {m_oracle['collision_free_fraction']:.3f} "
          f"safe-reach {m_oracle['safe_reach_fraction']:.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # (c) scene-conditioned student, UNGUIDED full CFG
    def run_scene(cen, rad, x0, k):
        feat = scene_features(cen, rad)
        loop = make_closed_loop(
            diffusion, model24.apply, in_stats, c24_stats, plant, quad_cost,
            horizon=H, n_steps=T, w=args.w, n_diffusion_steps_without_noise=5,
            state_to_condition=lambda x: jnp.concatenate([x, feat]))
        return loop(student, x0, k)

    t0 = time.time()
    runs = jax.jit(jax.vmap(run_scene))(pc, pr, px, pk)
    m_student = metrics_by_scene(runs.x_track)
    print(f"[eval scene ] CF {m_student['collision_free_fraction']:.3f} "
          f"safe-reach {m_student['safe_reach_fraction']:.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # (c') scene student + best-of-K with SCENE-AWARE safety-first selection:
    # K candidate plans per replan (one batched U-Net pass), scored against
    # the scene's margin-inflated spheres — the in-runtime combination
    # VERDICT r3 #2 asked for
    m_student_k = None
    if args.select_k > 1:
        from quadrotor_task import make_select_cost

        def run_scene_k(cen, rad, x0, k):
            feat = scene_features(cen, rad)
            sel_cost = make_select_cost(quad_cost, centers=cen, radii=rad)
            loop = make_closed_loop(
                diffusion, model24.apply, in_stats, c24_stats, plant,
                sel_cost, horizon=H, n_steps=T, w=args.w,
                n_diffusion_steps_without_noise=5,
                n_candidates=args.select_k,
                state_to_condition=lambda x: jnp.concatenate([x, feat]))
            return loop(student, x0, k)

        t0 = time.time()
        runs = jax.jit(jax.vmap(run_scene_k))(pc, pr, px, pk)
        m_student_k = metrics_by_scene(runs.x_track)
        print(f"[eval sceneK] K={args.select_k} "
              f"CF {m_student_k['collision_free_fraction']:.3f} "
              f"safe-reach {m_student_k['safe_reach_fraction']:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # canonical-scene row (the flagship protocol scene, never up-weighted)
    from quadrotor_task import OBS_CENTERS, OBS_RADII
    cc = jnp.tile(jnp.asarray(OBS_CENTERS)[None], (S, 1, 1))
    cr = jnp.tile(jnp.asarray(OBS_RADII)[None], (S, 1))
    kk = jax.random.split(jax.random.PRNGKey(47), S)
    runs = jax.jit(jax.vmap(run_scene))(cc, cr, starts, kk)
    m_canon = track_metrics(runs.x_track)
    print(f"[eval canon ] CF {m_canon['collision_free_fraction']:.3f} "
          f"safe-reach {m_canon['safe_reach_fraction']:.3f}", flush=True)

    report = {
        "method": "scene-conditioned guided-data fine-tune (widened context)",
        "teacher": args.teacher,
        "guide_scale": args.guide_scale,
        "t_start_guide": args.t_start_guide,
        "w": args.w,
        "clear_margin": args.clear_margin,
        "progress_keep": args.progress_keep,
        "select_k": args.select_k,
        "n_kept": int(data_u.shape[0]),
        "n_drawn": int(n_drawn),
        "sample_seconds": round(t_sample, 1),
        "finetune_steps": args.finetune_steps,
        "finetune_seconds": round(t_ft, 1),
        "final_loss": float(loss),
        "warm_start_max_err": warm_err,
        "eval_scenes": E, "eval_starts": S, "eval_steps": T,
        "held_out": {
            "teacher_scene_blind": m_blind,
            "teacher_per_scene_guided_oracle": m_oracle,
            "scene_conditioned_student": m_student,
            **({f"scene_conditioned_student_k{args.select_k}": m_student_k}
               if m_student_k is not None else {}),
        },
        "canonical_scene_student": m_canon,
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
