"""Best-of-K self-distillation of the cart-pole deep 1-eval student.

Completes the round-4 self-distillation line on the third plant family
(artifacts/onpolicy_quadrotor, onpolicy_scene, onpolicy_panda). The deep
1-eval student's seed-mean is basin-count-quantized (1.0165x expert at 10
seeds; each bad-basin swing costs 0.94% — artifacts/distilled_deep/
diagnosis.json), and in-kernel best-of-4 selection removes the bad basin
at runtime (1.0004x at 14.4 kHz, BENCH.md). This bakes that selection into
the weights, like the amortization line's shared-init/best-of-K curation
(scripts/amortize_flagship.py) but keeping the diffusion student:

1. Roll the 1-eval student from theta-jittered swing-up starts, collect
   visited states (virtual theta* recomputed per start).
2. At each visited state draw K candidates from the SAME student; keep the
   argmin rolled-out task cost (no obstacles — the quadrotor recipe's
   curation score minus the collision hinge).
3. Fine-tune at the student's single DDIM grid time (recon plan-matching
   loss), 50/50 with the teacher dataset; aggregate and repeat.
4. Eval: 10-seed AND 50-seed cost ratios at the flagship x0, K=1 and the
   in-runtime K=4 selection row.

Writes artifacts/onpolicy_cartpole/{student_1eval.pkl, report.json}.
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
    p.add_argument("--student-dir", default="artifacts/distilled_deep")
    p.add_argument("--teacher", default="artifacts/flagship_modality")
    p.add_argument("--out", default="artifacts/onpolicy_cartpole")
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--collect-starts", type=int, default=32)
    p.add_argument("--theta-jitter", type=float, default=0.45)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--label-k", type=int, default=8)
    p.add_argument("--train-steps", type=int, default=4000)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--onpolicy-frac", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-seeds", type=int, default=10)
    p.add_argument("--wide-seeds", type=int, default=50)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import normalize, unnormalize
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_collect_cost, get_plant, theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout_with_cost
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_custom_train_step, make_optimizer,
        make_scanned_train_steps,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, _ = get_plant("cartpole_virtual_swingup")
    cost = cartpole_virtual_collect_cost()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]

    sreport = json.load(open(os.path.join(args.student_dir, "report.json")))
    times = [r for r in sreport["rounds"] if r["n_evals"] == 1][0]["times"]
    expert_cost = sreport["expert_cost"]
    with open(os.path.join(args.student_dir, "student_1eval.pkl"), "rb") as f:
        student0 = pickle.load(f)

    H = args.horizon
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    model = TemporalUnet(
        state_dim=1, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5,
        conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)
    sampler = make_student_ddim_sampler(schedule, model.apply, times)

    x0_eval = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])

    _loop_cache = {}

    def make_loop(params, K):
        ck = (id(params), K)
        if ck not in _loop_cache:
            override = lambda ctx, key: sampler(params, ctx, key, (K, H, 1))
            _loop_cache[ck] = jax.jit(make_closed_loop(
                diffusion, model.apply, in_stats, c_stats, plant, cost,
                horizon=H, n_steps=args.steps, n_candidates=K,
                sample_override=override))
        return _loop_cache[ck]

    def eval_student(params, K, n_seeds):
        loop = make_loop(params, K)
        ks = jax.random.split(jax.random.PRNGKey(11), n_seeds)
        runs = jax.jit(jax.vmap(lambda k: loop(params, x0_eval, k)))(ks)
        costs = np.asarray(runs.stage_costs.sum(axis=1))
        return {"cost_mean": float(costs.mean()),
                "cost_max": float(costs.max()),
                "ratio_mean": round(float(costs.mean()) / expert_cost, 5),
                "ratio_max": round(float(costs.max()) / expert_cost, 5),
                "n_seeds": n_seeds}

    def make_labeler(params):
        @jax.jit
        def label(x0s, keys):
            def per_row(x0, key):
                ctx = normalize(c_stats, x0)[None]
                plans = sampler(params, ctx, key, (args.label_k, H, 1))

                def score(u_n):
                    u = unnormalize(in_stats, jnp.clip(u_n, -1.0, 1.0))
                    _, c = rollout_with_cost(plant, cost, x0, u)
                    return c

                return plans[jnp.argmin(jax.vmap(score)(plans))]

            return jax.vmap(per_row)(x0s, keys)

        return label

    t_star = int(times[0])
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sra = float(np.sqrt(1.0 / abar[t_star]))
    srm = float(np.sqrt(1.0 / abar[t_star] - 1.0))
    sqrt_ab = float(np.sqrt(abar[t_star]))
    sqrt_1mab = float(np.sqrt(1.0 - abar[t_star]))

    def loss_fn(params, x0b, ctxb, key):
        b = x0b.shape[0]
        noise = jax.random.normal(key, x0b.shape, x0b.dtype)
        x_t = sqrt_ab * x0b + sqrt_1mab * noise
        t = jnp.full((b,), t_star, jnp.int32)
        eps = model.apply(params, x_t, t, ctxb, jnp.zeros((b, 1), x0b.dtype))
        recon = sra * x_t - srm * eps
        return jnp.mean(jnp.square(recon - x0b))

    optimizer = make_optimizer(lr=args.lr)
    train_step = make_custom_train_step(
        loss_fn, optimizer, step_start_ema=0, update_ema_every=1)
    chunk_fn = make_scanned_train_steps(train_step, args.chunk)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
    _rng = lambda v: f"{v[0]:.4f}->{v[-1]:.4f}" if v else "n/a"

    report = {
        "expert_cost": expert_cost, "times": times,
        "protocol": "flagship x0 [0,0,3.0,0,theta*], 80 steps, "
                    "PRNGKey(11) seed fan (study_student_candidates "
                    "protocol)",
        "label_k": args.label_k,
        "collect": {"starts": args.collect_starts,
                    "theta_jitter": args.theta_jitter,
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
        rng = np.random.RandomState(600 + it)
        thetas = 3.0 + rng.uniform(-args.theta_jitter, args.theta_jitter,
                                   args.collect_starts)
        x0s = np.zeros((args.collect_starts, 5), np.float32)
        x0s[:, 2] = thetas
        x0s[:, 4] = [float(theta_to_red_theta(t)) for t in thetas]
        x0s[:, 0] = rng.uniform(-0.5, 0.5, args.collect_starts)
        loop1 = make_loop(cur, 1)
        cks = jax.random.split(jax.random.PRNGKey(100 + it),
                               args.collect_starts)
        runs = jax.jit(jax.vmap(lambda x0, k: loop1(cur, x0, k)))(
            jnp.asarray(x0s), cks)
        visited = np.asarray(runs.x_track[:, :-1]).reshape(-1, 5)
        print(f"[it {it}] collect: {len(visited)} states "
              f"({time.time() - t0:.0f}s)", flush=True)

        t1 = time.time()
        labeler = make_labeler(cur)
        base_key = jax.random.PRNGKey(200 + it)
        CH = 512
        xs = jnp.asarray(visited)
        lab = []
        for i in range(0, len(visited), CH):
            keys = jax.vmap(lambda j: jax.random.fold_in(base_key, j))(
                jnp.arange(i, min(i + CH, len(visited))))
            lab.append(np.asarray(labeler(xs[i:i + CH], keys)))
        labels = np.concatenate(lab)
        print(f"[it {it}] label: best-of-{args.label_k} at {len(labels)} "
              f"states ({time.time() - t1:.0f}s)", flush=True)

        pool_u.append(np.clip(labels, -1.0, 1.0))
        pool_c.append(np.asarray(jax.vmap(
            lambda x: normalize(c_stats, x))(xs)))
        onp_u = jnp.asarray(np.concatenate(pool_u))
        onp_c = jnp.asarray(np.concatenate(pool_c))

        state = TrainState(
            params=cur, ema_params=jax.tree_util.tree_map(jnp.copy, cur),
            opt_state=optimizer.init(cur), step=jnp.int32(0))
        key = jax.random.PRNGKey(77 + it)
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
                state, loss = chunk_jit(state, ds.inputs_normalized,
                                        ds.condition_normalized, k)
                ls["ds"].append(float(loss))
        cur = jax.device_get(state.ema_params)
        print(f"[it {it}] train {args.train_steps} steps "
              f"({time.time() - t2:.0f}s): onp {_rng(ls['onp'])}, "
              f"ds {_rng(ls['ds'])}", flush=True)

    student = cur
    with open(os.path.join(args.out, "student_1eval.pkl"), "wb") as f:
        pickle.dump(student, f)

    for tag, params in (("before", student0), ("onpolicy", student)):
        for K, n_seeds in ((1, args.eval_seeds), (1, args.wide_seeds),
                           (4, args.eval_seeds)):
            m = eval_student(params, K, n_seeds)
            row = {"student": tag, "K": K, **m}
            report["rows"].append(row)
            print(json.dumps(row), flush=True)
            with open(os.path.join(args.out, "report.json"), "w") as f:
                json.dump(report, f, indent=2)

    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
