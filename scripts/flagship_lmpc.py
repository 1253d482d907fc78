"""LMPC parity run: the reference's committed headline artifact, reproduced.

The ONLY closed-loop parity numbers committed in the reference repo are for
the linear cart-pole LMPC workload (BASELINE.md):
`model_performance_saving/model_230000/x0_{101,14}`: over 50 control steps at
horizon 8, sum|u_diffusion - u_mpc| = 0.1375 / 0.1024 (max per-step 0.016 /
0.0145).

This script reproduces that workload end-to-end in-framework: LQR expert
data over the reference's initial grid (+ Gaussian noisy replicas,
`noisy_data_collecting.py`), train the conditional U-Net at horizon 8,
then run the fused diffusion closed loop and the exact LQR expert loop from
a sweep of initial states and report the same L1 metrics.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/flagship_lmpc")
    p.add_argument("--grid", type=int, default=40, help="grid points per axis")
    p.add_argument("--noisy", type=int, default=10)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--train-steps", type=int, default=60000)
    p.add_argument("--eval-steps", type=int, default=50)
    p.add_argument("--n-eval-x0", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop, track_parity
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.control.runtime import ClosedLoopResult
    from mpc_via_diffusion_model_tpu.data.generation import (
        collect_lmpc_dataset, make_initial_state_grid,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import cartpole_lmpc, cartpole_lmpc_cost
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import lqr_gains, lqr_solve
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
        save_checkpoint,
    )

    os.makedirs(args.out, exist_ok=True)
    plant = cartpole_lmpc()
    cost = cartpole_lmpc_cost()

    # linear system matrices recovered from the (linear) plant step
    n = plant.state_dim
    a = jnp.asarray(np.stack(
        [np.asarray(plant.step(jnp.eye(n)[i], jnp.zeros(1))) for i in range(n)], axis=1))
    b = jnp.asarray(np.asarray(plant.step(jnp.zeros(n), jnp.ones(1)))[:, None])
    q = jnp.diag(cost.q_diag)
    r = jnp.array([[float(cost.r)]])
    pmat = jnp.diag(cost.p_diag)

    # 1) LQR expert dataset on the reference's grid ranges
    #    (POSITION_INITIAL_RANGE linspace(-1,1), THETA linspace(3pi/4, 5pi/4),
    #     Diffusion_MPC_Inference.py:29-30) + noisy replicas (N(0,0.15^2),
    #     noisy_data_collecting.py)
    t0 = time.time()
    grid = make_initial_state_grid(
        np.linspace(-1, 1, args.grid), np.linspace(3 * np.pi / 4, 5 * np.pi / 4, args.grid),
        state_dim=4,
    )
    ds = collect_lmpc_dataset(
        a, b, q, r, pmat, grid, horizon=args.horizon,
        noise_std=0.15, n_noisy=args.noisy, key=jax.random.PRNGKey(0),
    )
    t_collect = time.time() - t0
    print(f"[collect] {ds.n_init} LQR solves in {t_collect:.1f}s", flush=True)
    ds.save(os.path.join(args.out, "dataset.npz"))

    # 2) train (flagship config at horizon 8)
    model = TemporalUnet(
        state_dim=1, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=4, conditioning_type="default",
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    x = jnp.zeros((2, args.horizon, 1))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 4)), jnp.zeros((2, 1)))
    optimizer = make_optimizer(lr=3e-3)
    step = make_train_step(diffusion, model.apply, optimizer)
    chunk = make_scanned_train_steps(step, 250)
    chunk_jit = jax.jit(lambda st, aa, bb, k: chunk(st, aa, bb, k, 512))
    state = TrainState(params, jax.tree_util.tree_map(jnp.copy, params),
                       optimizer.init(params), jnp.int32(0))
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    loss = None
    for c in range(args.train_steps // 250):
        key, k = jax.random.split(key)
        state, loss = chunk_jit(state, ds.inputs_normalized, ds.condition_normalized, k)
    t_train = time.time() - t0
    print(f"[train] {args.train_steps} steps in {t_train:.1f}s; final loss {float(loss):.5f}", flush=True)
    save_checkpoint(os.path.join(args.out, "checkpoints", "final.ckpt"), state)

    # 3) diffusion closed loop vs the exact LQR expert loop
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, ds.normalizer.stats["inputs"],
        ds.normalizer.stats["condition"], plant, cost,
        horizon=args.horizon, n_steps=args.eval_steps, w=0.01,
        n_diffusion_steps_without_noise=5,
    ))

    ks = lqr_gains(a, b, q, r, pmat, args.horizon)

    def lqr_loop(x0):
        def body(xx, _):
            sol = lqr_solve(a, b, q, r, pmat, xx, args.horizon)
            u0 = sol.us[0]
            x_next = plant.step(xx, u0)
            return x_next, (x_next, u0, sol.us, cost.stage(xx, u0))

        x_f, (xs, us, uh, st) = jax.lax.scan(body, x0, None, length=args.eval_steps)
        return ClosedLoopResult(jnp.concatenate([x0[None], xs]), us, uh, st)

    lqr_loop_j = jax.jit(lqr_loop)

    # evaluation x0 sweep over the reference's ranges
    rng = np.random.RandomState(30)
    pos = rng.uniform(-1, 1, args.n_eval_x0)
    theta = rng.uniform(3 * np.pi / 4, 5 * np.pi / 4, args.n_eval_x0)
    u_l1s, u_maxs = [], []
    for i in range(args.n_eval_x0):
        x0 = jnp.array([pos[i], 0.0, theta[i], 0.0], jnp.float32)
        run = loop(state.ema_params, x0, jax.random.fold_in(jax.random.PRNGKey(7), i))
        expert = lqr_loop_j(x0)
        parity = track_parity(run, expert)
        u_l1s.append(parity["u_l1"])
        u_maxs.append(parity["u_l1_max"])
        if i < 3:
            print(f"  x0[{i}] (pos {pos[i]:+.3f}, theta {theta[i]:.3f}): "
                  f"sum|u_diff - u_mpc| = {parity['u_l1']:.4f}, max step {parity['u_l1_max']:.4f}", flush=True)

    report = {
        "n_samples": ds.n_init,
        "train_steps": args.train_steps,
        "final_loss": float(loss),
        "eval_steps": args.eval_steps,
        "horizon": args.horizon,
        "u_l1_mean": float(np.mean(u_l1s)),
        "u_l1_median": float(np.median(u_l1s)),
        "u_l1_best": float(np.min(u_l1s)),
        "u_l1_worst": float(np.max(u_l1s)),
        "u_step_max_mean": float(np.mean(u_maxs)),
        "reference_committed_artifacts": {"x0_101": 0.1375, "x0_14": 0.1024,
                                          "max_step": [0.016, 0.0145]},
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
