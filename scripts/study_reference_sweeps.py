"""The reference's two committed study sweeps, reproduced end-to-end.

1. Condition-weight sweep — the effect of the CFG guidance weight on
   closed-loop parity with MPC (`Condition_Weight_Inference.py:28-31,181-262`
   runs one weight per invocation and saves under Weight_<w>/; here one
   compiled sampler serves the whole sweep because w is a traced argument).
2. Checkpoint sweep — u-MSE vs MPC across training checkpoints
   (`U_2406400_Models_Difference_Plot.py:16-60`: 26 checkpoints of the 2.4M
   dataset run; here snapshots of one training run on the bit-faithfully
   regenerated 420k dataset).

Both use the exact committed-parity protocol (50 steps, horizon 8, T=25+5,
round(u,4), exact ZoH plant) at the reference's own committed initial states
x0_101 / x0_14, metric vs the committed u_mpc tracks.

Artifacts land in artifacts/study_sweeps/.
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

REF_BASE = "/root/reference/model_performance_saving/model_230000"
REF_CKPT = (
    "/root/reference/trained_models/420000_models_with_noisy_data/230000/"
    "checkpoints/ema_model_current_state_dict.pth"
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/study_sweeps")
    p.add_argument("--weights", type=float, nargs="+",
                   default=[0.0, 0.01, 0.1, 0.5, 1.0, 2.0, 5.0])
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--ckpt-steps", type=int, nargs="+",
                   default=[10000, 30000, 50000, 70000, 100000, 130000,
                            160000, 190000, 230000])
    p.add_argument("--skip-ckpt-sweep", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.reference_lmpc import (
        REFERENCE_X0_101, REFERENCE_X0_14, lmpc_exact_discretization,
        regenerate_reference_lmpc_arrays,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.eval.reference_protocol import make_lmpc_eval
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.models.torch_import import (
        import_reference_unet, load_reference_state_dict, schedule_from_state_dict,
    )

    os.makedirs(args.out, exist_ok=True)
    a_d, b_d = lmpc_exact_discretization()
    u_arr, x_arr = regenerate_reference_lmpc_arrays()
    ds = ControlSequenceDataset.from_arrays(u_arr, x_arr)
    x0s = {"x0_101": REFERENCE_X0_101, "x0_14": REFERENCE_X0_14}
    u_mpc = {k: np.load(f"{REF_BASE}/{k}/u_mpc.npy")[0] for k in x0s}

    sd = load_reference_state_dict(REF_CKPT)
    variables, cfg = import_reference_unet(sd)
    model_ref = TemporalUnet(
        state_dim=1, n_support_points=8, unet_input_dim=cfg["unet_input_dim"],
        dim_mults=cfg["dim_mults"], time_emb_dim=cfg["time_emb_dim"],
        context_dim=cfg["context_dim"], conditioning_type="default",
    )
    diffusion_ref = GaussianDiffusion(schedule=schedule_from_state_dict(sd))
    evaluate = make_lmpc_eval(
        diffusion_ref, model_ref.apply, ds.normalizer.stats["inputs"],
        ds.normalizer.stats["condition"], a_d, b_d,
    )

    # ---------------- 1) condition-weight sweep ---------------- #
    t0 = time.time()
    w_rows = []
    for w in args.weights:
        row = {"w": w}
        for tag, x0 in x0s.items():
            l1s, mses = [], []
            for s in range(args.seeds):
                us = evaluate(variables, x0, w, 3000 + s)
                l1s.append(float(np.abs(us - u_mpc[tag]).sum()))
                mses.append(float(np.mean((us - u_mpc[tag]) ** 2)))
            row[f"{tag}_u_l1_median"] = float(np.median(l1s))
            row[f"{tag}_u_mse_median"] = float(np.median(mses))
        w_rows.append(row)
        print(f"[w-sweep] w={w}: "
              + ", ".join(f"{t}={row[f'{t}_u_l1_median']:.4f}" for t in x0s),
              flush=True)
    t_wsweep = time.time() - t0

    # ---------------- 2) checkpoint sweep ---------------- #
    ckpt_rows = []
    if not args.skip_ckpt_sweep:
        from mpc_via_diffusion_model_tpu.train import (
            TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
        )
        model_ours = TemporalUnet(
            state_dim=1, n_support_points=8, unet_input_dim=32,
            dim_mults=UNET_DIM_MULTS[0], context_dim=4, conditioning_type="default",
        )
        diffusion_ours = GaussianDiffusion(schedule=make_schedule("exponential", 25))
        params = model_ours.init(
            jax.random.PRNGKey(1), jnp.zeros((2, 8, 1)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 4)), jnp.zeros((2, 1)),
        )
        optimizer = make_optimizer(lr=3e-3)
        step = make_train_step(diffusion_ours, model_ours.apply, optimizer)
        chunk = make_scanned_train_steps(step, 250)
        chunk_j = jax.jit(lambda st, aa, bb, k: chunk(st, aa, bb, k, 512))
        state = TrainState(params, jax.tree_util.tree_map(jnp.copy, params),
                           optimizer.init(params), jnp.int32(0))
        eval_ours = make_lmpc_eval(
            diffusion_ours, model_ours.apply, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], a_d, b_d,
        )
        key = jax.random.PRNGKey(2)
        snaps, done, t0 = {}, 0, time.time()
        for target in sorted(args.ckpt_steps):
            while done < target:
                key, k = jax.random.split(key)
                state, loss = chunk_j(state, ds.inputs_normalized,
                                      ds.condition_normalized, k)
                done += 250
            snaps[target] = jax.tree_util.tree_map(np.asarray, state.ema_params)
            print(f"[ckpt-sweep] snapshot at {done} steps "
                  f"(loss {float(loss):.5f})", flush=True)
        print(f"[ckpt-sweep] trained {done} steps in {time.time()-t0:.1f}s", flush=True)

        for step_n, ema in snaps.items():
            row = {"train_steps": step_n}
            for tag, x0 in x0s.items():
                l1s, mses = [], []
                for s in range(args.seeds):
                    us = eval_ours(ema, x0, 0.01, 4000 + s)
                    l1s.append(float(np.abs(us - u_mpc[tag]).sum()))
                    mses.append(float(np.mean((us - u_mpc[tag]) ** 2)))
                row[f"{tag}_u_l1_median"] = float(np.median(l1s))
                row[f"{tag}_u_mse_median"] = float(np.median(mses))
            ckpt_rows.append(row)
            print(f"[ckpt-sweep] {step_n}: "
                  + ", ".join(f"{t}={row[f'{t}_u_mse_median']:.6f}" for t in x0s),
                  flush=True)

    report = {
        "protocol": "50 steps, horizon 8, T=25+5, round(u,4), exact ZoH plant; "
                    "metric vs committed model_230000 u_mpc tracks",
        "seeds": args.seeds,
        "condition_weight_sweep": w_rows,
        "condition_weight_seconds": round(t_wsweep, 1),
        "checkpoint_sweep": ckpt_rows,
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)

    # plots
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpc_via_diffusion_model_tpu.eval.plotting import save_fig

    fig, axes = plt.subplots(1, 2 if ckpt_rows else 1, figsize=(11, 4))
    axes = np.atleast_1d(axes)
    ws = [r["w"] for r in w_rows]
    for tag in x0s:
        axes[0].plot(ws, [r[f"{tag}_u_l1_median"] for r in w_rows],
                     marker="o", label=tag)
    axes[0].set_xscale("symlog", linthresh=0.01)
    axes[0].set_xlabel("CFG weight w")
    axes[0].set_ylabel("sum |u_diff - u_mpc| (50 steps)")
    axes[0].set_title("condition-weight sweep (imported model_230000)")
    axes[0].legend()
    if ckpt_rows:
        steps = [r["train_steps"] for r in ckpt_rows]
        for tag in x0s:
            axes[1].plot(steps, [r[f"{tag}_u_mse_median"] for r in ckpt_rows],
                         marker="o", label=tag)
        axes[1].set_xlabel("train steps")
        axes[1].set_ylabel("u MSE vs committed u_mpc")
        axes[1].set_title("checkpoint sweep (420k exact dataset)")
        axes[1].legend()
    fig.tight_layout()
    save_fig(fig, os.path.join(args.out, "sweeps"))
    print("artifacts in", args.out, flush=True)


if __name__ == "__main__":
    main()
