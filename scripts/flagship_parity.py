"""Head-on parity against the reference's committed artifacts (VERDICT r1 #2).

The reference's only committed closed-loop numbers are
`model_performance_saving/model_230000/x0_{101,14}`: 50 receding-horizon
steps at horizon 8, CFG w=0.01, T=25+5, n_samples=1; metric =
sum|u_diffusion - u_mpc| = 0.1375 (x0_101) / 0.1024 (x0_14).

This script evaluates, at the EXACT protocol (recovered initial states,
round-to-4-decimals applied input, exact ZoH plant, committed u_mpc as the
expert track):

  (a) the reference's own trained model_230000, imported through
      `models/torch_import.py` and sampled by THIS engine (bit-exact
      schedule) — the apples-to-apples engine-parity row;
  (b) our own model trained on the bit-faithfully regenerated 420k dataset
      (`data/reference_lmpc.py`), same architecture/protocol;
  (c) optionally the round-1 artifact model (artifacts/flagship_lmpc).

Each is run single-sample (the reference's setting) over N seeds, plus an
8-candidate min-cost variant (beyond-reference extension).

Usage:
  python scripts/flagship_parity.py --train            # full run (TPU, ~10 min)
  python scripts/flagship_parity.py --seeds 5          # imported model only
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
    p.add_argument("--out", default="artifacts/flagship_parity")
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--train", action="store_true", help="also train our own model on the regenerated 420k dataset")
    p.add_argument("--train-steps", type=int, default=230000)
    p.add_argument("--cfg-indicator", action="store_true", help="train ours with the context-present indicator")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Parity eval is quality-critical: TPU's default bf16 matmul precision
    # shifts the denoiser output by ~1e-3 normalized, which the +-19.5 u
    # range amplifies to ~1e-2 per step — measured 0.48 vs 0.14 u-L1 at
    # x0_101. Force fp32 matmuls everywhere in this script.
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.reference_lmpc import (
        REFERENCE_PARITY_U_L1,
        REFERENCE_X0_101,
        REFERENCE_X0_14,
        lmpc_exact_discretization,
        lmpc_lqr_gain_maps,
        regenerate_reference_lmpc_arrays,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.models.torch_import import (
        import_reference_unet,
        load_reference_state_dict,
        schedule_from_state_dict,
    )

    os.makedirs(args.out, exist_ok=True)
    a_d, b_d = lmpc_exact_discretization()
    _, _, g_map = lmpc_lqr_gain_maps()

    # ---------------- dataset (exact regeneration) ---------------- #
    t0 = time.time()
    u_arr, x_arr = regenerate_reference_lmpc_arrays()  # 420k, seed 42
    ds = ControlSequenceDataset.from_arrays(u_arr, x_arr)
    print(f"[dataset] regenerated 420k exact reference dataset in {time.time()-t0:.1f}s; "
          f"u range [{u_arr.min():.3f}, {u_arr.max():.3f}]", flush=True)

    x0s = {"x0_101": REFERENCE_X0_101, "x0_14": REFERENCE_X0_14}
    u_mpc = {k: np.load(f"{REF_BASE}/{k}/u_mpc.npy")[0] for k in x0s}
    u_diff_ref = {k: np.load(f"{REF_BASE}/{k}/u_diffusion.npy")[0] for k in x0s}

    from mpc_via_diffusion_model_tpu.eval.reference_protocol import make_lmpc_eval

    def run_rows(name, diffusion, apply_fn, params, cfg_indicator=False):
        # the exact Condition_Weight_Inference protocol (50 steps, round(u,4),
        # exact fp64 ZoH plant on host), shared with study_reference_sweeps
        evaluate = make_lmpc_eval(
            diffusion, apply_fn, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], a_d, b_d,
        )
        rows = {}
        for tag, x0 in x0s.items():
            for n_cand in (1, 8):
                l1s, maxs = [], []
                for s in range(args.seeds):
                    us = evaluate(params, x0, 0.01, 1000 + s, n_cand=n_cand)
                    d = np.abs(us - u_mpc[tag])
                    l1s.append(float(d.sum()))
                    maxs.append(float(d.max()))
                rows[f"{tag}_n{n_cand}"] = {
                    "u_l1_median": float(np.median(l1s)),
                    "u_l1_mean": float(np.mean(l1s)),
                    "u_l1_best": float(np.min(l1s)),
                    "u_l1_worst": float(np.max(l1s)),
                    "u_step_max_median": float(np.median(maxs)),
                }
                print(f"[{name}] {tag} n_cand={n_cand}: median sum|du| = "
                      f"{rows[f'{tag}_n{n_cand}']['u_l1_median']:.4f} "
                      f"(best {min(l1s):.4f}, worst {max(l1s):.4f}; ref committed "
                      f"{REFERENCE_PARITY_U_L1[tag]})", flush=True)
        return rows

    report = {
        "protocol": "50 steps, horizon 8, w=0.01, T=25+5, round(u,4), exact ZoH plant",
        "seeds": args.seeds,
        "reference_committed": REFERENCE_PARITY_U_L1,
        "reference_own_sample_l1": {
            k: float(np.abs(u_diff_ref[k] - u_mpc[k]).sum()) for k in x0s
        },
        "models": {},
    }

    # ---------------- (a) imported reference model ---------------- #
    sd = load_reference_state_dict(REF_CKPT)
    variables, cfg = import_reference_unet(sd)
    model_ref = TemporalUnet(
        state_dim=1, n_support_points=8, unet_input_dim=cfg["unet_input_dim"],
        dim_mults=cfg["dim_mults"], time_emb_dim=cfg["time_emb_dim"],
        context_dim=cfg["context_dim"], conditioning_type="default",
    )
    diffusion_ref = GaussianDiffusion(schedule=schedule_from_state_dict(sd))
    report["models"]["imported_model_230000"] = run_rows(
        "imported", diffusion_ref, model_ref.apply, variables)

    # ---------------- (b) our model on the exact dataset ---------------- #
    if args.train:
        from mpc_via_diffusion_model_tpu.train import (
            TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
        )
        import pickle

        model_ours = TemporalUnet(
            state_dim=1, n_support_points=8, unet_input_dim=32,
            dim_mults=UNET_DIM_MULTS[0], context_dim=4,
            conditioning_type="default", cfg_indicator=args.cfg_indicator,
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
        key = jax.random.PRNGKey(2)
        t0 = time.time()
        loss = float("nan")
        for c in range(max(1, args.train_steps // 250)):
            key, k = jax.random.split(key)
            state, loss = chunk_j(state, ds.inputs_normalized, ds.condition_normalized, k)
        print(f"[train] {args.train_steps} steps in {time.time()-t0:.1f}s, "
              f"final loss {float(loss):.5f}", flush=True)
        with open(os.path.join(args.out, "ema_params.pkl"), "wb") as f:
            pickle.dump({"ema_params": jax.tree_util.tree_map(np.asarray, state.ema_params),
                         "cfg_indicator": args.cfg_indicator}, f)
        report["models"]["ours_420k_exact"] = run_rows(
            "ours", diffusion_ours, model_ours.apply, state.ema_params,
            cfg_indicator=args.cfg_indicator)
        report["train"] = {"steps": args.train_steps, "final_loss": float(loss),
                           "cfg_indicator": args.cfg_indicator}

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
