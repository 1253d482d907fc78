"""AMPC (MLP) baseline training CLI.

Replaces `scripts/train_diffusion/NN_cart_pole_train.py`: regress the
normalized u-horizon directly from the normalized x0 with the reference's
5->2->50->50->H tanh MLP (`NN_cart_pole_train.py:32-51`), MSE loss, Adam,
EMA — the non-diffusion baseline for `NMPC_NN_Inference.py`-style
comparisons.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--results-dir", default="logs/ampc")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ema-decay", type=float, default=0.995)
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.models import AMPCNet

    ds = ControlSequenceDataset.load(args.dataset)
    model = AMPCNet(horizon=ds.n_support_points, control_dim=ds.state_dim)
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((2, ds.condition_dim)))
    ema = jax.tree_util.tree_map(jnp.copy, params)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, ema, opt_state, cond, target):
        def loss_fn(p):
            pred = model.apply(p, cond)
            return jnp.mean(jnp.square(pred - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, q: e * args.ema_decay + q * (1 - args.ema_decay), ema, params
        )
        return params, ema, opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    for it in range(args.steps):
        key, k = jax.random.split(key)
        inputs, cond = ds.batch(k, args.batch_size)
        params, ema, opt_state, loss = step(params, ema, opt_state, cond, inputs)
        if (it + 1) % 2000 == 0 or it == 0:
            print(f"step {it + 1}/{args.steps} mse {float(loss):.6f}")

    os.makedirs(args.results_dir, exist_ok=True)
    with open(os.path.join(args.results_dir, "ampc.ckpt"), "wb") as f:
        pickle.dump({
            "params": jax.tree_util.tree_map(np.asarray, params),
            "ema_params": jax.tree_util.tree_map(np.asarray, ema),
            "horizon": ds.n_support_points,
            "control_dim": ds.state_dim,
        }, f)
    print("saved", os.path.join(args.results_dir, "ampc.ckpt"))


if __name__ == "__main__":
    main()
