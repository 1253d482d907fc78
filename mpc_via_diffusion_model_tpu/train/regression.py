"""Shared MSE-regression trainer for direct policy nets (AMPC / amortized).

One implementation of the minibatch Adam + EMA + scanned-chunk loop that the
amortization ladder uses on every plant family (scripts/amortize_*.py) — the
0-eval MLP regression of `condition -> u-horizon` pairs, whether the pairs
come from the expert dataset (the reference's AMPC baseline,
`scripts/train_diffusion/NN_cart_pole_train.py:267-471`) or from
mode-consistent student samples. Chunked `lax.scan` for the same
dispatch-amortization reason as `make_scanned_train_steps`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["fit_mlp_regression"]


def fit_mlp_regression(
    model,
    inputs: jnp.ndarray,
    conds: jnp.ndarray,
    *,
    steps: int,
    chunk: int,
    batch_size: int,
    lr: float,
    ema_decay: float = 0.995,
    seed: int = 30,
    verbose: bool = False,
):
    """Regress ``model(conds) -> inputs`` with Adam + EMA.

    ``model`` is a flax module whose ``apply(params, conds[idx])`` matches
    ``inputs[idx]``'s shape (e.g. ``models.AMPCNet``). Fresh minibatch
    indices are drawn per inner step; ``chunk`` steps run per device
    dispatch. Returns ``(ema_params_on_host, final_loss)``.
    """
    if steps < chunk:
        raise ValueError(
            f"steps ({steps}) < chunk ({chunk}): zero chunks would run and "
            f"the untrained init would be returned as 'trained' params")
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((2, conds.shape[-1])))
    opt = optax.adam(lr)

    def one_step(carry, k):
        params, ema, opt_state = carry
        k_idx, _ = jax.random.split(k)
        idx = jax.random.randint(k_idx, (batch_size,), 0, inputs.shape[0])

        def loss_fn(q):
            pred = model.apply(q, conds[idx])
            return jnp.mean(jnp.square(pred - inputs[idx]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, q: e * ema_decay + q * (1 - ema_decay), ema, params)
        return (params, ema, opt_state), loss

    @jax.jit
    def run_chunk(carry, key):
        return jax.lax.scan(one_step, carry, jax.random.split(key, chunk))

    carry = (params, jax.tree_util.tree_map(jnp.copy, params),
             opt.init(params))
    key = jax.random.PRNGKey(seed + 1)
    n_chunks = steps // chunk
    loss = None
    for c in range(n_chunks):
        key, k = jax.random.split(key)
        carry, losses = run_chunk(carry, k)
        loss = float(losses[-1])
        if verbose and (c + 1) % max(1, n_chunks // 5) == 0:
            print(f"  step {(c + 1) * chunk} mse {loss:.6f}", flush=True)
    return jax.device_get(carry[1]), loss
