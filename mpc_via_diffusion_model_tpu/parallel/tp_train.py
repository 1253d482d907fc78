"""Tensor-parallel TRAINING of the temporal U-Net over a 2-D (data, model) mesh.

Completes the 'model'-axis story from `tp_unet.py`: the forward there is
inference-only; this module trains THROUGH the channel sharding, so a
denoiser that outgrows one chip's HBM can be trained in the same layout it
serves from. The reference has no model (or any) parallelism — its trainer
is a single-GPU torch loop (`mpd/trainer/trainer.py:181-309`); this is the
SURVEY §2.4 scaling design carried to training.

Layout
- shd leaves (conv1 cols, GN1, FiLM cols, conv2 rows — ~92% of the params)
  live sharded over 'model' with a leading shard axis; rep leaves (conv2
  bias, GN2, residual 1x1, down/up convs, time MLP, final head) are
  replicated. Adam moments and EMA follow the same layout, so optimizer
  state memory also scales 1/m.
- the batch is sharded over 'data' (if the mesh has a data axis) and
  replicated over 'model'.

Gradient semantics (the part that is easy to get silently wrong): the
forward's per-ResBlock `psum` must transpose correctly under `jax.grad`.
With shard_map's ``check_vma=False`` the transpose of psum is psum — the
sharded-leaf grads come out scaled by m and replicated-leaf grads are
corrupted outright. ``check_vma=True`` tracks varying-vs-replicated axes and
transposes psum to the identity on replicated cotangents; an empirical probe
(and tests/test_tp_train.py) shows every TP grad leaf then matches the
single-device reference to ~1e-8.

Update semantics match `train.trainer.make_train_step` exactly:
clip-by-GLOBAL-norm 1.0 (the true norm — shard sumsq is psum'd over 'model'
before the sqrt) + Adam(3e-3), per-sample PRNG keys derived from global
sample indices (same contract as `mesh.make_dp_train_step`, so the update is
independent of the mesh layout), NaN-skip, in-step EMA (0.995/1000/10).
tests/test_tp_train.py asserts the full TrainState (params AND ema) equals
the single-device trainer's after several steps, through
`tp_unet.gather_tp_params` export.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.gaussian_diffusion import GaussianDiffusion
from ..models.temporal_unet import TemporalUnet
from .tp_unet import gather_tp_params, make_local_forward, shard_unet_params

__all__ = ["make_tp_train_state", "make_tp_train_step", "tp_state_to_flax"]

_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8


def _param_specs(params_tree, axis: str):
    """Spec tree for a {'shd': …, 'rep': …} param-shaped pytree: shd leaves
    sharded over ``axis`` on their leading shard dim, rep leaves replicated."""
    return {
        "shd": jax.tree_util.tree_map(lambda _: P(axis), params_tree["shd"]),
        "rep": jax.tree_util.tree_map(lambda _: P(), params_tree["rep"]),
    }


def _state_specs(state, axis: str):
    return {
        "params": _param_specs(state["params"], axis),
        "ema": _param_specs(state["ema"], axis),
        "mu": _param_specs(state["mu"], axis),
        "nu": _param_specs(state["nu"], axis),
        "count": P(),
        "step": P(),
    }


def make_tp_train_state(mesh: Mesh, model: TemporalUnet, params,
                        axis: str = "model"):
    """Shard flax ``params`` into the TP layout and build the train state
    (params + EMA + Adam moments + counters), placed on ``mesh`` with shd
    leaves sharded over ``axis`` and everything else replicated."""
    m = int(mesh.shape[axis])
    shd, rep, _, _ = shard_unet_params(model, params, m)
    p = {"shd": shd, "rep": rep}
    state = {
        "params": p,
        "ema": jax.tree_util.tree_map(jnp.copy, p),
        "mu": jax.tree_util.tree_map(jnp.zeros_like, p),
        "nu": jax.tree_util.tree_map(jnp.zeros_like, p),
        "count": jnp.int32(0),
        "step": jnp.int32(0),
    }
    specs = _state_specs(state, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs,
        is_leaf=lambda x: x is None,
    )


def tp_state_to_flax(model: TemporalUnet, state) -> Tuple[dict, dict]:
    """Export (params, ema_params) as standard flax trees — checkpoint /
    fused-kernel / single-chip-serving compatible."""
    return (
        gather_tp_params(model, state["params"]["shd"], state["params"]["rep"]),
        gather_tp_params(model, state["ema"]["shd"], state["ema"]["rep"]),
    )


def make_tp_train_step(
    mesh: Mesh,
    model: TemporalUnet,
    diffusion: GaussianDiffusion,
    lr: float = 3e-3,
    clip_grad_max_norm: float = 1.0,
    ema_decay: float = 0.995,
    step_start_ema: int = 1000,
    update_ema_every: int = 10,
    axis: str = "model",
    data_axis: Optional[str] = "data",
) -> Callable:
    """Build the jitted 2-D-parallel train step
    ``step(state, inputs_norm, condition_norm, key) -> (state, metrics)``.

    ``state`` comes from `make_tp_train_state`. The global batch is sharded
    over ``data_axis`` (set ``data_axis=None``, or use a 1-D ('model',) mesh,
    for pure TP); per-sample keys make the update identical for any layout of
    the same global batch.
    """
    m = int(mesh.shape[axis])
    has_data = data_axis is not None and data_axis in mesh.axis_names

    # template state on host just to derive specs / groups metadata
    dummy = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, model.n_support_points, model.state_dim), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        *(() if model.conditioning_type in (None, "None") else (
            jnp.zeros((1, model.context_dim), jnp.float32),
            jnp.zeros((1, 1), jnp.float32),
        )),
    )
    shd_t, rep_t, groups_per_block, n_levels = shard_unet_params(model, dummy, m)
    local_fwd = make_local_forward(model, n_levels, groups_per_block, m, axis)

    p_template = {"params": {"shd": shd_t, "rep": rep_t}}
    state_template = {
        "params": p_template["params"], "ema": p_template["params"],
        "mu": p_template["params"], "nu": p_template["params"],
        "count": jnp.int32(0), "step": jnp.int32(0),
    }
    state_specs = _state_specs(state_template, axis)
    batch_spec = P(data_axis) if has_data else P()

    def device_step(state, inputs_norm, condition_norm, key):
        local_b = inputs_norm.shape[0]
        didx = jax.lax.axis_index(data_axis) if has_data else 0
        global_idx = didx * local_b + jnp.arange(local_b)
        sample_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(global_idx)

        def loss_fn(p):
            denoise = lambda x, t, c, mk: local_fwd(x, t, c, mk,
                                                    p["shd"], p["rep"])
            return diffusion.loss(denoise, inputs_norm, condition_norm, None,
                                  sample_keys=sample_keys)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        if has_data:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)

        # true global grad norm: shard sumsq psum'd over 'model', rep counted
        # once (rep grads are replicated over 'model' after the VMA-correct
        # psum transpose)
        sumsq_shd = sum(jnp.sum(jnp.square(g))
                        for g in jax.tree_util.tree_leaves(grads["shd"]))
        sumsq_shd = jax.lax.psum(sumsq_shd, axis)
        sumsq_rep = sum(jnp.sum(jnp.square(g))
                        for g in jax.tree_util.tree_leaves(grads["rep"]))
        gnorm = jnp.sqrt(sumsq_shd + sumsq_rep)
        trigger = gnorm < clip_grad_max_norm
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(trigger, g, (g / gnorm) * clip_grad_max_norm),
            grads,
        )

        # NaN guard across ALL shards (a nonfinite shd grad on ONE device must
        # skip the update everywhere or rep params desync)
        nonfinite = sum(
            jnp.sum(~jnp.isfinite(g)).astype(jnp.int32)
            for g in jax.tree_util.tree_leaves(grads["shd"])
        )
        nonfinite = jax.lax.psum(nonfinite, axis)
        nonfinite = nonfinite + sum(
            jnp.sum(~jnp.isfinite(g)).astype(jnp.int32)
            for g in jax.tree_util.tree_leaves(grads["rep"])
        )
        ok = jnp.logical_and(jnp.isfinite(loss), nonfinite == 0)

        # Adam (optax.adam formulas: eps_root=0, bias-corrected moments)
        count_inc = state["count"] + 1
        mu = jax.tree_util.tree_map(
            lambda mo, g: _ADAM_B1 * mo + (1 - _ADAM_B1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: _ADAM_B2 * v + (1 - _ADAM_B2) * jnp.square(g),
            state["nu"], grads)
        bc1 = 1 - _ADAM_B1 ** count_inc.astype(jnp.float32)
        bc2 = 1 - _ADAM_B2 ** count_inc.astype(jnp.float32)
        new_params = jax.tree_util.tree_map(
            lambda pp, mo, v: jnp.where(
                ok,
                pp - lr * (mo / bc1) / (jnp.sqrt(v / bc2) + _ADAM_EPS),
                pp,
            ),
            state["params"], mu, nu,
        )
        mu = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), mu, state["mu"])
        nu = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), nu, state["nu"])
        count = jnp.where(ok, count_inc, state["count"])

        step = state["step"] + 1
        do_update = jnp.logical_and(step >= step_start_ema,
                                    step % update_ema_every == 0)
        hard_copy = step < step_start_ema

        def ema_leaf(e, pp):
            decayed = e * ema_decay + pp * (1.0 - ema_decay)
            out = jnp.where(do_update, decayed, e)
            return jnp.where(hard_copy, pp, out)

        new_ema = jax.tree_util.tree_map(ema_leaf, state["ema"], new_params)
        new_state = {"params": new_params, "ema": new_ema, "mu": mu, "nu": nu,
                     "count": count, "step": step}
        return new_state, {"loss": loss, "update_skipped": jnp.logical_not(ok)}

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(state_specs, batch_spec, batch_spec, P()),
        out_specs=(state_specs, {"loss": P(), "update_skipped": P()}),
        check_vma=True,
    )
    return jax.jit(sharded)
