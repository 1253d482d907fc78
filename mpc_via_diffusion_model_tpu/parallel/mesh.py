"""Device mesh + data-parallel training (shard_map + psum over ICI).

The reference has NO distributed support (SURVEY.md §2.4: no DDP/NCCL
anywhere; CPU multiprocessing only for data collection). This module is the
TPU-native scaling story:

- `make_mesh`: 1-axis ('data',) mesh by default; a ('data', 'model') mesh is
  accepted everywhere so channel-sharding the U-Net stays possible.
- `make_dp_train_step`: wraps the single-device train step with `shard_map`;
  the batch is sharded over 'data', params/opt-state are replicated, and
  gradients are psum-averaged over the axis — the collective rides ICI when
  the mesh maps to a pod slice.
- Gradient math note: the per-device loss is a MEAN over the local shard, so
  the cross-device reduction is `jax.lax.pmean`, giving gradients identical
  to the global-batch mean (same numbers a single chip would produce).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.gaussian_diffusion import GaussianDiffusion
from ..train.trainer import TrainState, make_optimizer

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_sharded_eval",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices. 1-D ('data',) by
    default; pass axis_names=('data','model') with a 2-D shape via
    `jax.sharding.Mesh` directly for hybrid layouts. ``devices`` overrides
    the default device list (e.g. jax.devices('cpu') when another platform
    is the default)."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=axis_names)


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree sharded over the 'data' axis (leading dim)."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(
    mesh: Mesh,
    diffusion: GaussianDiffusion,
    apply_fn: Callable,
    optimizer,
    ema_decay: float = 0.995,
    step_start_ema: int = 1000,
    update_ema_every: int = 10,
):
    """Data-parallel train step: batch sharded over 'data', grads
    pmean-reduced, params updated identically on every device.

    Returns a jitted ``step(state, inputs_norm, condition_norm, key)``;
    ``key`` is a single key — per-SAMPLE keys are derived from it by global
    sample index (device_index * local_batch + local_index), so the update is
    identical for any device count over the same global batch (the
    1-vs-8-device parity test in tests/test_parallel.py asserts this).
    """

    def loss_fn(params, inputs_norm, condition_norm, sample_keys):
        denoise = lambda x, t, c, m: apply_fn(params, x, t, c, m)
        return diffusion.loss(
            denoise, inputs_norm, condition_norm, None, sample_keys=sample_keys
        )

    def device_step(state: TrainState, inputs_norm, condition_norm, key):
        idx = jax.lax.axis_index("data")
        local_b = inputs_norm.shape[0]
        global_idx = idx * local_b + jnp.arange(local_b)
        sample_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(global_idx)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, inputs_norm, condition_norm, sample_keys
        )
        # average across the data axis -> identical update everywhere
        grads = jax.lax.pmean(grads, axis_name="data")
        loss = jax.lax.pmean(loss, axis_name="data")

        grads_finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )
        ok = jnp.logical_and(jnp.isfinite(loss), grads_finite)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: jnp.where(ok, p + u, p), state.params, updates
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
        )

        step = state.step + 1
        do_update = jnp.logical_and(step >= step_start_ema, step % update_ema_every == 0)
        hard_copy = step < step_start_ema

        def ema_leaf(ema, p):
            decayed = ema * ema_decay + p * (1.0 - ema_decay)
            out = jnp.where(do_update, decayed, ema)
            return jnp.where(hard_copy, p, out)

        new_ema = jax.tree_util.tree_map(ema_leaf, state.ema_params, new_params)
        new_state = TrainState(new_params, new_ema, new_opt_state, step)
        return new_state, {"loss": loss, "update_skipped": jnp.logical_not(ok)}

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_eval(mesh: Mesh, fn: Callable):
    """Shard an embarrassingly-parallel evaluation sweep over the mesh.

    ``fn(params, x0, key) -> pytree`` is one evaluation (e.g. a full fused
    closed loop from `control.make_closed_loop`). Returns a jitted
    ``sweep(params, x0s, keys)`` that vmaps ``fn`` over the LOCAL shard on
    each device, with the (x0s, keys) batch sharded over 'data' and params
    replicated — the multi-chip path for the reference's initial-state
    sweeps (`Diffusion_MPC_Inference.py:153-174` runs them serially).

    The global batch (leading dim of x0s/keys) must divide the mesh size.
    """

    def local_sweep(params, x0s, keys):
        return jax.vmap(lambda x0, k: fn(params, x0, k))(x0s, keys)

    sharded = shard_map(
        local_sweep,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(sharded)
