"""Expert parallelism for serving a fleet of per-task policies.

Production diffusion-MPC serving is a FLEET: one finetuned checkpoint per
task/plant variant (the reference trains separate models per experiment —
cart-pole, Panda, quadrotor — and loads one checkpoint per run,
`Diffusion_MPC_Inference.py:55-63`, `inference_diffusion_panda.py:60-75`).
This module shards the EXPERTS over the mesh: device d holds ONLY its
experts' weights and serves their control streams, so fleet weight memory
scales 1/E per chip and E policies run concurrently with ZERO collectives
(each expert's closed loop is local; the mesh is used for placement, not
communication).

Contrast with the other axes in this package:
- `mesh.make_sharded_eval` (DP): one policy, replicated weights, the BATCH
  of start states is sharded.
- `tp_unet` / `tp_train` (TP): one policy, the CHANNELS are sharded.
- `pp_chain` (PP): one policy, the chain DEPTH is sharded.
- here (EP): many policies, the POLICIES are sharded.

All experts must share one pytree structure / architecture (a stacked
leading E axis) — the heterogeneity is in the WEIGHTS (per-task finetunes,
distillation students, sweep variants), which is the shape of every fleet
this framework produces (scripts/distill_*.py emit same-architecture
students per plant).

Parity: tests/test_ep_fleet.py asserts the sharded fleet result equals
running each expert's loop sequentially on one device.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_experts", "make_ep_fleet_eval"]


def stack_experts(mesh: Mesh, params_list, axis: str = "ep"):
    """Stack per-expert param pytrees along a new leading E axis and place
    the stack sharded over ``mesh``'s ``axis``.

    Each device materializes ONLY its own experts' shard (built host-side
    per device via `make_array_from_callback`) — the full (E, ...) stack
    never exists on any single chip, which is the point of EP: a fleet
    whose total weights exceed one chip's HBM still loads."""
    import numpy as np

    n_experts = len(params_list)
    sharding = NamedSharding(mesh, P(axis))

    def stack_leaf(*leaves):
        global_shape = (n_experts,) + tuple(np.shape(leaves[0]))

        def shard_for(index):
            lo, hi, _ = index[0].indices(n_experts)
            return np.stack([np.asarray(leaves[e]) for e in range(lo, hi)])

        return jax.make_array_from_callback(global_shape, sharding, shard_for)

    return jax.tree_util.tree_map(stack_leaf, *params_list)


def make_ep_fleet_eval(mesh: Mesh, fn: Callable, axis: str = "ep") -> Callable:
    """Build the jitted expert-parallel fleet sweep
    ``sweep(params_stack, x0s, keys) -> pytree``:

    - ``params_stack``: per-expert params stacked on a leading E axis
      (`stack_experts`), sharded over ``axis``.
    - ``x0s``/``keys``: (E, …) one start state / PRNG key per expert,
      sharded to co-locate with that expert's weights.
    - ``fn(params, x0, key) -> pytree`` is one expert's evaluation (e.g. a
      fused closed loop from `control.make_closed_loop`).

    E (the leading dim) must divide the mesh's ``axis`` size times any
    integer — i.e. ``axis`` size must divide E; each device vmaps over its
    local E/n_devices experts.
    """

    def local(params_stack, x0s, keys):
        return jax.vmap(fn)(params_stack, x0s, keys)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=True,
    )
    return jax.jit(sharded)
