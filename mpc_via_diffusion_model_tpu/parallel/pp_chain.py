"""Pipeline parallelism over the diffusion denoising chain.

The diffusion-MPC workload is SEQUENTIAL-DEPTH bound (BENCH.md roofline):
one control step is a chain of N denoiser evals that cannot be batched away,
so a single chip's latency floor is N * t_eval regardless of MXU headroom.
Pipeline parallelism attacks exactly that axis: the chain's N steps are cut
into S contiguous stages, stage s owns steps [s*N/S, (s+1)*N/S), and a STREAM
of independent control requests (different plants / different start states —
the serving-fleet shape, BENCH.md serving curve) flows through the stages,
activations hopping device-to-device over ICI with one `ppermute` per round.

Steady state, every stage denoises a DIFFERENT request concurrently: R
requests finish in (R + S - 1) stage-rounds instead of R * S — an S-fold
throughput multiplier precisely where data parallelism cannot help (DP
replicates the whole chain, so per-request latency and the per-chip
request rate stay fixed; PP divides the per-request chain across chips).

The reference has no parallelism of any kind (single-GPU torch loop,
`mpd/trainer/trainer.py:181-309`; per-step model reload in the control loop,
`inference_diffusion_(LMPC_learning).py:20-74`). This module is the SURVEY
§2.4 scaling design applied to the serving path.

Mechanics (classic GPipe-style schedule, no microbatch split needed because
requests ARE the microbatches):

- every device holds the FULL denoiser params (1M params — replication is
  free; PP here divides sequential DEPTH, not memory) plus the schedule
  constants for its step window.
- a `lax.fori_loop` runs R + S - 1 rounds. Per round each stage: (1) injects
  (stage 0: next request's noise-init x), (2) runs its N/S `ddpm_cfg_step`s
  as a `lax.scan`, (3) extracts (last stage: finished sample -> output
  buffer), (4) shifts its slot to stage s+1 with a single `ppermute`.
- slot validity rides the wire as ``slot_idx + 1`` (ppermute fills
  non-receivers with zeros, so stage 0 decodes 0 - 1 = -1 = empty); bubbles
  at fill/drain run masked (results discarded by a `where`).
- per-request noise reproduces `GaussianDiffusion.ddpm_cfg_sample`'s
  convention bit-for-bit: `normal(keys[r], (n_total+1,) + shape)`, slab 0 is
  the init, slab 1+i is step i's injected noise — so the pipelined sampler
  is asserted EQUAL to the sequential sampler per request
  (tests/test_pp_chain.py).

Cost model: one (B, H, C) ppermute per stage-round — for the flagship
(64, 16, 1) slot that is 4 KiB on the wire, vanishingly small next to the
N/S * ~48 MFLOP of denoiser evals it amortizes; the schedule is
compute-dominated at any realistic stage depth, so the S-fold multiplier is
essentially lossless once R >> S.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..diffusion.gaussian_diffusion import GaussianDiffusion, GuideFn

__all__ = ["make_pp_cfg_sampler"]


def make_pp_cfg_sampler(
    mesh: Mesh,
    diffusion: GaussianDiffusion,
    denoise_fn: Callable,
    shape: Tuple[int, ...],
    w: float = 0.01,
    n_diffusion_steps_without_noise: int = 0,
    guide: Optional[GuideFn] = None,
    n_guide_steps: int = 1,
    t_start_guide: float = float("inf"),
    scale_grad_by_std: bool = False,
    axis: str = "pp",
) -> Callable:
    """Build the jitted pipelined CFG sampler
    ``sample(contexts, keys) -> samples``:

    - ``contexts``: (R, B, context_dim) — R independent requests, each a
      batch of B candidate trajectories conditioned on that request's state.
    - ``keys``: (R,) PRNG keys, one per request.
    - returns (R,) + shape samples, request r bit-matching
      ``diffusion.ddpm_cfg_sample(denoise_fn, shape, keys[r], contexts[r], w,
      n_diffusion_steps_without_noise)``.

    ``mesh.shape[axis]`` = S pipeline stages; S must divide the total chain
    length (n_steps + tail). ``denoise_fn(x, t, context, context_mask)`` is
    the replicated denoiser closure (params baked in — e.g.
    ``lambda x, t, c, mk: model.apply(params, x, t, c, mk)``).
    """
    S = int(mesh.shape[axis])
    n_tail = n_diffusion_steps_without_noise
    n_total = diffusion.schedule.n_steps + n_tail
    if n_total % S != 0:
        raise ValueError(
            f"chain length {n_total} (n_steps {diffusion.schedule.n_steps} + "
            f"tail {n_tail}) must be divisible by the pipeline depth {S}"
        )
    k_per_stage = n_total // S
    # descending step ids, same order as ddpm_cfg_sample
    steps_full = jnp.arange(diffusion.schedule.n_steps - 1, -n_tail - 1, -1)
    perm = [(s, s + 1) for s in range(S - 1)]

    def _stage_steps(slot, noise_slab, context, stage):
        """Run this stage's k_per_stage CFG steps on one slot."""
        my_steps = jax.lax.dynamic_slice_in_dim(
            steps_full, stage * k_per_stage, k_per_stage
        )

        def body(x, inp):
            i, noise = inp
            x_new = diffusion.ddpm_cfg_step(
                denoise_fn, x, i, noise, context, w,
                guide=guide, n_guide_steps=n_guide_steps,
                t_start_guide=t_start_guide,
                scale_grad_by_std=scale_grad_by_std,
            )
            return x_new, None

        out, _ = jax.lax.scan(body, slot, (my_steps, noise_slab))
        return out

    def device_fn(contexts, keys):
        # contexts: (R, B, ctx) replicated; keys: (R, ...) replicated.
        # Noise is generated ON DEMAND per round from the active request's
        # key — the same full (n_total+1)+shape normal draw as
        # `ddpm_cfg_sample`, sliced to this stage's window — so each device
        # holds one transient slab instead of a resident R x (n_total+1)
        # buffer (which would grow with the stream length R and defeat the
        # memory point of pipelining). Values stay bit-identical to the
        # sequential sampler's convention.
        R = contexts.shape[0]
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == S - 1

        slot0 = jnp.zeros(shape, jnp.float32)
        out0 = jnp.zeros((R,) + shape, jnp.float32)

        def round_body(r, carry):
            slot, slot_idx, out = carry
            # (1) inject: stage 0 picks up request r (while r < R)
            inj = jnp.logical_and(is_first, r < R)
            req = jnp.minimum(r, R - 1)
            slot_idx = jnp.where(inj, req, slot_idx)

            # (2) compute this stage's step window (masked when empty).
            # After injection slot_idx == req on stage 0, so one key index
            # serves both the init slab and the step window.
            valid = slot_idx >= 0
            safe = jnp.maximum(slot_idx, 0)
            noise_full = jax.random.normal(
                keys[safe], (n_total + 1,) + tuple(shape), jnp.float32
            )
            slot = jnp.where(inj, noise_full[0], slot)
            noise_slab = jax.lax.dynamic_slice_in_dim(
                noise_full, 1 + stage * k_per_stage, k_per_stage, axis=0
            )
            done = _stage_steps(slot, noise_slab, contexts[safe], stage)
            slot = jnp.where(valid, done, slot)

            # (3) extract: last stage banks its finished request
            bank = jnp.logical_and(is_last, valid)
            out = jax.lax.dynamic_update_index_in_dim(
                out,
                jnp.where(bank, slot, out[safe]),
                safe,
                axis=0,
            )

            # (4) shift slot to the next stage; validity rides as idx+1 so
            # stage 0 (which receives zeros) decodes to empty (-1)
            slot = jax.lax.ppermute(slot, axis, perm)
            slot_idx = jax.lax.ppermute(slot_idx + 1, axis, perm) - 1
            return slot, slot_idx, out

        # carries become device-varying inside the loop (axis_index branches),
        # so the initial values must be pcast to varying for check_vma
        carry0 = jax.lax.pcast((slot0, jnp.int32(-1), out0), axis, to="varying")
        _, _, out = jax.lax.fori_loop(0, R + S - 1, round_body, carry0)
        # only the last stage wrote anything; psum replicates the result
        return jax.lax.psum(out, axis)

    spec_rep = P()
    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(spec_rep, spec_rep),
        out_specs=spec_rep,
        check_vma=True,
    )

    def sample(contexts, keys):
        return sharded(contexts, keys)

    return jax.jit(sample)
