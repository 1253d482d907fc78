"""The ENTIRE receding-horizon episode as ONE Pallas TPU kernel.

`fused_denoise.make_fused_ddim_chain` already runs a whole few-step sampler
per kernel launch, but a closed loop launches it once per replan: measured on
the 3-eval distilled student, the ~350 us fixed per-`pallas_call` cost
(weight staging HBM->VMEM + Mosaic launch) dominates the ~50 us of U-Net
compute, capping the loop at ~2.4 kHz. This kernel moves the REPLAN LOOP
itself inside: all `n_steps` control steps — normalize state, denoise chain,
unnormalize controls, plant step, stage cost — execute in one Mosaic
program, so the weights are staged exactly once per episode and stay
VMEM-resident across all `n_steps * len(times)` U-Net bodies.

What the reference's loop does per control step on the host
(`scripts/inference/Diffusion_MPC_Inference.py:191-290`: reload + compile,
30 double U-Net launches, copy to CPU, numpy/CasADi plant step) is here ~0
dispatches per step and 1 per episode.

In-kernel additions over the per-replan kernels:
- conditioning: the FiLM biases depend on the CURRENT plant state, which is
  only known in-kernel — the time-embedding table is precomputed per grid
  step, and each denoise step computes `mish([t_emb, ctx]) @ Wf_r + bf_r`
  per residual block as small MXU matmuls (films stay a python list indexed
  statically by the unrolled U-Net body; no padded stack needed),
- the plant step and the diagonal quadratic stage cost are the library's own
  pure `(x, u) -> x'` closures traced straight into the kernel (VPU scalar
  math; `dynamics/base.py` contract),
- the Limits normalizer affines (normalize state, clip-and-unnormalize
  controls — the reference's saturate-at-dataset-limits semantics,
  `normalization.py:156-167`) are baked as constants,
- per-replan init noise is pre-drawn outside to match
  `make_closed_loop`'s key-splitting semantics exactly
  (`control/runtime.py:186-196`), so the episode is bit-comparable to the
  per-replan path (tests/test_fused_episode.py).

Plant envelope: the plant step (and optional state->condition map) must
LOWER TO MOSAIC. Elementwise/trig dynamics (cart-pole, pendulum, acrobot,
quadrotor) do; the panda 7-link RNE chain does NOT (Mosaic
NotImplementedError on its tiny-matmul link recursion — and the failed
remote compile can wedge the axon relay, so don't retry blindly). For such
plants use the fused CHAIN kernels (`fused_denoise.py`) as
`make_closed_loop(sample_override=...)` with the plant XLA-side — measured
in scripts/bench_highdim.py::_panda_fused.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.schedules import DiffusionSchedule
from ..data.normalization import NormalizerStats
from ..dynamics.base import Plant, QuadraticCost
from ..models.layers import mish
from ..models.temporal_unet import TemporalUnet
from .fused_unet import (append_film_weights, append_final_1x1,
                         build_unet_ops, time_embedding_table)

__all__ = ["make_fused_ddim_episode", "make_fused_cfg_episode"]


def _bits_to_normal(b1, b2):
    """Box-Muller N(0,1) from two independent uint32 bit arrays — the pure
    math behind the in-kernel noise path, split out so its distribution is
    unit-testable on CPU with host-generated bits (the `pltpu.prng_*`
    primitives have no CPU lowering). Uses the top 24 bits of each word as
    the uniform mantissa: u1 in (0, 1] (log-safe), u2 in [0, 1)."""
    inv24 = np.float32(1.0 / 16777216.0)
    # >>8 keeps values < 2^24, so the int32 view is non-negative and the
    # int->float convert is exact
    i1 = jax.lax.shift_right_logical(b1, np.uint32(8)).astype(jnp.int32)
    i2 = jax.lax.shift_right_logical(b2, np.uint32(8)).astype(jnp.int32)
    u1 = (i1.astype(jnp.float32) + 1.0) * inv24
    u2 = i2.astype(jnp.float32) * inv24
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(np.float32(2.0 * np.pi) * u2)


def _kernel_gauss(shape):
    """Draw N(0,1) of ``shape`` from the per-core hardware PRNG (must be
    seeded once per kernel via `pltpu.prng_seed`). Each call consumes fresh
    bits, so successive draws are independent; draw order is the kernel's
    program order."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _bits_to_normal(b1, b2)


def _key_to_seeds(key: jax.Array) -> jnp.ndarray:
    """(2,) int32 seed words for `pltpu.prng_seed` from a jax PRNG key —
    the full key data, so distinct keys give distinct in-kernel streams."""
    data = jax.random.key_data(key).reshape(-1)
    return jax.lax.bitcast_convert_type(data, jnp.int32)


def _affine_consts(stats: NormalizerStats, dim: int):
    """(shift, scale) so that normalize(x) = (x - shift) * scale; and the
    inverse pair for unnormalize. Supports 'limits' and 'identity'."""
    if stats.kind == "identity":
        z = np.zeros((dim,), np.float32)
        o = np.ones((dim,), np.float32)
        return z, o, z, o
    assert stats.kind == "limits", f"fused episode supports limits/identity, got {stats.kind}"
    mins = np.asarray(stats.mins, np.float32)
    maxs = np.asarray(stats.maxs, np.float32)
    rng = maxs - mins
    # normalize: 2 (x - min)/rng - 1  ==  (x - (min + rng/2)) * (2/rng)
    n_shift = mins + 0.5 * rng
    n_scale = 2.0 / rng
    # unnormalize: (clip(x) + 1) * rng/2 + min
    u_scale = 0.5 * rng
    u_shift = mins + 0.5 * rng
    return n_shift, n_scale, u_shift, u_scale


def _kernel_safe_fn(fn: Callable, flat: list, *example_args):
    """Hoist ``fn``'s captured array constants onto the pallas input list
    (Mosaic kernels cannot capture concrete arrays — the panda plant's RNE
    step and FK context close over DH/inertia tables). `jax.closure_convert`
    is not enough: numpy-array closures enter the jaxpr as CONSTS (literals),
    not as hoistable jax-array captures, so we trace the jaxpr ourselves and
    feed its const list back through kernel refs.
    Returns ``call(W, *args)`` where ``W(idx)`` reads a flat input."""
    closed = jax.make_jaxpr(fn)(*example_args)
    recs = []
    for c in closed.consts:
        c = jnp.asarray(c)
        recs.append((len(flat), c.shape, c.dtype))
        flat.append(c.reshape(1, -1) if c.ndim < 2 else c)

    def call(W, *args):
        cs = [W(i).reshape(sh).astype(dt) for i, sh, dt in recs]
        out = jax.core.eval_jaxpr(closed.jaxpr, cs, *args)
        return out[0] if len(out) == 1 else tuple(out)

    return call


def make_fused_ddim_episode(
    model: TemporalUnet,
    params,
    schedule: DiffusionSchedule,
    times,
    inputs_stats: NormalizerStats,
    condition_stats: NormalizerStats,
    plant: Plant,
    cost: QuadraticCost,
    n_steps: int = 80,
    n_candidates: int = 1,
    selection_cost=None,
    selection_horizon: Optional[int] = None,
    weights_dtype=jnp.float32,
    clip_denoised: bool = True,
    interpret: bool = False,
    state_to_condition: Optional[Callable] = None,
    inkernel_noise: bool = False,
) -> Callable:
    """Build ``episode(x0, key) -> (x_track, u_track, stage_costs)`` — the
    full distilled-student closed loop (conditional DDIM chain, guidance
    baked in) as one kernel. Matches
    ``make_closed_loop(..., sample_override=make_fused_ddim_chain(...))``
    step for step (same per-replan key split, same clip/normalize semantics).

    ``inkernel_noise=True`` draws the per-replan init noise INSIDE the
    kernel from the TPU hardware PRNG (seeded from ``key``'s data) instead
    of staging a pre-drawn (n_steps, K*H, d) array: the staged layout
    lane-pads d -> 128 in VMEM (225 MB at K=16/600 steps — cannot compile),
    so this is what makes LONG best-of-K episodes single-dispatch. The
    draws are Box-Muller from hardware bits, NOT bit-equal to
    `jax.random.normal`, so the episode is distributionally (not bitwise)
    comparable to the XLA loop; requires real TPU (no CPU/interpret
    lowering). Mosaic envelope (AOT-probed on the quadrotor H=48 config):
    compiles for K <= 14 at any episode length; K=16 (768 rows) crashes
    the Mosaic compiler whenever ANY in-kernel draw is present — even
    steps=2, no selection, chunked (512,4)+(256,4) or transposed (4,768)
    draws — though the same 768-row body with STAGED noise and a
    standalone gauss((768,4)) kernel both compile. Use the staged
    dependent-chain protocol at K=16.

    ``n_candidates > 1`` runs best-of-K IN-kernel: K candidate horizons
    denoise as one batched U-Net body (rows = K*H), each rolls open-loop
    through the plant, and the min-rollout-cost plan's first control is
    applied — `control/runtime.py` `horizon_cost` selection (same scan
    order, same argmin first-min tie rule) without leaving VMEM. Measured
    motivation: the 1-eval student at K=4 matches the expert's closed-loop
    cost (artifacts/student_candidates), so the selection belongs in the
    fast path.

    ``selection_cost`` (duck-typed ``.stage(x, u)``/``.terminal(x)``, any
    pure jax fn — e.g. the quadrotor's margin-inflated safety scorer,
    `scripts/quadrotor_task.py::make_select_cost`) scores the K candidates
    instead of ``cost`` when given; the reported ``stage_costs`` stay the
    task quadratic. This mirrors the study protocol where selection is
    near-lexicographic safety-first while metrics are computed from the
    state track (artifacts/quadrotor_candidates: K=16 makes the whole
    student ladder collision-free on all 64 starts).

    ``state_to_condition`` maps the plant state (dx,) to the conditioning
    vector (model.context_dim,) IN-kernel (e.g. the Panda FK context,
    `dynamics/arm.py::panda_context`); identity when None.
    """
    from ..diffusion.distillation import ddim_affine_coefs

    # NOTE: like all the fused chain/episode kernels, this hardcodes the
    # EPSILON-prediction recon algebra (recon = sra x - srm eps) — the
    # GaussianDiffusion default. x0-predicting models (predict_epsilon=False)
    # must use the XLA samplers.
    K = int(n_candidates)
    assert K >= 1
    ops = build_unet_ops(model, params, K, weights_dtype)
    flat, body = list(ops["flat"]), ops["body"]
    films_w, f1_w, time_p = ops["films_w"], ops["final_1x1"], ops["time"]
    horizon, n_res = ops["horizon"], ops["n_res"]
    d_state = model.state_dim       # control channels (denoiser state)
    dx = plant.state_dim
    du = plant.control_dim
    assert d_state == du, "episode kernel denoises control sequences"
    # conditioning width: the model's context_dim when a state->condition
    # map is given (e.g. panda FK context), the raw state width otherwise
    dc = int(model.context_dim) if state_to_condition is not None else dx

    C = ddim_affine_coefs(schedule, times)
    n_total = len(C["t"])
    coefs = jnp.asarray(
        np.stack([C["sra"], C["srm"], C["c1"], C["c2"]], axis=1), jnp.float32
    )  # (n_total, 4) -> SMEM

    # time embeddings of the grid steps (n_total, emb), VMEM table; FiLM
    # dense weights appended unpadded (in-kernel films are a python list
    # indexed statically by body())
    t_embs = time_embedding_table(time_p, C["t"])
    film_idx = append_film_weights(flat, films_w)
    w1_idx, b1_idx = append_final_1x1(flat, f1_w, weights_dtype)

    cfg_indicator = bool(getattr(model, "cfg_indicator", False))

    # normalizer affines ride the flat input list (pallas kernels may not
    # capture concrete arrays); the quadratic-cost diagonals become unrolled
    # python-float scalar math below for the same reason
    cn_shift, cn_scale, _, _ = _affine_consts(condition_stats, dc)
    _, _, un_shift, un_scale = _affine_consts(inputs_stats, du)
    flat.append(jnp.asarray(cn_shift.reshape(1, dc))); cns_idx = len(flat) - 1
    flat.append(jnp.asarray(cn_scale.reshape(1, dc))); cnc_idx = len(flat) - 1
    flat.append(jnp.asarray(un_shift.reshape(1, du))); uns_idx = len(flat) - 1
    flat.append(jnp.asarray(un_scale.reshape(1, du))); unc_idx = len(flat) - 1

    q_diag = [float(v) for v in np.asarray(cost.q_diag).reshape(-1)]
    r_diag = list(np.broadcast_to(np.asarray(cost.r, np.float64).reshape(-1), (du,)))

    # in-kernel plant step / context map with captured arrays hoisted onto
    # the pallas input list (see _kernel_safe_fn)
    plant_call = _kernel_safe_fn(lambda x, u: plant.step(x, u), flat,
                                 jnp.zeros((dx,), jnp.float32),
                                 jnp.zeros((du,), jnp.float32))
    cond_call = (_kernel_safe_fn(lambda x: state_to_condition(x), flat,
                                 jnp.zeros((dx,), jnp.float32))
                 if state_to_condition is not None else None)

    # best-of-K selection: the candidate scorer computes the runtime's
    # `horizon_cost` (control/runtime.py:144-153) as a fori_loop. Mosaic's
    # kernel lowering rejects BOTH lax.scan with extensive inputs (scanning
    # over u_seq as xs) AND value dynamic_slice (u_cand[:, i] with a traced
    # i) — each compiles in interpret mode but NotImplementedErrors on real
    # TPU (found benching the K=4 episode row, round 4). Step i's controls
    # are therefore selected by a one-hot contraction over the horizon axis
    # (broadcasted_iota + compare lower fine), the same trick the kernel's
    # argmin-candidate extraction uses.
    if K > 1:
        sel_cost = cost if selection_cost is None else selection_cost
        # truncated scoring (control/runtime.py:144-167 semantics): score
        # only the credible plan prefix; terminal cost only when the FULL
        # plan is scored — a truncated rollout's last state is not the
        # plan's terminal state
        sel_h = int(selection_horizon or horizon)

        def _cand_costs(x0v, u_cand):
            x0_b = jnp.broadcast_to(x0v, (K, dx))
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (horizon, 1), 0)

            def body_fn(i, carry):
                xc, acc = carry  # (K, dx), (K,)
                sel = (iota_h == i).astype(jnp.float32)  # (H, 1)
                u = jnp.sum(u_cand * sel[None], axis=1)  # (K, du)
                acc = acc + jax.vmap(sel_cost.stage)(xc, u)
                return jax.vmap(plant.step)(xc, u), acc

            x_f, acc = jax.lax.fori_loop(
                0, sel_h, body_fn, (x0_b, jnp.zeros((K,), jnp.float32)))
            if sel_h == horizon:
                # terminal with the SELECTION cost, matching the runtime
                # (the loop passes sel_cost as its `cost`)
                acc = acc + jax.vmap(sel_cost.terminal)(x_f)
            return acc

        costs_call = _kernel_safe_fn(_cand_costs, flat,
                                     jnp.zeros((dx,), jnp.float32),
                                     jnp.zeros((K, horizon, du), jnp.float32))

    rows = K * horizon

    def kernel(x0_ref, noise_ref, tembs_ref, coef_ref, *refs):
        xtr_ref, utr_ref, cost_ref = refs[-3:]
        wrefs = refs[:-3]

        def W(idx):
            return wrefs[idx][...]

        if inkernel_noise:
            # noise_ref is the (2,) SMEM seed; one seed per episode, draws
            # consumed in replan order
            pltpu.prng_seed(noise_ref[0], noise_ref[1])

        xtr_ref[0] = x0_ref[0]

        def replan(step_i, x):
            # x: (1, dx) current plant state
            raw = cond_call(W, x[0])[None] if cond_call is not None else x  # (1, dc)
            ctx = (raw - W(cns_idx)) * W(cnc_idx)  # normalized condition (1, dc)

            def denoise(si, u):
                # u: (rows, d_state) current normalized control sample
                temb = tembs_ref[si][None, :]  # (1, emb)
                parts = [temb, ctx]
                if cfg_indicator:
                    parts.append(jnp.ones((1, 1), jnp.float32))
                mc = mish(jnp.concatenate(parts, axis=-1))  # (1, cond)
                films = [
                    jnp.broadcast_to(
                        jnp.dot(mc, W(wi), preferred_element_type=jnp.float32)
                        + W(bi),
                        (K, W(bi).shape[-1]),
                    )
                    for wi, bi in film_idx
                ]  # list of (K, c_r); candidates share the loop's context
                y = body(W, films, u)
                eps = jnp.dot(y.astype(weights_dtype), W(w1_idx),
                              preferred_element_type=jnp.float32) + W(b1_idx)
                sra_t = coef_ref[si, 0]
                srm_t = coef_ref[si, 1]
                c1_t = coef_ref[si, 2]
                c2_t = coef_ref[si, 3]
                recon = sra_t * u - srm_t * eps
                if clip_denoised:
                    recon = jnp.clip(recon, -1.0, 1.0)
                return c1_t * recon + c2_t * u

            u0n = (_kernel_gauss((rows, d_state)) if inkernel_noise
                   else noise_ref[step_i])  # (rows, d_state) init noise
            u_norm = jax.lax.fori_loop(0, n_total, denoise, u0n)
            # limits unnormalize: clip to [-1, 1] then affine (the reference's
            # saturate-at-dataset-limits semantics)
            u_seq = jnp.clip(u_norm, -1.0, 1.0) * W(unc_idx) + W(uns_idx)  # (K*H, du)
            if K == 1:
                u0 = u_seq[0]  # (du,)
            else:
                u_cand = u_seq.reshape(K, horizon, du)
                ck = costs_call(W, x[0], u_cand).reshape(1, K)
                # first-min argmin without lax.argmin (Mosaic-safe 2-D
                # min/where): matches jnp.argmin's tie rule in runtime.py
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                best = jnp.min(jnp.where(ck == jnp.min(ck), iota, K))
                onehot = (iota == best).astype(jnp.float32)  # (1, K)
                u0 = jnp.dot(onehot, u_cand[:, 0, :],
                             preferred_element_type=jnp.float32)[0]  # (du,)
            stage = sum(q_diag[i] * x[0, i] * x[0, i] for i in range(dx)) \
                + sum(r_diag[j] * u0[j] * u0[j] for j in range(du))
            x_next = plant_call(W, x[0], u0)[None]  # (1, dx)
            xtr_ref[step_i + 1] = x_next[0]
            utr_ref[step_i] = u0
            cost_ref[step_i] = jnp.reshape(stage, (1,))
            return x_next

        jax.lax.fori_loop(0, n_steps, replan, x0_ref[...])

    def episode(x0: jnp.ndarray, key: jax.Array):
        """x0: (dx,) initial plant state. Returns (x_track (n_steps+1, dx),
        u_track (n_steps, du), stage_costs (n_steps,))."""
        if inkernel_noise:
            noise = _key_to_seeds(key)  # (2,) int32 -> SMEM
        else:
            replan_keys = jax.random.split(key, n_steps)  # runtime.py:188
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (K, horizon, d_state), jnp.float32)
            )(replan_keys).reshape(n_steps, rows, d_state)

        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        noise_spec = (pl.BlockSpec(memory_space=pltpu.SMEM)
                      if inkernel_noise else full())
        xtr, utr, costs = pl.pallas_call(
            kernel,
            in_specs=[full(), noise_spec, full(),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [full()] * len(flat),
            out_specs=(full(), full(), full()),
            out_shape=(
                jax.ShapeDtypeStruct((n_steps + 1, dx), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, du), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 1), jnp.float32),
            ),
            interpret=interpret,
        )(x0.reshape(1, dx).astype(jnp.float32), noise, t_embs, coefs, *flat)
        return xtr, utr, costs[:, 0]

    return episode


def make_fused_cfg_episode(
    model: TemporalUnet,
    params,
    schedule: DiffusionSchedule,
    inputs_stats: NormalizerStats,
    condition_stats: NormalizerStats,
    plant: Plant,
    cost: QuadraticCost,
    n_steps: int = 80,
    w: float = 0.01,
    n_diffusion_steps_without_noise: int = 5,
    n_candidates: int = 1,
    selection_cost=None,
    selection_horizon: Optional[int] = None,
    weights_dtype=jnp.float32,
    clip_denoised: bool = True,
    interpret: bool = False,
    state_to_condition: Optional[Callable] = None,
    inkernel_noise: bool = False,
) -> Callable:
    """The HEADLINE protocol as one kernel: the full CFG DDPM closed loop
    (`bench.py` — n_steps replans x (T + tail) denoise steps x 2 CFG U-Net
    passes fused into one doubled batch) with the replan loop in-kernel.
    Same semantics as ``make_closed_loop(..., sample_override=
    make_fused_cfg_chain(...))`` (tests/test_fused_episode.py).

    ``n_candidates > 1`` runs best-of-K IN-kernel exactly like
    `make_fused_ddim_episode`: K candidate horizons denoise as 2K groups in
    the doubled CFG batch (rows = 2*K*H per U-Net pass), each rolls through
    the plant and the min-cost plan's first control is applied —
    `control/runtime.py` `horizon_cost` semantics. ``selection_cost``
    (duck-typed stage/terminal) scores candidates instead of ``cost`` when
    given; reported ``stage_costs`` stay the task quadratic. This is the
    serving path for TEACHER-grade policies (e.g. the scene-conditioned
    student: per-scene selection spheres + scene-feature context both ride
    the hoisted-capture input list, so ONE compiled kernel serves every
    scene).

    ``inkernel_noise=True``: all injected + init noise is drawn in-kernel
    from the TPU hardware PRNG instead of the staged
    (n_steps*(T+tail+1), ...) array — see `make_fused_ddim_episode`; this
    is what lets a LONG (e.g. 600-step) K=16 CFG episode compile as ONE
    dispatch (the staged array is 731 MB of VMEM even transposed at that
    length). Distributionally, not bitwise, equal to the staged path;
    requires real TPU."""
    K = int(n_candidates)
    assert K >= 1
    ops = build_unet_ops(model, params, 2 * K, weights_dtype)
    flat, body = list(ops["flat"]), ops["body"]
    films_w, f1_w, time_p = ops["films_w"], ops["final_1x1"], ops["time"]
    horizon, n_res = ops["horizon"], ops["n_res"]
    d_state = model.state_dim
    dx = plant.state_dim
    du = plant.control_dim
    assert d_state == du, "episode kernel denoises control sequences"
    # conditioning width: the model's context_dim when a state->condition
    # map is given (e.g. panda FK context), the raw state width otherwise
    dc = int(model.context_dim) if state_to_condition is not None else dx

    n_tail = n_diffusion_steps_without_noise
    n_total = schedule.n_steps + n_tail
    steps = np.arange(schedule.n_steps - 1, -n_tail - 1, -1)
    t_eff = np.maximum(steps, 0)
    s = schedule
    tab = lambda a: np.asarray(a, np.float64)
    sra = tab(s.sqrt_recip_alphas_cumprod)[t_eff]
    srm = tab(s.sqrt_recipm1_alphas_cumprod)[t_eff]
    c1 = tab(s.posterior_mean_coef1)[t_eff]
    c2 = tab(s.posterior_mean_coef2)[t_eff]
    sig = np.exp(0.5 * tab(s.posterior_log_variance_clipped)[t_eff])
    gate = (steps > 0).astype(np.float64)
    coefs = jnp.asarray(
        np.stack([sra, srm, c1, c2, sig * gate], axis=1), jnp.float32
    )  # (n_total, 5) -> SMEM

    t_embs = time_embedding_table(time_p, t_eff)
    film_idx = append_film_weights(flat, films_w)
    w1_idx, b1_idx = append_final_1x1(flat, f1_w, weights_dtype)

    cfg_indicator = bool(getattr(model, "cfg_indicator", False))

    cn_shift, cn_scale, _, _ = _affine_consts(condition_stats, dc)
    _, _, un_shift, un_scale = _affine_consts(inputs_stats, du)
    flat.append(jnp.asarray(cn_shift.reshape(1, dc))); cns_idx = len(flat) - 1
    flat.append(jnp.asarray(cn_scale.reshape(1, dc))); cnc_idx = len(flat) - 1
    flat.append(jnp.asarray(un_shift.reshape(1, du))); uns_idx = len(flat) - 1
    flat.append(jnp.asarray(un_scale.reshape(1, du))); unc_idx = len(flat) - 1

    q_diag = [float(v) for v in np.asarray(cost.q_diag).reshape(-1)]
    r_diag = list(np.broadcast_to(np.asarray(cost.r, np.float64).reshape(-1), (du,)))

    # in-kernel plant step / context map with captured arrays hoisted onto
    # the pallas input list (see _kernel_safe_fn)
    plant_call = _kernel_safe_fn(lambda x, u: plant.step(x, u), flat,
                                 jnp.zeros((dx,), jnp.float32),
                                 jnp.zeros((du,), jnp.float32))
    cond_call = (_kernel_safe_fn(lambda x: state_to_condition(x), flat,
                                 jnp.zeros((dx,), jnp.float32))
                 if state_to_condition is not None else None)

    # candidate scorer: same one-hot-contraction fori_loop as the DDIM
    # kernel (Mosaic rejects scan-with-xs and value dynamic_slice)
    if K > 1:
        sel_cost = cost if selection_cost is None else selection_cost
        sel_h = int(selection_horizon or horizon)  # runtime.py truncation

        def _cand_costs(x0v, u_cand):
            x0_b = jnp.broadcast_to(x0v, (K, dx))
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (horizon, 1), 0)

            def body_fn(i, carry):
                xc, acc = carry
                sel = (iota_h == i).astype(jnp.float32)
                u = jnp.sum(u_cand * sel[None], axis=1)
                acc = acc + jax.vmap(sel_cost.stage)(xc, u)
                return jax.vmap(plant.step)(xc, u), acc

            x_f, acc = jax.lax.fori_loop(
                0, sel_h, body_fn, (x0_b, jnp.zeros((K,), jnp.float32)))
            if sel_h == horizon:
                acc = acc + jax.vmap(sel_cost.terminal)(x_f)
            return acc

        costs_call = _kernel_safe_fn(_cand_costs, flat,
                                     jnp.zeros((dx,), jnp.float32),
                                     jnp.zeros((K, horizon, du), jnp.float32))

    rows = K * horizon  # sample rows; the CFG batch doubles to 2*rows

    def kernel(x0_ref, noise_ref, tembs_ref, coef_ref, *refs):
        xtr_ref, utr_ref, cost_ref = refs[-3:]
        wrefs = refs[:-3]

        def W(idx):
            return wrefs[idx][...]

        # K>1 noise is stored TRANSPOSED (d, rows): the natural (rows, d)
        # layout lane-pads d=4 -> 128, inflating the K=16 60-step input
        # from 22.8 MB to 731 MB of VMEM; (d, rows) only sublane-pads
        # d -> 8 and Mosaic lowers the in-kernel 2-D transpose (probed).
        # inkernel_noise sidesteps the staging entirely: fresh hardware
        # draws per use, zero VMEM input at ANY episode length.
        if inkernel_noise:
            pltpu.prng_seed(noise_ref[0], noise_ref[1])
            read_nz = lambda i: _kernel_gauss((rows, d_state))
        elif K > 1:
            read_nz = lambda i: noise_ref[i].T
        else:
            read_nz = lambda i: noise_ref[i]

        xtr_ref[0] = x0_ref[0]

        def replan(step_i, x):
            raw = cond_call(W, x[0])[None] if cond_call is not None else x  # (1, dc)
            ctx = (raw - W(cns_idx)) * W(cnc_idx)  # (1, dc)
            # CFG doubled conditioning GROUPS: K candidates with the present
            # ctx, then K with it dropped (zeros)
            ctxK = jnp.broadcast_to(ctx, (K, ctx.shape[-1]))
            ctx2 = jnp.concatenate([ctxK, jnp.zeros_like(ctxK)], axis=0)  # (2K, dc)

            def denoise(si, u):
                # u: (rows, d_state) = (K*H, d)
                temb = jnp.broadcast_to(tembs_ref[si][None, :],
                                        (2 * K, tembs_ref.shape[-1]))
                parts = [temb, ctx2]
                if cfg_indicator:
                    ind = jnp.concatenate(
                        [jnp.ones((K, 1), jnp.float32),
                         jnp.zeros((K, 1), jnp.float32)], axis=0)
                    parts.append(ind)
                mc = mish(jnp.concatenate(parts, axis=-1))  # (2K, cond)
                films = [
                    jnp.dot(mc, W(wi), preferred_element_type=jnp.float32) + W(bi)
                    for wi, bi in film_idx
                ]  # list of (2K, c_r)
                x2 = jnp.concatenate([u, u], axis=0)  # (2*rows, d)
                y = body(W, films, x2)
                eps2 = jnp.dot(y.astype(weights_dtype), W(w1_idx),
                               preferred_element_type=jnp.float32) + W(b1_idx)
                sra_t = coef_ref[si, 0]
                srm_t = coef_ref[si, 1]
                c1_t = coef_ref[si, 2]
                c2_t = coef_ref[si, 3]
                sg_t = coef_ref[si, 4]
                recon2 = sra_t * x2 - srm_t * eps2
                recon = (1.0 + w) * recon2[:rows] - w * recon2[rows:]
                if clip_denoised:
                    recon = jnp.clip(recon, -1.0, 1.0)
                mean = c1_t * recon + c2_t * u
                nz = read_nz(step_i * (n_total + 1) + si)  # (rows, d)
                return mean + sg_t * nz

            u0n = read_nz(step_i * (n_total + 1) + n_total)  # x_T draw
            u_norm = jax.lax.fori_loop(0, n_total, denoise, u0n)
            u_seq = jnp.clip(u_norm, -1.0, 1.0) * W(unc_idx) + W(uns_idx)
            if K == 1:
                u0 = u_seq[0]
            else:
                u_cand = u_seq.reshape(K, horizon, du)
                ck = costs_call(W, x[0], u_cand).reshape(1, K)
                # first-min argmin without lax.argmin (Mosaic-safe 2-D
                # min/where), matching jnp.argmin's tie rule in runtime.py
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                best = jnp.min(jnp.where(ck == jnp.min(ck), iota, K))
                onehot = (iota == best).astype(jnp.float32)  # (1, K)
                u0 = jnp.dot(onehot, u_cand[:, 0, :],
                             preferred_element_type=jnp.float32)[0]
            stage = sum(q_diag[i] * x[0, i] * x[0, i] for i in range(dx)) \
                + sum(r_diag[j] * u0[j] * u0[j] for j in range(du))
            x_next = plant_call(W, x[0], u0)[None]
            xtr_ref[step_i + 1] = x_next[0]
            utr_ref[step_i] = u0
            cost_ref[step_i] = jnp.reshape(stage, (1,))
            return x_next

        jax.lax.fori_loop(0, n_steps, replan, x0_ref[...])

    def episode(x0: jnp.ndarray, key: jax.Array):
        """x0: (dx,). Returns (x_track, u_track, stage_costs) for the full
        CFG DDPM closed loop."""
        if inkernel_noise:
            noise = _key_to_seeds(key)  # (2,) int32 -> SMEM
        else:
            replan_keys = jax.random.split(key, n_steps)

            def draw(k):
                # ddpm_cfg_sample noise layout (fused_denoise.py:162-165):
                # one normal() of (n_total+1, K, H, d); [0] is x_T, [1:]
                # injected; reordered so rows [0:n_total) are the injected
                # draws and row n_total is x_T.
                nz = jax.random.normal(
                    k, (n_total + 1, K, horizon, d_state), jnp.float32)
                return jnp.concatenate([nz[1:], nz[:1]], axis=0)

            noise = jax.vmap(draw)(replan_keys).reshape(
                n_steps * (n_total + 1), rows, d_state)
            if K > 1:
                # transposed storage (see read_nz in the kernel)
                noise = jnp.swapaxes(noise, 1, 2)

        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        noise_spec = (pl.BlockSpec(memory_space=pltpu.SMEM)
                      if inkernel_noise else full())
        xtr, utr, costs = pl.pallas_call(
            kernel,
            in_specs=[full(), noise_spec, full(),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [full()] * len(flat),
            out_specs=(full(), full(), full()),
            out_shape=(
                jax.ShapeDtypeStruct((n_steps + 1, dx), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, du), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 1), jnp.float32),
            ),
            interpret=interpret,
        )(x0.reshape(1, dx).astype(jnp.float32), noise, t_embs, coefs, *flat)
        return xtr, utr, costs[:, 0]

    return episode
