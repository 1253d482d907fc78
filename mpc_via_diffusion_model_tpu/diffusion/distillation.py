"""Progressive distillation of the guided diffusion policy to a few-step
conditional student (Salimans & Ho 2022; CFG-baking per Meng et al. 2023).

The reference's only fast path is DDIM with T//5 steps
(`diffusion_model_base.py:239-314`), still paying two U-Net passes per step
for guidance. This module goes further, TPU-first:

- every distillation round halves the DDIM time grid (25 -> 13 -> 7 -> 4
  model evaluations), training the student so ONE of its DDIM steps lands
  where TWO teacher steps do;
- the first round also bakes the classifier-free guidance weight ``w`` into
  the student: the teacher's epsilon is the CFG combination
  ``(1+w) eps_cond - w eps_uncond`` while the student runs conditional-only
  — the distilled sampler needs NO doubled batch;
- targets and losses live in x0-space with the truncated-SNR weighting
  ``max(snr, 1)`` (stable where epsilon-space targets blow up at small t);
- the distilled sampler is an affine per-step update
  ``x <- C1(t) recon + C2(t) x`` with a STATIC coefficient table, the exact
  form the fused Pallas chain executes (`ops/fused_denoise.py`).

The distill step has the same ``step(state, inputs, cond, key)`` signature
as the train step, so `make_scanned_train_steps` chunks it unchanged.
"""
from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schedules import DiffusionSchedule

__all__ = [
    "ddim_time_grid",
    "halve_times",
    "ddim_affine_coefs",
    "distill_pair_tables",
    "make_distill_step",
    "make_student_ddim_sampler",
]


def ddim_time_grid(n_steps: int, t_start: int | None = None) -> List[int]:
    """Finest DDIM grid: every timestep, descending ([t_start, ..., 1, 0]).

    ``t_start`` defaults to the final timestep (T-1). For schedules whose
    terminal ``alphas_cumprod`` underflows (the reference's exponential
    schedule clamps abar[T-1] to 1e-12, so sqrt(1/abar) = 1e6 and the
    recon-space distill loss amplifies eps errors by 1e12), pass
    ``t_start = n_steps - 2`` to skip the degenerate endpoint: the signal
    content at abar = 1e-12 is 1e-6, so treating the initial N(0, 1) draw as
    x_{T-2} loses nothing measurable while keeping every distill pair
    conditioned."""
    if t_start is None:
        t_start = n_steps - 1
    return list(range(t_start, -1, -1))


def halve_times(times: Sequence[int]) -> List[int]:
    """Coarsen a descending time grid by 2 (keeps the endpoints when the
    length is odd: [24..0] -> [24,22,..,0] -> ... -> [24,16,8,0])."""
    return list(times)[::2]


def _pair_coefs(schedule: DiffusionSchedule, t: int, t_next: int):
    """(C1, C2) of the deterministic DDIM update x' = C1 * recon + C2 * x
    for the pair (t -> t_next); t_next < 0 means 'return recon' (C1=1,C2=0).
    Derived from `GaussianDiffusion.ddim_sample`'s update
    (x' = sqrt(abar') recon + sqrt(1-abar') eps with
    eps = (sra(t) x - recon)/srm(t))."""
    if t_next < 0:
        return 1.0, 0.0
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sra = float(np.sqrt(1.0 / abar[t]))
    srm = float(np.sqrt(1.0 / abar[t] - 1.0))
    a_next = float(abar[t_next])
    c = float(np.sqrt(1.0 - a_next))
    c1 = float(np.sqrt(a_next)) - c / srm
    c2 = c * sra / srm
    return c1, c2


def ddim_affine_coefs(schedule: DiffusionSchedule, times: Sequence[int]):
    """Static per-step tables for the affine DDIM chain over ``times``
    (descending, ending at 0; a final (0, -1) recon step is appended).

    Returns dict of np arrays with length ``len(times)``:
    t (eval timestep), sra, srm (recon coefs), c1, c2 (update coefs)."""
    ts = list(times)
    pairs = list(zip(ts, ts[1:] + [-1]))
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    t_arr = np.asarray([p[0] for p in pairs], np.int32)
    sra = np.sqrt(1.0 / abar[t_arr])
    srm = np.sqrt(1.0 / abar[t_arr] - 1.0)
    c1c2 = np.asarray([_pair_coefs(schedule, t, tn) for t, tn in pairs], np.float64)
    return {
        "t": t_arr,
        "sra": sra.astype(np.float32),
        "srm": srm.astype(np.float32),
        "c1": c1c2[:, 0].astype(np.float32),
        "c2": c1c2[:, 1].astype(np.float32),
    }


def distill_pair_tables(schedule: DiffusionSchedule, teacher_times: Sequence[int]):
    """Per-student-pair coefficient tables for progressive distillation.

    Teacher sub-steps for student pair j: (ts[j] -> mid_j -> lo_j), where
    ts = halve_times(teacher_times), lo is ts[j+1], or -1 (the final recon)
    for the last pair. Whether the LAST pair has a teacher mid depends on
    the teacher grid's parity: odd length (e.g. [24..0], ts ends at 0) ->
    the final student step IS the teacher's single (0 -> -1) recon, second
    sub-step is the identity; even length (e.g. [23..0], ts ends at 1) ->
    the teacher still has an eval at tt[2j+1] = 0, so the target is the
    genuine two-step (1 -> 0 -> -1) chain — dropping it would distill the
    last pair against a single teacher eval and lose the lowest-timestep
    refinement (tests/test_distillation.py::test_pair_tables_grid_parity).
    """
    ts = halve_times(teacher_times)
    n_pairs = len(ts)
    tt = list(teacher_times)
    assert tt[::2] == ts, "teacher grid must refine the student grid"

    stu = ddim_affine_coefs(schedule, ts)
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    mids, a_c1, a_c2, b_c1, b_c2, a_sra, a_srm, b_sra, b_srm = ([] for _ in range(9))
    for j in range(n_pairs):
        t_hi = ts[j]
        lo = ts[j + 1] if j < n_pairs - 1 else -1
        if 2 * j + 1 < len(tt):
            mid = tt[2 * j + 1]
            a = _pair_coefs(schedule, t_hi, mid)
            b = _pair_coefs(schedule, mid, lo)
        else:
            mid = 0
            a = _pair_coefs(schedule, t_hi, -1)
            b = (0.0, 1.0)
        mids.append(mid)
        a_c1.append(a[0]); a_c2.append(a[1]); b_c1.append(b[0]); b_c2.append(b[1])
        a_sra.append(float(np.sqrt(1.0 / abar[t_hi])))
        a_srm.append(float(np.sqrt(1.0 / abar[t_hi] - 1.0)))
        b_sra.append(float(np.sqrt(1.0 / abar[mid])))
        b_srm.append(float(np.sqrt(max(1.0 / abar[mid] - 1.0, 1e-20))))

    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return {
        "t_hi": jnp.asarray(ts, jnp.int32), "mid": jnp.asarray(mids, jnp.int32),
        "a_c1": f32(a_c1), "a_c2": f32(a_c2), "b_c1": f32(b_c1), "b_c2": f32(b_c2),
        "a_sra": f32(a_sra), "a_srm": f32(a_srm),
        "b_sra": f32(b_sra), "b_srm": f32(b_srm),
        "s_c1": f32(stu["c1"]), "s_c2": f32(stu["c2"]),
        "snr_w": f32(np.maximum(abar[np.asarray(ts)] / (1.0 - abar[np.asarray(ts)] + 1e-12), 1.0)),
    }


def make_distill_step(
    schedule: DiffusionSchedule,
    apply_fn: Callable,
    optimizer,
    teacher_params,
    teacher_times: Sequence[int],
    w: float = 0.0,
    teacher_cfg: bool = False,
    clip_denoised: bool = True,
    ema_decay: float = 0.995,
    step_start_ema: int = 200,
    update_ema_every: int = 10,
    guide_fn: Callable | None = None,
    t_start_guide: float = float("inf"),
):
    """One progressive-distillation round's train step.

    Student grid = ``halve_times(teacher_times)``; the student learns to
    reproduce two consecutive teacher DDIM steps with one of its own.
    ``teacher_cfg=True`` evaluates the teacher with the doubled-batch CFG
    combination at weight ``w`` (used in the FIRST round to bake guidance
    in); later rounds pass False — teacher and student are both
    conditional-only.

    ``guide_fn(x_norm_batch, ctx_norm_batch) -> delta`` bakes a sampling-time
    cost-gradient guide into the student (first round only, like the CFG
    weight): each teacher DDIM sub-step stepping FROM a timestep
    ``< t_start_guide`` gets the guide delta added to its landing point —
    exactly `GaussianDiffusion.ddpm_step`'s post-step guide hook — so the
    student's one step learns to land where the GUIDED teacher's two steps
    do. The guide is a function of the conditioning context (it closes over
    the plant state = unnormalize(ctx)), so the guided conditional
    distribution is learnable by a context-conditioned student; the distilled
    sampler then needs NO guide at inference (VERDICT r2 #3).

    Returns ``(step_fn, student_times)``; ``step_fn`` matches
    `make_train_step`'s signature and plugs into `make_scanned_train_steps`.
    """
    from ..train.trainer import TrainState
    import optax

    student_times = halve_times(teacher_times)
    ts = list(student_times)
    n_pairs = len(ts)
    T = distill_pair_tables(schedule, teacher_times)
    # guide gating per sub-step, matching ddpm_step's `i < t_start_guide`
    # (i = the timestep being stepped FROM). The b sub-step of an odd-parity
    # last pair is the identity (distill_pair_tables) — no step, no guide.
    tt = list(teacher_times)
    gate_a = jnp.asarray([float(t < t_start_guide) for t in ts], jnp.float32)
    gate_b = jnp.asarray(
        [float(2 * j + 1 < len(tt) and tt[2 * j + 1] < t_start_guide)
         for j in range(n_pairs)], jnp.float32)
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sqrt_ab = jnp.asarray(np.sqrt(abar), jnp.float32)
    sqrt_1mab = jnp.asarray(np.sqrt(1.0 - abar), jnp.float32)

    def teacher_eps(x, t, ctx):
        b = x.shape[0]
        if teacher_cfg:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx2 = jnp.concatenate([ctx, ctx], axis=0)
            mask2 = jnp.concatenate(
                [jnp.zeros((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)], axis=0
            )
            eps2 = apply_fn(teacher_params, x2, t2, ctx2, mask2)
            return (1.0 + w) * eps2[:b] - w * eps2[b:]
        return apply_fn(teacher_params, x, t, ctx, jnp.zeros((b, 1), x.dtype))

    def loss_fn(params, x0, ctx, key):
        b = x0.shape[0]
        k_j, k_noise = jax.random.split(key)
        j = jax.random.randint(k_j, (b,), 0, n_pairs)
        t_hi = T["t_hi"][j]
        noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
        expand = lambda v: v.reshape((b,) + (1,) * (x0.ndim - 1))
        x_t = expand(sqrt_ab[t_hi]) * x0 + expand(sqrt_1mab[t_hi]) * noise

        # two teacher DDIM sub-steps (stop-gradient targets). Teacher recons
        # are clamped to [-1, 1] exactly as the DDPM sampler that produced the
        # teacher's closed-loop behavior does (GaussianDiffusion.clip_denoised,
        # reference diffusion_model_base.py:155-158) — without the clamp, a
        # recon at small abar amplifies teacher eps error by sqrt(1/abar) and
        # those pairs dominate every gradient.
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_denoised else (lambda v: v)
        eps_a = teacher_eps(x_t, t_hi, ctx)
        recon_a = clip(expand(T["a_sra"][j]) * x_t - expand(T["a_srm"][j]) * eps_a)
        x_mid = expand(T["a_c1"][j]) * recon_a + expand(T["a_c2"][j]) * x_t
        if guide_fn is not None:
            x_mid = x_mid + expand(gate_a[j]) * guide_fn(x_mid, ctx)
        eps_b = teacher_eps(x_mid, T["mid"][j], ctx)
        recon_b = clip(expand(T["b_sra"][j]) * x_mid - expand(T["b_srm"][j]) * eps_b)
        x_tgt = expand(T["b_c1"][j]) * recon_b + expand(T["b_c2"][j]) * x_mid
        if guide_fn is not None:
            x_tgt = x_tgt + expand(gate_b[j]) * guide_fn(x_tgt, ctx)

        # the x0 the student must predict so ONE step lands at x_tgt
        recon_star = (x_tgt - expand(T["s_c2"][j]) * x_t) / expand(T["s_c1"][j])
        recon_star = jax.lax.stop_gradient(clip(recon_star))

        eps_s = apply_fn(params, x_t, t_hi, ctx, jnp.zeros((b, 1), x0.dtype))
        recon_s = expand(T["a_sra"][j]) * x_t - expand(T["a_srm"][j]) * eps_s
        err = jnp.square(recon_s - recon_star)
        return jnp.mean(expand(T["snr_w"][j]) * err)

    def distill_step(state: TrainState, inputs_norm, condition_norm, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, inputs_norm, condition_norm, key
        )
        grads_finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
        ))
        ok = jnp.logical_and(jnp.isfinite(loss), grads_finite)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
        )
        step = state.step + 1
        do_update = jnp.logical_and(step >= step_start_ema, step % update_ema_every == 0)
        hard_copy = step < step_start_ema

        def ema_leaf(ema, p):
            decayed = ema * ema_decay + p * (1.0 - ema_decay)
            return jnp.where(hard_copy, p, jnp.where(do_update, decayed, ema))

        new_ema = jax.tree_util.tree_map(ema_leaf, state.ema_params, new_params)
        new_state = TrainState(new_params, new_ema, new_opt_state, step)
        return new_state, {"loss": loss, "update_skipped": jnp.logical_not(ok)}

    return distill_step, student_times


def make_student_ddim_sampler(
    schedule: DiffusionSchedule,
    apply_fn: Callable,
    times: Sequence[int],
    clip_denoised: bool = True,
):
    """Pure-XLA reference sampler for a distilled student: conditional-only
    affine DDIM chain over the static ``times`` grid (the Pallas counterpart
    is `ops.fused_denoise.make_fused_ddim_chain`). ``clip_denoised`` clamps
    the per-step x0 reconstruction to [-1, 1], matching both the distill
    targets and the DDPM sampler the teacher was validated under.

    Returns ``sample(params, context, key, shape, x_init=None) -> x`` with
    shape = (n_samples, horizon, d). The chain is DETERMINISTIC given the
    initial draw; pass ``x_init`` (broadcastable to ``shape``) to pin it —
    e.g. ONE shared draw across a batch of contexts, which makes the
    sampler a mode-consistent function of the context (the property policy
    amortization needs, scripts/amortize_flagship.py)."""
    C = ddim_affine_coefs(schedule, times)
    t_tab = jnp.asarray(C["t"], jnp.int32)
    sra, srm = jnp.asarray(C["sra"]), jnp.asarray(C["srm"])
    c1, c2 = jnp.asarray(C["c1"]), jnp.asarray(C["c2"])
    n = len(C["t"])

    def sample(params, context, key, shape, x_init=None):
        b = shape[0]
        x = (jax.random.normal(key, shape, jnp.float32) if x_init is None
             else jnp.broadcast_to(x_init, shape).astype(jnp.float32))
        mask = jnp.zeros((b, 1), jnp.float32)

        def body(x, i):
            t = jnp.full((b,), t_tab[i], jnp.int32)
            eps = apply_fn(params, x, t, context, mask)
            recon = sra[i] * x - srm[i] * eps
            if clip_denoised:
                recon = jnp.clip(recon, -1.0, 1.0)
            return c1[i] * recon + c2[i] * x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(n))
        return x

    return sample
