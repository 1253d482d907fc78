"""Progressive distillation: grid halving, DDIM-algebra parity with the
scan sampler, the fused Pallas DDIM chain (interpret mode), and a tiny
end-to-end distill round."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.diffusion.distillation import (
    ddim_affine_coefs,
    ddim_time_grid,
    halve_times,
    make_distill_step,
    make_student_ddim_sampler,
)
from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
from mpc_via_diffusion_model_tpu.train import TrainState, make_optimizer


def test_grid_halving_nests():
    g = ddim_time_grid(25)
    assert g[0] == 24 and g[-1] == 0 and len(g) == 25
    g12 = halve_times(g)
    g6 = halve_times(g12)
    g3 = halve_times(g6)
    assert g12 == list(range(24, -1, -2))
    assert g6 == [24, 20, 16, 12, 8, 4, 0]
    assert g3 == [24, 16, 8, 0]
    # nesting: every coarser grid is a subset of the finer one
    assert set(g3) <= set(g6) <= set(g12) <= set(g)


def _tiny_model(horizon=8, cond_dim=3):
    model = TemporalUnet(
        state_dim=1, n_support_points=horizon, unet_input_dim=8,
        dim_mults=(1, 2), context_dim=cond_dim, conditioning_type="default",
    )
    x = jnp.zeros((2, horizon, 1))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, cond_dim)), jnp.zeros((2, 1)))
    return model, params


def test_student_sampler_matches_ddim_sample():
    """The affine-coef sampler must reproduce GaussianDiffusion.ddim_sample
    (eta=0, w=0, same time grid, same initial noise)."""
    model, params = _tiny_model()
    schedule = make_schedule("exponential", 10)
    diffusion = GaussianDiffusion(schedule=schedule, clip_denoised=False)
    ctx = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
    key = jax.random.PRNGKey(42)

    # ddim_sample's grid for K=3: linspace(0, 9, 4) = [0, 3, 6, 9]
    ref = diffusion.ddim_sample(
        lambda x, t, c, m: model.apply(params, x, t, c, m),
        (4, 8, 1), key, context=ctx, sampling_timesteps=3, eta=0.0, w=0.0,
    )
    times = [9, 6, 3, 0]
    sampler = make_student_ddim_sampler(schedule, model.apply, times,
                                        clip_denoised=False)
    k_init, _ = jax.random.split(key)  # ddim_sample's internal init split
    out = sampler(params, ctx, k_init, (4, 8, 1))
    # untrained eps + exponential schedule blow values up to ~1e6, so the
    # meaningful bound is relative
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_ddim_chain_matches_scan():
    from mpc_via_diffusion_model_tpu.ops.fused_denoise import make_fused_ddim_chain

    model, params = _tiny_model()
    schedule = make_schedule("exponential", 10)
    times = [9, 6, 3, 0]
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 3), jnp.float32)
    key = jax.random.PRNGKey(7)

    for clip in (True, False):
        sampler = make_student_ddim_sampler(schedule, model.apply, times,
                                            clip_denoised=clip)
        ref = sampler(params, ctx, key, (2, 8, 1))
        fused = make_fused_ddim_chain(model, params, schedule, times,
                                      n_samples=2, clip_denoised=clip,
                                      interpret=True)
        out = fused(ctx, key)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_pair_tables_grid_parity():
    """Even-length teacher grids keep BOTH teacher sub-steps in the last
    pair (mid = tt[-1], b != identity); odd-length grids use the single
    final recon (identity second sub-step)."""
    from mpc_via_diffusion_model_tpu.diffusion.distillation import distill_pair_tables

    schedule = make_schedule("exponential", 10)
    # even: [7..0] -> ts [7,5,3,1]; last pair must be the true (1 -> 0 -> -1)
    T = distill_pair_tables(schedule, list(range(7, -1, -1)))
    assert int(T["mid"][-1]) == 0
    # second sub-step (0 -> -1) is the pure recon (c1=1, c2=0), NOT identity
    np.testing.assert_allclose(float(T["b_c1"][-1]), 1.0)
    np.testing.assert_allclose(float(T["b_c2"][-1]), 0.0)
    # odd: [8..0] -> ts [8,6,4,2,0]; last pair is the single (0 -> -1) recon,
    # second sub-step is the identity (its teacher eval is unused)
    T = distill_pair_tables(schedule, list(range(8, -1, -1)))
    np.testing.assert_allclose(float(T["a_c1"][-1]), 1.0)
    np.testing.assert_allclose(float(T["a_c2"][-1]), 0.0)
    np.testing.assert_allclose(float(T["b_c1"][-1]), 0.0)
    np.testing.assert_allclose(float(T["b_c2"][-1]), 1.0)


def test_time_grid_t_start_skips_degenerate_endpoint():
    g = ddim_time_grid(25, t_start=23)
    assert g[0] == 23 and g[-1] == 0 and len(g) == 24
    # the distill grids halve cleanly down to a 3-eval student
    assert halve_times(halve_times(halve_times(g))) == [23, 15, 7]


def test_distill_round_learns():
    """A tiny distillation round: loss is finite, the student moves, and the
    distill loss drops vs its starting value."""
    model, params = _tiny_model()
    schedule = make_schedule("exponential", 10)
    teacher_times = [9, 6, 3, 0]

    optimizer = make_optimizer(lr=1e-3)
    step_fn, student_times = make_distill_step(
        schedule, model.apply, optimizer, params, teacher_times,
        w=0.1, teacher_cfg=True, step_start_ema=5, update_ema_every=1,
    )
    assert student_times == [9, 3]

    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(32, 8, 1), jnp.float32).clip(-1, 1)
    ctx = jnp.asarray(rng.randn(32, 3), jnp.float32)

    state = TrainState(
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
        step=jnp.int32(0),
    )
    step_jit = jax.jit(step_fn)
    losses = []
    key = jax.random.PRNGKey(9)
    for i in range(60):
        key, k = jax.random.split(key)
        state, metrics = step_jit(state, x0, ctx, k)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # student params actually moved
    p0 = jax.tree_util.tree_leaves(params)[0]
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.max(jnp.abs(p1 - p0))) > 0


def test_affine_coefs_final_step_is_recon():
    schedule = make_schedule("exponential", 10)
    C = ddim_affine_coefs(schedule, [9, 0])
    # final pair (0, -1): x <- recon exactly
    assert C["c1"][-1] == 1.0 and C["c2"][-1] == 0.0
    # student C1 coefficients are safely away from zero (divide-by-C1 in the
    # distill target stays conditioned)
    assert np.all(np.abs(C["c1"][:-1]) > 1e-3)


def test_distill_guide_hook_gating():
    """The guided-distillation hook (VERDICT r2 #3): a guide_fn shifts the
    teacher targets (loss differs from unguided), gating with
    t_start_guide=-1 disables every sub-step (loss identical to unguided),
    and the guided loss stays finite."""
    model, params = _tiny_model()
    schedule = make_schedule("exponential", 10)
    # skip the degenerate abar~1e-12 endpoint (ddim_time_grid's t_start
    # rationale): at t=9 the teacher recon clip saturates for every element
    # and a post-step guide delta would be invisible to the target
    teacher_times = list(range(8, -1, -1))
    optimizer = make_optimizer(lr=1e-3)

    def guide(x_batch, ctx_batch):
        # deterministic nonzero delta, a stand-in for the obstacle gradient
        return 0.05 * jnp.tanh(x_batch) * (1.0 + 0.0 * ctx_batch.sum())

    mk = lambda **kw: make_distill_step(
        schedule, model.apply, optimizer, params, teacher_times,
        w=0.1, teacher_cfg=True, **kw)[0]
    step_plain = jax.jit(mk())
    step_guided = jax.jit(mk(guide_fn=guide, t_start_guide=float("inf")))
    step_gated_off = jax.jit(mk(guide_fn=guide, t_start_guide=-1.0))

    rng = np.random.RandomState(5)
    x0 = jnp.asarray(rng.randn(16, 8, 1), jnp.float32).clip(-1, 1)
    ctx = jnp.asarray(rng.randn(16, 3), jnp.float32)
    state = TrainState(
        params=params, ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params), step=jnp.int32(0))
    key = jax.random.PRNGKey(4)

    _, m_plain = step_plain(state, x0, ctx, key)
    _, m_guided = step_guided(state, x0, ctx, key)
    _, m_off = step_gated_off(state, x0, ctx, key)
    l_plain, l_guided, l_off = (float(m["loss"]) for m in (m_plain, m_guided, m_off))
    assert np.isfinite(l_guided)
    assert abs(l_off - l_plain) < 1e-6, "t_start_guide=-1 must be a no-op"
    assert abs(l_guided - l_plain) > 1e-6, "guide must shift the targets"


def test_distill_to_single_eval_grid():
    """The deep end of progressive distillation: grids [9,6,3] -> [9,3] ->
    [9] stay well-formed (pair tables, coefs) and a ONE-eval student's
    sampler runs a single U-Net pass straight to the final recon — the
    machinery behind scripts/distill_flagship.py --init-student."""
    model, params = _tiny_model()
    schedule = make_schedule("exponential", 10)

    # 3-eval -> 2-eval round
    optimizer = make_optimizer(lr=1e-3)
    step_fn, times2 = make_distill_step(
        schedule, model.apply, optimizer, params, [9, 6, 3], w=0.0,
        teacher_cfg=False,
    )
    assert times2 == [9, 3]
    # 2-eval -> 1-eval round
    step_fn1, times1 = make_distill_step(
        schedule, model.apply, optimizer, params, times2, w=0.0,
        teacher_cfg=False,
    )
    assert times1 == [9]

    # both rounds' steps run and produce finite losses
    rng = np.random.RandomState(7)
    x0 = jnp.asarray(rng.randn(16, 8, 1), jnp.float32).clip(-1, 1)
    ctx = jnp.asarray(rng.randn(16, 3), jnp.float32)
    for fn in (step_fn, step_fn1):
        state = TrainState(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=optimizer.init(params),
            step=jnp.int32(0),
        )
        _, metrics = jax.jit(fn)(state, x0, ctx, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    # the 1-eval sampler: one pass, lands on a clipped final recon
    sampler = make_student_ddim_sampler(schedule, model.apply, times1)
    out = sampler(params, ctx[:2], jax.random.PRNGKey(2), (2, 8, 1))
    assert out.shape == (2, 8, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


def test_student_sampler_fixed_init_mode_consistency():
    """x_init pins the DDIM chain's only stochasticity: same init -> same
    output (the amortization property, scripts/amortize_flagship.py); a
    different init changes the output; omitted init draws from the key."""
    model, params = _tiny_model()
    schedule = make_schedule("exponential", 10)
    sampler = make_student_ddim_sampler(schedule, model.apply, [9, 5, 2])
    ctx = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
    eps0 = jax.random.normal(jax.random.PRNGKey(42), (1, 8, 1))

    a = sampler(params, ctx, jax.random.PRNGKey(1), (4, 8, 1), x_init=eps0)
    b = sampler(params, ctx, jax.random.PRNGKey(2), (4, 8, 1), x_init=eps0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # key ignored

    c = sampler(params, ctx, jax.random.PRNGKey(1), (4, 8, 1),
                x_init=eps0 + 1.0)
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6

    d = sampler(params, ctx, jax.random.PRNGKey(1), (4, 8, 1))
    e = sampler(params, ctx, jax.random.PRNGKey(1), (4, 8, 1))
    np.testing.assert_allclose(np.asarray(d), np.asarray(e))
