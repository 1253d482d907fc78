"""Whole-episode fused kernel vs the per-replan closed loop (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.data.normalization import fit_normalizer
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.dynamics import pendulum, pendulum_cost
from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.control import make_closed_loop
from mpc_via_diffusion_model_tpu.ops.fused_denoise import (
    make_fused_cfg_chain, make_fused_ddim_chain)
from mpc_via_diffusion_model_tpu.ops.fused_episode import (
    make_fused_cfg_episode, make_fused_ddim_episode)


def _setup(cfg_indicator=True):
    plant = pendulum(dt=0.05)
    cost = pendulum_cost()
    horizon = 8
    model = TemporalUnet(state_dim=1, n_support_points=horizon, unet_input_dim=8,
                         dim_mults=(1, 2), context_dim=plant.state_dim,
                         conditioning_type="default", cfg_indicator=cfg_indicator)
    x = jnp.zeros((1, horizon, 1))
    args = [x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, plant.state_dim))]
    if cfg_indicator:
        args.append(jnp.zeros((1, 1)))
    params = model.init(jax.random.PRNGKey(0), *args)
    schedule = make_schedule("exponential", 10)
    rng = np.random.RandomState(0)
    in_stats = fit_normalizer(rng.randn(64, horizon, 1).astype(np.float32) * 2.0)
    c_stats = fit_normalizer(rng.randn(64, plant.state_dim).astype(np.float32))
    return plant, cost, horizon, model, params, schedule, in_stats, c_stats


def test_episode_matches_per_replan_loop():
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9, 6, 3, 0]
    n_steps = 5

    chain = make_fused_ddim_chain(model, params, schedule, times, n_samples=1,
                                  interpret=True)
    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, sample_override=chain)

    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, interpret=True)

    x0 = jnp.array([2.5, 0.0])
    key = jax.random.PRNGKey(3)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)

    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref.stage_costs),
                               rtol=1e-4, atol=1e-4)


def test_cfg_episode_matches_per_replan_loop():
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    n_steps = 4
    w, n_tail = 0.01, 2

    chain = make_fused_cfg_chain(model, params, schedule, n_samples=1, w=w,
                                 n_diffusion_steps_without_noise=n_tail,
                                 interpret=True)
    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, w=w,
        n_diffusion_steps_without_noise=n_tail, sample_override=chain)

    episode = make_fused_cfg_episode(
        model, params, schedule, in_stats, c_stats, plant, cost,
        n_steps=n_steps, w=w, n_diffusion_steps_without_noise=n_tail,
        interpret=True)

    x0 = jnp.array([1.5, -0.3])
    key = jax.random.PRNGKey(11)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)

    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref.stage_costs),
                               rtol=1e-4, atol=1e-4)


def test_episode_bf16_weights_close_to_fp32():
    """bf16 VMEM weights (the production choice for >=128-row configs) keep
    the episode trajectory close to fp32 — same structure, bf16-level
    tolerance."""
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9, 4, 0]
    kw = dict(n_steps=4, interpret=True)
    ep32 = make_fused_ddim_episode(model, params, schedule, times, in_stats,
                                   c_stats, plant, cost, **kw)
    ep16 = make_fused_ddim_episode(model, params, schedule, times, in_stats,
                                   c_stats, plant, cost,
                                   weights_dtype=jnp.bfloat16, **kw)
    x0 = jnp.array([2.0, 0.1])
    key = jax.random.PRNGKey(5)
    x32, u32, _ = ep32(x0, key)
    x16, u16, _ = ep16(x0, key)
    assert np.all(np.isfinite(np.asarray(x16)))
    np.testing.assert_allclose(np.asarray(u16), np.asarray(u32), atol=0.15)
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x32), atol=0.3)


def test_cfg_episode_state_to_condition():
    """A non-identity state->condition map (the panda FK-context pattern)
    traced in-kernel matches the XLA loop's state_to_condition path."""
    plant = pendulum(dt=0.05)
    cost = pendulum_cost()
    horizon = 8

    def to_cond(x):  # (2,) -> (3,): a feature map like the 20-dim panda ctx
        return jnp.array([jnp.sin(x[0]), jnp.cos(x[0]), x[1]])

    model = TemporalUnet(state_dim=1, n_support_points=horizon, unet_input_dim=8,
                         dim_mults=(1, 2), context_dim=3,
                         conditioning_type="default", cfg_indicator=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, horizon, 1)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3)),
                        jnp.zeros((1, 1)))
    schedule = make_schedule("exponential", 10)
    rng = np.random.RandomState(0)
    in_stats = fit_normalizer(rng.randn(64, horizon, 1).astype(np.float32) * 2.0)
    c_stats = fit_normalizer(rng.randn(64, 3).astype(np.float32))

    n_steps, w, n_tail = 4, 0.01, 2
    chain = make_fused_cfg_chain(model, params, schedule, n_samples=1, w=w,
                                 n_diffusion_steps_without_noise=n_tail,
                                 interpret=True)
    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, w=w,
        n_diffusion_steps_without_noise=n_tail, sample_override=chain,
        state_to_condition=to_cond)
    episode = make_fused_cfg_episode(
        model, params, schedule, in_stats, c_stats, plant, cost,
        n_steps=n_steps, w=w, n_diffusion_steps_without_noise=n_tail,
        interpret=True, state_to_condition=to_cond)

    x0 = jnp.array([1.2, 0.4])
    key = jax.random.PRNGKey(21)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)
    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)


def test_episode_no_cfg_indicator():
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup(
        cfg_indicator=False)
    times = [9, 4, 0]
    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=3, interpret=True)
    xtr, utr, costs = episode(jnp.array([1.0, -0.5]), jax.random.PRNGKey(1))
    assert xtr.shape == (4, 2) and utr.shape == (3, 1) and costs.shape == (3,)
    assert np.all(np.isfinite(np.asarray(xtr)))


def test_episode_single_eval_grid():
    """The deep-distillation endpoint: a ONE-eval student (times=[9]) runs
    the whole episode kernel and matches the per-replan XLA loop — the
    config scripts/distill_flagship.py --init-student produces and
    scripts/bench_deep_students.py benches."""
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9]
    n_steps = 4

    chain = make_fused_ddim_chain(model, params, schedule, times, n_samples=1,
                                  interpret=True)
    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, sample_override=chain)

    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, interpret=True)

    x0 = jnp.array([2.5, 0.0])
    key = jax.random.PRNGKey(7)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)

    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref.stage_costs),
                               rtol=1e-4, atol=1e-4)


def test_episode_best_of_k_matches_runtime():
    """In-kernel best-of-K selection must replay the runtime's horizon_cost
    scoring and first-min argmin exactly (control/runtime.py:144-156): the
    K=4 episode kernel vs make_closed_loop(n_candidates=4) with the chain
    kernel as the sampler, same key."""
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9, 6, 3, 0]
    n_steps, K = 5, 4

    chain = make_fused_ddim_chain(model, params, schedule, times, n_samples=K,
                                  interpret=True)
    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, n_candidates=K,
        sample_override=chain)

    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, n_candidates=K, interpret=True)

    x0 = jnp.array([2.5, 0.0])
    key = jax.random.PRNGKey(3)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)

    # selection is discrete: a flipped argmin would diverge the tracks, so
    # the tight tolerances also assert the argmins agree at every replan
    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref.stage_costs),
                               rtol=1e-4, atol=1e-4)


def test_cfg_episode_best_of_k_matches_runtime():
    """CFG episode kernel with in-kernel best-of-K (round 4): K candidates
    denoise as 2K groups in the doubled CFG batch; selection must replay
    the runtime's horizon_cost + first-min argmin exactly. Reference is the
    PURE-XLA runtime path (no sample_override) — same ddpm_cfg_sample noise
    layout, per-replan key split, and candidate ordering."""
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    n_steps, K = 4, 3
    w, n_tail = 0.01, 2

    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, w=w,
        n_diffusion_steps_without_noise=n_tail, n_candidates=K)

    episode = make_fused_cfg_episode(
        model, params, schedule, in_stats, c_stats, plant, cost,
        n_steps=n_steps, w=w, n_diffusion_steps_without_noise=n_tail,
        n_candidates=K, interpret=True)

    x0 = jnp.array([2.5, 0.0])
    key = jax.random.PRNGKey(5)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)

    # discrete selection: tight tolerances also assert every argmin agrees
    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref.stage_costs),
                               rtol=1e-4, atol=1e-4)


def test_episode_selection_cost_decouples_from_stage_cost():
    """Kernel selection_cost != task cost (the quadrotor safety-first
    protocol, scripts/quadrotor_task.py::make_select_cost): tracks must match
    the XLA loop GIVEN the selection cost, while reported stage_costs stay
    the task quadratic. The selection cost's control-hinge (prefer u near
    +3 where the task prefers small |u|) reorders the candidates, so passing
    also proves the kernel scores with the selection cost (not the task
    cost) — the degeneracy assert at the end pins the reordering."""
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9, 6, 3, 0]
    n_steps, K = 5, 4

    class SelectCost:
        @staticmethod
        def stage(x, u):
            pull = u[0] - 3.0
            return cost.stage(x, u) + 30.0 * pull * pull

        @staticmethod
        def terminal(x):
            return cost.terminal(x)

    chain = make_fused_ddim_chain(model, params, schedule, times, n_samples=K,
                                  interpret=True)
    diffusion = GaussianDiffusion(schedule=schedule)
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, SelectCost(),
        horizon=horizon, n_steps=n_steps, n_candidates=K,
        sample_override=chain)

    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, n_candidates=K, selection_cost=SelectCost(),
        interpret=True)

    x0 = jnp.array([2.5, 0.0])
    key = jax.random.PRNGKey(3)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)

    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    # the loop reports SelectCost stages; the kernel must report the TASK
    # quadratic on the same (x, u) track
    task_stages = jax.vmap(cost.stage)(ref.x_track[:-1], ref.u_track)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(task_stages),
                               rtol=1e-4, atol=1e-4)
    # and the selection hinge must actually have flipped at least one argmin
    # vs task-cost selection, else this test degenerates to the one above
    loop_task = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, n_candidates=K,
        sample_override=chain)
    ref_task = loop_task(params, x0, key)
    assert not np.allclose(np.asarray(ref.u_track),
                           np.asarray(ref_task.u_track))


def test_bits_to_normal_distribution():
    # the pure Box-Muller math behind inkernel_noise, fed host-generated
    # uint32 bits (pltpu.prng_* has no CPU lowering); N(0,1) moments +
    # quantiles to tolerances a 2^20 sample pins tightly
    from mpc_via_diffusion_model_tpu.ops.fused_episode import _bits_to_normal

    rng = np.random.RandomState(7)
    n = 1 << 20
    b1 = jnp.asarray(rng.randint(0, 2 ** 32, size=(n,), dtype=np.uint64)
                     .astype(np.uint32))
    b2 = jnp.asarray(rng.randint(0, 2 ** 32, size=(n,), dtype=np.uint64)
                     .astype(np.uint32))
    z = np.asarray(_bits_to_normal(b1, b2))
    assert np.all(np.isfinite(z))
    assert abs(z.mean()) < 5e-3
    assert abs(z.std() - 1.0) < 5e-3
    # standard normal quantiles: |z| < 1.96 covers 95%, < 2.58 covers 99%
    assert abs((np.abs(z) < 1.96).mean() - 0.95) < 2e-3
    assert abs((np.abs(z) < 2.58).mean() - 0.99) < 1e-3
    # skew ~ 0, excess kurtosis ~ 0
    assert abs((z ** 3).mean()) < 2e-2
    assert abs((z ** 4).mean() - 3.0) < 5e-2


def test_key_to_seeds_distinct():
    from mpc_via_diffusion_model_tpu.ops.fused_episode import _key_to_seeds

    s0 = np.asarray(_key_to_seeds(jax.random.PRNGKey(0)))
    s0b = np.asarray(_key_to_seeds(jax.random.PRNGKey(0)))
    s1 = np.asarray(_key_to_seeds(jax.random.PRNGKey(1)))
    assert s0.shape == (2,) and s0.dtype == np.int32
    np.testing.assert_array_equal(s0, s0b)
    assert not np.array_equal(s0, s1)


def test_inkernel_noise_episode_traces():
    # no CPU lowering for the hardware PRNG, but the kernel must TRACE with
    # the seed plumbing (shapes/specs correct) — eval_shape stops before
    # lowering; the real-TPU behavior is measured by the serving benches
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9, 6, 3, 0]
    for K in (1, 4):
        episode = make_fused_ddim_episode(
            model, params, schedule, times, in_stats, c_stats, plant, cost,
            n_steps=5, n_candidates=K, inkernel_noise=True)
        out = jax.eval_shape(episode, jnp.zeros((2,)), jax.random.PRNGKey(0))
        assert out[0].shape == (6, 2) and out[1].shape == (5, 1)
    diffusion = GaussianDiffusion(schedule=schedule)
    del diffusion
    cfg_episode = make_fused_cfg_episode(
        model, params, schedule, in_stats, c_stats, plant, cost,
        n_steps=5, n_candidates=4, inkernel_noise=True)
    out = jax.eval_shape(cfg_episode, jnp.zeros((2,)), jax.random.PRNGKey(0))
    assert out[0].shape == (6, 2)


def test_panda_episode_kernel_matches_loop_interpret():
    """Round 5: the whole-EPISODE kernel on the ARTICULATED plant —
    `panda_rbd_unrolled` (python-unrolled RNE + unrolled Cholesky) traces
    into the kernel where the scan/linalg plant could not, with the FK
    context map in-kernel. Bit-parity vs the XLA loop in interpret mode."""
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler)
    from mpc_via_diffusion_model_tpu.dynamics import (
        make_panda_context, panda_cost, panda_rbd_unrolled)

    plant = panda_rbd_unrolled()
    cost = panda_cost()
    to_cond = make_panda_context()
    horizon = 16
    model = TemporalUnet(state_dim=7, n_support_points=horizon,
                         unet_input_dim=8, dim_mults=(1, 2), context_dim=20,
                         conditioning_type="default", cfg_indicator=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, horizon, 7)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 20)),
                        jnp.zeros((1, 1)))
    schedule = make_schedule("exponential", 10)
    rng = np.random.RandomState(3)
    in_stats = fit_normalizer(rng.randn(64, horizon, 7).astype(np.float32) * 3.0)
    c_stats = fit_normalizer(rng.randn(64, 20).astype(np.float32) * 2.0)

    times = [9, 4]
    n_steps = 4
    diffusion = GaussianDiffusion(schedule=schedule)
    sampler = make_student_ddim_sampler(schedule, model.apply, times)
    chain = lambda ctx, key: sampler(params, ctx, key, (1, horizon, 7))
    loop = make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, sample_override=chain,
        state_to_condition=to_cond)

    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, state_to_condition=to_cond, interpret=True)

    x0 = jnp.concatenate([jnp.full((7,), 0.2), jnp.zeros(7)])
    key = jax.random.PRNGKey(5)
    ref = loop(params, x0, key)
    xtr, utr, costs = episode(x0, key)
    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=2e-4, atol=2e-4)


def test_episode_selection_horizon_matches_runtime():
    """Round 5: truncated candidate scoring (`selection_horizon`) inside the
    kernel must match `make_closed_loop(selection_horizon=...)` exactly —
    incl. the no-terminal-on-truncation rule (runtime.py:164-166)."""
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    plant, cost, horizon, model, params, schedule, in_stats, c_stats = _setup()
    times = [9, 6, 3, 0]
    n_steps, K, sel_h = 5, 4, 3
    diffusion = GaussianDiffusion(schedule=schedule)
    chain = make_fused_ddim_chain(model, params, schedule, times, n_samples=K,
                                  interpret=True)
    # jitted: unjitted tracing hits a jax-internal closed_call
    # lowering-cache KeyError when the pallas chain + truncated-slice
    # combination lowers twice in one trace (jit avoids the buggy path)
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, n_candidates=K,
        sample_override=chain, selection_horizon=sel_h))
    episode = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, n_candidates=K, selection_horizon=sel_h,
        interpret=True)
    x0 = jnp.array([2.5, 0.0])
    key = jax.random.PRNGKey(3)
    ref = loop(params, x0, key)
    xtr, utr, _ = episode(x0, key)
    np.testing.assert_allclose(np.asarray(xtr), np.asarray(ref.x_track),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(utr), np.asarray(ref.u_track),
                               rtol=1e-4, atol=1e-4)
    # truncation must actually be able to change selections (else this test
    # degenerates to the full-horizon parity test): search a few keys at
    # the most aggressive truncation for a flipped argmin, checking kernel
    # parity at every tried key
    loop_full = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, n_candidates=K,
        sample_override=chain))
    loop_h1 = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, n_candidates=K,
        sample_override=chain, selection_horizon=1))
    episode_h1 = make_fused_ddim_episode(
        model, params, schedule, times, in_stats, c_stats, plant, cost,
        n_steps=n_steps, n_candidates=K, selection_horizon=1,
        interpret=True)
    flipped = False
    for seed in range(6):
        k = jax.random.PRNGKey(seed)
        r1 = loop_h1(params, x0, k)
        rf = loop_full(params, x0, k)
        _, uk, _ = episode_h1(x0, k)
        np.testing.assert_allclose(np.asarray(uk), np.asarray(r1.u_track),
                                   rtol=1e-4, atol=1e-4)
        if not np.allclose(np.asarray(r1.u_track), np.asarray(rf.u_track)):
            flipped = True
            break
    assert flipped, "sel_h=1 never flipped a selection across 6 keys"
