"""Denoiser model shapes, parameter counts, and CFG-mask semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_via_diffusion_model_tpu.models import AMPCNet, PointUnet, TemporalUnet, UNET_DIM_MULTS


def _n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


@pytest.fixture(scope="module")
def flagship():
    """The production cart-pole config: horizon 32, 1 channel, cond 5,
    dims 32->64->128 (BASELINE.md 'Denoiser size')."""
    model = TemporalUnet(
        state_dim=1,
        n_support_points=32,
        unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0],
        context_dim=5,
        conditioning_type="default",
    )
    x = jnp.zeros((2, 32, 1))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 5))
    mask = jnp.zeros((2, 1))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, mask)
    return model, params


def test_flagship_shape_and_param_count(flagship):
    model, params = flagship
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 1))
    t = jnp.array([0, 5, 12, 24])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 5))
    mask = jnp.zeros((4, 1))
    out = model.apply(params, x, t, ctx, mask)
    assert out.shape == (4, 32, 1)
    assert np.all(np.isfinite(out))
    # reference checkpoint: ~1.00 M params (BASELINE.md); ours must match the
    # same architecture within a few percent (init-scheme params identical).
    n = _n_params(params)
    assert 0.9e6 < n < 1.1e6, n


def test_context_mask_drops_context(flagship):
    """mask==1 must equal passing a zero context (reference
    temporal_unet.py:296-300)."""
    model, params = flagship
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 1))
    t = jnp.array([3, 3])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 5))
    out_masked = model.apply(params, x, t, ctx, jnp.ones((2, 1)))
    out_zero_ctx = model.apply(params, x, t, jnp.zeros_like(ctx), jnp.zeros((2, 1)))
    np.testing.assert_allclose(out_masked, out_zero_ctx, rtol=1e-6, atol=1e-6)
    # and differs from the conditioned output
    out_cond = model.apply(params, x, t, ctx, jnp.zeros((2, 1)))
    assert float(jnp.max(jnp.abs(out_cond - out_masked))) > 1e-6


def test_horizon_must_divide_by_2_per_level(flagship):
    """Downsampling halves the horizon per level; horizon 128 (Panda) works
    with 3 levels."""
    model, params = flagship
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 128, 1))
    t = jnp.array([1])
    ctx = jnp.ones((1, 5))
    out = model.apply(params, x, t, ctx, jnp.zeros((1, 1)))
    assert out.shape == (1, 128, 1)


def test_four_level_unet():
    model = TemporalUnet(
        state_dim=2, n_support_points=64, dim_mults=UNET_DIM_MULTS[1],
        context_dim=4, conditioning_type="default",
    )
    x = jnp.zeros((2, 64, 2))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 4))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((2, 1)))
    out = model.apply(params, x, t, ctx, jnp.zeros((2, 1)))
    assert out.shape == (2, 64, 2)


def test_unconditional_unet():
    model = TemporalUnet(state_dim=2, n_support_points=16, conditioning_type=None)
    x = jnp.zeros((3, 16, 2))
    t = jnp.zeros((3,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (3, 16, 2)


def test_attention_conditioning():
    model = TemporalUnet(
        state_dim=2, n_support_points=16, context_dim=7, conditioning_type="attention",
    )
    x = jnp.zeros((2, 16, 2))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 7))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 2)


def test_concatenate_conditioning():
    model = TemporalUnet(
        state_dim=2, n_support_points=16, context_dim=12, conditioning_type="concatenate",
    )
    x = jnp.zeros((2, 16, 2))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 12))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 2)


def test_point_unet():
    model = PointUnet(state_dim=4, context_dim=4, conditioning_type="default")
    x = jnp.zeros((5, 1, 4))
    t = jnp.zeros((5,), jnp.int32)
    ctx = jnp.zeros((5, 4))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (5, 1, 4)


def test_ampc_net():
    model = AMPCNet(horizon=8, control_dim=1)
    x = jnp.zeros((6, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (6, 8, 1)
    # reference AMPCNet: 5->2->50->50->8 = 5*2+2 + 2*50+50 + 50*50+50 + 50*8+8
    n = _n_params(params)
    assert n == (5 * 2 + 2) + (2 * 50 + 50) + (50 * 50 + 50) + (50 * 8 + 8)


def test_unet_jit_and_grad(flagship):
    model, params = flagship
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 1))
    t = jnp.array([1, 2])
    ctx = jnp.ones((2, 5))
    mask = jnp.zeros((2, 1))

    @jax.jit
    def loss(p):
        out = model.apply(p, x, t, ctx, mask)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_score_mlp_and_likelihood():
    """Working score-model family (the reference's is dead code with a broken
    import, score_model_base.py:3)."""
    from mpc_via_diffusion_model_tpu.models import (
        ScoreMLP, ode_likelihood, score_matching_loss, ve_marginal_prob_std,
    )

    model = ScoreMLP(x_dim=2, hidden_dim=32, embed_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    t = jnp.full((8,), 0.5)
    params = model.init(jax.random.PRNGKey(1), x, t)
    s = model.apply(params, x, t)
    assert s.shape == (8, 2)
    assert float(ve_marginal_prob_std(jnp.float32(1.0))) == pytest.approx(50.0)

    loss = score_matching_loss(model.apply, params, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))

    z, logp = ode_likelihood(model.apply, params, x, jax.random.PRNGKey(3))
    assert z.shape == (8, 2) and logp.shape == (8,)
    assert np.all(np.isfinite(np.asarray(logp)))


def test_vn_equivariant_layers():
    """VNLinear commutes with rotations (SO(3) equivariance)."""
    from mpc_via_diffusion_model_tpu.models import VNLinear, VNLeakyReLU, knn, get_graph_feature

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3))  # (B, C, 3)
    layer = VNLinear(out_channels=6)
    params = layer.init(jax.random.PRNGKey(1), x)
    # rotation about z by 0.7 rad
    c, s = np.cos(0.7), np.sin(0.7)
    rot = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    out_then_rot = jnp.einsum("ij,bcj->bci", rot, layer.apply(params, x))
    rot_then_out = layer.apply(params, jnp.einsum("ij,bcj->bci", rot, x))
    np.testing.assert_allclose(np.asarray(out_then_rot), np.asarray(rot_then_out), rtol=1e-4, atol=1e-5)

    pts = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 10))  # (B, 3, N)
    idx = knn(pts, k=4)
    assert idx.shape == (2, 10, 4)
    feat = get_graph_feature(pts, k=4)
    assert feat.shape == (2, 2, 3, 10, 4)

    relu = VNLeakyReLU(in_channels=4)
    p2 = relu.init(jax.random.PRNGKey(3), x)
    out = relu.apply(p2, x)
    assert out.shape == x.shape


def test_extra_layers():
    """GaussianFourierProjection, ResnetBlockFC, SpatialSoftArgmax parity
    (reference layers.py:39-168; SpatialSoftArgmax checked with the same
    delta-peak assertion as the reference's __main__ block, layers.py:432-447)."""
    from mpc_via_diffusion_model_tpu.models import (
        GaussianFourierProjection, ResnetBlockFC, SpatialSoftArgmax,
    )

    gfp = GaussianFourierProjection(embed_dim=16)
    t = jnp.linspace(0, 1, 5)
    p = gfp.init(jax.random.PRNGKey(0), t)
    out = gfp.apply(p, t)
    assert out.shape == (5, 16)

    blk = ResnetBlockFC(size_out=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    pb = blk.init(jax.random.PRNGKey(2), x)
    assert blk.apply(pb, x).shape == (4, 8)

    # delta peaks recover their own coordinates (reference assert)
    b, c, h, w = 1, 3, 12, 12
    rng = np.random.RandomState(0)
    true_max = rng.randint(0, 12, size=(b, c, 2))
    img = np.zeros((b, c, h, w), np.float32)
    for i in range(b):
        for j in range(c):
            img[i, j, true_max[i, j, 0], true_max[i, j, 1]] = 1000.0
    ssa = SpatialSoftArgmax(normalize=False)
    ps = ssa.init(jax.random.PRNGKey(3), jnp.asarray(img))
    coords = np.asarray(ssa.apply(ps, jnp.asarray(img))).reshape(b, c, 2)
    np.testing.assert_allclose(coords, true_max.astype(np.float32), atol=1e-3)


def test_cfg_indicator_disambiguates_zero_context():
    """With cfg_indicator=True, a DROPPED context must differ from a genuine
    all-zero context (with zero-masking alone they are identical, which makes
    near-origin conditioning collapse to the marginal — measured 49%%
    catastrophic sampling outliers on the LMPC workload)."""
    model = TemporalUnet(
        state_dim=1, n_support_points=8, unet_input_dim=8, dim_mults=(1, 2),
        context_dim=3, conditioning_type="default", cfg_indicator=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 1))
    t = jnp.array([2, 2])
    zero_ctx = jnp.zeros((2, 3))
    params = model.init(jax.random.PRNGKey(1), x, t, zero_ctx, jnp.zeros((2, 1)))
    out_given = model.apply(params, x, t, zero_ctx, jnp.zeros((2, 1)))  # genuine zero ctx
    out_dropped = model.apply(params, x, t, zero_ctx, jnp.ones((2, 1)))  # dropped
    assert float(jnp.max(jnp.abs(out_given - out_dropped))) > 1e-6


def test_context_and_sdf_score_models():
    """The reference's context/SDF score-model variants
    (mlp_score_model.py:79-220, dead code there): shapes, 1/sigma output
    scaling, finite grads, and the SDF hook actually conditioning."""
    import numpy as np
    from mpc_via_diffusion_model_tpu.models import (
        ContextScoreMLP, SDFScoreMLP, SharedFeatureSDFScoreMLP,
        ve_marginal_prob_std,
    )
    from mpc_via_diffusion_model_tpu.envs.planning2d import make_random_env

    b, H = 4, 6
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.uniform(0.1, 1.0, (b,)), jnp.float32)
    env_feat = jnp.asarray(rng.randn(b, 8), jnp.float32)
    task_feat = jnp.asarray(rng.randn(b, 4), jnp.float32)
    start = jnp.asarray(rng.randn(b, 2), jnp.float32)

    # ContextScoreMLP on a flat 2-D state
    m1 = ContextScoreMLP(x_dim=2, hidden_dim=32, embed_dim=16)
    x1 = jnp.asarray(rng.randn(b, 2), jnp.float32)
    p1 = m1.init(jax.random.PRNGKey(0), x1, t, env_feat, task_feat, start)
    s1 = m1.apply(p1, x1, t, env_feat, task_feat, start)
    assert s1.shape == (b, 2) and bool(jnp.all(jnp.isfinite(s1)))
    # output scales like 1/sigma(t): same net at larger t -> smaller |score|
    t_hi = jnp.ones_like(t)
    ratio = ve_marginal_prob_std(t) / ve_marginal_prob_std(t_hi)
    s1_hi = m1.apply(p1, x1, t_hi, env_feat, task_feat, start)
    assert float(jnp.mean(jnp.abs(s1_hi))) < float(jnp.mean(jnp.abs(s1)))

    # SDFScoreMLP over a real env SDF; use_sdf_value changes the output
    env = make_random_env(jax.random.PRNGKey(1))
    x2 = jnp.asarray(rng.randn(b, H * 2) * 0.3, jnp.float32)
    m2 = SDFScoreMLP(n_support_points=H, hidden_dim=32, embed_dim=16,
                     sdf_fn=env.sdf, use_sdf_value=True)
    p2 = m2.init(jax.random.PRNGKey(2), x2, t, env_feat, task_feat)
    s2 = m2.apply(p2, x2, t, env_feat, task_feat)
    assert s2.shape == (b, H * 2) and bool(jnp.all(jnp.isfinite(s2)))
    g2 = jax.grad(lambda xx: jnp.sum(jnp.square(
        m2.apply(p2, xx, t, env_feat, task_feat))))(x2)
    assert bool(jnp.all(jnp.isfinite(g2)))

    # SharedFeatureSDFScoreMLP: learned waypoint features as context
    m3 = SharedFeatureSDFScoreMLP(n_support_points=H, hidden_dim=32, embed_dim=16)
    p3 = m3.init(jax.random.PRNGKey(3), x2, t, task_feat, start)
    s3 = m3.apply(p3, x2, t, task_feat, start)
    assert s3.shape == (b, H * 2) and bool(jnp.all(jnp.isfinite(s3)))


def test_sdf_score_model_requires_sdf_fn():
    """Default-constructed SDFScoreMLP (use_sdf_value=True, sdf_fn=None) must
    fail with a clear message, not a NoneType call."""
    from mpc_via_diffusion_model_tpu.models import SDFScoreMLP

    m = SDFScoreMLP(n_support_points=6)
    with pytest.raises(ValueError, match="sdf_fn"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 12)),
               jnp.full((2,), 0.5), jnp.zeros((2, 8)), jnp.zeros((2, 4)))
