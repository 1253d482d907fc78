"""Motion-planning stack: SDF envs, guides, GPMP data gen, planner pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.data.trajectories import (
    TrajectoryDataset,
    generate_trajectories_gpmp,
)
from mpc_via_diffusion_model_tpu.diffusion import (
    GaussianDiffusion,
    collision_avoidance_guide,
    first_order_smoothness_guide,
    gp_prior_guide,
    last_point_guide,
    make_guide,
    multi_sphere_obstacle_guide,
    smoothness_finite_difference_guide,
    state_goal_guide,
    control_effort_guide,
    stochgpmp_guide,
)
from mpc_via_diffusion_model_tpu.envs import ENV_SIMPLE_2D, PlanningEnv2D, make_random_env
from mpc_via_diffusion_model_tpu.eval import get_best_index, planning_metrics
from mpc_via_diffusion_model_tpu.control import make_planner
from mpc_via_diffusion_model_tpu.models import TemporalUnet


# ------------------------------------------------------------------ #
# env / sdf
# ------------------------------------------------------------------ #

def test_sdf_circle_box_values():
    env = PlanningEnv2D(
        circles=jnp.array([[0.0, 0.0, 0.5]]),
        boxes=jnp.array([[3.0, 0.0, 0.5, 0.5]]),  # spans [2.5, 3.5] x [-0.5, 0.5]
    )
    # outside circle: distance to surface
    assert float(env.sdf(jnp.array([1.5, 0.0]))) == pytest.approx(1.0, abs=1e-5)
    # inside circle: negative
    assert float(env.sdf(jnp.array([0.0, 0.0]))) == pytest.approx(-0.5, abs=1e-5)
    # box: outside above, inside at center
    assert float(env.sdf(jnp.array([3.0, 1.0]))) == pytest.approx(0.5, abs=1e-5)
    assert float(env.sdf(jnp.array([3.0, 0.0]))) == pytest.approx(-0.5, abs=1e-5)
    # on the box boundary
    assert float(env.sdf(jnp.array([2.5, 0.0]))) == pytest.approx(0.0, abs=1e-5)


def test_sdf_batched_and_differentiable():
    env = ENV_SIMPLE_2D
    pts = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 2), minval=-1, maxval=1)
    d = env.sdf(pts)
    assert d.shape == (4, 16)
    g = jax.grad(lambda p: jnp.sum(env.compute_collision_cost(p)))(pts)
    assert g.shape == pts.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_random_free_points():
    env = ENV_SIMPLE_2D
    pts = env.random_free_points(jax.random.PRNGKey(1), 32)
    assert pts.shape == (32, 2)
    assert np.all(np.asarray(env.sdf(pts)) > 0)


# ------------------------------------------------------------------ #
# guides
# ------------------------------------------------------------------ #

def test_guide_manager_composition_and_endpoints():
    env = ENV_SIMPLE_2D
    guide = make_guide(
        [(collision_avoidance_guide(env), 1.0), (first_order_smoothness_guide(), 0.1)],
        clip_grad=True, clip_grad_rule="norm", max_grad_norm=1.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 2)) * 0.5
    g = guide(x)
    assert g.shape == x.shape
    # endpoints zeroed
    np.testing.assert_allclose(np.asarray(g)[:, 0, :], 0.0)
    np.testing.assert_allclose(np.asarray(g)[:, -1, :], 0.0)
    # norm clipped
    norms = np.linalg.norm(np.asarray(g).reshape(3, -1), axis=-1)
    assert np.all(norms <= 1.0 + 1e-5)


def test_individual_reward_fns_finite():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 4)) * 0.3
    x2 = x[..., :2]
    fns = [
        smoothness_finite_difference_guide()(x2),
        gp_prior_guide(dt=0.1)(x),  # needs even dim (q, qdot)
        state_goal_guide(jnp.zeros(2), idx=5)(x2),
        first_order_smoothness_guide()(x2),
        last_point_guide(jnp.zeros(2))(x2),
        multi_sphere_obstacle_guide(jnp.array([[0.0, 0.0]]), jnp.array([0.2]))(x2),
    ]
    for r in fns:
        assert r.shape == (2,)
        assert np.all(np.isfinite(np.asarray(r)))


def test_control_effort_guide_matches_reference_form():
    u = jnp.ones((2, 8, 1)) * 0.1
    g = control_effort_guide(scale=1e-7)(u)
    # 2*sum|u| = 1.6 > 1 -> clipped to 1 -> grad = -1e-7 everywhere
    np.testing.assert_allclose(np.asarray(g), -1e-7, rtol=1e-5)


def test_smoothness_guide_prefers_straight_lines():
    smooth_fn = first_order_smoothness_guide()
    t = jnp.linspace(0, 1, 16)[:, None]
    straight = (t * jnp.array([1.0, 1.0]))[None]
    wiggly = straight + 0.1 * jnp.sin(8 * jnp.pi * t)[None]
    assert float(smooth_fn(straight)[0]) > float(smooth_fn(wiggly)[0])


# ------------------------------------------------------------------ #
# data generation + dataset
# ------------------------------------------------------------------ #

@pytest.fixture(scope="module")
def traj_data():
    env = ENV_SIMPLE_2D
    trajs, valid = generate_trajectories_gpmp(
        env, jax.random.PRNGKey(0), n_tasks=6, n_trajs_per_task=4,
        horizon=32, n_opt_steps=200,
    )
    return env, trajs, valid


def test_gpmp_generation_mostly_valid(traj_data):
    env, trajs, valid = traj_data
    assert trajs.shape == (24, 32, 2)
    # most optimized trajectories should be collision-free
    assert float(jnp.mean(valid.astype(jnp.float32))) > 0.5
    # endpoints are preserved exactly (start/goal fixed during optimization)
    assert np.all(np.asarray(env.sdf(trajs[:, 0])) > 0)


def test_trajectory_dataset(traj_data):
    env, trajs, valid = traj_data
    ds = TrajectoryDataset.from_arrays(np.asarray(trajs[valid]), env=env)
    assert ds.state_dim == 2
    b_trajs, b_tasks = ds.batch(jax.random.PRNGKey(0), 8)
    assert b_trajs.shape == (8, 32, 2)
    assert b_tasks.shape == (8, 4)
    idx, values = ds.get_hard_conditions(trajs[0, 0], trajs[0, -1], n_samples=3)
    assert list(np.asarray(idx)) == [0, 31]
    assert values.shape == (3, 2, 2)
    back = ds.unnormalize_trajectories(ds.trajs_normalized)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ds.trajs), atol=1e-4)


def test_planning_metrics_and_best_index(traj_data):
    env, trajs, valid = traj_data
    m = planning_metrics(env, trajs)
    for k in ("success", "fraction_free", "collision_intensity",
              "path_length_mean", "smoothness_mean", "waypoint_variance"):
        assert np.isfinite(m[k]), k
    best = get_best_index(env, trajs)
    assert 0 <= best < trajs.shape[0]


# ------------------------------------------------------------------ #
# planner pipeline (tiny model, untrained: checks the plumbing)
# ------------------------------------------------------------------ #

def test_planner_pipeline(traj_data):
    env, trajs, valid = traj_data
    ds = TrajectoryDataset.from_arrays(np.asarray(trajs), env=env)
    model = TemporalUnet(
        state_dim=2, n_support_points=32, unet_input_dim=8, dim_mults=(1, 2),
        conditioning_type=None,
    )
    x = jnp.zeros((1, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))

    guide = make_guide(
        [(collision_avoidance_guide(env), 1.0)],
        unnormalize_fn=ds.unnormalize_trajectories,
        clip_grad=True, scale=0.1,
    )
    plan = make_planner(diffusion, model.apply, ds, n_samples=4,
                        n_diffusion_steps_without_noise=2,
                        n_post_diffusion_guide_steps=2)
    start, goal = ds.trajs[0, 0], ds.trajs[0, -1]
    result = plan(params, start, goal, jax.random.PRNGKey(3), guide=guide)
    assert result.trajs.shape == (4, 32, 2)
    # hard conditions pin start/goal after unnormalization
    np.testing.assert_allclose(
        result.trajs[:, 0, :], np.broadcast_to(np.asarray(start), (4, 2)), atol=1e-3
    )
    np.testing.assert_allclose(
        result.trajs[:, -1, :], np.broadcast_to(np.asarray(goal), (4, 2)), atol=1e-3
    )
    assert "fraction_free" in result.metrics


def test_quadrotor_obstacle_guidance():
    """BASELINE configs[4]: obstacle-avoidance cost guidance on the 12-state
    quadrotor — the guide gradient pushes sampled position trajectories away
    from sphere obstacles."""
    from mpc_via_diffusion_model_tpu.dynamics import obstacle_cost

    centers = jnp.array([[0.0, 0.0, 1.0]])
    radii = jnp.array([0.5])

    def reward(x):
        return -obstacle_cost(x, centers, radii)

    guide = make_guide([(reward, 1.0)], zero_endpoints=False, scale=0.05)
    # trajectory passing straight through the obstacle
    t = jnp.linspace(-1, 1, 16)
    traj = jnp.stack([t, jnp.zeros_like(t), jnp.ones_like(t)], axis=-1)[None]  # (1, 16, 3)
    traj = jnp.concatenate([traj, jnp.zeros((1, 16, 9))], axis=-1)  # pad to 12 states
    g = guide(traj)
    assert g.shape == traj.shape
    # gradient pushes the mid-trajectory position components away (nonzero)
    mid = np.asarray(g)[0, 8, :3]
    assert np.any(np.abs(mid) > 0)
    # applying a few guide steps reduces the obstacle cost
    c0 = float(obstacle_cost(traj, centers, radii)[0])
    x = traj
    for _ in range(20):
        x = x + guide(x)
    c1 = float(obstacle_cost(x, centers, radii)[0])
    assert c1 < c0


def test_obstacle_cost_single_matches_batched():
    """The Mosaic-kernel-safe unrolled hinge must equal the batched form
    exactly — it replaces obstacle_cost(x[None], ...) inside the fused
    episode kernel's candidate scorer (quadrotor_task.make_select_cost),
    whose rank-3 broadcast SIGABRTed the Mosaic compiler (round 4)."""
    from mpc_via_diffusion_model_tpu.dynamics import (
        obstacle_cost, obstacle_cost_single)

    rng = np.random.RandomState(0)
    centers = jnp.asarray(rng.randn(3, 3).astype(np.float32))
    radii = jnp.asarray([0.5, 0.8, 1.2], jnp.float32)
    for _ in range(5):
        x = jnp.asarray(rng.randn(12).astype(np.float32) * 1.5)
        a = obstacle_cost(x[None], centers, radii, weight=2e5)
        b = obstacle_cost_single(x, centers, radii, weight=2e5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_se3_orientation_goal_guide():
    """SE3 orientation-goal reward (reference GuideSE3OrientationGoal,
    guides.py:522-564): zero at a config whose EE rotation IS the target,
    negative elsewhere, and differentiable through the FK chain."""
    import jax
    from mpc_via_diffusion_model_tpu.diffusion import se3_orientation_goal_guide
    from mpc_via_diffusion_model_tpu.dynamics.arm import panda_link_transforms

    q0 = jnp.asarray(np.zeros(7), jnp.float32)
    rot_des = panda_link_transforms(q0)[-1][0]  # EE rotation at q0
    reward = se3_orientation_goal_guide(rot_des)

    x_goal = jnp.tile(q0, (2, 4, 1))  # (B=2, H=4, 7) all at the goal rotation
    r_goal = reward(x_goal)
    assert r_goal.shape == (2,)
    # arccos clip keeps a 1e-6 floor; "zero" means ~1e-3 per waypoint
    assert float(jnp.max(jnp.abs(r_goal))) < 0.05

    rng = np.random.RandomState(0)
    x_off = jnp.asarray(rng.uniform(-1, 1, (2, 4, 7)), jnp.float32)
    r_off = reward(x_off)
    assert bool(jnp.all(r_off < r_goal - 0.1)), "off-goal configs must score worse"

    g = jax.grad(lambda x: jnp.sum(reward(x)))(x_off)
    assert g.shape == x_off.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_stochgpmp_guide_one_step():
    """Sampling-based one-step GPMP guide (reference GuideStochGPMP,
    guides.py:630-752): derivative-free, moves toward higher reward,
    endpoint-protected, deterministic per input, jit-safe."""
    reward = lambda x: -jnp.sum(jnp.square(x), axis=(-1, -2))  # goal = origin
    guide = stochgpmp_guide(
        [(reward, 1.0)], jax.random.PRNGKey(3),
        num_samples=64, sigma=0.2, step_size=1.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 2)) * 1.5
    g = guide(x)
    assert g.shape == x.shape
    np.testing.assert_allclose(np.asarray(g)[:, 0, :], 0.0)
    np.testing.assert_allclose(np.asarray(g)[:, -1, :], 0.0)
    # the softmin step points toward the origin (reward increases)
    assert float(jnp.vdot(g[:, 1:-1], -x[:, 1:-1])) > 0
    # pure function of the input (counter-style RNG)
    np.testing.assert_allclose(np.asarray(guide(x)), np.asarray(g))
    # jit-compatible (no data-dependent python control flow)
    np.testing.assert_allclose(
        np.asarray(jax.jit(guide)(x)), np.asarray(g), atol=1e-6)
    # actually improves the reward when applied
    r0 = float(jnp.sum(reward(x)))
    r1 = float(jnp.sum(reward(x + g)))
    assert r1 > r0


def test_stochgpmp_guide_rejects_odd_num_samples():
    """num_samples is the exact reward-eval budget (antithetic pairs), so an
    odd count would silently evaluate a different number than requested."""
    reward = lambda x: -jnp.sum(jnp.square(x), axis=(-1, -2))
    for bad in (1, 15):
        with pytest.raises(ValueError):
            stochgpmp_guide([(reward, 1.0)], jax.random.PRNGKey(0),
                            num_samples=bad)


def test_min_clearance_jax_matches_numpy():
    """The jittable curation-filter clearance (scripts/quadrotor_task) must
    agree with the numpy eval-metric clearance — one scene, two callers."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from quadrotor_task import min_clearance, min_clearance_jax

    xt = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (5, 20, 12))) * 1.5
    got = np.asarray(jax.vmap(min_clearance_jax)(jnp.asarray(xt)))
    np.testing.assert_allclose(got, min_clearance(xt), rtol=1e-5)


def test_select_cost_safety_first_ordering():
    """make_select_cost must flip the candidate ranking that make_task_cost
    gets wrong: a grazing track (inside the 0.15 m margin shell but NOT
    penetrating, so the task cost's hinge is zero) must lose to a clear
    detour track even when the detour's hover quadratic is worse — the
    measured failure behind safety-first best-of-K selection
    (scripts/study_quadrotor_candidates.py)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from quadrotor_task import (
        HOVER_THRUST, OBS_CENTERS, OBS_RADII, make_select_cost, make_task_cost,
    )

    from mpc_via_diffusion_model_tpu.dynamics import get_plant

    _, quad_cost = get_plant("quadrotor")
    task, select = make_task_cost(quad_cost), make_select_cost(quad_cost)

    u_hover = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0])
    center, radius = OBS_CENTERS[0], float(OBS_RADII[0])  # (1.5, 0, 1), r=0.45

    def track_cost(cost, offsets):
        """Sum stage costs over states hovering at center + offset points."""
        total = jnp.float32(0.0)
        for off in offsets:
            x = jnp.zeros((12,)).at[0:3].set(jnp.asarray(center) + jnp.asarray(off))
            total = total + cost.stage(x, u_hover)
        return float(total)

    # grazing: clearance +0.05 (inside margin shell, hinge-free for task cost)
    graze = [(0.0, 0.0, radius + 0.05)] * 4
    # detour: clearance +0.30 (outside shell) but farther from the origin goal
    detour = [(0.0, 0.0, radius + 0.30)] * 4

    # the hover quadratic alone prefers the grazing track (closer to origin)
    assert track_cost(task, graze) < track_cost(task, detour)
    # safety-first selection prefers the clear detour
    assert track_cost(select, graze) > track_cost(select, detour)


def test_sample_scenes_respects_corridor_constraints():
    """Scene randomization (scripts/quadrotor_task.sample_scenes) must keep
    the eval-start box (x >= 2.2) and the goal (origin) clear for EVERY
    drawn scene — otherwise scene-conditioned evals would contain unsolvable
    (start-in-collision / goal-in-collision) episodes."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from quadrotor_task import sample_scenes, scene_features

    centers, radii = sample_scenes(2000, seed=3)
    assert centers.shape == (2000, 3, 3) and radii.shape == (2000, 3)
    # start box clear: max obstacle extent along +x below the 2.2 start wall
    assert float((centers[..., 0] + radii).max()) <= 2.1 + 1e-5
    # goal clear: no sphere within 0.3 of the origin
    margins = np.linalg.norm(centers, axis=-1) - radii
    assert float(margins.min()) >= 0.3 - 1e-5
    # canonical scene is in-support of the perturbation ranges
    from quadrotor_task import OBS_CENTERS, OBS_RADII
    lo_c, hi_c = centers.min(axis=0), centers.max(axis=0)
    assert np.all(OBS_CENTERS >= lo_c - 1e-6) and np.all(OBS_CENTERS <= hi_c + 1e-6)
    assert np.all(OBS_RADII >= radii.min(axis=0)) and np.all(OBS_RADII <= radii.max(axis=0))
    # feature flattening: batched == per-scene
    f = np.asarray(scene_features(centers, radii))
    assert f.shape == (2000, 12)
    np.testing.assert_allclose(
        f[7], np.asarray(scene_features(centers[7], radii[7])), rtol=1e-6)


def test_widen_film_params_warm_start():
    """Context widening surgery (scripts/scene_conditioned_quadrotor.py::
    widen_film_params): the widened model with zeroed new context dims must
    compute EXACTLY the original model's function."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from scene_conditioned_quadrotor import widen_film_params

    from mpc_via_diffusion_model_tpu.models import TemporalUnet

    H = 8
    mk = lambda ctx: TemporalUnet(state_dim=2, n_support_points=H,
                                  unet_input_dim=8, dim_mults=(1, 2),
                                  context_dim=ctx, conditioning_type="default",
                                  cfg_indicator=True)
    m3, m5 = mk(3), mk(5)
    x = jnp.ones((2, H, 2)) * 0.3
    t = jnp.array([1, 7])
    args3 = [x, t, jnp.ones((2, 3)) * 0.2, jnp.zeros((2, 1))]
    p3 = m3.init(jax.random.PRNGKey(0), *args3)
    p5_init = m5.init(jax.random.PRNGKey(1), x, t, jnp.zeros((2, 5)),
                      jnp.zeros((2, 1)))
    p5 = widen_film_params(p3, p5_init, 3, 5, cfg_indicator=True)

    ctx5 = jnp.concatenate([args3[2], jnp.zeros((2, 2))], axis=1)
    o3 = m3.apply(p3, *args3)
    o5 = m5.apply(p5, x, t, ctx5, jnp.zeros((2, 1)))
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o5), atol=1e-6)
    # at init the output is INVARIANT to the new dims (zero rows)...
    o5b = m5.apply(p5, x, t, ctx5.at[:, 3].set(1.0), jnp.zeros((2, 1)))
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o5b), atol=1e-6)
    # ...but the zero rows still receive gradient (trainable, not dead): the
    # fine-tune can learn scene dependence from the warm start
    ctx_hot = ctx5.at[:, 3].set(1.0)
    g = jax.grad(lambda p: jnp.sum(
        m5.apply(p, x, t, ctx_hot, jnp.zeros((2, 1))) ** 2))(p5)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    widened_grads = [l for path, l in leaves
                     if l.ndim == 2 and l.shape[0] == 32 + 5 + 1]
    assert widened_grads, "no FiLM kernels found in grad tree"
    # row 32+3 = the first new context dim's input row (time_emb_dim=32)
    assert any(float(jnp.max(jnp.abs(l[32 + 3]))) > 0 for l in widened_grads)


def test_lqr_hover_plan_holds_goal_and_loses_far_away():
    """The station-keeping label candidate (scripts/quadrotor_task.
    make_lqr_hover_plan) must (a) hold the hover equilibrium exactly, (b)
    regulate a near-goal state with residual velocity back to the goal —
    the behaviour absent from 60-step teacher data — and (c) be strictly
    worse than useless far from the linearization point so margin-penalized
    candidate scoring rejects it there (the safety property that makes
    appending it to every best-of-K label set safe)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from quadrotor_task import make_lqr_hover_plan

    from mpc_via_diffusion_model_tpu.data.normalization import (
        NormalizerStats, unnormalize,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout

    plant, cost = get_plant("quadrotor")
    # dataset-scale control limits (the committed flagship_quadrotor
    # dataset's inputs grid is thrust [-17.4, 45.2], torques ~[-5, 5]);
    # tight torque boxes saturate the regulator and break the hold
    in_stats = NormalizerStats(
        "limits",
        mins=jnp.array([-17.0, -5.0, -5.0, -5.0]),
        maxs=jnp.array([45.0, 5.0, 5.0, 5.0]))
    plan = jax.jit(make_lqr_hover_plan(plant, cost, in_stats, 48))

    def end_dist(x0):
        xs = rollout(plant, x0, unnormalize(in_stats, plan(x0)))
        return np.linalg.norm(np.asarray(xs)[:, 0:3], axis=-1)

    # (a) at the equilibrium: zero drift (hover thrust is in the limits grid)
    assert end_dist(jnp.zeros(12)).max() < 1e-4
    # (b) near-goal with velocity: regulated back inside the reach threshold
    x_near = jnp.array([0.3, -0.2, 0.1, 0.5, -0.3, 0.2,
                        0.05, -0.05, 0.0, 0.0, 0.0, 0.0])
    d = end_dist(x_near)
    assert d[-1] < 0.2 and d.max() < 0.5
    # (c) far start (eval box): the linearization is invalid — does NOT reach
    x_far = jnp.zeros(12).at[0:3].set(jnp.array([2.6, 0.8, 1.0]))
    assert end_dist(x_far)[-1] > 1.0
    # plan stays inside the normalized control box
    u_n = plan(x_near)
    assert u_n.shape == (48, 4)
    assert float(jnp.abs(u_n).max()) <= 1.0 + 1e-6


def test_nan_candidate_score_loses_argmin():
    """Live-debugged round 5 (onpolicy_scene.py): a candidate whose rollout
    overflows scores NaN, and NaN WINS jnp.argmin (NaN comparisons are
    false, so the reduction keeps the NaN lane) — selecting the worthless
    plan exactly when it diverges. The labelers guard scores with
    where(isfinite, s, inf); this pins both the surprising argmin semantics
    the guard exists for and the guard's fix."""
    scores = jnp.array([3.0, jnp.nan, 1.0, 2.0])
    # the hazard: unguarded argmin picks the NaN lane, not the true min
    assert int(jnp.argmin(scores)) == 1
    guarded = jnp.where(jnp.isfinite(scores), scores, jnp.inf)
    assert int(jnp.argmin(guarded)) == 2
