"""3-D / articulated motion-planning environments (VERDICT r3 next #4).

TPU-native replacement for the reference's torch_robotics 3-D env + robot
stack: the reference instantiates environment/robot objects from dataset
metadata (`mpd/datasets/trajectories.py:44-55`) and runs guided planning
with collision-sphere robots (`inference_(mpd).py:170-343`;
`GuideCollisionAvoidance` differentiates the robot's task-space collision
field, reference `guides.py:444-456`). Here:

- `PlanningEnv3D` — sphere + axis-aligned-box SDF world, same differentiable
  API as `planning2d.PlanningEnv2D` (sdf / compute_collision_cost /
  in_collision / random_free_points), points are (..., 3).
- `PandaArmEnv3D` — a 7-DoF configuration-space environment: the Franka
  Panda approximated by collision SPHERES attached to its modified-DH link
  frames (`dynamics/arm.py::panda_link_transforms`, the same chain the RNE
  dynamics and `panda_fk` use). `in_collision`/`compute_collision_cost`
  take JOINT trajectories (..., 7); clearance is the world SDF at every
  collision sphere minus its radius, with an optional self-collision term
  between spheres on non-adjacent links. Everything is pure jnp,
  differentiable, vmappable — the planner's guide descends through FK.

The duck-typed surface means `eval/planning_metrics.planning_metrics`,
`get_best_index`, and `control.make_planner` work unchanged on arm
trajectories (they only call `env.in_collision` on interpolated waypoints —
linear interpolation in q-space is the standard arm collision check).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.arm import panda_link_transforms
from .planning2d import _safe_norm, smooth_distance_penalty

__all__ = [
    "PlanningEnv3D", "PandaArmEnv3D", "ENV_SPHERES_3D", "PANDA_Q_MIN",
    "PANDA_Q_MAX", "PANDA_COLLISION_SPHERES", "make_panda_arm_env",
]


@dataclasses.dataclass(frozen=True)
class PlanningEnv3D:
    """Workspace with sphere and axis-aligned box obstacles.

    spheres: (Ns, 4) = (cx, cy, cz, radius); boxes: (Nb, 6) =
    (cx, cy, cz, half_x, half_y, half_z). ``margin`` inflates all obstacles.
    """

    spheres: jnp.ndarray
    boxes: jnp.ndarray
    margin: float = 0.0
    limits: float = 1.0

    def sdf(self, points: jnp.ndarray) -> jnp.ndarray:
        """Signed distance (positive outside) for points (..., 3)."""
        p = points[..., None, :]  # (..., 1, 3)
        d_spheres = _safe_norm(p - self.spheres[..., :3]) - (
            self.spheres[..., 3] + self.margin
        )  # (..., Ns)
        q = jnp.abs(p - self.boxes[..., :3]) - (self.boxes[..., 3:6] + self.margin)
        outside = _safe_norm(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        d_boxes = outside + inside  # (..., Nb)
        return jnp.min(jnp.concatenate([d_spheres, d_boxes], axis=-1), axis=-1)

    def compute_collision_cost(self, x: jnp.ndarray, max_sdf: float = 0.1) -> jnp.ndarray:
        return smooth_distance_penalty(self.sdf(x), max_sdf)

    def in_collision(self, x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
        return self.sdf(x) < eps

    def random_free_points(self, key: jax.Array, n: int, min_clearance: float = 0.05, n_attempts: int = 64) -> jnp.ndarray:
        cand = jax.random.uniform(
            key, (n, n_attempts, 3), minval=-self.limits, maxval=self.limits
        )
        d = self.sdf(cand)
        best = jnp.argmax(d, axis=-1)
        return cand[jnp.arange(n), best]


jax.tree_util.register_pytree_node(
    PlanningEnv3D,
    lambda e: ((e.spheres, e.boxes), (e.margin, e.limits)),
    lambda aux, leaves: PlanningEnv3D(leaves[0], leaves[1], aux[0], aux[1]),
)


# Franka Panda joint limits (public spec, same source as the DH/inertial
# tables in dynamics/arm.py)
PANDA_Q_MIN = np.array(
    [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973],
    np.float32)
PANDA_Q_MAX = np.array(
    [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973], np.float32)

# Collision spheres (link_index, offset in that link's DH frame, radius):
# a compact 11-sphere cover of the Panda's column / upper arm / forearm /
# wrist / hand, the torch_robotics collision-sphere pattern at coarser
# granularity (their RobotPanda carries ~30 spheres; planning fidelity is
# set by the sphere HULL, and this cover stays inside it with margin).
# Offsets are in the MODIFIED-DH link frames of dynamics/arm.py.
PANDA_COLLISION_SPHERES = (
    # (link, (ox, oy, oz), r)
    (0, (0.0, 0.0, -0.15), 0.11),   # shoulder column below joint-1 frame
    (0, (0.0, 0.0, 0.0), 0.11),     # joint-1/2 cluster
    (2, (0.0, 0.0, -0.20), 0.09),   # upper arm (between joints 2 and 3)
    (2, (0.0, 0.0, -0.07), 0.09),   # elbow ball
    (3, (0.0, 0.0, 0.06), 0.08),    # joint-4 cluster
    (4, (0.0, 0.0, -0.26), 0.075),  # forearm upper
    (4, (0.0, 0.0, -0.12), 0.075),  # forearm lower
    (5, (0.0, 0.0, 0.02), 0.07),    # wrist (joint-6 cluster)
    (6, (0.0, 0.0, 0.05), 0.06),    # joint-7 / flange
    (6, (0.0, 0.0, 0.13), 0.06),    # hand base
    (6, (0.0, 0.0, 0.21), 0.055),   # gripper body
)
_CS_LINK = np.array([s[0] for s in PANDA_COLLISION_SPHERES], np.int32)
_CS_OFF = np.array([s[1] for s in PANDA_COLLISION_SPHERES], np.float32)
_CS_RAD = np.array([s[2] for s in PANDA_COLLISION_SPHERES], np.float32)
# self-collision pairs: far-apart links whose sphere distance actually
# varies with q. Links 0<->3 are excluded — the shoulder-center sphere sits
# on the joint-1/2 axes, so its distance to the elbow cluster is RIGID
# (~0.33 m, the upper-arm length): including it caps every config's
# clearance at a constant and degenerates rejection sampling. The modes
# that matter are forearm/wrist/hand (links 4-6) against the base column /
# upper arm (links 0-2), plus elbow-vs-hand (3 vs 6).
_SELF_PAIRS = np.array(
    [(i, j) for i in range(len(_CS_LINK)) for j in range(i + 1, len(_CS_LINK))
     if int(_CS_LINK[j]) - int(_CS_LINK[i]) >= 3
     and not (int(_CS_LINK[i]) == 0 and int(_CS_LINK[j]) == 3)], np.int32)


@dataclasses.dataclass(frozen=True)
class PandaArmEnv3D:
    """Configuration-space planning environment for the Panda.

    Duck-types the `PlanningEnv2D` surface on JOINT-space points (..., 7):
    `in_collision` / `compute_collision_cost` / `sdf` report the robot's
    minimum collision-sphere clearance at each configuration.
    """

    world: PlanningEnv3D
    self_collision: bool = True

    # ---------------------------------------------------------------- #
    def sphere_positions(self, q: jnp.ndarray) -> jnp.ndarray:
        """World positions (S, 3) of the collision spheres at config q (7,)."""
        frames = panda_link_transforms(q)  # list of 7 (R, p)
        rs = jnp.stack([f[0] for f in frames])  # (7, 3, 3)
        ps = jnp.stack([f[1] for f in frames])  # (7, 3)
        link = jnp.asarray(_CS_LINK)
        off = jnp.asarray(_CS_OFF)
        r_sel = rs[link]  # (S, 3, 3)
        p_sel = ps[link]  # (S, 3)
        return p_sel + jnp.einsum("sij,sj->si", r_sel, off)

    def config_clearance(self, q: jnp.ndarray) -> jnp.ndarray:
        """Min world-clearance over collision spheres at config q (7,),
        optionally min'd with non-adjacent-link self-clearance."""
        pos = self.sphere_positions(q)  # (S, 3)
        rad = jnp.asarray(_CS_RAD)
        clear = jnp.min(self.world.sdf(pos) - rad)
        if self.self_collision and len(_SELF_PAIRS):
            pi, pj = _SELF_PAIRS[:, 0], _SELF_PAIRS[:, 1]
            d = _safe_norm(pos[pi] - pos[pj]) - (rad[pi] + rad[pj])
            clear = jnp.minimum(clear, jnp.min(d))
        return clear

    # ---- duck-typed planning surface (points are configs (..., 7)) ---- #
    def sdf(self, q_points: jnp.ndarray) -> jnp.ndarray:
        flat = q_points.reshape(-1, 7)
        return jax.vmap(self.config_clearance)(flat).reshape(q_points.shape[:-1])

    def compute_collision_cost(self, q: jnp.ndarray, max_sdf: float = 0.05) -> jnp.ndarray:
        return smooth_distance_penalty(self.sdf(q), max_sdf)

    def in_collision(self, q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
        return self.sdf(q) < eps

    def random_free_points(self, key: jax.Array, n: int, min_clearance: float = 0.02, n_attempts: int = 64) -> jnp.ndarray:
        """Rejection-sample n collision-free CONFIGS (best-of-n_attempts),
        replaces torch_robotics `random_coll_free_q`."""
        lo, hi = jnp.asarray(PANDA_Q_MIN), jnp.asarray(PANDA_Q_MAX)
        cand = jax.random.uniform(key, (n, n_attempts, 7)) * (hi - lo) + lo
        d = self.sdf(cand)
        best = jnp.argmax(d, axis=-1)
        return cand[jnp.arange(n), best]


jax.tree_util.register_pytree_node(
    PandaArmEnv3D,
    lambda e: ((e.world,), (e.self_collision,)),
    lambda aux, leaves: PandaArmEnv3D(leaves[0], aux[0]),
)


# Fixed benchmark world around the Panda's reachable shell (base at origin,
# reach ~0.85 m): three spheres + a table slab and a shelf-post box.
ENV_SPHERES_3D = PlanningEnv3D(
    spheres=jnp.array(
        [
            [0.45, 0.35, 0.45, 0.14],
            [0.45, -0.35, 0.45, 0.14],
            [0.00, 0.55, 0.35, 0.12],
        ],
        dtype=jnp.float32,
    ),
    boxes=jnp.array(
        [
            # thin table slab below the workspace (z = -0.12 plane)
            [0.0, 0.0, -0.17, 1.2, 1.2, 0.05],
            # shelf post in front of the robot
            [0.62, 0.0, 0.35, 0.05, 0.05, 0.35],
        ],
        dtype=jnp.float32,
    ),
)


def make_panda_arm_env(world: PlanningEnv3D = ENV_SPHERES_3D,
                       self_collision: bool = True) -> PandaArmEnv3D:
    """The 7-DoF planning environment `scripts/infer_planning.py --robot
    panda` uses (reference: RobotPanda + EnvSpheres3D instantiation,
    `mpd/datasets/trajectories.py:44-55`)."""
    return PandaArmEnv3D(world=world, self_collision=self_collision)
