"""7-DoF arm (Franka Panda) plant: the high-dimensional context workload.

The reference's Panda pipeline drives a MuJoCo Franka Panda
(`scripts/Panda/panda_inference/inference_diffusion_panda.py:77-84`): context
= 20 dims (q7, qdot7, ee-pos3, ee-vel3 via the MuJoCo Jacobian, `:377-399`),
diffusion horizon 128, 7 control channels. MuJoCo/MJX is not in this image,
so this module provides TPU-native plants with the same interface shape:

- `panda_rbd` (default flagship plant since round 2): FULL articulated
  rigid-body dynamics — 7-link recursive Newton-Euler inverse dynamics
  (Craig modified-DH convention) with the public Franka Panda inertial
  parameters (masses / COM / link inertia tensors from the
  franka_description URDF, identified in Gaz, Cognetti, Oliva, Robuffo
  Giordano, De Luca, RA-L 2019); the mass matrix is assembled by the RNE
  column trick, so forward dynamics is qdd = M(q)^-1 (tau - C(q,qd)qd
  - g(q) - damping qd), with inertia coupling, Coriolis and gravity —
  genuinely absorbing MuJoCo's role (`mujoco.mj_step`,
  `inference_diffusion_panda.py:159`).
- `panda_surrogate` (round-1): inertia-scaled double integrators with
  viscous damping (kept for comparison).
- forward kinematics of the Panda DH chain for the end-effector position,
  and the analytic position Jacobian (via jax.jacobian) for the
  end-effector velocity — the same 20-dim context vector the reference
  assembles from MuJoCo,
- quadratic joint-space cost for rollout scoring (replacing the reference's
  second-MuJoCo-instance rollout, `inference_diffusion_panda.py:459-500`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Plant, QuadraticCost
from ..utils.precision import hmatmul

__all__ = [
    "panda_surrogate",
    "panda_rbd",
    "panda_cost",
    "panda_fk",
    "panda_link_transforms",
    "panda_ee_velocity",
    "panda_context",
    "make_panda_context",
    "panda_inverse_dynamics",
    "panda_inverse_dynamics_unrolled",
    "panda_rbd_unrolled",
    "panda_mass_matrix",
    "PANDA_READY_POSE",
]

# Franka Panda modified-DH parameters (a, d, alpha), public spec.
_PANDA_DH = np.array(
    [
        # a,      d,      alpha
        [0.0, 0.333, 0.0],
        [0.0, 0.0, -np.pi / 2],
        [0.0, 0.316, np.pi / 2],
        [0.0825, 0.0, np.pi / 2],
        [-0.0825, 0.384, -np.pi / 2],
        [0.0, 0.0, np.pi / 2],
        [0.088, 0.0, np.pi / 2],
    ],
    dtype=np.float64,
)
_FLANGE_D = 0.107

# effective joint inertias / damping for the surrogate torque->accel map
_J_INERTIA = np.array([1.2, 1.2, 1.0, 1.0, 0.6, 0.4, 0.3], dtype=np.float32)
_J_DAMPING = np.array([2.0, 2.0, 1.5, 1.5, 1.0, 0.8, 0.6], dtype=np.float32)


def panda_fk(q: jnp.ndarray) -> jnp.ndarray:
    """End-effector position (3,) from joint angles q (7,) via the modified-DH
    chain (matches the real Panda kinematics)."""
    t = jnp.eye(4)
    for i in range(7):
        a, d, alpha = _PANDA_DH[i]
        ca, sa = np.cos(alpha), np.sin(alpha)
        cq, sq = jnp.cos(q[i]), jnp.sin(q[i])
        # modified DH (Craig): screw X(a, alpha) then screw Z(d, theta)
        ti = jnp.array(
            [
                [cq, -sq, 0.0, a],
                [sq * ca, cq * ca, -sa, -d * sa],
                [sq * sa, cq * sa, ca, d * ca],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        t = hmatmul(t, ti)
    flange = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, _FLANGE_D], [0, 0, 0, 1.0]])
    t = hmatmul(t, flange)
    return t[:3, 3]


def panda_ee_velocity(q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """EE linear velocity = J(q) qdot with J from jax.jacobian (the reference
    uses the MuJoCo Jacobian, `inference_diffusion_panda.py:308-319`)."""
    jac = jax.jacobian(panda_fk)(q)  # (3, 7)
    return hmatmul(jac, qd)


def panda_context(x: jnp.ndarray) -> jnp.ndarray:
    """State (14,) -> the reference's 20-dim conditioning vector
    (q7 | qd7 | ee_pos3 | ee_vel3)."""
    q, qd = x[:7], x[7:]
    return jnp.concatenate([q, qd, panda_fk(q), panda_ee_velocity(q, qd)])


def panda_surrogate(dt: float = 0.01) -> Plant:
    inertia = jnp.asarray(_J_INERTIA)
    damping = jnp.asarray(_J_DAMPING)

    def step(x, u):
        q, qd = x[:7], x[7:]
        qdd = (jnp.reshape(u, (7,)) - damping * qd) / inertia
        return jnp.concatenate([q + qd * dt, qd + qdd * dt])

    return Plant(name="panda_surrogate", state_dim=14, control_dim=7, dt=dt, step=step)


def panda_cost() -> QuadraticCost:
    """Joint-space regulation cost (q -> 0 posture, damped)."""
    return QuadraticCost(
        q_diag=jnp.concatenate([jnp.full((7,), 1.0), jnp.full((7,), 0.1)]),
        r=jnp.full((7,), 0.01),
        p_diag=jnp.concatenate([jnp.full((7,), 10.0), jnp.full((7,), 1.0)]),
    )


# --------------------------------------------------------------------------- #
# Articulated rigid-body dynamics (recursive Newton-Euler, modified DH)
# --------------------------------------------------------------------------- #
# Inertial parameters of the Franka Panda links: mass (kg), COM position in
# the link frame (m), inertia tensor about the COM in the link frame
# (kg m^2). Public values from the franka_description URDF / Gaz et al.
# (RA-L 2019) identified model.
_PANDA_MASS = np.array(
    [4.970684, 0.646926, 3.228604, 3.587895, 1.225946, 1.666555, 0.735522],
    dtype=np.float64,
)
_PANDA_COM = np.array(
    [
        [3.875e-03, 2.081e-03, -0.1750],
        [-3.141e-03, -2.872e-02, 3.495e-03],
        [2.7518e-02, 3.9252e-02, -6.6502e-02],
        [-5.317e-02, 1.04419e-01, 2.7454e-02],
        [-1.1953e-02, 4.1065e-02, -3.8437e-02],
        [6.0149e-02, -1.4117e-02, -1.0517e-02],
        [1.0517e-02, -4.252e-03, 6.1597e-02],
    ],
    dtype=np.float64,
)
_PANDA_INERTIA = np.array(
    [
        [[7.0337e-01, -1.3900e-04, 6.7720e-03],
         [-1.3900e-04, 7.0661e-01, 1.9169e-02],
         [6.7720e-03, 1.9169e-02, 9.1170e-03]],
        [[7.9620e-03, -3.9250e-03, 1.0254e-02],
         [-3.9250e-03, 2.8110e-02, 7.0400e-04],
         [1.0254e-02, 7.0400e-04, 2.5995e-02]],
        [[3.7242e-02, -4.7610e-03, -1.1396e-02],
         [-4.7610e-03, 3.6155e-02, -1.2805e-02],
         [-1.1396e-02, -1.2805e-02, 1.0830e-02]],
        [[2.5853e-02, 7.7960e-03, -1.3320e-03],
         [7.7960e-03, 1.9552e-02, 8.6410e-03],
         [-1.3320e-03, 8.6410e-03, 2.8323e-02]],
        [[3.5549e-02, -2.1170e-03, -4.0370e-03],
         [-2.1170e-03, 2.9474e-02, 2.2900e-04],
         [-4.0370e-03, 2.2900e-04, 8.6270e-03]],
        [[1.9640e-03, 1.0900e-04, -1.1580e-03],
         [1.0900e-04, 4.3540e-03, 3.4100e-04],
         [-1.1580e-03, 3.4100e-04, 5.4330e-03]],
        [[1.2516e-02, -4.2800e-04, -1.1960e-03],
         [-4.2800e-04, 1.0027e-02, -7.4100e-04],
         [-1.1960e-03, -7.4100e-04, 4.8150e-03]],
    ],
    dtype=np.float64,
)
# viscous joint friction (Gaz et al. identify ~[0.06 .. 1.0] N m s/rad scale)
_PANDA_VISCOUS = np.array([0.5, 0.5, 0.4, 0.4, 0.3, 0.25, 0.2], dtype=np.float64)
_GRAVITY = 9.81

# the Franka "ready" pose: elbow bent, gravity torques strongly nonzero
PANDA_READY_POSE = np.array(
    [0.0, -np.pi / 4, 0.0, -3 * np.pi / 4, 0.0, np.pi / 2, np.pi / 4],
    dtype=np.float64,
)


def _link_rot_pos(q_i, i):
    """(^{i-1}R_i, ^{i-1}P_i) of the modified-DH transform used in
    `panda_fk` (row i packs (a_{i-1}, d_i, alpha_{i-1}))."""
    a, d, alpha = _PANDA_DH[i]
    ca, sa = np.cos(alpha), np.sin(alpha)
    cq, sq = jnp.cos(q_i), jnp.sin(q_i)
    r = jnp.array(
        [
            [cq, -sq, 0.0],
            [sq * ca, cq * ca, -sa],
            [sq * sa, cq * sa, ca],
        ]
    )
    p = jnp.array([a, -d * sa, d * ca])
    return r, p


def panda_link_transforms(q: jnp.ndarray):
    """Base-frame (R, p) of every link frame (list of 7), for tests/plots."""
    r_acc = jnp.eye(3)
    p_acc = jnp.zeros(3)
    out = []
    for i in range(7):
        r_i, p_i = _link_rot_pos(q[i], i)
        p_acc = p_acc + hmatmul(r_acc, p_i)
        r_acc = hmatmul(r_acc, r_i)
        out.append((r_acc, p_acc))
    return out


# per-link constants stacked for the lax.scan RNE body
_DH_A = np.ascontiguousarray(_PANDA_DH[:, 0])
_DH_D = np.ascontiguousarray(_PANDA_DH[:, 1])
_DH_CA = np.cos(_PANDA_DH[:, 2])
_DH_SA = np.sin(_PANDA_DH[:, 2])


def _link_rot_pos_scan(q_i, a, d, ca, sa):
    """Traced (^{i-1}R_i, ^{i-1}P_i) from stacked per-link DH constants."""
    cq, sq = jnp.cos(q_i), jnp.sin(q_i)
    r = jnp.stack([
        jnp.stack([cq, -sq, jnp.zeros_like(cq)]),
        jnp.stack([sq * ca, cq * ca, jnp.broadcast_to(-sa, cq.shape)]),
        jnp.stack([sq * sa, cq * sa, jnp.broadcast_to(ca, cq.shape)]),
    ])
    p = jnp.stack([jnp.broadcast_to(a, cq.shape),
                   jnp.broadcast_to(-d * sa, cq.shape),
                   jnp.broadcast_to(d * ca, cq.shape)])
    return r, p


def panda_inverse_dynamics(
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    gravity: float = _GRAVITY,
) -> jnp.ndarray:
    """Joint torques for a given motion: recursive Newton-Euler (Craig ch. 6,
    modified DH). Gravity enters as the classic base-acceleration trick
    (v'_0 = +g z). Friction NOT included.

    Both passes are `lax.scan`s over the 7-link chain (the inward pass with
    ``reverse=True``) rather than trace-time unrolls: a single traced link
    body keeps the XLA graph ~50x smaller, which is what makes iLQR over
    this plant compile in seconds instead of minutes (the mass matrix alone
    is 7 vmapped RNE calls, each differentiated by the solver).
    """
    z = jnp.array([0.0, 0.0, 1.0])
    dh = (jnp.asarray(_DH_A), jnp.asarray(_DH_D),
          jnp.asarray(_DH_CA), jnp.asarray(_DH_SA))
    coms = jnp.asarray(_PANDA_COM)
    inertias = jnp.asarray(_PANDA_INERTIA)
    masses = jnp.asarray(_PANDA_MASS)

    def outward(carry, xs):
        omega, omegad, vd = carry
        q_i, qd_i, qdd_i, a, d, ca, sa, c, inertia, mass = xs
        r_i, p_i = _link_rot_pos_scan(q_i, a, d, ca, sa)
        r_t = r_i.T
        vd = hmatmul(
            r_t, vd + jnp.cross(omegad, p_i) + jnp.cross(omega, jnp.cross(omega, p_i))
        )
        omega_r = hmatmul(r_t, omega)
        omegad = hmatmul(r_t, omegad) + jnp.cross(omega_r, qd_i * z) + qdd_i * z
        omega = omega_r + qd_i * z
        vd_c = vd + jnp.cross(omegad, c) + jnp.cross(omega, jnp.cross(omega, c))
        f_i = mass * vd_c
        n_i = hmatmul(inertia, omegad) + jnp.cross(omega, hmatmul(inertia, omega))
        return (omega, omegad, vd), (r_i, p_i, f_i, n_i)

    carry0 = (jnp.zeros(3), jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]) * gravity)
    # unroll=7: the scan keeps the TRACE one-link-sized for fast jit, while
    # the generated code has no runtime loop — deeply nested device loops
    # (this scan inside jacfwd inside the iLQR while_loop inside the
    # collection scan) crashed the TPU runtime worker.
    _, (rs, ps, F, N) = jax.lax.scan(
        outward, carry0,
        (q, qd, qdd, dh[0], dh[1], dh[2], dh[3], coms, inertias, masses),
        unroll=7,
    )

    # child-frame transforms seen from link i: (rs[i+1], ps[i+1]); the last
    # link's entries are identity/zero — with the zero initial carry the
    # child contribution there vanishes, so no mask is needed
    r_child = jnp.concatenate([rs[1:], jnp.eye(3)[None]], axis=0)
    p_child = jnp.concatenate([ps[1:], jnp.zeros((1, 3))], axis=0)

    def inward(carry, xs):
        f_next, n_next = carry
        r_nx, p_nx, f_i_in, n_i_in, c = xs
        f_from_child = hmatmul(r_nx, f_next)
        n_from_child = hmatmul(r_nx, n_next) + jnp.cross(p_nx, f_from_child)
        f_i = f_from_child + f_i_in
        n_i = n_i_in + n_from_child + jnp.cross(c, f_i_in)
        return (f_i, n_i), n_i[2]

    _, taus = jax.lax.scan(
        inward, (jnp.zeros(3), jnp.zeros(3)),
        (r_child, p_child, F, N, coms), reverse=True, unroll=7,
    )
    return taus


def panda_mass_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """M(q) via the RNE column trick, vmapped over unit accelerations:
    M[:, j] = RNE(q, 0, e_j, g=0) — ONE traced RNE body for all 7 columns."""
    zero = jnp.zeros(7)
    cols = jax.vmap(
        lambda e: panda_inverse_dynamics(q, zero, e, gravity=0.0)
    )(jnp.eye(7))  # cols[j] = M[:, j]
    m = cols.T
    return 0.5 * (m + m.T)


def panda_rbd(dt: float = 0.01, q_ref: np.ndarray = PANDA_READY_POSE) -> Plant:
    """Full articulated-body Panda plant (replaces the round-1 diagonal
    surrogate as the flagship arm; VERDICT r1 item 3).

    State x = (q - q_ref (7), qd (7)) — shifted so the regulation target
    (the 'ready' pose, where gravity torques are strongly nonzero) is the
    origin of the quadratic cost. Control u = joint torques (7). Forward
    dynamics solves M(q) qdd = tau - rne_bias(q, qd) - viscous qd; the
    integrator is semi-implicit Euler (qd first), stable at dt = 0.01 like
    the reference's MuJoCo step (`inference_diffusion_panda.py:31,159`).
    """
    q_ref_j = jnp.asarray(q_ref, jnp.float32)
    viscous = jnp.asarray(_PANDA_VISCOUS, jnp.float32)

    def step(x, u):
        q = x[:7] + q_ref_j
        qd = x[7:]
        bias = panda_inverse_dynamics(q, qd, jnp.zeros(7))
        m = panda_mass_matrix(q)
        rhs = jnp.reshape(u, (7,)) - bias - viscous * qd
        qdd = jnp.linalg.solve(m, rhs)
        qd_next = qd + qdd * dt
        q_next = x[:7] + qd_next * dt
        return jnp.concatenate([q_next, qd_next])

    return Plant(name="panda_rbd", state_dim=14, control_dim=7, dt=dt, step=step)


def make_panda_context(q_ref: np.ndarray = PANDA_READY_POSE):
    """Context map for the shifted-coordinate `panda_rbd` plant: the
    reference's 20-dim vector (q7 | qd7 | ee_pos3 | ee_vel3) built from the
    TRUE joint angles q = x[:7] + q_ref."""
    q_ref_j = jnp.asarray(q_ref, jnp.float32)

    def ctx(x):
        q = x[:7] + q_ref_j
        qd = x[7:]
        return jnp.concatenate([q, qd, panda_fk(q), panda_ee_velocity(q, qd)])

    return ctx


# --------------------------------------------------------------------------- #
# Mosaic-safe (kernel-lowerable) articulated dynamics (round 5)
#
# The scan-based RNE above cannot enter a Pallas kernel: Mosaic's lowering
# rejects `lax.scan` with extensive inputs (lowering.py _scan_lowering_rule,
# AOT-probed), and `jnp.cross` lowers through a gather
# (`dynamics/quadrotor.py:54` note). These variants trade trace size for
# kernel compatibility: python-unrolled 7-link passes, component-formula
# cross products, explicit 3-vector matvecs, and an unrolled scalar
# Cholesky solve for M(q) qdd = rhs (M is SPD by construction). Numerics
# match the scan/linalg path to fp32 round-off (tests/test_arm.py).
# --------------------------------------------------------------------------- #


def _cross3u(a, b):
    """Gather-free cross product of two (3,) vectors."""
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _matvec3(r, v):
    """Explicit (3,3) @ (3,) — Mosaic-safe scalar products (no dot)."""
    return jnp.stack([
        r[0, 0] * v[0] + r[0, 1] * v[1] + r[0, 2] * v[2],
        r[1, 0] * v[0] + r[1, 1] * v[1] + r[1, 2] * v[2],
        r[2, 0] * v[0] + r[2, 1] * v[1] + r[2, 2] * v[2],
    ])


def _matvec3_t(r, v):
    """Explicit r.T @ v without materializing the transpose."""
    return jnp.stack([
        r[0, 0] * v[0] + r[1, 0] * v[1] + r[2, 0] * v[2],
        r[0, 1] * v[0] + r[1, 1] * v[1] + r[2, 1] * v[2],
        r[0, 2] * v[0] + r[1, 2] * v[1] + r[2, 2] * v[2],
    ])


def panda_inverse_dynamics_unrolled(q, qd, qdd, gravity=_GRAVITY):
    """`panda_inverse_dynamics` as trace-time python loops (14 link bodies
    in the trace instead of 2 scan bodies) — the form that lowers to
    Mosaic. Use the scan version everywhere XLA runs (iLQR, collection):
    its 50x-smaller trace is what keeps those compiles fast."""
    z2 = 1.0  # joint axis is z: only the [2] components of qd_i*z survive
    coms = _PANDA_COM
    inertias = _PANDA_INERTIA
    masses = _PANDA_MASS

    omega = jnp.zeros(3)
    omegad = jnp.zeros(3)
    vd = jnp.array([0.0, 0.0, 1.0]) * gravity
    rs, ps, F, N = [], [], [], []
    for i in range(7):
        r_i, p_i = _link_rot_pos(q[i], i)
        c = jnp.asarray(coms[i], jnp.float32)
        inertia = jnp.asarray(inertias[i], jnp.float32)
        mass = jnp.float32(masses[i])
        vd = _matvec3_t(r_i, vd + _cross3u(omegad, p_i)
                        + _cross3u(omega, _cross3u(omega, p_i)))
        omega_r = _matvec3_t(r_i, omega)
        qd_z = jnp.stack([jnp.zeros(()), jnp.zeros(()), qd[i] * z2])
        qdd_z = jnp.stack([jnp.zeros(()), jnp.zeros(()), qdd[i] * z2])
        omegad = _matvec3_t(r_i, omegad) + _cross3u(omega_r, qd_z) + qdd_z
        omega = omega_r + qd_z
        vd_c = vd + _cross3u(omegad, c) + _cross3u(omega, _cross3u(omega, c))
        f_i = mass * vd_c
        n_i = _matvec3(inertia, omegad) + _cross3u(omega, _matvec3(inertia, omega))
        rs.append(r_i); ps.append(p_i); F.append(f_i); N.append(n_i)

    f_next = jnp.zeros(3)
    n_next = jnp.zeros(3)
    taus = [None] * 7
    for i in reversed(range(7)):
        if i < 6:
            r_nx, p_nx = rs[i + 1], ps[i + 1]
            f_from_child = _matvec3(r_nx, f_next)
            n_from_child = _matvec3(r_nx, n_next) + _cross3u(p_nx, f_from_child)
        else:
            f_from_child = jnp.zeros(3)
            n_from_child = jnp.zeros(3)
        c = jnp.asarray(coms[i], jnp.float32)
        f_i = f_from_child + F[i]
        n_i = N[i] + n_from_child + _cross3u(c, F[i])
        f_next, n_next = f_i, n_i
        taus[i] = n_i[2]
    return jnp.stack(taus)


def _solve_spd_unrolled(m, b, n=7):
    """x with m x = b for SPD m — scalar Cholesky fully unrolled at trace
    time (static indexing only; no pivoting needed for SPD, no
    jnp.linalg)."""
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = m[i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(s)
            else:
                l[i][j] = s / l[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x)


def panda_rbd_unrolled(dt: float = 0.01,
                       q_ref: np.ndarray = PANDA_READY_POSE) -> Plant:
    """`panda_rbd` with every solver ingredient in Mosaic-lowerable form:
    same state/control/integrator semantics (parity-tested), but the step
    traces into a Pallas kernel — enabling the whole-EPISODE panda kernel
    (`ops/fused_episode.py` plant envelope) that the scan/linalg plant
    could not (`fused_episode.py` module note; reference Panda loop:
    `inference_diffusion_panda.py:31,159`)."""
    q_ref_j = jnp.asarray(q_ref, jnp.float32)
    viscous = jnp.asarray(_PANDA_VISCOUS, jnp.float32)

    def step(x, u):
        q = x[:7] + q_ref_j
        qd = x[7:]
        bias = panda_inverse_dynamics_unrolled(q, qd, jnp.zeros(7))
        # mass columns by the RNE trick, python-unrolled (no vmap: batched
        # link bodies would re-introduce reshapes Mosaic cannot lower)
        cols = [panda_inverse_dynamics_unrolled(
            q, jnp.zeros(7), jnp.asarray(e, jnp.float32), gravity=0.0)
            for e in np.eye(7)]
        m = jnp.stack(cols, axis=1)
        m = 0.5 * (m + m.T)
        rhs = jnp.reshape(u, (7,)) - bias - viscous * qd
        qdd = _solve_spd_unrolled(m, rhs)
        qd_next = qd + qdd * dt
        q_next = x[:7] + qd_next * dt
        return jnp.concatenate([q_next, qd_next])

    return Plant(name="panda_rbd", state_dim=14, control_dim=7, dt=dt, step=step)
