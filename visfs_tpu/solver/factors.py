"""Bundle-adjustment factors: residuals and Jacobians.

The factor set mirrors the reference optimizer (corelib/src/Optimizer/
Optimizer.cpp:58-596):

  * stereo reprojection factor  — obs (uL, vL, uR = uL - bf/z), residual
    ``obs - project(Tcw * Pw)`` (g2o EdgeStereo, OptimizeTypeDefine.h:111-191;
    ceres StereoObservationFactor.cpp:12-78).  RGBD depth is folded into the
    same factor through a virtual disparity, exactly like the reference
    (Optimizer.cpp:184-196).
  * relative pose (wheel-odometry) factor — residual
    ``[q1*(q2^-1*(-t2)) + t1 - t12 ; 2*vec(q12^-1 * q1 * q2^-1)]``
    (EdgePoseConstraint, OptimizeTypeDefine.cpp:35-50).
  * Huber robust weighting (g2o RobustKernelHuber semantics).

Pose parameterization: ``(q, t)`` is the *inverse* camera pose Tcw
(world->camera), updated on the 6-dim tangent as ``t += dt; q = deltaQ(dw)*q``
(OptimizeTypeDefine.cpp:7-14).  All Jacobians here are *exactly* consistent
with that update rule (the reference's hand-derived stereo pose Jacobian uses
skew(pc) where the exact linearization of its own update rule is
skew(pc - t) = skew(R*Pw); we use the exact form, verified against
``jax.jacfwd`` in tests/test_factors.py).

Everything is written for a single factor and batched with vmap by the
solver; shapes stay static so the whole GN/LM iteration jits into one XLA
computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import (
    delta_q,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    skew,
)


class StereoIntrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray  # baseline * fx


def apply_tangent(q, t, delta):
    """Tangent-space pose update: t += dt, q = deltaQ(dw) * q."""
    return quat_normalize(quat_mul(delta_q(delta[3:6]), q)), t + delta[0:3]


# ---------------------------------------------------------------------------
# Stereo reprojection factor
# ---------------------------------------------------------------------------

def _safe_inv_z(z):
    """1/z with a clamp away from the camera plane.

    Valid observations always have z >> 1e-3; the clamp only protects
    masked-out table slots (whose weight is zero) from producing inf/NaN
    that would poison weighted reductions (0 * inf = NaN).
    """
    sign = jnp.where(z < 0.0, -1.0, 1.0)
    return sign / jnp.maximum(jnp.abs(z), 1e-3)


def project_stereo_point(pc, intr: StereoIntrinsics):
    """Camera-frame point -> (uL, vL, uR) (OptimizeTypeDefine.h:180-187)."""
    inv_z = _safe_inv_z(pc[2])
    u = pc[0] * inv_z * intr.fx + intr.cx
    v = pc[1] * inv_z * intr.fy + intr.cy
    return jnp.stack([u, v, u - intr.bf * inv_z])


def stereo_residual(pose_q, pose_t, pw, obs, intr: StereoIntrinsics):
    """obs - project(Tcw * Pw); [3]."""
    pc = quat_rotate(pose_q, pw) + pose_t
    return obs - project_stereo_point(pc, intr)


def stereo_jacobians(pose_q, pose_t, pw, intr: StereoIntrinsics):
    """Analytic Jacobians of the stereo residual.

    Returns (J_pose [3,6] wrt (dt, dw), J_point [3,3] wrt Pw).

    d(residual)/d(pc) = -dproj/dpc with
      dproj/dpc = [[fx/z, 0, -fx*x/z^2],
                   [0, fy/z, -fy*y/z^2],
                   [fx/z, 0, -fx*x/z^2 + bf/z^2]]
    dpc/d(dt) = I;  dpc/d(dw) = -skew(R*Pw)  (exact for the left-quaternion
    update with separate translation);  dpc/dPw = R.
    """
    R = quat_to_mat(pose_q)
    rp = R @ pw  # R * Pw = pc - t
    pc = rp + pose_t
    x, y, z = pc[0], pc[1], pc[2]
    inv_z = _safe_inv_z(z)
    inv_z2 = inv_z * inv_z
    dproj = jnp.stack(
        [
            jnp.stack([intr.fx * inv_z, jnp.zeros_like(z), -intr.fx * x * inv_z2]),
            jnp.stack([jnp.zeros_like(z), intr.fy * inv_z, -intr.fy * y * inv_z2]),
            jnp.stack(
                [
                    intr.fx * inv_z,
                    jnp.zeros_like(z),
                    -intr.fx * x * inv_z2 + intr.bf * inv_z2,
                ]
            ),
        ]
    )
    J_point = -dproj @ R
    J_pose = jnp.concatenate([-dproj, dproj @ skew(rp)], axis=1)
    return J_pose, J_point


# ---------------------------------------------------------------------------
# Relative-pose (wheel odometry) factor
# ---------------------------------------------------------------------------

def pose_link_residual(q1, t1, q2, t2, meas_q, meas_t):
    """EdgePoseConstraint residual (OptimizeTypeDefine.cpp:35-50); [6].

    (q1,t1), (q2,t2) are Tc1w, Tc2w; (meas_q, meas_t) is the measured
    relative transform Tc1c2.
    """
    e_t = quat_rotate(q1, quat_rotate(quat_conj(q2), -t2)) + t1 - meas_t
    e_q = 2.0 * quat_mul(quat_mul(quat_conj(meas_q), q1), quat_conj(q2))[1:4]
    return jnp.concatenate([e_t, e_q])


def pose_link_jacobians(q1, t1, q2, t2, meas_q, meas_t):
    """Jacobians of the link residual wrt the two pose tangents; ([6,6],[6,6]).

    Computed by forward-mode autodiff at the zero tangent — exact, and only
    evaluated for the handful of window links per problem, so closed forms
    buy nothing on TPU here (the hot stereo factor has analytic forms).
    """

    def res_of_deltas(d1, d2):
        nq1, nt1 = apply_tangent(q1, t1, d1)
        nq2, nt2 = apply_tangent(q2, t2, d2)
        return pose_link_residual(nq1, nt1, nq2, nt2, meas_q, meas_t)

    zero = jnp.zeros(6, dtype=t1.dtype)
    J1, J2 = jax.jacfwd(res_of_deltas, argnums=(0, 1))(zero, zero)
    return J1, J2


# ---------------------------------------------------------------------------
# Robust kernel
# ---------------------------------------------------------------------------

def huber_weight(chi2, delta):
    """Gauss-Newton IRLS weight for g2o's RobustKernelHuber.

    chi2 is the squared error e^T Omega e; the GN reweighting that reproduces
    the robustified normal equations is rho'(chi2) = min(1, delta/sqrt(chi2)).
    delta <= 0 disables the kernel (Optimizer.cpp:robustKernelDelta_ > 0 gate).
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w = jnp.where(chi2 > delta * delta, delta / e, 1.0)
    return jnp.where(delta > 0.0, w, jnp.ones_like(w))


def inv3x3(m):
    """Batched closed-form 3x3 inverse (adjugate / determinant).

    jnp.linalg.inv on small batched blocks lowers to a batched-LU custom
    call with a ~0.2 ms latency floor per invocation on TPU; the cofactor
    form is plain fused vector work.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve6x6_spd(H, g):
    """Batched 6x6 SPD solve via 3x3-block Schur complement.

    Closed-form inverse of the diagonal blocks (inv3x3) replaces the
    Cholesky custom call that jax.scipy.linalg.solve(assume_a='pos') emits —
    one per solver iteration inside PnP/GN loops.  H: [..., 6, 6] (assumed
    symmetric positive definite, e.g. J^T J + damping), g: [..., 6].
    """
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    D = H[..., 3:, 3:]
    Ai = inv3x3(A)
    AiB = Ai @ B
    S = D - jnp.swapaxes(B, -1, -2) @ AiB
    Si = inv3x3(S)
    g1 = g[..., :3, None]
    g2 = g[..., 3:, None]
    y2 = Si @ (g2 - jnp.swapaxes(AiB, -1, -2) @ g1)
    y1 = Ai @ g1 - AiB @ y2
    return jnp.concatenate([y1, y2], axis=-2)[..., 0]
