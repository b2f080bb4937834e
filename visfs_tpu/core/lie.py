"""SO(3)/SE(3) Lie-group primitives for the TPU-native VISFS engine.

Quaternions are stored as ``[w, x, y, z]`` float arrays (Hamilton convention,
matching Eigen's constructor order).  Rigid transforms are represented either
as ``(q, t)`` pairs or as 4x4 homogeneous matrices; helpers convert between
the two.  Everything here is shape-polymorphic pure-jnp so it vmaps/jits and
differentiates cleanly.

Functional parity targets (reference: supersaiyajinggod/VISFS):
  - ``delta_q``            <- utilite/include/Math.h:277-287  (deltaQ)
  - ``skew``               <- utilite/include/Math.h:294-301  (skewSymmetric)
  - ``quat_positify``      <- utilite/include/Math.h:308-317  (QuaternionPositify)
  - ``quat_left/right``    <- utilite/include/Math.h:324-345  (QuaternionLeft/Right)
  - ``so3_exp/so3_log``    <- utilite/include/Math.h:347-386  (expSO3/logSO3)
  - RPY conventions        <- pcl::getTransformation / getTranslationAndEulerAngles
                              (R = Rz(yaw) @ Ry(pitch) @ Rx(roll)), used throughout
                              Estimator.cpp / Extrapolator.cpp for motion models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion algebra  (q = [w, x, y, z])
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(a, b):
    """Hamilton product a*b for [w,x,y,z] quaternions (batched on leading dims)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q):
    """Inverse of a (near-)unit quaternion."""
    return quat_conj(q) / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_positify(q):
    """Flip sign so w >= 0, then normalize (Math.h:308-317)."""
    sign = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    return quat_normalize(q * sign)


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q."""
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def delta_q(omega):
    """Small-rotation quaternion (1, omega/2), unnormalized (Math.h:277-287).

    The reference leaves it unnormalized; normalization happens in the pose
    update.  We keep identical semantics.
    """
    half = 0.5 * omega
    one = jnp.ones(omega.shape[:-1] + (1,), dtype=omega.dtype)
    return jnp.concatenate([one, half], axis=-1)


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix (Math.h:294-301)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_left(q):
    """4x4 left-multiplication operator: quat_left(q) @ p == q*p (Math.h:324-334).

    Like the reference, the quaternion is positified first.
    """
    pq = quat_positify(q)
    w = pq[..., 0]
    v = pq[..., 1:4]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), v.shape[:-1] + (3, 3))
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * eye3 + skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right(q):
    """4x4 right-multiplication operator: quat_right(q) @ p == p*q (Math.h:336-345)."""
    pq = quat_positify(q)
    w = pq[..., 0]
    v = pq[..., 1:4]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), v.shape[:-1] + (3, 3))
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * eye3 - skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_mat(q):
    """Unit quaternion -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return r


def mat_to_quat(m):
    """Rotation matrix -> unit quaternion [w,x,y,z] (Shepperd's method, branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by the largest
    # diagonal combination (all computed, selected with where: jit-friendly).
    q0 = jnp.stack(
        [1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    q1 = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
    )
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return quat_positify(q)


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------

def so3_exp(w):
    """Axis-angle 3-vector -> rotation matrix (Math.h:347-369)."""
    d2 = jnp.sum(w * w, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    W = skew(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    # Taylor branch for tiny angles, closed form otherwise; both always
    # evaluated with safe denominators (jit-friendly select).
    small = d < 1e-5
    d_safe = jnp.where(small, 1.0, d)
    d2_safe = jnp.where(small, 1.0, d2)
    a = jnp.where(small, 1.0, jnp.sin(d_safe) / d_safe)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(d_safe)) / d2_safe)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix -> axis-angle 3-vector (Math.h:371-386)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    w = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    costheta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(costheta)
    s = jnp.sin(theta)
    scale = jnp.where(jnp.abs(s) < 1e-5, 1.0, theta / jnp.where(jnp.abs(s) < 1e-5, 1.0, s))
    return w * scale[..., None]


# ---------------------------------------------------------------------------
# SE(3): (q, t) pairs and 4x4 matrices
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return quat_identity(dtype), jnp.zeros(3, dtype=dtype)


def se3_matrix(q, t):
    """(q, t) -> 4x4 homogeneous transform."""
    R = quat_to_mat(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=q.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def se3_from_matrix(T):
    return mat_to_quat(T[..., :3, :3]), T[..., :3, 3]


def se3_mul(a, b):
    """Compose (qa,ta) * (qb,tb)."""
    qa, ta = a
    qb, tb = b
    return quat_mul(qa, qb), quat_rotate(qa, tb) + ta


def se3_inv(a):
    q, t = a
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def se3_apply(a, p):
    q, t = a
    return quat_rotate(q, p) + t


def mat_inv_se3(T):
    """Fast inverse of a rigid 4x4 transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., :, None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def mat_apply(T, p):
    """Apply 4x4 transform to 3-point(s)."""
    return (T[..., :3, :3] @ p[..., :, None])[..., 0] + T[..., :3, 3]


# ---------------------------------------------------------------------------
# RPY euler conventions (pcl::getTransformation compatible: R = Rz Ry Rx)
# ---------------------------------------------------------------------------

def rpy_to_mat(roll, pitch, yaw):
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_rpy(R):
    """Rotation matrix -> (roll, pitch, yaw), R = Rz(yaw) Ry(pitch) Rx(roll)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def xyzrpy_to_mat(x, y, z, roll, pitch, yaw):
    """pcl::getTransformation equivalent."""
    R = rpy_to_mat(roll, pitch, yaw)
    t = jnp.stack([x, y, z], axis=-1)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def mat_to_xyzrpy(T):
    """pcl::getTranslationAndEulerAngles equivalent -> (x,y,z,roll,pitch,yaw)."""
    roll, pitch, yaw = mat_to_rpy(T[..., :3, :3])
    return T[..., 0, 3], T[..., 1, 3], T[..., 2, 3], roll, pitch, yaw


def pose_update(q, t, delta):
    """Apply the BA pose update used by the reference vertex
    (OptimizeTypeDefine.cpp:7-14): t += dt; q = deltaQ(dw) * q; normalize.

    delta: [..., 6] = (dt[3], dw[3]).
    """
    t_new = t + delta[..., 0:3]
    q_new = quat_normalize(quat_mul(delta_q(delta[..., 3:6]), q))
    return q_new, t_new


def flatten_3dof(T):
    """Zero z/roll/pitch of a 4x4 pose (Estimator.cpp:368-375, Force3DoF)."""
    x, y, _, _, _, yaw = mat_to_xyzrpy(T)
    zero = jnp.zeros_like(x)
    return xyzrpy_to_mat(x, y, zero, zero, zero, yaw)
