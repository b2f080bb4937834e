"""Golden tests for core Lie-group math vs scipy/numpy closed forms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visfs_tpu.core import lie


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q, dtype=jnp.float32)


def test_quat_mul_identity(rng):
    q = random_quat(rng, (5,))
    e = jnp.broadcast_to(lie.quat_identity(), (5, 4))
    np.testing.assert_allclose(lie.quat_mul(q, e), q, atol=1e-6)
    np.testing.assert_allclose(lie.quat_mul(e, q), q, atol=1e-6)


def test_quat_mul_matches_rotation_compose(rng):
    qa, qb = random_quat(rng), random_quat(rng)
    Rab = lie.quat_to_mat(lie.quat_mul(qa, qb))
    np.testing.assert_allclose(
        Rab, lie.quat_to_mat(qa) @ lie.quat_to_mat(qb), atol=1e-5
    )


def test_quat_inverse(rng):
    q = random_quat(rng, (7,))
    e = lie.quat_mul(q, lie.quat_inv(q))
    np.testing.assert_allclose(e[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(e[:, 1:], 0.0, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (6,))
    v = jnp.asarray(rng.normal(size=(6, 3)), dtype=jnp.float32)
    Rv = jnp.einsum("nij,nj->ni", lie.quat_to_mat(q), v)
    np.testing.assert_allclose(lie.quat_rotate(q, v), Rv, atol=1e-5)


def test_mat_quat_roundtrip(rng):
    q = lie.quat_positify(random_quat(rng, (20,)))
    q2 = lie.mat_to_quat(lie.quat_to_mat(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_left_right_operators(rng):
    """quat_left(a) @ b == a*b and quat_right(b) @ a == a*b (Math.h:324-345).

    Both operators positify their argument, so compare against products of
    positified quaternions.
    """
    a = lie.quat_positify(random_quat(rng))
    b = lie.quat_positify(random_quat(rng))
    ab = lie.quat_mul(a, b)
    np.testing.assert_allclose(lie.quat_left(a) @ b, ab, atol=1e-5)
    np.testing.assert_allclose(lie.quat_right(b) @ a, ab, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(10, 3)) * 0.5, dtype=jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(lie.so3_log(R), w, atol=1e-4)
    # Orthonormality
    np.testing.assert_allclose(
        jnp.einsum("nij,nkj->nik", R, R),
        jnp.broadcast_to(jnp.eye(3), (10, 3, 3)),
        atol=1e-5,
    )


def test_so3_exp_small_angle():
    w = jnp.array([1e-7, -2e-7, 1e-7], dtype=jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(R, jnp.eye(3) + lie.skew(w), atol=1e-6)


def test_se3_compose_inverse(rng):
    q = lie.quat_positify(random_quat(rng))
    t = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    T = (q, t)
    Tinv = lie.se3_inv(T)
    qe, te = lie.se3_mul(T, Tinv)
    np.testing.assert_allclose(qe[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(te, 0.0, atol=1e-5)

    # matrix path agrees
    M = lie.se3_matrix(q, t)
    np.testing.assert_allclose(lie.mat_inv_se3(M), lie.se3_matrix(*Tinv), atol=1e-5)

    p = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        lie.se3_apply(T, p), lie.mat_apply(M, p), atol=1e-5
    )


def test_rpy_roundtrip(rng):
    roll, pitch, yaw = [
        jnp.asarray(v, dtype=jnp.float32)
        for v in rng.uniform(-1.2, 1.2, size=(3, 8))
    ]
    R = lie.rpy_to_mat(roll, pitch, yaw)
    r2, p2, y2 = lie.mat_to_rpy(R)
    np.testing.assert_allclose(r2, roll, atol=1e-5)
    np.testing.assert_allclose(p2, pitch, atol=1e-5)
    np.testing.assert_allclose(y2, yaw, atol=1e-5)


def test_rpy_convention_is_zyx():
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) — pcl::getTransformation order."""
    roll, pitch, yaw = 0.3, -0.2, 0.7
    Rx = np.array(
        [[1, 0, 0],
         [0, np.cos(roll), -np.sin(roll)],
         [0, np.sin(roll), np.cos(roll)]]
    )
    Ry = np.array(
        [[np.cos(pitch), 0, np.sin(pitch)],
         [0, 1, 0],
         [-np.sin(pitch), 0, np.cos(pitch)]]
    )
    Rz = np.array(
        [[np.cos(yaw), -np.sin(yaw), 0],
         [np.sin(yaw), np.cos(yaw), 0],
         [0, 0, 1]]
    )
    R = lie.rpy_to_mat(jnp.float32(roll), jnp.float32(pitch), jnp.float32(yaw))
    np.testing.assert_allclose(R, Rz @ Ry @ Rx, atol=1e-6)


def test_pose_update_matches_reference_rule(rng):
    """t += dt; q = deltaQ(dw)*q (OptimizeTypeDefine.cpp:7-14)."""
    q = lie.quat_positify(random_quat(rng))
    t = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    delta = jnp.asarray(rng.normal(size=6) * 0.01, dtype=jnp.float32)
    q2, t2 = lie.pose_update(q, t, delta)
    np.testing.assert_allclose(t2, t + delta[:3], atol=1e-6)
    expected_q = lie.quat_normalize(lie.quat_mul(lie.delta_q(delta[3:]), q))
    np.testing.assert_allclose(q2, expected_q, atol=1e-6)


def test_flatten_3dof(rng):
    T = lie.xyzrpy_to_mat(*[jnp.float32(v) for v in [1.0, 2.0, 3.0, 0.1, 0.2, 0.9]])
    F = lie.flatten_3dof(T)
    x, y, z, roll, pitch, yaw = lie.mat_to_xyzrpy(F)
    np.testing.assert_allclose([x, y, z], [1.0, 2.0, 0.0], atol=1e-5)
    np.testing.assert_allclose([roll, pitch], [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(yaw, 0.9, atol=1e-5)


def test_jit_and_vmap_compatible(rng):
    q = random_quat(rng, (16,))
    t = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    f = jax.jit(jax.vmap(lambda q, t: lie.se3_matrix(*lie.se3_inv((q, t)))))
    out = f(q, t)
    assert out.shape == (16, 4, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
