"""Golden tests: analytic factor Jacobians vs jax.jacfwd, residual models."""

import numpy as np
import jax
import jax.numpy as jnp

from visfs_tpu.core import lie
from visfs_tpu.solver import factors
from visfs_tpu.solver.factors import StereoIntrinsics


def make_intr():
    return StereoIntrinsics(
        fx=jnp.float32(458.0), fy=jnp.float32(457.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        bf=jnp.float32(458.0 * 0.05),
    )


def random_pose(rng, scale=0.3):
    q = lie.quat_positify(
        jnp.asarray(rng.normal(size=4), dtype=jnp.float32)
    )
    t = jnp.asarray(rng.normal(size=3) * scale, dtype=jnp.float32)
    return q, t


class TestStereoFactor:
    def test_residual_zero_at_exact_projection(self, rng):
        intr = make_intr()
        q, t = random_pose(rng)
        pw = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
        pc = lie.quat_rotate(q, pw) + t
        # Ensure positive depth by reflecting if needed
        pc = jnp.where(pc[2] < 0.5, pc.at[2].set(2.0), pc)
        pw = lie.quat_rotate(lie.quat_conj(q), pc - t)
        obs = factors.project_stereo_point(pc, intr)
        r = factors.stereo_residual(q, t, pw, obs, intr)
        np.testing.assert_allclose(r, 0.0, atol=1e-3)

    def test_observation_model_disparity(self):
        """uR = uL - bf/z (Optimizer.cpp:184-196 disparity model)."""
        intr = make_intr()
        pc = jnp.array([0.5, -0.2, 4.0], dtype=jnp.float32)
        obs = factors.project_stereo_point(pc, intr)
        np.testing.assert_allclose(obs[0] - obs[2], intr.bf / 4.0, rtol=1e-5)

    def test_jacobians_match_autodiff(self, rng):
        intr = make_intr()
        for _ in range(5):
            q, t = random_pose(rng)
            # Point in front of the camera
            pc_target = jnp.asarray(
                [rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(1.5, 8)],
                dtype=jnp.float32,
            )
            pw = lie.quat_rotate(lie.quat_conj(q), pc_target - t)
            obs = factors.project_stereo_point(pc_target, intr) + 0.5

            J_pose, J_point = factors.stereo_jacobians(q, t, pw, intr)

            def res_d(delta, p):
                nq, nt = factors.apply_tangent(q, t, delta)
                return factors.stereo_residual(nq, nt, p, obs, intr)

            zero = jnp.zeros(6, dtype=jnp.float32)
            J_pose_ad = jax.jacfwd(res_d, argnums=0)(zero, pw)
            J_point_ad = jax.jacfwd(res_d, argnums=1)(zero, pw)
            np.testing.assert_allclose(J_pose, J_pose_ad, rtol=2e-3, atol=2e-2)
            np.testing.assert_allclose(J_point, J_point_ad, rtol=2e-3, atol=2e-2)


class TestPoseLinkFactor:
    def test_zero_residual_at_consistent_measurement(self, rng):
        q1, t1 = random_pose(rng)
        q2, t2 = random_pose(rng)
        # measurement = Tc1w * Twc2 = Tc1w * (Tc2w)^-1
        T1 = (q1, t1)
        T2inv = lie.se3_inv((q2, t2))
        mq, mt = lie.se3_mul(T1, T2inv)
        r = factors.pose_link_residual(q1, t1, q2, t2, mq, mt)
        np.testing.assert_allclose(r, 0.0, atol=1e-5)

    def test_residual_matches_reference_form(self, rng):
        """e_t = q1*(q2^-1*(-t2)) + t1 - t12 (OptimizeTypeDefine.cpp:35-50)."""
        q1, t1 = random_pose(rng)
        q2, t2 = random_pose(rng)
        mq, mt = random_pose(rng)
        r = factors.pose_link_residual(q1, t1, q2, t2, mq, mt)
        e_t = (
            lie.quat_rotate(q1, lie.quat_rotate(lie.quat_conj(q2), -t2))
            + t1 - mt
        )
        e_q = 2.0 * lie.quat_mul(
            lie.quat_mul(lie.quat_conj(mq), q1), lie.quat_conj(q2)
        )[1:]
        np.testing.assert_allclose(r[:3], e_t, atol=1e-5)
        np.testing.assert_allclose(r[3:], e_q, atol=1e-5)

    def test_jacobians_match_autodiff(self, rng):
        q1, t1 = random_pose(rng)
        q2, t2 = random_pose(rng)
        mq, mt = random_pose(rng)
        J1, J2 = factors.pose_link_jacobians(q1, t1, q2, t2, mq, mt)

        def res_of(d1, d2):
            nq1, nt1 = factors.apply_tangent(q1, t1, d1)
            nq2, nt2 = factors.apply_tangent(q2, t2, d2)
            return factors.pose_link_residual(nq1, nt1, nq2, nt2, mq, mt)

        zero = jnp.zeros(6, dtype=jnp.float32)
        J1_ad = jax.jacfwd(res_of, argnums=0)(zero, zero)
        J2_ad = jax.jacfwd(res_of, argnums=1)(zero, zero)
        np.testing.assert_allclose(J1, J1_ad, atol=1e-4)
        np.testing.assert_allclose(J2, J2_ad, atol=1e-4)

    def test_translation_jacobian_blocks(self, rng):
        """dI/dt1 = I and de_t/dt2 = -R1 R2^T, as in the reference closed
        forms (OptimizeTypeDefine.cpp:52-88)."""
        q1, t1 = random_pose(rng)
        q2, t2 = random_pose(rng)
        mq, mt = random_pose(rng)
        J1, J2 = factors.pose_link_jacobians(q1, t1, q2, t2, mq, mt)
        np.testing.assert_allclose(J1[:3, :3], jnp.eye(3), atol=1e-5)
        R12 = lie.quat_to_mat(lie.quat_mul(q1, lie.quat_conj(q2)))
        np.testing.assert_allclose(J2[:3, :3], -R12, atol=1e-4)
        # rotation error does not depend on translations
        np.testing.assert_allclose(J1[3:, :3], 0.0, atol=1e-5)
        np.testing.assert_allclose(J2[3:, :3], 0.0, atol=1e-5)


class TestHuber:
    def test_inlier_weight_is_one(self):
        w = factors.huber_weight(jnp.float32(4.0), 8.0)
        np.testing.assert_allclose(w, 1.0)

    def test_outlier_weight(self):
        chi2 = jnp.float32(400.0)
        w = factors.huber_weight(chi2, 8.0)
        np.testing.assert_allclose(w, 8.0 / 20.0, rtol=1e-5)

    def test_disabled_kernel(self):
        w = factors.huber_weight(jnp.float32(1e6), 0.0)
        np.testing.assert_allclose(w, 1.0)
