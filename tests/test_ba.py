"""End-to-end tests of the sliding-window Schur BA solver on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp

from visfs_tpu.core import lie
from visfs_tpu.solver import ba
from visfs_tpu.solver.factors import StereoIntrinsics, project_stereo_point


P = 6  # window slots
L = 60  # landmark capacity


def make_intr():
    return StereoIntrinsics(
        fx=jnp.float32(400.0), fy=jnp.float32(400.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        bf=jnp.float32(400.0 * 0.1),
    )


def synthetic_problem(rng, noise_px=0.0, pose_noise=0.02, lm_noise=0.05,
                      n_outliers=0, with_links=False):
    """Ground-truth forward-moving camera observing a wall of points.

    Returns (problem, gt_pose_q, gt_pose_t, gt_lm).  Poses are Tcw.
    """
    intr = make_intr()
    # Ground-truth camera centers along +z (world), small rotations
    gt_q, gt_t = [], []
    for i in range(P):
        # Twc: camera at z = 0.1*i, looking down +z
        ang = 0.01 * i
        q_wc = lie.quat_positify(
            jnp.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0],
                      dtype=jnp.float32)
        )
        t_wc = jnp.array([0.02 * i, 0.0, 0.1 * i], dtype=jnp.float32)
        q_cw, t_cw = lie.se3_inv((q_wc, t_wc))
        gt_q.append(q_cw)
        gt_t.append(t_cw)
    gt_q = jnp.stack(gt_q)
    gt_t = jnp.stack(gt_t)

    # Landmarks: in front of all cameras (z in [3, 8])
    pts = np.stack(
        [
            rng.uniform(-2.5, 2.5, size=L),
            rng.uniform(-1.8, 1.8, size=L),
            rng.uniform(3.0, 8.0, size=L),
        ],
        axis=-1,
    ).astype(np.float32)
    gt_lm = jnp.asarray(pts)

    # Observations: project into every pose
    def obs_for(qcw, tcw):
        pc = jax.vmap(lambda p: lie.quat_rotate(qcw, p) + tcw)(gt_lm)
        return jax.vmap(lambda p: project_stereo_point(p, intr))(pc)

    obs = jnp.stack([obs_for(gt_q[i], gt_t[i]) for i in range(P)], axis=1)
    if noise_px > 0:
        obs = obs + jnp.asarray(
            rng.normal(size=obs.shape) * noise_px, dtype=jnp.float32
        )

    outlier_mask = np.zeros((L, P), dtype=bool)
    if n_outliers:
        bad = rng.choice(L, size=n_outliers, replace=False)
        obs = obs.at[bad, P - 1, :2].add(50.0)
        outlier_mask[bad, P - 1] = True

    # Perturb initial state (root pose exact: it is fixed)
    pq = [gt_q[0]]
    pt = [gt_t[0]]
    for i in range(1, P):
        d = jnp.asarray(
            np.concatenate([
                rng.normal(size=3) * pose_noise,
                rng.normal(size=3) * pose_noise,
            ]),
            dtype=jnp.float32,
        )
        q, t = lie.pose_update(gt_q[i], gt_t[i], d)
        pq.append(q)
        pt.append(t)
    pose_q = jnp.stack(pq)
    pose_t = jnp.stack(pt)
    lm0 = gt_lm + jnp.asarray(
        rng.normal(size=(L, 3)) * lm_noise, dtype=jnp.float32
    )

    link_q = jnp.zeros((P - 1, 4), dtype=jnp.float32).at[:, 0].set(1.0)
    link_t = jnp.zeros((P - 1, 3), dtype=jnp.float32)
    link_mask = jnp.zeros(P - 1, dtype=bool)
    if with_links:
        lq, lt = [], []
        for i in range(P - 1):
            mq, mt = lie.se3_mul(
                (gt_q[i], gt_t[i]), lie.se3_inv((gt_q[i + 1], gt_t[i + 1]))
            )
            lq.append(mq)
            lt.append(mt)
        link_q = jnp.stack(lq)
        link_t = jnp.stack(lt)
        link_mask = jnp.ones(P - 1, dtype=bool)

    problem = ba.BAProblem(
        pose_q=pose_q, pose_t=pose_t,
        pose_valid=jnp.ones(P, dtype=bool),
        pose_fixed=jnp.zeros(P, dtype=bool).at[0].set(True),
        lm_pos=lm0,
        lm_valid=jnp.ones(L, dtype=bool),
        lm_fixed=jnp.zeros(L, dtype=bool),
        obs=obs,
        obs_mask=jnp.ones((L, P), dtype=bool),
        link_q=link_q, link_t=link_t, link_mask=link_mask,
        intr=intr,
    )
    return problem, gt_q, gt_t, gt_lm, jnp.asarray(outlier_mask)


def pose_errors(res, gt_q, gt_t):
    terr = jnp.linalg.norm(res.pose_t - gt_t, axis=-1)
    qdot = jnp.abs(jnp.sum(res.pose_q * gt_q, axis=-1))
    aerr = 2 * jnp.arccos(jnp.clip(qdot, 0, 1))
    return terr, aerr


class TestLocalOptimize:
    def test_converges_noise_free(self, rng):
        problem, gt_q, gt_t, gt_lm, _ = synthetic_problem(rng)
        settings = ba.BASettings(iterations=10)
        res = jax.jit(
            lambda p: ba.local_optimize(p, settings)
        )(problem)
        assert bool(res.ok)
        terr, aerr = pose_errors(res, gt_q, gt_t)
        assert float(terr.max()) < 2e-3, terr
        assert float(aerr.max()) < 2e-3, aerr
        assert not bool(res.outliers.any())

    def test_root_pose_stays_fixed(self, rng):
        problem, gt_q, gt_t, _, _ = synthetic_problem(rng)
        res = ba.local_optimize(problem, ba.BASettings(iterations=6))
        np.testing.assert_allclose(res.pose_q[0], problem.pose_q[0])
        np.testing.assert_allclose(res.pose_t[0], problem.pose_t[0])

    def test_converges_with_pixel_noise(self, rng):
        problem, gt_q, gt_t, gt_lm, _ = synthetic_problem(rng, noise_px=0.5)
        res = ba.local_optimize(problem, ba.BASettings(iterations=10))
        assert bool(res.ok)
        terr, _ = pose_errors(res, gt_q, gt_t)
        # Should improve substantially over the initial perturbation (~2-5 cm)
        assert float(terr.max()) < 0.02

    def test_outlier_detection_and_demotion(self, rng):
        problem, gt_q, gt_t, _, gt_out = synthetic_problem(
            rng, noise_px=0.3, n_outliers=8
        )
        res = ba.local_optimize(problem, ba.BASettings(iterations=10))
        assert bool(res.ok)
        found = np.asarray(res.outliers)
        expected = np.asarray(gt_out)
        # every injected 50px outlier must be flagged
        assert (found & expected).sum() == expected.sum()
        # and pose accuracy survives the contamination
        terr, _ = pose_errors(res, gt_q, gt_t)
        assert float(terr.max()) < 0.02

    def test_odometry_links_constrain_poses(self, rng):
        """With exact odometry links and few observations, links dominate."""
        problem, gt_q, gt_t, _, _ = synthetic_problem(
            rng, with_links=True, pose_noise=0.05
        )
        # Keep only a handful of visual observations
        mask = np.zeros((L, P), dtype=bool)
        mask[:15] = True
        problem = problem._replace(obs_mask=jnp.asarray(mask))
        res = ba.local_optimize(problem, ba.BASettings(iterations=10))
        assert bool(res.ok)
        terr, aerr = pose_errors(res, gt_q, gt_t)
        assert float(terr.max()) < 5e-3
        assert float(aerr.max()) < 5e-3

    def test_fixed_landmarks_do_not_move(self, rng):
        problem, *_ = synthetic_problem(rng)
        fixed = jnp.zeros(L, dtype=bool).at[:10].set(True)
        problem = problem._replace(lm_fixed=fixed)
        res = ba.local_optimize(problem, ba.BASettings(iterations=6))
        np.testing.assert_allclose(
            res.lm_pos[:10], problem.lm_pos[:10], atol=1e-7
        )

    def test_gauss_newton_mode(self, rng):
        problem, gt_q, gt_t, _, _ = synthetic_problem(rng)
        res = ba.local_optimize(
            problem, ba.BASettings(iterations=10, use_levenberg=False)
        )
        assert bool(res.ok)
        terr, _ = pose_errors(res, gt_q, gt_t)
        assert float(terr.max()) < 2e-3

    def test_invalid_pose_slots_ignored(self, rng):
        """Window warm-up: only 3 of 6 slots populated."""
        problem, gt_q, gt_t, _, _ = synthetic_problem(rng)
        valid = jnp.array([True, True, True, False, False, False])
        mask = np.array(problem.obs_mask)
        mask[:, 3:] = False
        problem = problem._replace(
            pose_valid=valid,
            pose_fixed=jnp.array([True, False, False, True, True, True]),
            obs_mask=jnp.asarray(mask),
        )
        res = ba.local_optimize(problem, ba.BASettings(iterations=8))
        assert bool(res.ok)
        terr, _ = pose_errors(res, gt_q, gt_t)
        assert float(terr[:3].max()) < 2e-3
        # untouched slots unchanged
        np.testing.assert_allclose(res.pose_t[3:], problem.pose_t[3:])
