"""Tests for batched PnP RANSAC motion estimation."""

import numpy as np
import jax
import jax.numpy as jnp

from visfs_tpu.core import lie
from visfs_tpu.ops import pnp

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0
N = 80


def scene(rng, n=N):
    pts = np.stack(
        [
            rng.uniform(-3, 3, n),
            rng.uniform(-2, 2, n),
            rng.uniform(3, 10, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(pts)


def project(q, t, pts):
    pc = jax.vmap(lambda p: lie.quat_rotate(q, p) + t)(pts)
    return jnp.stack(
        [pc[:, 0] / pc[:, 2] * FX + CX, pc[:, 1] / pc[:, 2] * FY + CY], -1
    )


def gt_pose(rng, scale=0.1):
    d = jnp.asarray(
        np.concatenate([rng.normal(size=3) * scale, rng.normal(size=3) * scale]),
        dtype=jnp.float32,
    )
    return lie.pose_update(lie.quat_identity(), jnp.zeros(3), d)


def run(pw, uv, mask, q0, t0, seed=0, **kw):
    settings = pnp.PnPSettings(**kw) if kw else pnp.PnPSettings()
    f = jax.jit(
        lambda *a: pnp.solve_pnp_ransac(
            *a, FX, FY, CX, CY, jax.random.PRNGKey(seed), settings
        )
    )
    return f(pw, uv, mask, q0, t0)


class TestPnP:
    def test_exact_recovery_with_good_guess(self, rng):
        pw = scene(rng)
        q_gt, t_gt = gt_pose(rng)
        uv = project(q_gt, t_gt, pw)
        res = run(pw, uv, jnp.ones(N, bool), lie.quat_identity(), jnp.zeros(3))
        assert bool(res.ok)
        assert int(res.n_inliers) == N
        np.testing.assert_allclose(res.t, t_gt, atol=2e-3)
        assert float(jnp.abs(jnp.sum(res.q * q_gt))) > 0.99999

    def test_robust_to_outliers(self, rng):
        pw = scene(rng)
        q_gt, t_gt = gt_pose(rng)
        uv = np.array(project(q_gt, t_gt, pw))
        bad = rng.choice(N, size=N // 4, replace=False)
        uv[bad] += rng.uniform(30, 90, size=(len(bad), 2))
        res = run(pw, jnp.asarray(uv), jnp.ones(N, bool),
                  lie.quat_identity(), jnp.zeros(3))
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert not inl[bad].any()
        np.testing.assert_allclose(res.t, t_gt, atol=5e-3)

    def test_recovers_without_informative_guess(self, rng):
        """Guess = identity but true motion is substantial."""
        pw = scene(rng)
        d = jnp.asarray([0.3, -0.15, 0.25, 0.05, 0.08, -0.04], jnp.float32)
        q_gt, t_gt = lie.pose_update(lie.quat_identity(), jnp.zeros(3), d)
        uv = project(q_gt, t_gt, pw)
        res = run(pw, uv, jnp.ones(N, bool), lie.quat_identity(), jnp.zeros(3))
        assert bool(res.ok)
        np.testing.assert_allclose(res.t, t_gt, atol=1e-2)

    def test_insufficient_matches(self, rng):
        pw = scene(rng)
        q_gt, t_gt = gt_pose(rng)
        uv = project(q_gt, t_gt, pw)
        mask = jnp.zeros(N, bool).at[:5].set(True)
        res = run(pw, uv, mask, lie.quat_identity(), jnp.zeros(3))
        assert not bool(res.ok)

    def test_mask_excludes_points(self, rng):
        pw = np.array(scene(rng))
        q_gt, t_gt = gt_pose(rng)
        uv = np.array(project(jnp.asarray(q_gt), jnp.asarray(t_gt), jnp.asarray(pw)))
        # corrupt masked-out points wildly; they must not affect the result
        mask = np.ones(N, bool)
        mask[50:] = False
        uv[50:] = 1e5
        res = run(jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(mask),
                  lie.quat_identity(), jnp.zeros(3))
        assert bool(res.ok)
        np.testing.assert_allclose(res.t, t_gt, atol=5e-3)
        assert not np.asarray(res.inliers)[50:].any()

    def test_noisy_observations(self, rng):
        pw = scene(rng)
        q_gt, t_gt = gt_pose(rng)
        uv = project(q_gt, t_gt, pw) + jnp.asarray(
            rng.normal(size=(N, 2)) * 0.5, jnp.float32
        )
        res = run(pw, uv, jnp.ones(N, bool), lie.quat_identity(), jnp.zeros(3))
        assert bool(res.ok)
        np.testing.assert_allclose(res.t, t_gt, atol=2e-2)
        assert float(res.mean_err) < 1.5

class TestEPnP:
    """Closed-form minimal solver (Estimator/PnPFlags=1=EPNP, the reference
    default — Parameters.h:174, MultiviewGeometry.cpp:238)."""

    def test_epnp_exact_pose(self, rng):
        pw = scene(rng)
        # 50 deg rotation + large translation
        d = jnp.asarray([0.8, -0.5, 0.6, 0.3, 0.75, 0.25], jnp.float32)
        q_gt, t_gt = lie.pose_update(lie.quat_identity(), jnp.zeros(3), d)
        uv = project(q_gt, t_gt, pw)
        q, t, err = pnp.epnp_pose(pw, uv, jnp.ones(N, jnp.float32),
                                  FX, FY, CX, CY)
        assert float(err) < 0.5
        np.testing.assert_allclose(t, t_gt, atol=5e-3)
        assert float(jnp.abs(jnp.sum(q * q_gt))) > 0.9999

    def test_epnp_planar_scene(self, rng):
        """All points on a plane: the regularized control frame + Procrustes
        must still recover the pose (EPnP's classic degenerate case)."""
        pts = np.stack(
            [
                rng.uniform(-3, 3, N),
                rng.uniform(-2, 2, N),
                np.full(N, 6.0),
            ],
            axis=-1,
        ).astype(np.float32)
        pw = jnp.asarray(pts)
        d = jnp.asarray([0.4, -0.2, 0.3, 0.2, 0.3, 0.1], jnp.float32)
        q_gt, t_gt = lie.pose_update(lie.quat_identity(), jnp.zeros(3), d)
        uv = project(q_gt, t_gt, pw)
        q, t, err = pnp.epnp_pose(pw, uv, jnp.ones(N, jnp.float32),
                                  FX, FY, CX, CY)
        assert float(err) < 1.0

    def test_large_rotation_from_identity_guess(self, rng):
        """>= 40 deg rotation + large translation, identity prior: only the
        closed-form hypothesis path can land in the basin."""
        pw = scene(rng)
        # 49 deg total rotation, 1.1 m translation
        d = jnp.asarray([0.6, -0.4, 0.8, 0.5, 0.6, -0.3], jnp.float32)
        q_gt, t_gt = lie.pose_update(lie.quat_identity(), jnp.zeros(3), d)
        ang = 2 * np.arccos(min(abs(float(q_gt[0])), 1.0)) * 180 / np.pi
        assert ang >= 40.0, ang
        uv = project(q_gt, t_gt, pw)
        res = run(pw, uv, jnp.ones(N, bool), lie.quat_identity(),
                  jnp.zeros(3), flags=1)
        assert bool(res.ok)
        assert int(res.n_inliers) >= N - 2
        np.testing.assert_allclose(res.t, t_gt, atol=2e-2)
        assert float(jnp.abs(jnp.sum(res.q * q_gt))) > 0.999

    def test_flags_select_solver(self, rng):
        """flags selects the hypothesis solver.  At a constrained budget
        (2 hypotheses, 3 GN steps, no refinement) on a 130-degree rotation
        from an identity guess, GN-from-prior (flags=0) cannot reach the
        optimum while the closed-form EPnP hypothesis (flags=1) solves it
        outright.  (At the default budget the iterative mode's 50 random
        restarts also succeed — the modes differ in *mechanism*, which is
        what this pins.)"""
        pw = np.array(scene(rng))
        a = np.radians(130.0)
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        c = np.array([0, 0, 6.5], np.float32)
        t_gt = c - R @ c
        pc = (R @ pw.T).T + t_gt
        uv = jnp.asarray(
            np.stack([pc[:, 0] / pc[:, 2] * FX + CX,
                      pc[:, 1] / pc[:, 2] * FY + CY], -1)
        )
        vis = jnp.asarray(pc[:, 2] > 0.3)
        kw = dict(iterations=2, gn_iterations=3, refine_iterations=0)
        res_iter = run(jnp.asarray(pw), uv, vis, lie.quat_identity(),
                       jnp.zeros(3), flags=0, **kw)
        res_epnp = run(jnp.asarray(pw), uv, vis, lie.quat_identity(),
                       jnp.zeros(3), flags=1, **kw)
        assert bool(res_epnp.ok)
        np.testing.assert_allclose(res_epnp.t, t_gt, atol=2e-2)
        assert not bool(res_iter.ok)

    def test_epnp_with_outliers(self, rng):
        pw = scene(rng)
        d = jnp.asarray([0.5, -0.3, 0.5, 0.4, 0.5, -0.2], jnp.float32)
        q_gt, t_gt = lie.pose_update(lie.quat_identity(), jnp.zeros(3), d)
        uv = np.array(project(q_gt, t_gt, pw))
        bad = rng.choice(N, size=N // 5, replace=False)
        uv[bad] += rng.uniform(40, 100, size=(len(bad), 2))
        res = run(pw, jnp.asarray(uv), jnp.ones(N, bool),
                  lie.quat_identity(), jnp.zeros(3), flags=1)
        assert bool(res.ok)
        assert not np.asarray(res.inliers)[bad].any()
        np.testing.assert_allclose(res.t, t_gt, atol=2e-2)
