"""Global mapping back-end tests: keyframe graph + loop closure on the
8-device CPU mesh (BASELINE config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from visfs_tpu.core.lie import mat_inv_se3, xyzrpy_to_mat
from visfs_tpu.slam.mapping import MappingBackend


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("edges",))


def square_loop_trajectory(n_side=6, step=0.5, drift=0.01, seed=0):
    """Ground truth square loop + odometry-integrated (drifting) estimates."""
    rng = np.random.default_rng(seed)
    gt = [np.eye(4, dtype=np.float32)]
    # 4 sides of n_side forward steps, a 90deg turn after each side
    motions = []
    for side in range(4):
        motions += [(step, 0.0)] * n_side
        motions += [(0.0, np.pi / 2)]
    for (fwd, dyaw) in motions:
        d = np.asarray(
            xyzrpy_to_mat(*[jnp.float32(v) for v in
                            (fwd, 0.0, 0.0, 0.0, 0.0, dyaw)])
        )
        gt.append((gt[-1] @ d).astype(np.float32))

    est = [gt[0]]
    for k in range(1, len(gt)):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.asarray(
            xyzrpy_to_mat(*[jnp.float32(v) for v in (
                rng.normal(0, drift), rng.normal(0, drift), 0.0,
                0.0, 0.0, rng.normal(0, drift))])
        )
        est.append((est[-1] @ rel @ noise).astype(np.float32))
    return np.stack(gt), np.stack(est)


class TestMappingBackend:
    def test_loop_closure_reduces_drift(self, mesh):
        gt, est = square_loop_trajectory(drift=0.015, seed=3)
        backend = MappingBackend(mesh, max_nodes=64, max_edges=512)
        for k in range(len(est)):
            backend.add_keyframe(est[k], float(k))

        err_before = np.linalg.norm(
            backend.poses()[:, :3, 3] - gt[: len(est), :3, 3], axis=-1
        )

        # loop closure: final pose revisits the start
        rel = np.linalg.inv(gt[0]) @ gt[len(est) - 1]
        backend.add_loop_closure(0, len(est) - 1, rel, info=1e5)
        # and a mid-loop constraint
        mid = len(est) // 2
        backend.add_loop_closure(
            0, mid, np.linalg.inv(gt[0]) @ gt[mid], info=1e5
        )
        chi2 = backend.optimize(iterations=10, cg_iters=80)

        err_after = np.linalg.norm(
            backend.poses()[:, :3, 3] - gt[: len(est), :3, 3], axis=-1
        )
        assert err_after.max() < err_before.max() * 0.5, (
            err_before.max(), err_after.max(), chi2
        )
        # anchor unchanged
        np.testing.assert_allclose(backend.poses()[0], est[0], atol=1e-5)

    def test_candidates_by_proximity(self, mesh):
        gt, est = square_loop_trajectory(drift=0.0)
        backend = MappingBackend(mesh, max_nodes=64, max_edges=512)
        for k in range(len(est)):
            backend.add_keyframe(est[k], float(k))
        cands = backend.loop_candidates(radius=1.0, min_gap=10)
        assert len(cands) > 0
        # the closing pair (near-start, near-end) must appear
        assert any(c[0] <= 2 and c[1] >= len(est) - 4 for c in cands), cands

    def test_vo_integration(self, mesh):
        """Keyframes flow from FrameOutputs of the VO front-end."""
        from visfs_tpu.io.sim import generate_sequence
        from visfs_tpu.slam.system import System

        seq = generate_sequence(n_frames=8, n_points=300, seed=44)
        cam = seq.camera
        # low parallax threshold so this short sequence produces keyframes
        sys_ = System({"Tracker/MaxFeatures": 100, "Tracker/MinDistance": 16,
                       "LocalMap/MinParallax": 2.0})
        sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
                  float(cam.baseline), width=cam.width, height=cam.height)
        outs = sys_.run_sequence(seq.stamps, seq.left, seq.right)
        backend = MappingBackend(mesh, max_nodes=64, max_edges=256)
        added = sum(backend.maybe_add(o) for o in outs)
        assert added >= 1
        assert int(backend.graph.n_nodes) == added


class TestLoopVerification:
    """verify_loop: NCC patch matching + PnP relative pose between
    keyframe snapshots (the geometric-verification role rtabmap plays
    downstream of the reference)."""

    def test_recovers_relative_pose_and_rejects_junk(self, mesh):
        import jax.numpy as jnp

        from visfs_tpu.io.sim import generate_sequence
        from visfs_tpu.slam.mapping import verify_loop
        from visfs_tpu.slam.system import System

        seq = generate_sequence(n_frames=8, n_points=500, width=200,
                                height=150, motion="arc", seed=5)
        cam = seq.camera
        s = System({"Tracker/MaxFeatures": 80, "Tracker/MinDistance": 8,
                    "Optimizer/Iterations": 8})
        s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               float(cam.baseline), width=cam.width, height=cam.height)
        snaps, poses = [], []
        for k in range(6):
            s.input_primary_sensor_data(float(seq.stamps[k]), seq.left[k],
                                        seq.right[k])
            out = s.output_odometry_info()
            snaps.append(s.keyframe_snapshot(max_kp=48))
            poses.append(np.asarray(seq.poses[k]))

        i, j = 2, 5
        rel, ok, n_inl = verify_loop(
            snaps[i], snaps[j], s.camera, jax.random.PRNGKey(0),
            min_inliers=10,
        )
        assert bool(ok) and int(n_inl) >= 10
        rel_gt = np.linalg.inv(poses[i]) @ poses[j]
        np.testing.assert_allclose(np.asarray(rel)[:3, 3], rel_gt[:3, 3],
                                   atol=0.05)
        # rotation error
        dR = np.asarray(rel)[:3, :3].T @ rel_gt[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 3.0

        # junk pair: snapshot vs itself with scrambled patches must fail
        bad = snaps[j]._replace(
            patch=jnp.asarray(
                np.random.default_rng(0).normal(size=snaps[j].patch.shape),
                jnp.float32),
        )
        _, ok_bad, n_bad = verify_loop(
            snaps[i], bad, s.camera, jax.random.PRNGKey(1), min_inliers=10,
        )
        assert (not bool(ok_bad)) or int(n_bad) < 10

    def test_close_loops_end_to_end(self, mesh):
        from visfs_tpu.io.sim import generate_sequence
        from visfs_tpu.slam.mapping import MappingBackend
        from visfs_tpu.slam.system import System

        seq = generate_sequence(n_frames=8, n_points=500, width=200,
                                height=150, motion="arc", seed=5)
        cam = seq.camera
        s = System({"Tracker/MaxFeatures": 80, "Tracker/MinDistance": 8,
                    "Optimizer/Iterations": 8})
        s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               float(cam.baseline), width=cam.width, height=cam.height)
        backend = MappingBackend(mesh, max_nodes=16, max_edges=64)
        for k in range(6):
            s.input_primary_sensor_data(float(seq.stamps[k]), seq.left[k],
                                        seq.right[k])
            out = s.output_odometry_info()
            backend.add_keyframe(np.asarray(out.pose), float(k),
                                 snapshot=s.keyframe_snapshot(max_kp=48))
        # arc stays within a small radius -> early/late frames are
        # proximity candidates once min_gap allows
        added = backend.close_loops(s.camera, radius=5.0, min_gap=3,
                                    min_inliers=10)
        # idempotent: decided pairs are never re-added
        assert backend.close_loops(s.camera, radius=5.0, min_gap=3,
                                   min_inliers=10) == 0
        assert added >= 1
        chi2 = backend.optimize(iterations=5, cg_iters=16)
        assert np.isfinite(chi2)


class TestRigid3D:
    """ops/rigid.py: Kabsch + RANSAC absolute orientation."""

    def test_recovers_transform_under_outliers(self):
        import jax.numpy as jnp

        from visfs_tpu.core.lie import xyzrpy_to_mat
        from visfs_tpu.ops.rigid import estimate_rigid_3d

        rng = np.random.default_rng(7)
        T = np.asarray(xyzrpy_to_mat(*[jnp.float32(v) for v in
                                       (0.4, -0.2, 0.1, 0.1, -0.2, 1.2)]))
        p_j = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
        p_i = (p_j @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        # corrupt 30% with gross outliers
        bad = rng.choice(40, 12, replace=False)
        p_i[bad] += rng.uniform(1, 3, (12, 3)).astype(np.float32)
        res = estimate_rigid_3d(
            jnp.asarray(p_i), jnp.asarray(p_j),
            jnp.ones(40, bool), jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.rotation), T[:3, :3],
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.translation), T[:3, 3],
                                   atol=1e-3)
        # the corrupted rows are flagged as outliers
        assert not np.any(np.asarray(res.inliers)[bad])

    def test_rejects_pure_noise(self):
        import jax.numpy as jnp

        from visfs_tpu.ops.rigid import estimate_rigid_3d

        rng = np.random.default_rng(8)
        a = jnp.asarray(rng.uniform(-2, 2, (30, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(-2, 2, (30, 3)), jnp.float32)
        res = estimate_rigid_3d(a, b, jnp.ones(30, bool),
                                jax.random.PRNGKey(1), min_inliers=8)
        assert not bool(res.ok)
