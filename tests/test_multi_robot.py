"""Multi-robot mapping session: N VO streams -> one shared keyframe graph
with cross-robot loop closures (BASELINE config 5; the composition the
reference delegates to rtabmap, simMapping.launch:10-14)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from visfs_tpu.core.lie import xyzrpy_to_mat
from visfs_tpu.slam.mapping import MappingBackend
from visfs_tpu.slam.multi_robot import MultiRobotMapping


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("edges",))


def drifting_chain(gt_offsets, start, drift, seed):
    """Integrate noisy odometry along a list of (dx, dyaw) motions."""
    rng = np.random.default_rng(seed)
    gt = [np.asarray(start, np.float32)]
    est = [np.asarray(start, np.float32)]
    for (fwd, dyaw) in gt_offsets:
        d = np.asarray(xyzrpy_to_mat(*[jnp.float32(v) for v in
                                       (fwd, 0.0, 0.0, 0.0, 0.0, dyaw)]))
        gt.append((gt[-1] @ d).astype(np.float32))
        noise = np.asarray(xyzrpy_to_mat(*[jnp.float32(v) for v in (
            rng.normal(0, drift), rng.normal(0, drift), 0.0,
            0.0, 0.0, rng.normal(0, drift))]))
        est.append((est[-1] @ d @ noise).astype(np.float32))
    return np.stack(gt), np.stack(est)


class TestMultiRobotGraph:
    """Graph-level semantics: per-robot odometry chains + cross closures."""

    def test_chains_do_not_cross_and_closure_fuses(self, mesh):
        # Two robots traverse the same corridor in opposite directions.
        # Robot B's start guess is WRONG by ~0.5 m / 0.1 rad (the unknown-
        # relative-start fleet case): cross-robot closures must snap B's
        # whole chain into A's frame.
        motions = [(0.5, 0.0)] * 12
        gt_a, est_a = drifting_chain(motions, np.eye(4), 0.01, seed=1)
        start_b = np.asarray(xyzrpy_to_mat(*[jnp.float32(v) for v in
                                             (6.0, 1.0, 0.0, 0, 0, np.pi)]))
        gt_b, _ = drifting_chain(motions, start_b, 0.0, seed=2)
        start_err = np.asarray(xyzrpy_to_mat(*[jnp.float32(v) for v in
                                               (0.4, -0.3, 0.0, 0, 0, 0.1)]))
        _, est_b = drifting_chain(motions, start_b @ start_err, 0.01, seed=2)

        backend = MappingBackend(mesh, max_nodes=64, max_edges=256)
        for k in range(len(est_a)):
            backend.add_keyframe(est_a[k], float(k), robot=0)
        for k in range(len(est_b)):
            backend.add_keyframe(est_b[k], float(k), robot=1)

        g = backend.graph
        n_e = int(g.n_edges)
        ei = np.asarray(g.edge_i[:n_e])
        ej = np.asarray(g.edge_j[:n_e])
        rob = np.asarray(g.robot)
        # All odometry edges stay within one robot's chain.
        assert (rob[ei] == rob[ej]).all()
        # Robot 1's first node has no odometry edge at all.
        first_b = len(est_a)
        assert not np.isin(first_b, ej).any() or \
            (rob[ei[ej == first_b]] == 1).all()

        # Cross-robot closures from ground truth.
        for (i, j) in [(2, 10), (6, 6), (10, 2), (4, 4), (8, 8), (12, 12)]:
            rel = np.linalg.inv(gt_a[i]) @ gt_b[j]
            backend.add_loop_closure(i, len(est_a) + j, rel, info=1e5)

        gt_all = np.concatenate([gt_a, gt_b])[:, :3, 3]
        err_before = np.linalg.norm(backend.poses()[:, :3, 3] - gt_all,
                                    axis=-1)
        backend.optimize(iterations=15, cg_iters=80)
        err_after = np.linalg.norm(backend.poses()[:, :3, 3] - gt_all,
                                   axis=-1)
        # B's chain starts ~0.5 m off; closures must pull its error down to
        # A's drift level.
        b_before = err_before[first_b:]
        b_after = err_after[first_b:]
        assert b_before.mean() > 0.3, b_before.mean()  # scenario sanity
        assert b_after.mean() < b_before.mean() * 0.4, (
            b_before.mean(), b_after.mean())
        # closure consistency: tied pairs agree with the measurement
        poses = backend.poses()
        rel_opt = np.linalg.inv(poses[6]) @ poses[first_b + 6]
        rel_gt = np.linalg.inv(gt_a[6]) @ gt_b[6]
        np.testing.assert_allclose(rel_opt[:3, 3], rel_gt[:3, 3], atol=0.1)

    def test_cross_robot_candidates_ignore_index_gap(self, mesh):
        backend = MappingBackend(mesh, max_nodes=32, max_edges=64)
        # Robot 0 then robot 1 at the SAME position: adjacent indices.
        backend.add_keyframe(np.eye(4, dtype=np.float32), 0.0, robot=0)
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.5
        backend.add_keyframe(p, 1.0, robot=1)
        cands = backend.loop_candidates(radius=2.0, min_gap=10)
        assert len(cands) >= 1 and (cands == [0, 1]).all(axis=1).any()


@pytest.mark.slow
class TestMultiRobotE2E:
    """Two robots run full VO over overlapping laps of one textured world;
    a cross-robot closure must be found, verified, and reduce joint error."""

    def test_two_robot_session(self, mesh):
        from visfs_tpu.io.sim import cached_textured_sequence

        n_frames, lap = 160, 80
        seq = cached_textured_sequence(
            n_frames=n_frames, width=256, height=192, motion="square",
            seed=11, loops=2.0, room=(-3.0, 13.0, -6.0, 6.0),
        )
        cam = seq.camera

        session = MultiRobotMapping(
            {"Tracker/MaxFeatures": 100, "Tracker/MinDistance": 14,
             "Tracker/QualityLevel": 0.05, "Optimizer/Iterations": 10,
             "Estimator/Force3DoF": True,
             "LocalMap/MinParallax": 30.0, "LocalMap/MinTranslation": 0.5},
            n_robots=2, mesh=mesh,
            # Robot B starts where lap 2 begins — a known world-frame pose.
            start_poses=[np.eye(4, dtype=np.float32), seq.poses[lap]],
            max_nodes=128, max_edges=512, snapshot_kp=48,
        )
        session.init(float(cam.fx), float(cam.fy), float(cam.cx),
                     float(cam.cy), float(cam.baseline), width=cam.width,
                     height=cam.height)

        # Robot A drives lap 1, robot B lap 2 (same world, same path).
        # B's VO is relative to its own start; the session lifts it by
        # start_poses[1].
        for k in range(lap):
            session.input_primary_sensor_data(
                0, float(seq.stamps[k]), seq.left[k], seq.right[k])
        for k in range(lap, n_frames):
            session.input_primary_sensor_data(
                1, float(seq.stamps[k]), seq.left[k], seq.right[k])
        session.finish()

        counts = session.keyframe_counts()
        assert counts[0] >= 3 and counts[1] >= 3, counts

        added = session.close_loops(radius=2.5, min_gap=8, min_inliers=10)
        assert session.cross_robot_edges() >= 1, (
            f"no cross-robot closure accepted (added={added})")

        # Ground truth at each keyframe's stamp.
        g = session.backend.graph
        n = int(g.n_nodes)
        stamps = np.asarray(g.stamp[:n])
        rob = np.asarray(g.robot[:n])
        idx = np.searchsorted(seq.stamps, stamps - 1e-6)
        idx = np.clip(idx, 0, n_frames - 1)
        gt = seq.poses[idx]
        # Robot B's VO poses were lifted by the TRUE start pose, so both
        # error_before and error_after are measured in one world frame.
        err_before = np.linalg.norm(
            session.poses()[:, :2, 3] - gt[:, :2, 3], axis=-1)
        session.optimize(iterations=10, cg_iters=60)
        err_after = np.linalg.norm(
            session.poses()[:, :2, 3] - gt[:, :2, 3], axis=-1)
        # The joint solve must not diverge, and should reduce the worst
        # drift when the closure carries information.
        assert np.isfinite(err_after).all()
        assert err_after.max() <= err_before.max() * 1.05 + 1e-3, (
            err_before.max(), err_after.max())
        assert err_after.mean() <= err_before.mean() * 1.02 + 1e-3


@pytest.mark.slow
class TestFleetMapping:
    """Lockstep dp-fleet variant: two robots advance as one sharded XLA
    program per frame, harvesting into the same shared graph."""

    def test_two_robot_lockstep_session(self):
        from visfs_tpu.io.sim import cached_textured_sequence
        from visfs_tpu.slam.multi_robot import FleetMapping

        n_frames, lap = 160, 80
        seq = cached_textured_sequence(
            n_frames=n_frames, width=256, height=192, motion="square",
            seed=11, loops=2.0, room=(-3.0, 13.0, -6.0, 6.0),
        )
        cam = seq.camera
        mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
        session = FleetMapping(
            {"Tracker/MaxFeatures": 100, "Tracker/MinDistance": 14,
             "Tracker/QualityLevel": 0.05, "Optimizer/Iterations": 10,
             "Estimator/Force3DoF": True,
             "LocalMap/MinParallax": 30.0, "LocalMap/MinTranslation": 0.5},
            mesh,
            start_poses=[np.eye(4, dtype=np.float32), seq.poses[lap]],
            max_nodes=256, max_edges=1024, snapshot_kp=48,
        )
        session.init(float(cam.fx), float(cam.fy), float(cam.cx),
                     float(cam.cy), float(cam.baseline), width=cam.width,
                     height=cam.height)

        lefts = np.asarray(seq.left, np.float32)
        rights = np.asarray(seq.right, np.float32)
        for k in range(lap):
            session.step(
                np.asarray([seq.stamps[k], seq.stamps[lap + k]]),
                np.stack([lefts[k], lefts[lap + k]]),
                np.stack([rights[k], rights[lap + k]]),
            )
        counts = session.keyframe_counts()
        assert counts[0] >= 3 and counts[1] >= 3, counts

        session.close_loops(radius=2.5, min_gap=8, min_inliers=10)
        assert session.cross_robot_edges() >= 1
        chi2 = session.optimize(iterations=8, cg_iters=40)
        assert np.isfinite(chi2)
        # both robots' chains live in one graph with sane world poses
        pa = session.poses(robot=0)
        pb = session.poses(robot=1)
        assert len(pa) == counts[0] and len(pb) == counts[1]
        assert np.isfinite(pa).all() and np.isfinite(pb).all()
