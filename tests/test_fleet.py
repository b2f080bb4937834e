"""FleetSystem: vmapped multi-stream VO must match single-stream System.

The fleet axis is pure batching — the vmapped function IS vo_step_impl —
so per-stream trajectories must agree with independent System runs (same
seeds) up to batched-reduction float reassociation.
"""

import numpy as np
import pytest

from visfs_tpu.io.sim import ate_rmse, generate_sequence
from visfs_tpu.slam.fleet import FleetSystem
from visfs_tpu.slam.system import System

PARAMS = {
    "Tracker/MaxFeatures": 100,
    "Tracker/MinDistance": 12,
    "Optimizer/Iterations": 8,
}


def _init(sys_, cam):
    sys_.init(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.baseline), width=cam.width, height=cam.height,
    )


def _sequences(n_frames=8):
    seqs = [
        generate_sequence(n_frames=n_frames, n_points=300, seed=3,
                          motion="forward"),
        generate_sequence(n_frames=n_frames, n_points=300, seed=4,
                          motion="arc"),
    ]
    return seqs


class TestFleetEquivalence:
    def test_matches_single_stream(self):
        seqs = _sequences()
        n_frames = len(seqs[0].stamps)

        # Single-stream references, one System per stream with fleet seeds.
        singles = []
        for i, seq in enumerate(seqs):
            sys_ = System(PARAMS, seed=i)
            _init(sys_, seq.camera)
            outs = sys_.run_sequence(seq.stamps, seq.left, seq.right)
            singles.append(np.stack([np.asarray(o.pose) for o in outs]))

        fleet = FleetSystem(PARAMS, n_streams=2, seed=0)
        _init(fleet, seqs[0].camera)
        stamps = np.stack([s.stamps for s in seqs], axis=1)  # [T, B]
        lefts = np.stack([s.left for s in seqs], axis=1)  # [T, B, H, W]
        rights = np.stack([s.right for s in seqs], axis=1)
        outs = fleet.run_sequences(stamps, lefts, rights)
        assert len(outs) == n_frames

        for b in range(2):
            fleet_traj = np.stack([np.asarray(o.pose[b]) for o in outs])
            np.testing.assert_allclose(
                fleet_traj, singles[b], atol=5e-3,
                err_msg=f"stream {b} diverged from its single-stream run",
            )
            # and each stream actually tracks its own sequence
            ate = ate_rmse(fleet_traj, seqs[b].poses)
            assert ate < 0.02, (b, ate)

    def test_streams_are_independent(self):
        """Garbage into stream 1 must not disturb stream 0."""
        seqs = _sequences()
        rng = np.random.default_rng(0)
        noise = rng.uniform(0, 255, seqs[1].left.shape).astype(np.float32)

        fleet = FleetSystem(PARAMS, n_streams=2, seed=0)
        _init(fleet, seqs[0].camera)
        stamps = np.stack([seqs[0].stamps, seqs[0].stamps], axis=1)
        lefts = np.stack([seqs[0].left, noise], axis=1)
        rights = np.stack([seqs[0].right, noise], axis=1)
        outs = fleet.run_sequences(stamps, lefts, rights)

        traj0 = np.stack([np.asarray(o.pose[0]) for o in outs])
        ate = ate_rmse(traj0, seqs[0].poses)
        assert ate < 0.02, ate

    def test_wheel_odometry_fleet(self):
        """Strategy-2 fleet smoke: odometry pushes respect the valid mask."""
        seq = generate_sequence(n_frames=6, n_points=300, seed=5,
                                motion="forward")
        params = dict(PARAMS)
        params["System/SensorStrategy"] = 2
        fleet = FleetSystem(params, n_streams=2, seed=0)
        _init(fleet, seq.camera)

        odom = np.asarray(seq.wheel_odom, np.float32)  # [K, 7]
        for k in range(len(odom)):
            row = np.stack([odom[k], odom[k]])
            fleet.input_wheel_odometry(
                row[:, 0], row[:, 1:7],
                valid=np.array([True, False]),  # stream 1 gets no odometry
            )
        stamps = np.stack([seq.stamps, seq.stamps], axis=1)
        lefts = np.stack([seq.left, seq.left], axis=1)
        rights = np.stack([seq.right, seq.right], axis=1)
        outs = fleet.run_sequences(stamps, lefts, rights)
        for b in range(2):
            traj = np.stack([np.asarray(o.pose[b]) for o in outs])
            assert np.isfinite(traj).all()
            ate = ate_rmse(traj, seq.poses)
            assert ate < 0.05, (b, ate)

    def test_laser_strategy_rejected(self):
        with pytest.raises(NotImplementedError):
            FleetSystem({"System/SensorStrategy": 3}, n_streams=2)
