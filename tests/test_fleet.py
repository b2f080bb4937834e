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


class TestDpLaserFleet:
    """Laser (strategy-3) fleets ride the cross-chip dp axis: one stream
    per device of the virtual 8-device mesh via dp_fleet_step (the submap
    cond branches stay scalar inside each shard, so every sensor strategy
    works — the within-chip vmap fleet cannot carry them)."""

    def test_dp_strategy3_matches_single_stream(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from visfs_tpu.slam import system as S
        from visfs_tpu.slam.fleet import dp_fleet_step, _push_odometry_fleet

        B = 8
        seq = generate_sequence(n_frames=4, n_points=200, width=160,
                                height=120, seed=11, motion="arc",
                                with_laser=True, n_beams=60)
        params = {
            "System/SensorStrategy": 3,
            "Tracker/MaxFeatures": 60,
            "Tracker/MinDistance": 12,
            "Optimizer/Iterations": 4,
            "LocalMap/NumRangeDataLimit": 20,
        }
        cam = seq.camera

        def make(seed):
            sys_ = System(params, scan_capacity=128,
                          submap_extent_cells=128, seed=seed)
            _init(sys_, cam)
            return sys_

        # Single-stream reference (seed 0).
        ref = make(0)
        outs_ref = ref.run_sequence(
            seq.stamps, seq.left, seq.right, wheel_odom=seq.wheel_odom,
            scans=seq.laser_scans,
        )
        ref_traj = np.stack([np.asarray(o.pose) for o in outs_ref])

        # dp fleet: B identical streams (same seed 0 => same trajectory).
        proto = make(0)
        states = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * B), proto.state)
        mesh = Mesh(np.array(jax.devices()[:B]), ("dp",))

        def pad_scan(scan):
            K = 128
            pts = np.zeros((K, 3), np.float32)
            msk = np.zeros((K,), bool)
            scan = np.asarray(scan, np.float32)[:K]
            pts[: len(scan)] = scan
            msk[: len(scan)] = True
            return pts, msk

        tile = lambda x: jnp.asarray(np.broadcast_to(
            np.asarray(x)[None], (B,) + np.asarray(x).shape))

        fleet_traj = []
        odom_i = 0
        wheel = seq.wheel_odom
        for i in range(len(seq.stamps)):
            while (odom_i < len(wheel)
                   and wheel[odom_i][0] <= seq.stamps[i] + 1e-9):
                row = wheel[odom_i]
                states = _push_odometry_fleet(
                    states, tile(np.float32(row[0])),
                    tile(np.asarray(row[1:7], np.float32)),
                    tile(np.zeros(6, np.float32)), tile(True),
                )
                odom_i += 1
            pts, msk = pad_scan(seq.laser_scans[i])
            states, out = dp_fleet_step(
                mesh, states, tile(seq.left[i]), tile(seq.right[i]),
                tile(np.float32(seq.stamps[i])), proto.camera,
                proto.settings, proto.lk_params, proto._cfg_hash,
                scan_points=tile(pts), scan_mask=tile(msk),
            )
            fleet_traj.append(np.asarray(out.pose))

        fleet_traj = np.stack(fleet_traj)  # [T, B, 4, 4]
        for b in range(B):
            np.testing.assert_allclose(fleet_traj[:, b], ref_traj,
                                       atol=5e-3)
        # the submaps actually accumulated laser data in every shard
        sub_valid = np.asarray(states.laser.submaps.slot_valid)
        assert sub_valid.any(axis=-1).all()
