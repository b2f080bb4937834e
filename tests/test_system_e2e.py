"""End-to-end odometry tests: full System on simulated stereo sequences.

This is the acceptance layer the reference lacks entirely (its integration
testing is manual ROS bags — SURVEY.md §4): ATE-checked trajectories per
BASELINE.json config.
"""

import numpy as np
import pytest

from visfs_tpu.io.sim import ate_rmse, generate_sequence
from visfs_tpu.slam.system import System

PARAMS = {
    "Tracker/MaxFeatures": 150,
    "Tracker/MinDistance": 16,
    "Optimizer/Iterations": 10,
}


def build_system(extra=None, seq=None):
    p = dict(PARAMS)
    if extra:
        p.update(extra)
    sys_ = System(p)
    cam = seq.camera
    sys_.init(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.baseline), width=cam.width, height=cam.height,
    )
    return sys_


def run_vo(seq, extra=None, with_odom=False):
    sys_ = build_system(extra, seq)
    outs = sys_.run_sequence(
        seq.stamps, seq.left, seq.right,
        wheel_odom=seq.wheel_odom if with_odom else None,
    )
    est = np.stack([np.asarray(o.pose) for o in outs])
    return outs, est


class TestStereoVO:
    """BASELINE config 1: stereo visual odometry (SensorStrategy=0)."""

    def test_forward_motion(self):
        seq = generate_sequence(n_frames=12, n_points=400, seed=1,
                                motion="forward")
        outs, est = run_vo(seq)
        assert not any(bool(o.lost) for o in outs[1:])
        ate = ate_rmse(est, seq.poses)
        assert ate < 0.01, ate

    def test_arc_motion(self):
        seq = generate_sequence(n_frames=15, n_points=500, seed=2,
                                motion="arc")
        outs, est = run_vo(seq)
        assert not any(bool(o.lost) for o in outs[1:])
        ate = ate_rmse(est, seq.poses)
        assert ate < 0.015, ate

    def test_yaw_rotation(self):
        seq = generate_sequence(n_frames=12, n_points=600, seed=3,
                                motion="yaw")
        outs, est = run_vo(seq)
        assert not any(bool(o.lost) for o in outs[1:])
        ate = ate_rmse(est, seq.poses)
        assert ate < 0.02, ate

    def test_first_frame_bootstrap(self):
        seq = generate_sequence(n_frames=3, n_points=300, seed=4)
        outs, _ = run_vo(seq)
        # frame 0 is 'lost' (no delta yet) but must detect features
        assert bool(outs[0].lost)
        assert int(outs[0].n_features) > 20
        assert not bool(outs[1].lost)

    def test_keyframe_and_window_bookkeeping(self):
        seq = generate_sequence(n_frames=10, n_points=400, seed=5)
        sys_ = build_system(None, seq)
        sys_.run_sequence(seq.stamps, seq.left, seq.right)
        st = sys_.state
        window = np.asarray(st.window.valid)
        assert window.sum() >= 2
        # feature table consistency: every observed slot belongs to a valid
        # feature; ids are unique among valid slots
        valid = np.asarray(st.features.valid)
        obs = np.asarray(st.features.obs_mask)
        assert not obs[~valid].any()
        fids = np.asarray(st.features.fid)[valid]
        assert len(np.unique(fids)) == len(fids)

    def test_blackout_recovery(self):
        """Blank frames in the middle -> lost, then recover."""
        seq = generate_sequence(n_frames=12, n_points=400, seed=6,
                                motion="forward")
        left = np.array(seq.left)
        right = np.array(seq.right)
        left[5:7] = 0.0
        right[5:7] = 0.0
        sys_ = build_system(None, seq)
        outs = sys_.run_sequence(seq.stamps, left, right)
        assert bool(outs[5].lost) or bool(outs[6].lost)
        # recovers within a couple of frames after texture returns
        assert not bool(outs[-1].lost)
        # pose remains finite throughout
        for o in outs:
            assert np.isfinite(np.asarray(o.pose)).all()


class TestStereoWheelFusion:
    """BASELINE config 3: stereo + wheel odometry (SensorStrategy=2)."""

    def test_fusion_tracks_trajectory(self):
        seq = generate_sequence(n_frames=12, n_points=400, seed=7,
                                motion="arc", odom_noise=0.002)
        outs, est = run_vo(seq, extra={"System/SensorStrategy": 2},
                           with_odom=True)
        ate = ate_rmse(est, seq.poses)
        assert ate < 0.03, ate

    def test_wheel_override_on_bad_visuals(self):
        """Blank out images: wheel odometry must carry the trajectory."""
        seq = generate_sequence(n_frames=10, n_points=400, seed=8,
                                motion="forward", odom_noise=0.002)
        left = np.array(seq.left)
        right = np.array(seq.right)
        left[4:8] = 0.0
        right[4:8] = 0.0
        sys_ = build_system({"System/SensorStrategy": 2}, seq)
        outs = sys_.run_sequence(seq.stamps, left, right,
                                 wheel_odom=seq.wheel_odom)
        est = np.stack([np.asarray(o.pose) for o in outs])
        ate = ate_rmse(est, seq.poses)
        # noisy (2 mm / 2 mrad sigma) wheel odometry carries the blackout
        assert ate < 0.06, ate


class TestStageProfiling:
    """Per-stage timing diagnostics (reference EstimateInfo fields,
    Signature.h:62-73, published via OdomInfo — MsgConversion.cpp:104-106)."""

    def test_timing_fields_populated_and_published(self):
        from visfs_tpu.io.interface import frame_output_to_messages

        seq = generate_sequence(n_frames=6, n_points=300, seed=10)
        sys_ = System(dict(PARAMS), profile_stages=True)
        cam = seq.camera
        sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
                  float(cam.baseline), width=cam.width, height=cam.height)
        outs = sys_.run_sequence(seq.stamps, seq.left, seq.right)
        assert len(outs) == 6
        for o in outs:
            assert float(o.time_tracking) > 0.0
            assert float(o.local_bundle_time) > 0.0
            assert float(o.time_estimation) >= float(o.local_bundle_time)
            assert float(o.time_total) >= (
                float(o.time_tracking) + float(o.time_estimation)
            ) * 0.99
        # trajectory still correct through the split-stage path
        est = np.stack([np.asarray(o.pose) for o in outs])
        assert ate_rmse(est, seq.poses) < 0.02
        _, info = frame_output_to_messages(outs[-1])
        assert info.time_total > 0.0
        assert info.local_bundle_time > 0.0

    def test_fused_path_zero_timings(self):
        seq = generate_sequence(n_frames=3, n_points=300, seed=11)
        sys_ = System(dict(PARAMS))
        cam = seq.camera
        sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
                  float(cam.baseline), width=cam.width, height=cam.height)
        outs = sys_.run_sequence(seq.stamps, seq.left, seq.right)
        assert float(outs[-1].time_total) == 0.0


class TestForce3DoF:
    def test_planar_output(self):
        seq = generate_sequence(n_frames=8, n_points=400, seed=9,
                                motion="arc")
        outs, est = run_vo(seq, extra={"Estimator/Force3DoF": True})
        # z, roll, pitch forced to zero
        assert np.abs(est[:, 2, 3]).max() < 1e-6


class TestLostRecovery:
    """Engine-level pin of the round-5 recovery fix: a lost (non-inserted)
    frame's re-detections must slide into the previous-frame column, so
    tracking resumes immediately and table slots don't leak.  (The old
    no-op slide parked them in the current column: every frame re-detected,
    matched nothing, and leaked slots to famine.)"""

    def test_recovers_after_blank_frames(self):
        import jax.numpy as jnp

        from visfs_tpu.io.sim import generate_sequence
        from visfs_tpu.slam.system import System

        seq = generate_sequence(n_frames=8, width=160, height=120,
                                n_points=150, seed=5)
        cam = seq.camera
        s = System({"Tracker/MaxFeatures": 60, "Tracker/MinDistance": 10,
                    "Optimizer/Iterations": 4})
        s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               float(cam.baseline), width=cam.width, height=cam.height)
        zero = np.zeros((120, 160), np.float32)
        # two featureless frames: bootstrap-insert + track-lost
        s.input_primary_sensor_data(-2.0, zero, zero)
        s.input_primary_sensor_data(-1.5, zero, zero)
        s.drain_outputs()
        outs = []
        for i in range(8):
            s.input_primary_sensor_data(
                float(seq.stamps[i]),
                jnp.asarray(seq.left[i], jnp.float32),
                jnp.asarray(seq.right[i], jnp.float32))
            outs.extend(s.drain_outputs())
        # first real frame re-bootstraps (lost), everything after tracks
        assert bool(outs[0].lost)
        assert all(not bool(o.lost) for o in outs[1:]), [
            int(o.lost) for o in outs]
        assert all(int(o.n_matches) >= 15 for o in outs[1:])
        # no slot leak: table stays near the live population
        n_valid = int(np.asarray(s.state.features.valid).sum())
        assert n_valid <= 2 * 60, n_valid
