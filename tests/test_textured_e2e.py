"""End-to-end tests on the textured ray-cast world (io/sim.py): occlusion,
multi-octave surface texture, per-frame pixel noise, exposure drift, and
random-walk wheel-odometry error — the evaluation substrate standing in for
the reference's real-rosbag operation (reference README.md:44-56,
Interface/ROS/src/InterfaceROS.cpp:180-223).

Covers the e2e holes the splat-starfield suite leaves open: CLAHE through
the pipeline (System.cpp:107-111), laser-only strategy 5
(Parameters.h:140, Estimator.cpp:243-250), and a drifted-revisit loop
closure (the rtabmap role, simMapping.launch:10-14)."""

import numpy as np
import pytest

from visfs_tpu.io.sim import ate_rmse, cached_textured_sequence, generate_sequence
from visfs_tpu.slam.system import System

ROOM = (-2.0, 12.0, -6.0, 6.0)


@pytest.fixture(scope="module")
def arc_seq():
    # 40 frames of textured arc with strong exposure drift + pixel noise
    return cached_textured_sequence(
        n_frames=40, width=256, height=192, motion="arc", seed=9,
        pixel_noise=2.0, exposure_drift=0.06,
    )


def _build(seq, extra=None, **kw):
    p = {"Tracker/MaxFeatures": 150, "Tracker/MinDistance": 12,
         "Optimizer/Iterations": 10}
    if extra:
        p.update(extra)
    s = System(p, **kw)
    cam = seq.camera
    s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
           float(cam.baseline), width=cam.width, height=cam.height)
    return s


def test_textured_stereo_vo(arc_seq):
    """Strategy 0 on textured/occluded/noisy imagery."""
    s = _build(arc_seq)
    outs = s.run_sequence(arc_seq.stamps, arc_seq.left, arc_seq.right)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, arc_seq.poses[: len(est)])
    assert ate < 0.12, ate


def test_textured_fusion_noisy_odom(arc_seq):
    """Strategy 2 with random-walk wheel drift (odom_drift_xy=0.01 default),
    not noise-free odometry."""
    # the generator's wheel odometry really is drifted, not exact
    gt_xy = arc_seq.poses[-1][:2, 3]
    od = arc_seq.wheel_odom
    od_xy = od[np.searchsorted(od[:, 0], arc_seq.stamps[-1]), 1:3]
    assert np.linalg.norm(od_xy - gt_xy) > 1e-4

    s = _build(arc_seq, {"System/SensorStrategy": 2})
    outs = s.run_sequence(arc_seq.stamps, arc_seq.left, arc_seq.right,
                          wheel_odom=arc_seq.wheel_odom)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, arc_seq.poses[: len(est)])
    assert ate < 0.12, ate


def test_clahe_through_pipeline(arc_seq):
    """System/CLAHE=true through the full fused step (System.cpp:107-111);
    must track the exposure-drifting sequence."""
    s = _build(arc_seq, {"System/CLAHE": True})
    assert s.cfg.system_clahe
    outs = s.run_sequence(arc_seq.stamps, arc_seq.left, arc_seq.right)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, arc_seq.poses[: len(est)])
    assert ate < 0.12, ate


def test_strategy5_laser_only():
    """SensorStrategy 5: scan-matching BA with NO wheel odometry input
    (the laser-only mode of Estimator.cpp:243-250)."""
    seq = generate_sequence(n_frames=10, n_points=400, seed=13,
                            motion="forward", with_laser=True, n_beams=120)
    s = _build(seq, {"System/SensorStrategy": 5,
                     "Tracker/MinDistance": 16,
                     "LocalMap/NumRangeDataLimit": 20},
               scan_capacity=200, submap_extent_cells=192)
    outs = s.run_sequence(seq.stamps, seq.left, seq.right,
                          scans=seq.laser_scans)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, seq.poses[: len(est)])
    assert ate < 0.02, ate


def test_drifted_loop_closure():
    """1.6 laps of a rounded square: VO (deliberately low feature budget)
    accumulates real drift; snapshot verification + pose-graph optimization
    must cut keyframe ATE by >= 2x (the rtabmap composition the reference
    delegates to, simMapping.launch:10-14)."""
    from visfs_tpu.parallel.mesh import edge_mesh
    from visfs_tpu.slam.mapping import MappingBackend

    seq = cached_textured_sequence(
        n_frames=140, width=256, height=192, motion="square", seed=8,
        room=ROOM, n_pillars=4, pixel_noise=2.0, exposure_drift=0.02,
        loops=1.6,
    )
    # 80 features (vs 120 nominal): starved enough to drift, but able to
    # track 8-bit-quantized frames — at 60 the quantized (camera-realistic)
    # render collapses outright (cached_textured_sequence quantizes).
    s = _build(seq, {"Tracker/MaxFeatures": 80, "Tracker/MinDistance": 10,
                     "Optimizer/Iterations": 4})
    backend = MappingBackend(edge_mesh(), max_nodes=96, max_edges=384)
    outs, frames_of = [], []
    for i in range(len(seq.stamps)):
        s.input_primary_sensor_data(float(seq.stamps[i]), seq.left[i],
                                    seq.right[i])
        out = s.output_odometry_info()
        if out is not None:
            outs.append(out)
            if backend.maybe_add(out, snapshot=s.keyframe_snapshot(max_kp=96)):
                frames_of.append(i)
    # the deliberately starved front-end may drop the odd frame; it must
    # still track the vast majority of the sequence
    assert sum(bool(o.lost) for o in outs[1:]) <= 4
    assert len(frames_of) >= 20

    kf_gt = seq.poses[np.asarray(frames_of)]
    ate_before = ate_rmse(np.asarray(backend.poses()[: len(frames_of)]),
                          kf_gt)
    assert ate_before > 0.1  # the revisit really is drifted

    added = backend.close_loops(s.camera, radius=3.0, min_gap=10,
                                min_inliers=10)
    assert added >= 5, added
    chi2 = backend.optimize(iterations=20, cg_iters=48)
    assert np.isfinite(chi2)
    ate_after = ate_rmse(np.asarray(backend.poses()[: len(frames_of)]),
                         kf_gt)
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)


def test_cached_sequence_cold_equals_warm(tmp_path, monkeypatch):
    """The cache must hand out IDENTICAL pixels on the rendering (cold) and
    loading (warm) runs — regression guard for the round-4 bug where the
    cold path returned the raw float render while warm runs loaded the
    uint8-quantized npz, making a bistable starved-budget test pass cold
    and fail on every rerun."""
    monkeypatch.setenv("VISFS_SIM_CACHE", str(tmp_path))
    kw = dict(n_frames=3, width=96, height=64, motion="arc", seed=21,
              pixel_noise=1.0)
    cold = cached_textured_sequence(**kw)
    warm = cached_textured_sequence(**kw)
    np.testing.assert_array_equal(cold.left, warm.left)
    np.testing.assert_array_equal(cold.right, warm.right)
    # 8-bit camera realism: integral pixel values
    assert float(np.abs(cold.left - np.round(cold.left)).max()) == 0.0
