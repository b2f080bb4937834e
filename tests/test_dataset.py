"""Dataset readers (EuRoC-ASL / TUM-RGBD) — write a simulated sequence to
each on-disk format, read it back, and run the full pipeline on the loaded
frames.  The reference has no offline dataset path at all (rosbag-only,
README.md:44-56); these formats are its offline stand-in."""

import numpy as np
import pytest

from visfs_tpu.io.dataset import (
    associate,
    read_euroc,
    read_tum_rgbd,
    write_euroc,
    write_tum_rgbd,
)
from visfs_tpu.io.sim import ate_rmse, generate_sequence
from visfs_tpu.slam.system import System


def _run(sys_, ds):
    outs = []
    for stamp, left, right in ds.frames():
        sys_.input_primary_sensor_data(stamp, left, right)
        out = sys_.output_odometry_info()
        if out is not None:
            outs.append(out)
    outs.extend(sys_.drain_outputs())
    return outs


def test_associate_greedy_nearest():
    a = [0.0, 0.1, 0.2, 0.31]
    b = [0.005, 0.11, 0.29, 0.309, 5.0]
    pairs = associate(a, b, max_difference=0.02)
    assert pairs == [(0, 0), (1, 1), (3, 3)]


def test_euroc_roundtrip_and_vo(tmp_path):
    seq = generate_sequence(n_frames=8, n_points=400, seed=31,
                            motion="forward")
    write_euroc(seq, tmp_path)
    ds = read_euroc(tmp_path)

    assert len(ds) == 8
    assert ds.width == seq.camera.width and ds.height == seq.camera.height
    np.testing.assert_allclose(ds.fx, float(seq.camera.fx), rtol=1e-6)
    np.testing.assert_allclose(ds.baseline, float(seq.camera.baseline),
                               rtol=1e-5)
    np.testing.assert_allclose(ds.stamps, seq.stamps, atol=1e-9)
    np.testing.assert_allclose(
        ds.t_bs, np.asarray(seq.camera.t_ri, np.float64), atol=1e-9
    )
    # images survive the uint8 PNG round trip
    _, left0, right0 = ds.frame(0)
    assert np.max(np.abs(left0 - np.clip(seq.left[0], 0, 255))) <= 1.0
    assert np.max(np.abs(right0 - np.clip(seq.right[0], 0, 255))) <= 1.0
    # ground truth round-trips (translations exact up to float printing)
    gt = ds.gt_at(ds.stamps)
    np.testing.assert_allclose(gt[:, :3, 3], seq.poses[:, :3, 3], atol=1e-6)

    sys_ = System({
        "Tracker/MaxFeatures": 150,
        "Tracker/MinDistance": 16,
        "Optimizer/Iterations": 10,
    })
    sys_.init(ds.fx, ds.fy, ds.cx, ds.cy, ds.baseline,
              width=ds.width, height=ds.height)
    outs = _run(sys_, ds)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, gt[: len(est)])
    assert ate < 0.02, ate


def test_tum_rgbd_roundtrip_and_vo(tmp_path):
    seq = generate_sequence(n_frames=8, n_points=400, seed=32,
                            motion="forward", with_depth=True)
    # depth_scale=1000 keeps the sim's 14 m far plane inside uint16
    # (the TUM default 5000 saturates at 13.1 m)
    write_tum_rgbd(seq, tmp_path, depth_scale=1000)
    ds = read_tum_rgbd(tmp_path, depth_scale=1000)

    assert ds.kind == "tum"
    assert len(ds) == 8
    # calibration.txt is honored over the freiburg3 defaults
    np.testing.assert_allclose(ds.fx, float(seq.camera.fx), rtol=1e-6)
    # depth survives the uint16@1000 round trip to ~1 mm
    _, _, depth0 = ds.frame(0)
    assert np.max(np.abs(depth0 - seq.depth[0])) < 2e-3

    sys_ = System({
        "System/SensorStrategy": 1,  # rgbd
        "Tracker/MaxFeatures": 150,
        "Tracker/MinDistance": 16,
        "Optimizer/Iterations": 10,
    })
    sys_.init(ds.fx, ds.fy, ds.cx, ds.cy, float(seq.camera.baseline),
              width=ds.width, height=ds.height)
    outs = _run(sys_, ds)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, ds.gt_at(ds.stamps)[: len(est)])
    assert ate < 0.02, ate


def test_tum_default_intrinsics(tmp_path):
    """Without calibration.txt the freiburg3 defaults apply."""
    import os

    seq = generate_sequence(n_frames=2, n_points=50, seed=33,
                            with_depth=True)
    write_tum_rgbd(seq, tmp_path)
    os.remove(tmp_path / "calibration.txt")
    ds = read_tum_rgbd(tmp_path)
    assert ds.fx == pytest.approx(535.4)
