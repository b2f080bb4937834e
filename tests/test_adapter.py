"""Middleware adapter bring-up + operating-point (launch-equivalent) tests.

Mirrors the reference node's construction recipe (InterfaceROS.cpp:18-155)
and its launch operating points (Interface/ROS/launch/*.launch,
params/ekf_fuse.yaml) against the in-repo StaticTransport.
"""

import pathlib

import numpy as np
import pytest

from visfs_tpu.config import config_from_parameters
from visfs_tpu.io.adapter import (
    CameraInfo,
    StaticTransport,
    VISFSAdapter,
    load_operating_point,
    static_frame_transform,
)
from visfs_tpu.io.sim import generate_sequence

CONFIGS = pathlib.Path(__file__).resolve().parent.parent / "configs"


def _infos(cam):
    fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx),
                      float(cam.cy))
    left = CameraInfo(cam.width, cam.height, fx, fy, cx, cy)
    right = CameraInfo(cam.width, cam.height, fx, fy, cx, cy,
                       tx=-fx * float(cam.baseline))
    return left, right


class TestOperatingPoints:
    def test_all_configs_load_and_validate(self):
        for name in ("sim_mapping", "sim_localization", "real_localization"):
            op = load_operating_point(CONFIGS / f"{name}.yaml")
            cfg = config_from_parameters(op.visfs)
            assert cfg is not None

    def test_sim_mapping_operating_point(self):
        # Pin the headline operating point (simMapping.launch:53-88).
        op = load_operating_point(CONFIGS / "sim_mapping.yaml")
        cfg = config_from_parameters(op.visfs)
        assert cfg.system_sensor_strategy == 3
        assert cfg.system_clahe is True
        assert cfg.tracker_max_features == 120
        assert cfg.local_map_map_size == 5
        assert cfg.optimizer_iterations == 20
        assert op.subscribe_wheel_odom and op.subscribe_laser_scan
        assert op.node["base_line"] == pytest.approx(0.0502569)

    def test_localization_operating_point(self):
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        cfg = config_from_parameters(op.visfs)
        assert cfg.system_sensor_strategy == 0
        assert cfg.tracker_max_features == 200
        assert cfg.tracker_flow_back is False
        assert not op.subscribe_laser_scan

    def test_unknown_key_raises_at_load(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("visfs:\n  Tracker/NoSuchParam: 3\n")
        with pytest.raises(KeyError):
            load_operating_point(bad)

    def test_frame_tree(self):
        op = load_operating_point(CONFIGS / "sim_mapping.yaml")
        T = static_frame_transform(op.frames, "camera_link")
        assert T is not None and T.shape == (4, 4)
        np.testing.assert_allclose(T[:3, 3], [0.0, 0.0, 0.68], atol=1e-7)
        T = static_frame_transform(op.frames, "sick_laser_link")
        np.testing.assert_allclose(T[:3, 3], [0.09375, 0.0, 0.0711],
                                   atol=1e-7)

    def test_ekf_fuse_point(self):
        import yaml

        doc = yaml.safe_load((CONFIGS / "ekf_fuse.yaml").read_text())
        # robot_localization selector semantics (params/ekf_fuse.yaml:11-17):
        # VISFS odometry contributes vx, vy, vyaw only.
        sel = doc["inputs"]["visfs_odometry"]["use"]
        assert len(sel) == 15
        assert [i for i, v in enumerate(sel) if v] == [6, 7, 11]
        assert doc["two_d_mode"] is True
        assert len(doc["process_noise_diag"]) == 15


class TestAdapterBringUp:
    def _seq(self):
        return generate_sequence(n_frames=4, width=160, height=120,
                                 n_points=150, seed=3)

    def test_full_bring_up_and_frames(self):
        seq = self._seq()
        left_i, right_i = _infos(seq.camera)
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        op.node["base_line"] = float(seq.camera.baseline)
        tr = StaticTransport(left_i, right_i, frames={
            "camera_link": {"parent": "base_link", "xyz": [0, 0, 0.68],
                            "rpy": [0, 0, 0]},
        })
        ad = VISFSAdapter(op, tr, use_native_runtime=False)
        assert ad.system.camera is not None
        # Exact-stamp gather path: inject left+right per frame.
        for i in range(3):
            t = float(seq.stamps[i])
            tr.inject("left/image", t, seq.left[i])
            tr.inject("right/image", t, seq.right[i])
        n = ad.spin_once()
        assert n == 3
        assert len(tr.published["odom"]) == 3
        assert len(tr.published["odom_info"]) == 3
        odom = tr.published["odom"][-1]
        assert np.isfinite(odom.position).all()

    def test_baseline_falls_back_to_camera_info(self):
        seq = self._seq()
        left_i, right_i = _infos(seq.camera)
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        op.node["base_line"] = 0.0  # launch leaves it unset
        ad = VISFSAdapter(op, StaticTransport(left_i, right_i),
                          use_native_runtime=False)
        assert float(ad.system.camera.baseline) == pytest.approx(
            float(seq.camera.baseline), rel=1e-6)

    def test_missing_camera_info_raises_on_static_transport(self):
        class NoInfo(StaticTransport):
            def wait_for_camera_info(self, side, timeout_s=3.0):
                return None

        seq = self._seq()
        left_i, right_i = _infos(seq.camera)
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        with pytest.raises(TimeoutError):
            VISFSAdapter(op, NoInfo(left_i, right_i),
                         use_native_runtime=False)

    def test_native_runtime_path(self):
        seq = self._seq()
        left_i, right_i = _infos(seq.camera)
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        op.node["base_line"] = float(seq.camera.baseline)
        tr = StaticTransport(left_i, right_i)
        ad = VISFSAdapter(op, tr, use_native_runtime=True)
        ad.start()
        try:
            import time

            for i in range(3):
                t = float(seq.stamps[i])
                tr.inject("left/image", t, seq.left[i])
                tr.inject("right/image", t, seq.right[i])
            deadline = time.time() + 30
            n = 0
            while n < 3 and time.time() < deadline:
                n += ad.spin_once()
                time.sleep(0.02)
            assert n == 3
        finally:
            ad.stop()
