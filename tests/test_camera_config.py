"""Tests for the stereo camera model and the parameter registry."""

import numpy as np
import jax.numpy as jnp
import pytest

from visfs_tpu import config
from visfs_tpu.core import camera


def make_cam(**kw):
    return camera.make_stereo_camera(
        fx=458.0, fy=457.0, cx=320.0, cy=240.0, baseline=0.05, **kw
    )


class TestCamera:
    def test_axis_permutation(self):
        """Camera z (forward) -> robot x; camera x (right) -> -robot y;
        camera y (down) -> -robot z (GeometricCamera.h:18-21)."""
        R = camera.image_to_robot_rotation()
        np.testing.assert_allclose(R @ jnp.array([0.0, 0.0, 1.0]), [1, 0, 0])
        np.testing.assert_allclose(R @ jnp.array([1.0, 0.0, 0.0]), [0, -1, 0])
        np.testing.assert_allclose(R @ jnp.array([0.0, 1.0, 0.0]), [0, 0, -1])

    def test_project_roundtrip(self):
        cam = make_cam()
        p = jnp.array([[0.3, -0.2, 2.5], [0.0, 0.0, 1.0]])
        uv = camera.project(cam, p)
        # Manual projection
        np.testing.assert_allclose(
            uv[0], [458.0 * 0.3 / 2.5 + 320.0, 457.0 * -0.2 / 2.5 + 240.0],
            rtol=1e-5,
        )

    def test_project_stereo_disparity(self):
        cam = make_cam()
        p = jnp.array([0.1, 0.1, 2.0])
        obs = camera.project_stereo(cam, p)
        disparity = obs[0] - obs[2]
        np.testing.assert_allclose(disparity, cam.bf / 2.0, rtol=1e-5)

    def test_triangulate_projects_back(self):
        cam = make_cam()
        # Image-frame ground-truth points
        p_img = jnp.array([[0.4, -0.3, 3.0], [-0.5, 0.2, 1.7], [0.0, 0.0, 5.0]])
        uvl = camera.project(cam, p_img)
        # right camera: x shifted by baseline
        p_right = p_img - jnp.array([cam.baseline, 0.0, 0.0])
        uvr = jnp.stack(
            [
                p_right[:, 0] / p_right[:, 2] * cam.fxr + cam.cxr,
                p_right[:, 1] / p_right[:, 2] * cam.fyr + cam.cyr,
            ],
            axis=-1,
        )
        p3d, valid = camera.triangulate_stereo(cam, uvl, uvr, 0.2, 10.0)
        assert bool(valid.all())
        # Result is in ROBOT frame: apply image->robot to ground truth
        from visfs_tpu.core.lie import mat_apply

        expected = mat_apply(cam.t_ri, p_img)
        np.testing.assert_allclose(p3d, expected, atol=5e-3)

    def test_triangulate_depth_gates(self):
        cam = make_cam()
        # Too-far point (z = 20 > max_depth 10): disparity small
        uvl = jnp.array([[320.0, 240.0]])
        disparity = cam.bf / 20.0 / cam.fx * cam.fx  # ~ bf/20
        uvr = uvl - jnp.array([[disparity / 1.0, 0.0]])
        p3d, valid = camera.triangulate_stereo(cam, uvl, uvr, 0.2, 10.0)
        assert not bool(valid[0])
        assert bool(jnp.isnan(p3d[0, 0]))

    def test_zero_disparity_invalid(self):
        cam = make_cam()
        uv = jnp.array([[100.0, 100.0]])
        p3d, valid = camera.triangulate_stereo(cam, uv, uv, 0.2, 10.0)
        assert not bool(valid[0])


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = config.VISFSConfig()
        assert cfg.tracker_max_features == 300
        assert cfg.tracker_min_distance == 40
        assert cfg.tracker_flow_win_size == 21
        assert cfg.tracker_flow_max_level == 3
        assert cfg.local_map_map_size == 5
        assert cfg.estimator_min_inliers == 12
        assert cfg.optimizer_iterations == 10
        assert cfg.optimizer_pixel_variance == 1.5
        assert cfg.optimizer_odometry_covariance == 0.00005
        assert cfg.optimizer_robust_kernel_delta == 8.0
        assert cfg.map_2d_num_range_data == 90
        assert cfg.system_sensor_strategy == 0

    def test_registry_has_all_groups(self):
        keys = set(config.DEFAULT_PARAMETERS)
        for k in [
            "System/SensorStrategy", "Tracker/MaxFeatures", "Tracker/FlowBack",
            "LocalMap/MapSize", "Estimator/MinInliers", "Optimizer/Iterations",
            "Map/2dNumRangeData",
        ]:
            assert k in keys

    def test_string_overrides(self):
        cfg = config.config_from_parameters(
            {
                "Tracker/MaxFeatures": "120",
                "Tracker/FlowBack": "false",
                "Optimizer/Iterations": 20,
                "LocalMap/MinTranslation": "0.25",
            }
        )
        assert cfg.tracker_max_features == 120
        assert cfg.tracker_flow_back is False
        assert cfg.optimizer_iterations == 20
        assert cfg.local_map_min_translation == 0.25

    def test_min_inliers_floor(self):
        """ROS layer floors MinInliers at 8 (InterfaceROS.cpp:147-150)."""
        cfg = config.config_from_parameters({"Estimator/MinInliers": 4})
        assert cfg.estimator_min_inliers == 8

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            config.config_from_parameters({"Nope/Missing": 1})

    def test_roundtrip(self):
        cfg = config.VISFSConfig()
        params = config.config_to_parameters(cfg)
        assert params == config.DEFAULT_PARAMETERS
        assert config.config_from_parameters(params) == config.config_from_parameters(None)
