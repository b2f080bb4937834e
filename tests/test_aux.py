"""Aux subsystems: monitor rendering, checkpoint/resume, logging, timers."""

import numpy as np
import pytest

from visfs_tpu.io.sim import generate_sequence
from visfs_tpu.slam.system import System
from visfs_tpu.slam import monitor
from visfs_tpu.utils.logging import make_logger
from visfs_tpu.utils.timer import StageTimer, memory_usage_mb


def small_system(seq, extra=None):
    p = {"Tracker/MaxFeatures": 100, "Tracker/MinDistance": 16}
    if extra:
        p.update(extra)
    sys_ = System(p)
    cam = seq.camera
    sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
              float(cam.baseline), width=cam.width, height=cam.height)
    return sys_


class TestMonitor:
    def test_render_frame(self):
        seq = generate_sequence(n_frames=3, n_points=300, seed=31)
        sys_ = small_system(seq)
        sys_.run_sequence(seq.stamps, seq.left, seq.right)
        img = monitor.render_frame(sys_.state, seq.left[-1], seq.right[-1])
        h, w = seq.left[0].shape
        assert img.shape == (h, 2 * w, 3)
        assert img.dtype == np.uint8
        # tracked keypoints drew some red pixels
        red = (img[:, :w, 0] == 255) & (img[:, :w, 1] == 64)
        assert red.sum() > 10
        # depth labels drew green bitmap-font pixels on the LEFT half
        # (Monitor.cpp:76; right-half green is the stereo crosses)
        green = (img[:, :w, 0] == 64) & (img[:, :w, 1] == 220)
        assert green.sum() > 10

    def test_draw_text_glyphs(self):
        img = np.zeros((10, 40, 3), np.uint8)
        monitor._draw_text(img, 1, 2, "-3.7", (255, 255, 255))
        # four glyph cells, each 3 px wide on a 4 px pitch
        assert img[:, :, 0].sum() > 0
        cols = np.nonzero(img[:, :, 0].any(axis=0))[0]
        assert cols.min() >= 1 and cols.max() <= 1 + 4 * 4

    def test_live_monitor_headless(self, tmp_path):
        """LiveMonitor (the reference's cv::imshow windows) degrades to
        frame dumps in a headless environment and never crashes."""
        seq = generate_sequence(n_frames=3, n_points=300, seed=31)
        sys_ = small_system(seq)
        sys_.run_sequence(seq.stamps, seq.left, seq.right)
        lm = monitor.LiveMonitor(save_dir=str(tmp_path))
        canvas = lm.show(sys_.state, seq.left[-1], seq.right[-1])
        lm.close()
        h, w = seq.left[0].shape
        assert canvas.shape == (h, 2 * w, 3)
        assert list(tmp_path.iterdir()), "no frame written"

    def test_render_submap_none_without_laser(self):
        seq = generate_sequence(n_frames=2, n_points=200, seed=32)
        sys_ = small_system(seq)
        sys_.run_sequence(seq.stamps, seq.left, seq.right)
        assert monitor.render_submap(sys_.state) is None


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from visfs_tpu.io import checkpoint as ckpt

        seq = generate_sequence(n_frames=5, n_points=300, seed=33)
        sys_ = small_system(seq)
        outs1 = sys_.run_sequence(seq.stamps[:3], seq.left[:3], seq.right[:3])
        ckpt.save_system(tmp_path / "ck", sys_)

        # fresh system restores and continues identically
        sys2 = small_system(seq)
        ckpt.restore_system(tmp_path / "ck", sys2)
        np.testing.assert_array_equal(
            np.asarray(sys2.state.pose_t), np.asarray(sys_.state.pose_t)
        )

        out_a = sys_.run_sequence(seq.stamps[3:], seq.left[3:], seq.right[3:])
        out_b = sys2.run_sequence(seq.stamps[3:], seq.left[3:], seq.right[3:])
        np.testing.assert_allclose(
            np.asarray(out_a[-1].pose), np.asarray(out_b[-1].pose), atol=1e-5
        )

    def test_mapping_backend_roundtrip(self, tmp_path):
        """save_mapping/restore_mapping: graph, snapshots, per-robot chain
        tails, and decided loop pairs all survive a restart."""
        import jax
        from jax.sharding import Mesh

        from visfs_tpu.io import checkpoint as ckpt
        from visfs_tpu.slam.mapping import MappingBackend

        mesh = Mesh(np.array(jax.devices()[:8]), ("edges",))
        seq = generate_sequence(n_frames=4, n_points=300, seed=35)
        sys_ = small_system(seq)
        sys_.run_sequence(seq.stamps, seq.left, seq.right)

        b = MappingBackend(mesh, max_nodes=16, max_edges=64)
        for k, robot in enumerate((0, 0, 1)):
            b.add_keyframe(np.eye(4, dtype=np.float32), float(k),
                           snapshot=sys_.keyframe_snapshot(max_kp=16),
                           robot=robot)
        rel = np.eye(4, dtype=np.float32)
        b.add_loop_closure(0, 2, rel, info=1e4)
        b._decided_pairs.add((0, 2))

        ckpt.save_mapping(tmp_path / "map.npz", b)
        b2 = MappingBackend(mesh, max_nodes=16, max_edges=64)
        ckpt.restore_mapping(tmp_path / "map.npz", b2)

        assert int(b2.graph.n_nodes) == 3
        np.testing.assert_array_equal(np.asarray(b2.graph.robot[:3]),
                                      [0, 0, 1])
        np.testing.assert_allclose(np.asarray(b2.graph.pose_t),
                                   np.asarray(b.graph.pose_t))
        assert set(b2.snapshots) == {0, 1, 2}
        np.testing.assert_allclose(np.asarray(b2.snapshots[1].patch),
                                   np.asarray(b.snapshots[1].patch))
        assert b2._last_node == {0: 1, 1: 2}
        assert (0, 2) in b2._decided_pairs
        # the restored graph still optimizes
        chi2 = b2.optimize(iterations=2, cg_iters=8)
        assert np.isfinite(chi2)
        # capacity mismatch is rejected
        b3 = MappingBackend(mesh, max_nodes=8, max_edges=64)
        with pytest.raises(ValueError):
            ckpt.restore_mapping(tmp_path / "map.npz", b3)

    def test_config_mismatch_rejected(self, tmp_path):
        from visfs_tpu.io import checkpoint as ckpt

        seq = generate_sequence(n_frames=2, n_points=200, seed=34)
        sys_ = small_system(seq)
        sys_.run_sequence(seq.stamps, seq.left, seq.right)
        ckpt.save_system(tmp_path / "ck", sys_)
        other = small_system(seq, extra={"Optimizer/Iterations": 4})
        with pytest.raises(ValueError):
            ckpt.restore_system(tmp_path / "ck", other)


class TestUtils:
    def test_logger_levels_and_file(self, tmp_path):
        lg = make_logger(level=2, on_console=False, folder=str(tmp_path))
        lg.info("hidden")
        lg.warning("shown")
        for h in lg.handlers:
            h.flush()
        text = (tmp_path / "visfs.log").read_text()
        assert "shown" in text and "hidden" not in text

    def test_stage_timer(self):
        import jax.numpy as jnp

        t = StageTimer()
        with t.stage("matmul") as h:
            h["sync"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        s = t.summary()
        assert "matmul" in s and s["matmul"]["count"] == 1

    def test_memory_usage(self):
        assert memory_usage_mb() > 1.0


class TestInterface:
    def test_odometry_messages(self):
        from visfs_tpu.io.interface import frame_output_to_messages, BAD_COVARIANCE

        seq = generate_sequence(n_frames=4, n_points=300, seed=35)
        sys_ = small_system(seq)
        outs = sys_.run_sequence(seq.stamps, seq.left, seq.right)

        # frame 0 is lost -> null odometry with BAD_COVARIANCE
        odom0, info0 = frame_output_to_messages(outs[0])
        assert not odom0.valid and info0.lost
        assert odom0.pose_covariance[0, 0] == BAD_COVARIANCE

        odom, info = frame_output_to_messages(outs[-1], prev_stamp=float(outs[-2].stamp))
        assert odom.valid and not info.lost
        assert info.inliers >= 12
        assert abs(info.interval - 0.1) < 1e-3
        assert np.isfinite(odom.position).all()


class TestLaserScanConversion:
    """MsgConversion::laserScanToTimedPointCloudWithIntensities parity
    (MsgConversion.cpp:156-197)."""

    def test_polar_to_cartesian_and_gating(self):
        import numpy as np

        from visfs_tpu.io.interface import laser_scan_to_points

        ranges = [1.0, 0.05, 2.0, 50.0]  # 2nd below min, 4th above max
        pc = laser_scan_to_points(
            ranges, angle_min=0.0, angle_increment=np.pi / 2,
            range_min=0.1, range_max=10.0, stamp=100.0,
            time_increment=0.001,
        )
        assert pc.points.shape == (2, 3)
        np.testing.assert_allclose(pc.points[0], [1.0, 0.0, 0.0], atol=1e-6)
        # 3rd ray at angle pi -> (-2, 0, 0)
        np.testing.assert_allclose(pc.points[1], [-2.0, 0.0, 0.0],
                                   atol=1e-6)
        # newest point time 0, cloud stamp advanced by its offset
        assert pc.times[-1] == 0.0
        assert pc.time == 100.0 + 0.002
        assert pc.times[0] == -0.002

    def test_intensities_passthrough_or_zero(self):
        import numpy as np

        from visfs_tpu.io.interface import laser_scan_to_points

        pc = laser_scan_to_points(
            [1.0, 2.0], 0.0, 0.1, 0.1, 10.0, 0.0,
            intensities=[5.0, 7.0],
        )
        np.testing.assert_allclose(pc.intensities, [5.0, 7.0])
        pc2 = laser_scan_to_points([1.0, 2.0], 0.0, 0.1, 0.1, 10.0, 0.0)
        np.testing.assert_allclose(pc2.intensities, [0.0, 0.0])
