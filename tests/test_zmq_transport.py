"""Live two-process transport integration: ZmqTransport + replay publisher.

The reference is driven by live ROS topics from rosbag replay
(Interface/ROS/src/InterfaceROS.cpp:92-120, README.md:44-56).  Here a real
second process (visfs_tpu.io.zmq_replay) paces a recorded stereo sequence
over a ZeroMQ PUB socket with drops and out-of-order L/R delivery, and the
full adapter stack — CameraInfo wait loop, tf lookup, param overrides,
native C++ approx-sync runtime, publish loop — runs against it.  This
proves the duck-typed Transport contract survives an asynchronous, lossy,
reordered stream, not just the in-repo StaticTransport.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np
import pytest

from visfs_tpu.io.adapter import VISFSAdapter, load_operating_point
from visfs_tpu.io.sim import generate_sequence

CONFIGS = pathlib.Path(__file__).resolve().parent.parent / "configs"
REPO = str(pathlib.Path(__file__).resolve().parent.parent)

zmq = pytest.importorskip("zmq")


def _write_npz(path, seq):
    frames = {
        "camera_link": {"parent": "base_link", "xyz": [0, 0, 0.3],
                        "rpy": [0, 0, 0]},
    }
    np.savez(
        path,
        left=np.clip(np.asarray(seq.left), 0, 255).astype(np.uint8),
        right=np.clip(np.asarray(seq.right), 0, 255).astype(np.uint8),
        stamps=np.asarray(seq.stamps, np.float64),
        fx=float(seq.camera.fx), fy=float(seq.camera.fy),
        cx=float(seq.camera.cx), cy=float(seq.camera.cy),
        baseline=float(seq.camera.baseline),
        frames=json.dumps(frames),
    )


def _run_live(tmp_path, seq_arrays, replay_args, deadline_s=120.0,
              visfs_overrides=None):
    """Run the full adapter stack against a live replay subprocess.

    seq_arrays: (left [T,H,W] uint8, right, stamps, camera).
    Returns (published, stats, transport) — the transport keeps the
    published odom/odom_info lists for assertions.
    """
    left, right, stamps, camera = seq_arrays
    data = tmp_path / "seq.npz"
    frames = {
        "camera_link": {"parent": "base_link", "xyz": [0, 0, 0.3],
                        "rpy": [0, 0, 0]},
    }
    np.savez(
        data, left=left, right=right,
        stamps=np.asarray(stamps, np.float64),
        fx=float(camera.fx), fy=float(camera.fy),
        cx=float(camera.cx), cy=float(camera.cy),
        baseline=float(camera.baseline), frames=json.dumps(frames),
    )

    endpoint = f"ipc://{tmp_path}/visfs_stream"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "visfs_tpu.io.zmq_replay",
         "--data", str(data), "--endpoint", endpoint] + replay_args,
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO,
    )
    tr = None
    try:
        from visfs_tpu.io.zmq_transport import ZmqTransport

        tr = ZmqTransport(endpoint)
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        op.visfs["Tracker/MaxFeatures"] = 60
        op.visfs["Optimizer/Iterations"] = 4
        op.node["base_line"] = 0.0  # force fallback to CameraInfo tx
        op.node["queue_size"] = 64  # deep enough to absorb the replay
        op.visfs.update(visfs_overrides or {})
        ad = VISFSAdapter(op, tr, use_native_runtime=True)

        # Compile the VO step before opening the tap: the zmq SUB socket
        # buffers the paced stream meanwhile, like a ROS subscriber queue.
        info_l, _ = ad.camera_info
        zero = np.zeros((info_l.height, info_l.width), np.float32)
        ad.system.input_primary_sensor_data(-2.0, zero, zero)
        ad.system.input_primary_sensor_data(-1.5, zero, zero)
        ad.system.drain_outputs()

        ad.start()
        published = 0
        deadline = time.monotonic() + deadline_s
        while not tr.eos and time.monotonic() < deadline:
            tr.spin(20)
            published += ad.spin_once()
        # Drain whatever the native sync runtime still holds.
        t_end = time.monotonic() + 60.0
        while time.monotonic() < t_end:
            tr.spin(5)
            n = ad.spin_once()
            published += n
            if n == 0 and ad._rt is not None \
                    and ad._rt.rt.queue_depth() == 0:
                break
        ad.stop()
        assert tr.eos, "never saw end-of-stream marker"

        stats = json.loads(proc.stdout.readline())
        assert proc.wait(timeout=30) == 0
        return published, stats, ad, tr
    finally:
        if proc.poll() is None:
            proc.kill()


def test_live_stream_bring_up_to_publish(tmp_path):
    """Baseline hostile stream: 5% drops + 15% L/R reordering."""
    n_frames = 40
    seq = generate_sequence(n_frames=n_frames, width=160, height=120,
                            n_points=150, seed=5)
    arrays = (np.clip(np.asarray(seq.left), 0, 255).astype(np.uint8),
              np.clip(np.asarray(seq.right), 0, 255).astype(np.uint8),
              seq.stamps, seq.camera)
    published, stats, ad, tr = _run_live(
        tmp_path, arrays,
        ["--hz", "40", "--drop", "0.05", "--swap", "0.15",
         "--preroll-s", "1.0", "--seed", "7"],
    )
    try:
        # Intrinsics and baseline came over the wire.
        info_l, info_r = ad.camera_info
        assert info_l.fx == pytest.approx(float(seq.camera.fx))
        assert info_r.baseline == pytest.approx(float(seq.camera.baseline),
                                                rel=1e-5)
        # tf table came over the wire.
        T = tr.lookup_transform("base_link", "camera_link")
        assert T is not None and T[2, 3] == pytest.approx(0.3)
        # The stream really was lossy and reordered.
        assert stats["dropped"]["left"] + stats["dropped"]["right"] > 0
        assert stats["swapped"] > 0

        # Both-sides-sent frames, minus reorder losses, should have synced
        # and produced odometry; anything more lenient would also pass on
        # a broken sync, so require at least half the frames end-to-end.
        assert published >= n_frames // 2, (published, stats)
        assert published <= n_frames
        odoms = tr.published["odom"]
        assert len(odoms) == published
        assert np.isfinite(np.asarray(odoms[-1].position)).all()
    finally:
        tr.close()


@pytest.mark.slow
class TestHostileStream:
    """Stress parametrizations of the live transport (VERDICT round-4 #5):
    heavy loss, bursty stalls, late bring-up, and loss-of-stream with a
    lost -> BAD_COVARIANCE publication and recovery
    (ref InterfaceROS.cpp:291-312)."""

    def _starfield(self, n_frames=40, seed=5):
        seq = generate_sequence(n_frames=n_frames, width=160, height=120,
                                n_points=150, seed=seed)
        return (np.clip(np.asarray(seq.left), 0, 255).astype(np.uint8),
                np.clip(np.asarray(seq.right), 0, 255).astype(np.uint8),
                np.asarray(seq.stamps), seq.camera)

    def test_heavy_drop(self, tmp_path):
        """>=30% independent per-side loss: sync must still pair what
        survives and never publish junk."""
        left, right, stamps, cam = self._starfield()
        published, stats, ad, tr = _run_live(
            tmp_path, (left, right, stamps, cam),
            ["--hz", "40", "--drop", "0.35", "--swap", "0.1",
             "--preroll-s", "1.0", "--seed", "11"],
        )
        try:
            dropped = stats["dropped"]["left"] + stats["dropped"]["right"]
            assert dropped >= 0.2 * 2 * len(stamps), stats  # really hostile
            # Only both-sides-delivered frames can sync; ~0.65^2 = 42%.
            assert published >= len(stamps) // 5, (published, stats)
            for o in tr.published["odom"]:
                if o.valid:
                    assert np.isfinite(np.asarray(o.position)).all()
        finally:
            tr.close()

    def test_bursty_stall(self, tmp_path):
        """A multi-second mid-stream stall: the adapter must idle through
        it and resume without losing the stream.

        Runs with Tracker/FlowBack=true (the simMapping operating point):
        without the reverse-flow gate the reference's localization config
        has no match verification at all, so spurious LK matches make
        per-frame validity untestable (a faithful but fragile mode).
        """
        left, right, stamps, cam = self._starfield()
        published, stats, ad, tr = _run_live(
            tmp_path, (left, right, stamps, cam),
            ["--hz", "40", "--drop", "0.0", "--swap", "0.0",
             "--preroll-s", "1.0", "--stall-at", "20", "--stall-s", "2.5",
             "--seed", "3"],
            visfs_overrides={"Tracker/FlowBack": True,
                             "Tracker/MinDistance": 10},
        )
        try:
            assert published >= len(stamps) - 4, (published, stats)
            odoms = tr.published["odom"]
            n_valid = sum(o.valid for o in odoms[2:])
            assert n_valid >= 0.8 * (len(odoms) - 2), (n_valid, len(odoms))
            assert all(o.valid for o in odoms[-3:])
        finally:
            tr.close()

    def test_late_camera_info(self, tmp_path):
        """CameraInfo only appears seconds after the subscriber connects:
        the bring-up wait loop must keep retrying (reference waitForMessage
        semantics), then stream normally."""
        left, right, stamps, cam = self._starfield()
        published, stats, ad, tr = _run_live(
            tmp_path, (left, right, stamps, cam),
            ["--hz", "40", "--drop", "0.0", "--swap", "0.0",
             "--preroll-s", "1.0", "--info-delay-s", "4.0", "--seed", "3"],
        )
        try:
            info_l, _ = ad.camera_info
            assert info_l.fx == pytest.approx(float(cam.fx))
            assert published >= len(stamps) // 2, (published, stats)
        finally:
            tr.close()

    def test_blackout_lost_and_recovery(self, tmp_path):
        """Loss of stream + scene change: on resume the engine must publish
        lost odometry with BAD_COVARIANCE (InterfaceROS.cpp:291-312), then
        recover to valid odometry."""
        from visfs_tpu.io.interface import BAD_COVARIANCE

        la, ra, st, cam = self._starfield(n_frames=24, seed=5)
        lb, rb, _, _ = self._starfield(n_frames=24, seed=17)
        # frames 0..23 from scene A, 24..47 from an unrelated scene B;
        # the replay blacks out 18..28, so the engine sees A, starves,
        # then resumes on content it cannot possibly track from A.
        left = np.concatenate([la, lb])
        right = np.concatenate([ra, rb])
        stamps = np.arange(len(left), dtype=np.float64) * 0.1
        # FlowBack=true (simMapping operating point): the reverse-flow
        # gate is the mechanism that detects the post-cut spurious
        # matches, triggers lost, and lets re-detection re-bootstrap —
        # without it (the reference's localization launches) neither this
        # engine nor the reference can distinguish aliased matches.
        published, stats, ad, tr = _run_live(
            tmp_path, (left, right, stamps, cam),
            ["--hz", "40", "--drop", "0.0", "--swap", "0.0",
             "--preroll-s", "1.0", "--blackout-from", "18",
             "--blackout-to", "28", "--seed", "3"],
            visfs_overrides={"Tracker/FlowBack": True,
                             "Tracker/MinDistance": 10},
        )
        try:
            assert stats["blacked_out"] == 10, stats
            odoms = tr.published["odom"]
            assert len(odoms) >= 10
            lost_idx = [k for k, o in enumerate(odoms) if not o.valid]
            assert lost_idx, "no lost/BAD_COVARIANCE odom published"
            k0 = lost_idx[0]
            cov = np.asarray(odoms[k0].pose_covariance)
            assert cov[0, 0] == pytest.approx(BAD_COVARIANCE)
            infos = tr.published["odom_info"]
            assert any(i.lost for i in infos)
            # recovery: valid odometry resumes after the lost frames
            assert any(o.valid for o in odoms[k0 + 1:]), (
                "engine never recovered after the blackout")
        finally:
            tr.close()
