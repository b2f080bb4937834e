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


@pytest.mark.parametrize("drop,swap", [(0.05, 0.15)])
def test_live_stream_bring_up_to_publish(tmp_path, drop, swap):
    n_frames = 40
    seq = generate_sequence(n_frames=n_frames, width=160, height=120,
                            n_points=150, seed=5)
    data = tmp_path / "seq.npz"
    _write_npz(data, seq)

    endpoint = f"ipc://{tmp_path}/visfs_stream"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "visfs_tpu.io.zmq_replay",
         "--data", str(data), "--endpoint", endpoint,
         "--hz", "40", "--drop", str(drop), "--swap", str(swap),
         "--preroll-s", "1.0", "--seed", "7"],
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO,
    )
    try:
        from visfs_tpu.io.zmq_transport import ZmqTransport

        tr = ZmqTransport(endpoint)
        # Bring-up: the CameraInfo wait loop must succeed from the wire
        # (the publisher keeps re-broadcasting like a latched topic).
        op = load_operating_point(CONFIGS / "sim_localization.yaml")
        op.visfs["Tracker/MaxFeatures"] = 60
        op.visfs["Optimizer/Iterations"] = 4
        op.node["base_line"] = 0.0  # force fallback to CameraInfo tx
        op.node["queue_size"] = 64  # deep enough to absorb the replay
        ad = VISFSAdapter(op, tr, use_native_runtime=True)
        # Intrinsics and baseline came over the wire.
        info_l, info_r = ad.camera_info
        assert info_l.fx == pytest.approx(float(seq.camera.fx))
        assert info_r.baseline == pytest.approx(float(seq.camera.baseline),
                                                rel=1e-5)
        # tf table came over the wire.
        T = tr.lookup_transform("base_link", "camera_link")
        assert T is not None and T[2, 3] == pytest.approx(0.3)

        # Compile the VO step before opening the tap: the zmq SUB socket
        # buffers the paced stream meanwhile, like a ROS subscriber queue.
        zero = np.zeros((info_l.height, info_l.width), np.float32)
        ad.system.input_primary_sensor_data(-2.0, zero, zero)
        ad.system.input_primary_sensor_data(-1.5, zero, zero)
        ad.system.drain_outputs()

        ad.start()
        published = 0
        deadline = time.monotonic() + 120.0
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
        if proc.poll() is None:
            proc.kill()
        try:
            tr.close()
        except Exception:
            pass
