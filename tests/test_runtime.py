"""Native runtime tests: sync policy, worker thread, System integration."""

import time

import numpy as np
import pytest

from visfs_tpu.runtime import PipelineRuntime, SystemRuntime


def img(v, h=24, w=32):
    return np.full((h, w), float(v), np.float32)


class TestSync:
    def test_exact_stamp_match(self):
        rt = PipelineRuntime(24, 32, capacity=8, slop_s=0.005)
        rt.push_left(1.0, img(1))
        assert rt.poll() is None  # right missing
        rt.push_right(1.0, img(2))
        out = rt.poll()
        assert out is not None
        stamp, fid, left, right, scan = out
        assert stamp == 1.0 and fid == 0
        np.testing.assert_array_equal(left, img(1))
        np.testing.assert_array_equal(right, img(2))
        assert scan is None
        rt.close()

    def test_slop_matching_and_unmatched_drop(self):
        rt = PipelineRuntime(24, 32, capacity=8, slop_s=0.01)
        rt.push_left(1.0, img(1))
        rt.push_right(1.004, img(2))  # within slop
        out = rt.poll()
        assert out is not None and out[0] == 1.0
        # left that can never match (right stream moved past)
        rt.push_left(2.0, img(3))
        rt.push_right(2.5, img(4))
        assert rt.poll() is None
        assert rt.stats()["dropped_unmatched"] >= 1
        rt.close()

    def test_scan_stream(self):
        rt = PipelineRuntime(24, 32, slop_s=0.01, with_scan=True)
        rt.push_left(1.0, img(1))
        rt.push_right(1.0, img(2))
        assert rt.poll() is None  # waiting on scan
        pts = np.arange(15, dtype=np.float32).reshape(5, 3)
        rt.push_scan(1.002, pts)
        out = rt.poll()
        assert out is not None
        np.testing.assert_array_equal(out[4], pts)
        rt.close()

    def test_overflow_drops_oldest(self):
        rt = PipelineRuntime(24, 32, capacity=2, slop_s=0.001)
        for i in range(5):
            rt.push_left(float(i), img(i))
            rt.push_right(float(i), img(i))
        assert rt.queue_depth() <= 2
        assert rt.stats()["dropped_overflow"] >= 1
        rt.close()


class TestWorkerThread:
    def test_callback_drains_queue(self):
        rt = PipelineRuntime(24, 32, capacity=16, slop_s=0.001)
        got = []
        rt.start(lambda stamp, l, r, s: got.append((stamp, l.mean())))
        for i in range(6):
            rt.push_left(float(i), img(i))
            rt.push_right(float(i), img(i + 10))
        deadline = time.time() + 5.0
        while len(got) < 6 and time.time() < deadline:
            time.sleep(0.01)
        rt.stop()
        assert len(got) == 6
        assert [g[0] for g in got] == [float(i) for i in range(6)]
        rt.close()


class TestSystemRuntime:
    def test_end_to_end_native_feed(self):
        from visfs_tpu.io.sim import generate_sequence
        from visfs_tpu.slam.system import System

        seq = generate_sequence(n_frames=5, n_points=300, seed=41)
        cam = seq.camera

        def build():
            s = System({"Tracker/MaxFeatures": 100,
                        "Tracker/MinDistance": 16})
            s.init(float(cam.fx), float(cam.fy), float(cam.cx),
                   float(cam.cy), float(cam.baseline), width=cam.width,
                   height=cam.height)
            return s

        # Warm the jit cache on a scratch System first: under a loaded
        # xdist worker the first vo_step compile alone can eat the output
        # deadline, which reads as the runtime producing nothing.
        warm = build()
        warm.input_primary_sensor_data(float(seq.stamps[0]), seq.left[0],
                                       seq.right[0])
        warm.drain_outputs()

        sys_ = build()
        srt = SystemRuntime(sys_, capacity=8, slop_s=0.02)
        srt.start()
        for i in range(len(seq.stamps)):
            srt.push_left(float(seq.stamps[i]), seq.left[i])
            srt.push_right(float(seq.stamps[i]), seq.right[i])
        deadline = time.time() + 60.0
        outs = []
        while len(outs) < len(seq.stamps) and time.time() < deadline:
            o = srt.output()
            if o is not None:
                outs.append(o)
            else:
                time.sleep(0.02)
        srt.stop()
        assert len(outs) == len(seq.stamps)
        assert srt.stats()["processed"] == len(seq.stamps)
        # tracked after bootstrap
        assert not bool(outs[-1].lost)
