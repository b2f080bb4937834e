"""Extrapolator unit tests (reference corelib/src/Extrapolator.cpp).

Covers the odometry ring buffer, timestamp-nearest two-sample selection,
constant-velocity interpolation/extrapolation, the timing sanity gates, and
the (reference-dead-code) constant-acceleration model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from visfs_tpu.slam import extrapolator as ex
from visfs_tpu.slam.state import init_state


def _buf(samples, capacity=16):
    """Build an OdomBuffer from [(stamp, pose6), ...]."""
    st = init_state(8, 8, capacity=4, window=3, odom_capacity=capacity)
    buf = st.odom
    for t, p in samples:
        buf = ex.add_odometry(
            buf, jnp.float32(t), jnp.asarray(p, jnp.float32),
            jnp.zeros(6, jnp.float32),
        )
    return buf


class TestOdomBuffer:
    def test_ring_wraps(self):
        buf = _buf([(0.01 * i, [i, 0, 0, 0, 0, 0]) for i in range(20)],
                   capacity=8)
        assert int(buf.head) == 20
        assert bool(jnp.all(buf.valid))
        # newest sample lives at head % capacity - 1
        assert float(buf.pose[(20 - 1) % 8, 0]) == 19.0


class TestPredictAlignPose:
    def test_interpolation_between_samples(self):
        # 100 Hz samples moving at 1 m/s in x.
        buf = _buf([(0.10, [0.10, 0, 0, 0, 0, 0]),
                    (0.11, [0.11, 0, 0, 0, 0, 0])])
        pose6, ok = ex.predict_align_pose(buf, jnp.float32(0.105), 100)
        assert bool(ok)
        assert float(pose6[0]) == pytest.approx(0.105, abs=1e-5)

    def test_extrapolation_past_last(self):
        buf = _buf([(0.10, [0.10, 0, 0, 0, 0, 0]),
                    (0.11, [0.11, 0, 0, 0, 0, 0])])
        # within 1/freq past the last sample -> linear extrapolation
        pose6, ok = ex.predict_align_pose(buf, jnp.float32(0.115), 100)
        assert bool(ok)
        assert float(pose6[0]) == pytest.approx(0.115, abs=1e-5)

    def test_gap_gate_rejects_stale_samples(self):
        # samples 50 ms apart >> 2/freq = 20 ms: timing sanity fails
        buf = _buf([(0.10, [0.10, 0, 0, 0, 0, 0]),
                    (0.15, [0.15, 0, 0, 0, 0, 0])])
        _, ok = ex.predict_align_pose(buf, jnp.float32(0.12), 100)
        assert not bool(ok)

    def test_too_far_beyond_rejected(self):
        buf = _buf([(0.10, [0.10, 0, 0, 0, 0, 0]),
                    (0.11, [0.11, 0, 0, 0, 0, 0])])
        # 30 ms past the last sample > 1/freq
        _, ok = ex.predict_align_pose(buf, jnp.float32(0.14), 100)
        assert not bool(ok)

    def test_needs_two_samples(self):
        buf = _buf([(0.10, [0.10, 0, 0, 0, 0, 0])])
        _, ok = ex.predict_align_pose(buf, jnp.float32(0.10), 100)
        assert not bool(ok)


class TestMotionModels:
    def test_vel_motion_model_linear(self):
        p1 = jnp.asarray([0, 0, 0, 0, 0, 0.0], jnp.float32)
        p2 = jnp.asarray([1, 2, 0, 0, 0, 0.2], jnp.float32)
        out = ex._vel_motion_model(
            jnp.float32(0.5), p1, jnp.float32(0.0), jnp.float32(1.0), p1, p2
        )
        np.testing.assert_allclose(
            np.asarray(out), [0.5, 1.0, 0, 0, 0, 0.1], atol=1e-6
        )

    def test_acc_motion_model_forward_backward(self):
        base = jnp.zeros(6, jnp.float32)
        v1 = jnp.asarray([1, 0, 0, 0, 0, 0.0], jnp.float32)
        v2 = jnp.asarray([2, 0, 0, 0, 0, 0.0], jnp.float32)
        fwd = ex.acc_motion_model(jnp.float32(1.0), jnp.bool_(True),
                                  base, v1, v2)
        # x = v1*t + 0.5*(v2-v1)*t = 1 + 0.5
        assert float(fwd[0]) == pytest.approx(1.5, abs=1e-6)
        bwd = ex.acc_motion_model(jnp.float32(1.0), jnp.bool_(False),
                                  base, v1, v2)
        assert float(bwd[0]) == pytest.approx(-2.5, abs=1e-6)


class TestExtrapolatePose:
    def test_stereo_uses_velocity(self):
        st = init_state(8, 8, capacity=4, window=3)
        vel = jnp.asarray([1.0, 0, 0, 0, 0, 0], jnp.float32)
        guess, _, wheel_ok, _, _ = ex.extrapolate_pose(
            st.odom, jnp.float32(2.0), jnp.float32(1.5),
            vel, jnp.bool_(True),
            jnp.zeros(6, jnp.float32), jnp.bool_(False),
            sensor_strategy=0, wheel_freq=100,
        )
        assert not bool(wheel_ok)
        assert float(guess[0, 3]) == pytest.approx(0.5, abs=1e-5)

    def test_wheel_mode_prefers_odometry(self):
        st = init_state(8, 8, capacity=4, window=3)
        buf = st.odom
        for t in (0.10, 0.11):
            buf = ex.add_odometry(
                buf, jnp.float32(t),
                jnp.asarray([t, 0, 0, 0, 0, 0], jnp.float32),
                jnp.zeros(6, jnp.float32),
            )
        prev6 = jnp.asarray([0.10, 0, 0, 0, 0, 0], jnp.float32)
        guess, wheel_pose, wheel_ok, _, _ = ex.extrapolate_pose(
            buf, jnp.float32(0.11), jnp.float32(0.10),
            jnp.zeros(6, jnp.float32), jnp.bool_(False),
            prev6, jnp.bool_(True),
            sensor_strategy=2, wheel_freq=100,
        )
        assert bool(wheel_ok)
        assert float(wheel_pose[0, 3]) == pytest.approx(0.11, abs=1e-5)
        assert float(guess[0, 3]) == pytest.approx(0.01, abs=1e-5)


def test_batched_odometry_push_equals_sequential():
    """System.input_wheel_odometry_batch (one dispatch per frame) must
    leave the ring buffer bit-identical to per-sample pushes."""
    import jax.tree_util as jtu
    import numpy as np

    from visfs_tpu.io.sim import generate_sequence
    from visfs_tpu.slam.system import System

    seq = generate_sequence(n_frames=3, n_points=100, width=96, height=64,
                            seed=4)
    cam = seq.camera

    def mk():
        s = System({"Tracker/MaxFeatures": 40, "System/SensorStrategy": 2})
        s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               float(cam.baseline), width=cam.width, height=cam.height)
        return s

    rows = np.asarray(seq.wheel_odom[:23])  # padded to 32 internally
    a = mk()
    for r in rows:
        a.input_wheel_odometry(float(r[0]), r[1:7])
    b = mk()
    b.input_wheel_odometry_batch(rows[:, 0], rows[:, 1:7])
    for la, lb in zip(jtu.tree_leaves(a.state.odom),
                      jtu.tree_leaves(b.state.odom)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
