"""Motion-prior extrapolator over a wheel-odometry ring buffer.

Replaces the reference Extrapolator (corelib/src/Extrapolator.cpp): buffers
timestamped wheel odometry (pose + velocity tuples, addOdometry :24-32); for
an image timestamp picks the two nearest samples (getApproximateOdometry
:34-66) and produces an aligned global wheel pose by constant-velocity
interpolation/extrapolation in (x,y,z,roll,pitch,yaw) space (velMotionModel
:172-194, predictAlignPose :196-276).  For pure stereo/RGBD the prior is the
last visual velocity (extrapolateFromVelocity :106-122).

The std::list + mutex becomes a fixed ring buffer in device state; the
timestamp search is an argmin over the buffer.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.lie import mat_to_xyzrpy, xyzrpy_to_mat
from .state import OdomBuffer


def add_odometry(buf: OdomBuffer, stamp, pose6, vel6) -> OdomBuffer:
    """Push one wheel-odometry sample (Extrapolator::addOdometry)."""
    i = buf.head % buf.stamp.shape[0]
    return OdomBuffer(
        stamp=buf.stamp.at[i].set(stamp),
        pose=buf.pose.at[i].set(pose6),
        velocity=buf.velocity.at[i].set(vel6),
        valid=buf.valid.at[i].set(True),
        head=buf.head + 1,
    )


def _vel_motion_model(delta_t, base6, t1, t2, pose1_6, pose2_6):
    """Linear xyzrpy interpolation (velMotionModel, Extrapolator.cpp:172-194)."""
    interval = t2 - t1
    safe = jnp.where(jnp.abs(interval) < 1e-9, 1.0, interval)
    rate = (pose2_6 - pose1_6) / safe
    return base6 + rate * delta_t


def acc_motion_model(delta_t, direction, base6, v1_6, v2_6):
    """Constant-acceleration xyzrpy prediction (accMotionModel,
    Extrapolator.cpp:124-170).

    Kept for inventory parity: both reference call sites are commented out
    (Extrapolator.cpp:218,252 — velMotionModel is used instead), so this is
    not on the live path there either.  direction True = second-last ->
    last; False integrates backwards with negated v2/acceleration.
    """
    acc = v2_6 - v1_6
    half = 0.5 * delta_t
    fwd = base6 + v1_6 * delta_t + acc * half
    bwd = base6 - v2_6 * delta_t - acc * half
    return jnp.where(direction, fwd, bwd)


def predict_align_pose(buf: OdomBuffer, stamp, wheel_freq: int):
    """Aligned global wheel pose at `stamp` (predictAlignPose equivalent).

    Returns (pose6, valid).  Valid requires two buffered samples whose
    spacing passes the reference's timing sanity checks
    (Extrapolator.cpp:203-219: gap <= 2/freq between samples for
    interpolation, <= 1/freq for extrapolation past the last sample).

    Known-quirk note: the reference's 2-sample extrapolation branch
    (Extrapolator.cpp:215-221) evaluates velMotionModel with
    base=secondLastPose but deltaTime measured from lastTime —
    under-extrapolating by one sample interval; its 3-sample overload
    (Extrapolator.cpp:249-253) uses base=lastPose, which equals
    base=secondLastPose with deltaTime from secondLastTime.  We use the
    consistent (3-sample-overload) math for both branches.
    """
    score = jnp.where(buf.valid, jnp.abs(buf.stamp - stamp), jnp.inf)
    best = jnp.argmin(score)
    score2 = score.at[best].set(jnp.inf)
    second = jnp.argmin(score2)
    have_two = jnp.sum(buf.valid) >= 2

    tb, ts = buf.stamp[best], buf.stamp[second]
    pb, ps = buf.pose[best], buf.pose[second]
    # order: last = later of the two
    t_last = jnp.maximum(tb, ts)
    t_second = jnp.minimum(tb, ts)
    p_last = jnp.where(tb >= ts, pb, ps)
    p_second = jnp.where(tb >= ts, ps, pb)

    interval = 1.0 / wheel_freq
    inside = (t_second <= stamp) & (stamp <= t_last)
    beyond = t_last < stamp
    gap_ok_inside = (t_last - t_second) <= 2.0 * interval + 1e-6
    gap_ok_beyond = (stamp - t_last) <= interval + 1e-6

    pose6 = _vel_motion_model(
        stamp - t_second, p_second, t_second, t_last, p_second, p_last
    )
    valid = have_two & (
        (inside & gap_ok_inside) | (beyond & gap_ok_beyond & gap_ok_inside)
    )
    return pose6, valid


def extrapolate_pose(
    buf: OdomBuffer,
    stamp,
    prev_stamp,
    velocity6,
    velocity_valid,
    prev_wheel6,
    prev_wheel_valid,
    sensor_strategy: int,
    wheel_freq: int,
):
    """Extrapolator::extrapolatorPose equivalent.

    Returns (guess_delta [4,4], wheel_pose [4,4], wheel_pose_valid,
    new_prev_wheel6, new_prev_wheel_valid).
    """
    dt = stamp - prev_stamp
    vel_delta6 = jnp.where(
        velocity_valid & (prev_stamp > 0.0), velocity6 * dt, jnp.zeros(6)
    )
    vel_delta = xyzrpy_to_mat(*[vel_delta6[i] for i in range(6)])

    if sensor_strategy < 2:
        eye = jnp.eye(4, dtype=vel_delta.dtype)
        return vel_delta, eye, jnp.zeros((), bool), prev_wheel6, prev_wheel_valid

    pose6, ok = predict_align_pose(buf, stamp, wheel_freq)
    wheel_pose = xyzrpy_to_mat(*[pose6[i] for i in range(6)])
    prev_mat = xyzrpy_to_mat(*[prev_wheel6[i] for i in range(6)])
    from ..core.lie import mat_inv_se3

    delta_wheel = mat_inv_se3(prev_mat) @ wheel_pose
    eye = jnp.eye(4, dtype=wheel_pose.dtype)
    guess = jnp.where(
        ok & prev_wheel_valid, delta_wheel,
        jnp.where(ok, eye, vel_delta),
    )
    new_prev6 = jnp.where(ok, pose6, prev_wheel6)
    new_prev_valid = ok | prev_wheel_valid
    return guess, wheel_pose, ok, new_prev6, new_prev_valid
