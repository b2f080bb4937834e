"""Fixed-capacity masked state pytrees for the fused per-frame pipeline.

The reference keeps per-frame state in std::map-keyed Signatures flowing
through three threads (Tracker/Estimator/Monitor, System.cpp:45-52) and a
LocalMap of map<id, Feature> (LocalMap.h:11-49).  Here all of it lives in
fixed-capacity arrays with validity masks so one jitted
``step(state, frame) -> (state, out)`` subsumes the whole pipeline:

  * FeatureTable — unified tracker words + LocalMap features: slot-allocated
    global ids, per-window-slot observations (uv left/right + image-frame
    depth: the exact inputs of the BA stereo factor, LocalMap.cpp:274-294),
    world position, NEW_ADDED/STABLE state, track counter;
  * WindowState — the sliding window of map_size+1 signatures: global robot
    poses Twr, wheel-odometry poses, stamps;
  * KeyframeCounters — the keyframe decision accumulators
    (LocalMap.cpp:95-126);
  * OdomBuffer — the Extrapolator's wheel-odometry ring buffer
    (Extrapolator.cpp:24-66);
  * VOState — everything carried frame to frame, including the
    estimator->tracker outlier-blocking feedback (Estimator.cpp:431-447 /
    Tracker.cpp:143-165) as arrays instead of a cross-thread queue.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32


class FeatureTable(NamedTuple):
    fid: jnp.ndarray  # [F] int32 global feature id, -1 = free slot
    valid: jnp.ndarray  # [F] bool
    uv: jnp.ndarray  # [F, W, 2] left-image pixel observations
    uv_right: jnp.ndarray  # [F, W, 2] right-image pixels
    depth: jnp.ndarray  # [F, W] image-frame z per observation
    obs_mask: jnp.ndarray  # [F, W] bool
    pw: jnp.ndarray  # [F, 3] world-frame position
    stable: jnp.ndarray  # [F] bool — STABLE (fixed in BA) vs NEW_ADDED
    track_cnt: jnp.ndarray  # [F] int32 consecutive-track count
    start_frame: jnp.ndarray  # [F] int32 first-observation signature id
    end_frame: jnp.ndarray  # [F] int32 last-observation signature id

    @property
    def capacity(self):
        return self.fid.shape[0]

    @property
    def window(self):
        return self.uv.shape[1]


class WindowState(NamedTuple):
    frame_id: jnp.ndarray  # [W] int32 signature ids, -1 = empty
    valid: jnp.ndarray  # [W] bool
    pose_q: jnp.ndarray  # [W, 4] Twr rotation
    pose_t: jnp.ndarray  # [W, 3] Twr translation
    wheel_q: jnp.ndarray  # [W, 4] wheel-odometry global pose
    wheel_t: jnp.ndarray  # [W, 3]
    wheel_valid: jnp.ndarray  # [W] bool
    stamp: jnp.ndarray  # [W] f32 seconds


class KeyframeCounters(NamedTuple):
    new_feature_count: jnp.ndarray  # int32
    signature_count: jnp.ndarray  # int32
    parallax_count: jnp.ndarray  # f32
    translation_count: jnp.ndarray  # [3] f32 (componentwise |t| accumulation)


class OdomBuffer(NamedTuple):
    """Ring buffer of timestamped wheel odometry (stamp, pose, velocity)."""

    stamp: jnp.ndarray  # [C] f32
    pose: jnp.ndarray  # [C, 6] (x, y, z, roll, pitch, yaw)
    velocity: jnp.ndarray  # [C, 6]
    valid: jnp.ndarray  # [C] bool
    head: jnp.ndarray  # int32 next write slot


class LaserState(NamedTuple):
    """Laser fusion state (strategies >= 3): active submaps + update tables."""

    submaps: "object"  # map2d.submap.ActiveSubmaps2D
    hit_table: jnp.ndarray  # [32768] uint16
    miss_table: jnp.ndarray
    cost_table: jnp.ndarray  # [65536] f32 value -> correspondence cost
    t_laser_robot: jnp.ndarray  # [4, 4] laser -> robot extrinsic


class VOState(NamedTuple):
    features: FeatureTable
    window: WindowState
    counters: KeyframeCounters
    odom: OdomBuffer
    prev_left: jnp.ndarray  # [H, W] previous left image
    prev_right: jnp.ndarray  # [H, W]
    has_prev: jnp.ndarray  # bool
    pose_q: jnp.ndarray  # [4] current global robot pose Twr
    pose_t: jnp.ndarray  # [3]
    prev_wheel_q: jnp.ndarray  # [4] previous wheel odom pose
    prev_wheel_t: jnp.ndarray  # [3]
    prev_wheel_valid: jnp.ndarray  # bool
    velocity: jnp.ndarray  # [6] xyzrpy/s guess velocity (Estimator.cpp:451-470)
    velocity_valid: jnp.ndarray  # bool
    prev_stamp: jnp.ndarray  # f32
    next_fid: jnp.ndarray  # int32 monotonically increasing feature id
    frame_count: jnp.ndarray  # int32 signature id counter
    keyframe: jnp.ndarray  # bool — last frame's keySignature_ decision
    lost: jnp.ndarray  # bool
    blocked_uv: jnp.ndarray  # [B, 2] blocked-word positions (outlier feedback)
    blocked_valid: jnp.ndarray  # [B] bool
    rng_key: jnp.ndarray  # PRNG key for RANSAC
    laser: LaserState | None = None  # structural None for strategies < 3
    # Previous left image's LK pyramid, carried so each frame builds only
    # two pyramids (left, right) instead of three: per level
    # (padded image, grad_x, grad_y).  Empty tuple = rebuild from prev_left.
    prev_pyr: tuple = ()


class FrameOutput(NamedTuple):
    """Per-frame odometry + diagnostics (TrackInfo/EstimateInfo equivalent,
    Signature.h:17-91)."""

    pose: jnp.ndarray  # [4, 4] global robot pose Twr
    transform: jnp.ndarray  # [4, 4] frame-to-frame delta
    lost: jnp.ndarray  # bool
    n_features: jnp.ndarray  # words in current frame
    n_matches: jnp.ndarray  # temporal matches
    n_inliers: jnp.ndarray  # PnP/BA inliers
    n_new: jnp.ndarray  # newly extracted features
    keyframe: jnp.ndarray  # bool
    ba_chi2: jnp.ndarray
    ba_ok: jnp.ndarray
    velocity: jnp.ndarray  # [6] xyzrpy/s
    stamp: jnp.ndarray
    covariance: jnp.ndarray  # [6, 6] (identity like Estimator.cpp:302, or
    # BAD_COVARIANCE*I when lost — InterfaceROS.cpp:291-312)
    # Per-stage wall times in seconds (EstimateInfo timing fields,
    # Signature.h:62-73, published via OdomInfo — MsgConversion.cpp:104-106).
    # Host-measured around synced stage jits when System(profile_stages=True);
    # zero in the fused async path (stages have no host-visible boundary).
    time_tracking: jnp.ndarray = 0.0
    time_estimation: jnp.ndarray = 0.0
    local_bundle_time: jnp.ndarray = 0.0
    time_total: jnp.ndarray = 0.0


def init_feature_table(capacity: int, window: int) -> FeatureTable:
    return FeatureTable(
        fid=jnp.full((capacity,), -1, I32),
        valid=jnp.zeros((capacity,), bool),
        uv=jnp.zeros((capacity, window, 2), F32),
        uv_right=jnp.zeros((capacity, window, 2), F32),
        depth=jnp.zeros((capacity, window), F32),
        obs_mask=jnp.zeros((capacity, window), bool),
        pw=jnp.zeros((capacity, 3), F32),
        stable=jnp.zeros((capacity,), bool),
        track_cnt=jnp.zeros((capacity,), I32),
        start_frame=jnp.zeros((capacity,), I32),
        end_frame=jnp.zeros((capacity,), I32),
    )


def init_window(window: int) -> WindowState:
    # Note: every field gets its own freshly-created buffer — shared buffers
    # would break jit argument donation (same buffer donated twice).
    def qid():
        return jnp.zeros((window, 4), F32).at[:, 0].set(1.0)

    return WindowState(
        frame_id=jnp.full((window,), -1, I32),
        valid=jnp.zeros((window,), bool),
        pose_q=qid(),
        pose_t=jnp.zeros((window, 3), F32),
        wheel_q=qid(),
        wheel_t=jnp.zeros((window, 3), F32),
        wheel_valid=jnp.zeros((window,), bool),
        stamp=jnp.zeros((window,), F32),
    )


def init_laser_state(resolution: float, extent_cells: int,
                     hit_probability: float, miss_probability: float,
                     t_laser_robot=None) -> LaserState:
    from ..map2d import probability_values as pv
    from ..map2d.submap import init_active_submaps

    hit, miss = pv.hit_miss_tables(hit_probability, miss_probability)
    cost = jnp.asarray(pv.value_to_correspondence_cost_table(),
                       dtype=jnp.float32)
    t = (jnp.eye(4, dtype=F32) if t_laser_robot is None
         else jnp.asarray(t_laser_robot, dtype=F32))
    return LaserState(
        submaps=init_active_submaps(resolution, extent_cells),
        hit_table=hit, miss_table=miss, cost_table=cost, t_laser_robot=t,
    )


def init_pyramid_state(height: int, width: int, pad: int,
                       max_level: int, dtype=F32) -> tuple:
    """Zero-filled carried LK pyramid matching ops.lk.build_lk_pyramid.

    dtype must equal LKParams.compute_dtype (the step donates the carried
    pyramid buffers, so init and the tracker's rebuilt pyramid must agree).
    """
    levels = []
    h, w = height, width
    for _ in range(max_level + 1):
        # Three distinct buffers (not one aliased array): the step donates
        # the state, and donating the same buffer twice is an error.
        levels.append(tuple(jnp.zeros((h + 2 * pad, w + 2 * pad), dtype)
                            for _ in range(3)))
        h, w = (h + 1) // 2, (w + 1) // 2
    return tuple(levels)


def init_state(height: int, width: int, capacity: int, window: int,
               odom_capacity: int = 64, blocked_capacity: int = 64,
               seed: int = 0, laser: LaserState | None = None,
               lk_pad: int = 12, lk_max_level: int = 3,
               lk_dtype=F32) -> VOState:
    import jax

    return VOState(
        features=init_feature_table(capacity, window),
        window=init_window(window),
        counters=KeyframeCounters(
            new_feature_count=jnp.zeros((), I32),
            signature_count=jnp.zeros((), I32),
            parallax_count=jnp.zeros((), F32),
            translation_count=jnp.zeros((3,), F32),
        ),
        odom=OdomBuffer(
            stamp=jnp.zeros((odom_capacity,), F32),
            pose=jnp.zeros((odom_capacity, 6), F32),
            velocity=jnp.zeros((odom_capacity, 6), F32),
            valid=jnp.zeros((odom_capacity,), bool),
            head=jnp.zeros((), I32),
        ),
        prev_left=jnp.zeros((height, width), F32),
        prev_right=jnp.zeros((height, width), F32),
        has_prev=jnp.zeros((), bool),
        pose_q=jnp.array([1.0, 0, 0, 0], F32),
        pose_t=jnp.zeros((3,), F32),
        prev_wheel_q=jnp.array([1.0, 0, 0, 0], F32),
        prev_wheel_t=jnp.zeros((3,), F32),
        prev_wheel_valid=jnp.zeros((), bool),
        velocity=jnp.zeros((6,), F32),
        velocity_valid=jnp.zeros((), bool),
        prev_stamp=jnp.zeros((), F32),
        next_fid=jnp.zeros((), I32),
        frame_count=jnp.zeros((), I32),
        keyframe=jnp.ones((), bool),  # keySignature_ starts true
        lost=jnp.zeros((), bool),
        blocked_uv=jnp.zeros((blocked_capacity, 2), F32),
        blocked_valid=jnp.zeros((blocked_capacity,), bool),
        rng_key=jax.random.PRNGKey(seed),
        laser=laser,
        prev_pyr=init_pyramid_state(height, width, lk_pad, lk_max_level,
                                    dtype=lk_dtype),
    )
