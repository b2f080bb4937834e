"""Odometry publication structures (Interface/ROS equivalent, ROS-free).

The reference's VISFSInterfaceROS publishes nav_msgs/Odometry +
rtabmap_ros/OdomInfo from the per-frame results (InterfaceROS.cpp:225-323,
MsgConversion.cpp:93-120), with a BAD_COVARIANCE null-odometry message when
tracking is lost (:291-312).  This module provides the same payloads as
plain dataclasses for any middleware binding (ROS1/ROS2/zmq/...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

BAD_COVARIANCE = 9999.0


@dataclasses.dataclass
class Odometry:
    """nav_msgs/Odometry equivalent."""

    stamp: float
    position: np.ndarray  # [3]
    orientation_wxyz: np.ndarray  # [4]
    pose_covariance: np.ndarray  # [6, 6]
    linear_velocity: np.ndarray  # [3]
    angular_velocity: np.ndarray  # [3]
    valid: bool


@dataclasses.dataclass
class OdomInfo:
    """rtabmap_ros/OdomInfo equivalent diagnostics."""

    stamp: float
    lost: bool
    matches: int
    inliers: int
    features: int
    new_features: int
    keyframe: bool
    ba_chi2: float
    ba_ok: bool
    interval: float
    # Per-stage wall times in seconds (the reference's EstimateInfo timing
    # fields published in rtabmap_ros/OdomInfo — Signature.h:62-73,
    # MsgConversion.cpp:104-106).  Non-zero when the System runs with
    # profile_stages=True; zero under the fused async step.
    time_tracking: float = 0.0
    time_estimation: float = 0.0
    local_bundle_time: float = 0.0
    time_total: float = 0.0


def frame_output_to_messages(out, prev_stamp: Optional[float] = None):
    """Convert a FrameOutput into (Odometry, OdomInfo).

    Lost frames publish null odometry with BAD_COVARIANCE diagonals, exactly
    like the reference (InterfaceROS.cpp:291-312).
    """
    from ..core.lie import mat_to_quat

    pose = np.asarray(out.pose)
    lost = bool(out.lost)
    stamp = float(out.stamp)
    vel = np.asarray(out.velocity)

    if lost:
        cov = np.eye(6) * BAD_COVARIANCE
        odom = Odometry(
            stamp=stamp,
            position=np.zeros(3),
            orientation_wxyz=np.array([1.0, 0, 0, 0]),
            pose_covariance=cov,
            linear_velocity=np.zeros(3),
            angular_velocity=np.zeros(3),
            valid=False,
        )
    else:
        odom = Odometry(
            stamp=stamp,
            position=pose[:3, 3].copy(),
            orientation_wxyz=np.asarray(mat_to_quat(out.pose[:3, :3])),
            pose_covariance=np.asarray(out.covariance),
            linear_velocity=vel[:3].copy(),
            angular_velocity=vel[3:].copy(),
            valid=True,
        )

    info = OdomInfo(
        stamp=stamp,
        lost=lost,
        matches=int(out.n_matches),
        inliers=int(out.n_inliers),
        features=int(out.n_features),
        new_features=int(out.n_new),
        keyframe=bool(out.keyframe),
        ba_chi2=float(out.ba_chi2),
        ba_ok=bool(out.ba_ok),
        interval=(stamp - prev_stamp) if prev_stamp is not None else 0.0,
        time_tracking=float(out.time_tracking),
        time_estimation=float(out.time_estimation),
        local_bundle_time=float(out.local_bundle_time),
        time_total=float(out.time_total),
    )
    return odom, info


@dataclasses.dataclass
class TimedPointCloud:
    """TimedPointCloudWithIntensities equivalent (Sensor/PointCloud.h:73-79)."""

    points: "np.ndarray"  # [N, 3] sensor-frame hits
    times: "np.ndarray"  # [N] per-point time offsets (<= 0, newest = 0)
    intensities: "np.ndarray"  # [N]
    time: float  # acquisition time of the newest point
    origin: "np.ndarray"  # [3]


def laser_scan_to_points(ranges, angle_min, angle_increment, range_min,
                         range_max, stamp, time_increment=0.0,
                         intensities=None):
    """Planar laser scan -> timed point cloud.

    Host-side equivalent of MsgConversion::laserScanToTimedPointCloudWith-
    Intensities (Interface/ROS/src/MsgConversion.cpp:156-197): range-gated
    polar-to-cartesian conversion around +Z, per-point relative times
    shifted so the newest point is 0 and the cloud stamp is the acquisition
    time of the last valid return.
    """
    ranges = np.asarray(ranges, np.float64)
    n = len(ranges)
    angles = angle_min + angle_increment * np.arange(n)
    valid = (ranges >= range_min) & (ranges <= range_max)
    r = ranges[valid]
    a = angles[valid]
    pts = np.stack([r * np.cos(a), r * np.sin(a), np.zeros_like(r)], axis=-1)
    times = (time_increment * np.arange(n))[valid]
    if intensities is not None and len(intensities) == n:
        inten = np.asarray(intensities, np.float32)[valid]
    else:
        inten = np.zeros(len(r), np.float32)
    stamp_out = float(stamp)
    if len(times):
        duration = float(times[-1])
        stamp_out += duration
        times = times - duration
    return TimedPointCloud(
        points=pts.astype(np.float32), times=times.astype(np.float32),
        intensities=inten, time=stamp_out,
        origin=np.zeros(3, np.float32),
    )
