"""Synthetic stereo sequence generator with exact ground truth.

The reference repo ships no datasets; its integration testing is manual ROS
bags (SURVEY.md §4).  This simulator renders a rigid 3D "starfield" of
Gaussian splats through the pinhole stereo rig, giving trackable corners with
exact ground-truth poses, depths and correspondences — the substrate for the
front-end unit tests, the end-to-end ATE tests and the benchmarks
(BASELINE.json configs).

World/robot conventions match the engine: robot x forward, y left, z up;
camera z forward (image frame), fixed axis permutation in
core.camera.image_to_robot_transform.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.camera import StereoCamera, make_stereo_camera
from ..core.lie import mat_inv_se3, xyzrpy_to_mat


class SimSequence(NamedTuple):
    left: np.ndarray  # [T, H, W] float32 images in [0, 255]
    right: np.ndarray  # [T, H, W]
    stamps: np.ndarray  # [T]
    poses: np.ndarray  # [T, 4, 4] ground-truth robot poses Twr
    wheel_odom: np.ndarray  # [T_odom, 8]: (stamp, x, y, z, roll, pitch, yaw, valid)
    points: np.ndarray  # [M, 3] world points
    camera: StereoCamera
    laser_scans: np.ndarray | None = None  # [T, B, 3] robot-frame scans
    room: tuple | None = None  # (x_min, x_max, y_min, y_max) wall rectangle
    depth: np.ndarray | None = None  # [T, H, W] depth maps (RGBD mode)


def default_camera(width=320, height=240):
    return make_stereo_camera(
        fx=0.8 * width, fy=0.8 * width, cx=width / 2, cy=height / 2,
        baseline=0.12, width=width, height=height,
    )


def _render(points_cam, intensities, width, height, splat_sigma=0.9):
    """Render Gaussian splats at projected positions (numpy, host-side)."""
    img = np.zeros((height, width), dtype=np.float32)
    rad = 3
    for (u, v, z), inten in zip(points_cam, intensities):
        if z <= 0.25 or not (rad <= u < width - rad and rad <= v < height - rad):
            continue
        iu, iv = int(u), int(v)
        ys = np.arange(iv - rad, iv + rad + 1)
        xs = np.arange(iu - rad, iu + rad + 1)
        gy = np.exp(-((ys - v) ** 2) / (2 * splat_sigma**2))
        gx = np.exp(-((xs - u) ** 2) / (2 * splat_sigma**2))
        img[np.ix_(ys, xs)] += inten * np.outer(gy, gx)
    return np.clip(img, 0.0, 255.0)


def generate_sequence(
    n_frames: int = 30,
    n_points: int = 600,
    width: int = 320,
    height: int = 240,
    motion: str = "arc",
    seed: int = 0,
    fps: float = 10.0,
    odom_rate: float = 100.0,
    odom_noise: float = 0.0,
    camera: StereoCamera | None = None,
    with_laser: bool = False,
    n_beams: int = 180,
    room: tuple = (-3.0, 18.0, -8.0, 8.0),
    laser_noise: float = 0.0,
    with_depth: bool = False,
) -> SimSequence:
    """Generate a stereo sequence of a robot moving through a starfield.

    motion: 'arc' (forward + turn), 'forward', 'yaw' (rotation in place).
    """
    rng = np.random.default_rng(seed)
    cam = camera if camera is not None else default_camera(width, height)

    # World points: a broad volume ahead of the start pose (robot frame x fwd)
    points = np.stack(
        [
            rng.uniform(1.0, 14.0, n_points),  # x forward
            rng.uniform(-7.0, 7.0, n_points),  # y left
            rng.uniform(-2.5, 2.5, n_points),  # z up
        ],
        axis=-1,
    ).astype(np.float32)
    intensities = rng.uniform(90.0, 230.0, n_points).astype(np.float32)

    # Ground-truth robot trajectory
    poses = []
    for i in range(n_frames):
        t = i / fps
        if motion == "forward":
            x, y, yaw = 0.35 * t, 0.0, 0.0
        elif motion == "yaw":
            x, y, yaw = 0.0, 0.0, 0.25 * t
        else:  # arc
            x = 0.35 * t
            y = 0.08 * t * t * 0.5
            yaw = 0.08 * t
        T = np.asarray(
            xyzrpy_to_mat(*[jnp.float32(v) for v in (x, y, 0.0, 0.0, 0.0, yaw)])
        )
        poses.append(T)
    poses = np.stack(poses).astype(np.float32)

    t_ri = np.asarray(cam.t_ri)  # image -> robot
    t_ir = np.asarray(mat_inv_se3(jnp.asarray(t_ri)))
    baseline = float(cam.baseline)
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)

    lefts, rights, depths = [], [], []
    for i in range(n_frames):
        T_rw = np.linalg.inv(poses[i])  # world -> robot
        p_robot = (T_rw[:3, :3] @ points.T).T + T_rw[:3, 3]
        p_img = (t_ir[:3, :3] @ p_robot.T).T + t_ir[:3, 3]
        z = p_img[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            ul = p_img[:, 0] / z * fx + cx
            vl = p_img[:, 1] / z * fy + cy
            ur = (p_img[:, 0] - baseline) / z * fx + cx
        lefts.append(_render(np.stack([ul, vl, z], -1), intensities, width, height))
        rights.append(_render(np.stack([ur, vl, z], -1), intensities, width, height))
        if with_depth:
            depths.append(
                _render_depth(np.stack([ul, vl, z], -1), width, height)
            )

    stamps = np.arange(n_frames, dtype=np.float64) / fps

    # Wheel odometry at odom_rate with optional noise, from GT poses
    n_odom = int(np.ceil(n_frames / fps * odom_rate)) + 2
    odom = np.zeros((n_odom, 8), dtype=np.float64)
    for k in range(n_odom):
        t = k / odom_rate
        tf = min(t * fps, n_frames - 1)
        i0 = int(np.floor(tf))
        i1 = min(i0 + 1, n_frames - 1)
        a = tf - i0
        # interpolate x, y, yaw linearly (planar motion)
        def xyyaw(T):
            return np.array([T[0, 3], T[1, 3], np.arctan2(T[1, 0], T[0, 0])])

        s = (1 - a) * xyyaw(poses[i0]) + a * xyyaw(poses[i1])
        if odom_noise > 0:
            s += rng.normal(scale=odom_noise, size=3)
        odom[k] = [t, s[0], s[1], 0.0, 0.0, 0.0, s[2], 1.0]

    laser_scans = None
    if with_laser:
        laser_scans = np.stack(
            [
                _scan_rectangle_room(poses[i], room, n_beams, rng, laser_noise)
                for i in range(n_frames)
            ]
        )

    return SimSequence(
        left=np.stack(lefts),
        right=np.stack(rights),
        stamps=stamps,
        poses=poses,
        wheel_odom=odom,
        points=points,
        camera=cam,
        laser_scans=laser_scans,
        room=room if with_laser else None,
        depth=np.stack(depths) if with_depth else None,
    )


def _render_depth(points_cam, width, height, rad=3):
    """Dense-enough depth map: z written on a disc around each projection
    (z-buffered by nearest)."""
    depth = np.zeros((height, width), dtype=np.float32)
    for (u, v, z) in points_cam:
        if z <= 0.25 or not (rad <= u < width - rad and rad <= v < height - rad):
            continue
        iu, iv = int(u), int(v)
        patch = depth[iv - rad : iv + rad + 1, iu - rad : iu + rad + 1]
        mask = (patch == 0) | (patch > z)
        patch[mask] = z
    return depth


def _scan_rectangle_room(pose, room, n_beams, rng, noise=0.0):
    """2D laser scan of a rectangular room from a planar robot pose.

    Returns [n_beams, 3] points in the ROBOT frame (z = 0); beams that
    would exit the room (never happens for a closed rectangle) fall back to
    a far range.
    """
    x0, x1, y0, y1 = room
    px, py = pose[0, 3], pose[1, 3]
    yaw = np.arctan2(pose[1, 0], pose[0, 0])
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    world_ang = angles + yaw
    dx = np.cos(world_ang)
    dy = np.sin(world_ang)

    with np.errstate(divide="ignore"):
        tx = np.where(dx > 0, (x1 - px) / dx,
                      np.where(dx < 0, (x0 - px) / dx, np.inf))
        ty = np.where(dy > 0, (y1 - py) / dy,
                      np.where(dy < 0, (y0 - py) / dy, np.inf))
    t = np.minimum(tx, ty)
    if noise > 0:
        t = t + rng.normal(scale=noise, size=t.shape)
    # robot-frame endpoints
    rx = t * np.cos(angles)
    ry = t * np.sin(angles)
    return np.stack([rx, ry, np.zeros_like(rx)], axis=-1).astype(np.float32)


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray) -> float:
    """Absolute trajectory error RMSE over translations (poses [T,4,4]).

    Both trajectories start at identity (VISFS odometry convention), so no
    alignment is performed — this matches comparing odometry outputs.
    """
    d = est_poses[:, :3, 3] - gt_poses[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))
