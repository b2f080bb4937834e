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


# ---------------------------------------------------------------------------
# Textured world renderer
#
# The splat starfield above gives exact correspondences but zero photometric
# realism.  The generator below ray-casts a closed rectangular room (4 walls,
# floor, ceiling) plus floor-to-ceiling pillars, all carrying multi-octave
# procedural value-noise textures: real occlusion (nearest-hit z test),
# dense trackable gradient structure, per-frame exposure drift and pixel
# noise.  This is the evaluation substrate standing in for the reference's
# real rosbag operation (reference README.md:44-56,
# Interface/ROS/src/InterfaceROS.cpp:180-223).
# ---------------------------------------------------------------------------


class _Plane(NamedTuple):
    p0: np.ndarray  # [3] point on plane
    n: np.ndarray  # [3] unit normal
    e1: np.ndarray  # [3] in-plane u axis
    e2: np.ndarray  # [3] in-plane v axis
    u0: float
    u1: float
    v0: float
    v1: float
    grid: np.ndarray  # [S, S] base noise grid


_TEX_OCTAVES = (
    # (world cell size m, weight, sharp): sharp = nearest-neighbor mosaic
    # (piecewise-constant cells => strong GFTT corners at cell boundaries)
    (1.1, 0.34, False),
    (0.33, 0.33, False),
    (0.13, 0.33, True),
)


def _sample_tex(grid: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Multi-octave value noise in [0, 1] at world coords (u, v)."""
    S = grid.shape[0]
    out = np.zeros_like(u)
    for cell, w, sharp in _TEX_OCTAVES:
        gu = u / cell
        gv = v / cell
        iu = np.floor(gu).astype(np.int64)
        iv = np.floor(gv).astype(np.int64)
        if sharp:
            out += w * grid[iu % S, iv % S]
        else:
            fu = gu - iu
            fv = gv - iv
            g00 = grid[iu % S, iv % S]
            g10 = grid[(iu + 1) % S, iv % S]
            g01 = grid[iu % S, (iv + 1) % S]
            g11 = grid[(iu + 1) % S, (iv + 1) % S]
            out += w * ((g00 * (1 - fu) + g10 * fu) * (1 - fv)
                        + (g01 * (1 - fu) + g11 * fu) * fv)
    return out


def _bounded_plane(rng, p0, n, e1, e2, u01, v01) -> _Plane:
    return _Plane(
        p0=np.asarray(p0, np.float64), n=np.asarray(n, np.float64),
        e1=np.asarray(e1, np.float64), e2=np.asarray(e2, np.float64),
        u0=u01[0], u1=u01[1], v0=v01[0], v1=v01[1],
        grid=rng.uniform(0.0, 1.0, (64, 64)),
    )


def _make_world(rng, room, z_floor, z_ceil, n_pillars, traj_xy):
    """Planes (walls/floor/ceiling/pillar faces) + pillar AABBs for laser."""
    x0, x1, y0, y1 = room
    planes = [
        # wall x = x1 (front), normal -x, coords (y, z)
        _bounded_plane(rng, (x1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, 0, 1),
                       (y0, y1), (z_floor, z_ceil)),
        # wall x = x0 (back)
        _bounded_plane(rng, (x0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                       (y0, y1), (z_floor, z_ceil)),
        # wall y = y1 (left)
        _bounded_plane(rng, (0, y1, 0), (0, -1, 0), (1, 0, 0), (0, 0, 1),
                       (x0, x1), (z_floor, z_ceil)),
        # wall y = y0 (right)
        _bounded_plane(rng, (0, y0, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1),
                       (x0, x1), (z_floor, z_ceil)),
        # floor / ceiling
        _bounded_plane(rng, (0, 0, z_floor), (0, 0, 1), (1, 0, 0), (0, 1, 0),
                       (x0, x1), (y0, y1)),
        _bounded_plane(rng, (0, 0, z_ceil), (0, 0, -1), (1, 0, 0), (0, 1, 0),
                       (x0, x1), (y0, y1)),
    ]
    pillars = []
    tries = 0
    while len(pillars) < n_pillars and tries < 200:
        tries += 1
        cx = rng.uniform(x0 + 2.0, x1 - 2.0)
        cy = rng.uniform(y0 + 1.5, y1 - 1.5)
        w = rng.uniform(0.4, 0.9)
        h = rng.uniform(0.4, 0.9)
        # keep clear of the trajectory (camera inside a pillar = blank view)
        d = np.hypot(traj_xy[:, 0] - cx, traj_xy[:, 1] - cy)
        if d.min() < 1.2 + max(w, h):
            continue
        bx0, bx1 = cx - w / 2, cx + w / 2
        by0, by1 = cy - h / 2, cy + h / 2
        pillars.append((bx0, bx1, by0, by1))
        planes += [
            _bounded_plane(rng, (bx1, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                           (by0, by1), (z_floor, z_ceil)),
            _bounded_plane(rng, (bx0, 0, 0), (-1, 0, 0), (0, 1, 0), (0, 0, 1),
                           (by0, by1), (z_floor, z_ceil)),
            _bounded_plane(rng, (0, by1, 0), (0, 1, 0), (1, 0, 0), (0, 0, 1),
                           (bx0, bx1), (z_floor, z_ceil)),
            _bounded_plane(rng, (0, by0, 0), (0, -1, 0), (1, 0, 0), (0, 0, 1),
                           (bx0, bx1), (z_floor, z_ceil)),
        ]
    return planes, pillars


class _PlaneArrays(NamedTuple):
    """Stacked-plane form of the world for the jitted renderer."""

    p0: jnp.ndarray  # [K, 3]
    n: jnp.ndarray  # [K, 3]
    e1: jnp.ndarray  # [K, 3]
    e2: jnp.ndarray  # [K, 3]
    uv: jnp.ndarray  # [K, 4] (u0, u1, v0, v1)
    grids: jnp.ndarray  # [K, S, S]


def _stack_planes(planes) -> _PlaneArrays:
    return _PlaneArrays(
        p0=jnp.asarray(np.stack([p.p0 for p in planes]), jnp.float32),
        n=jnp.asarray(np.stack([p.n for p in planes]), jnp.float32),
        e1=jnp.asarray(np.stack([p.e1 for p in planes]), jnp.float32),
        e2=jnp.asarray(np.stack([p.e2 for p in planes]), jnp.float32),
        uv=jnp.asarray(
            np.stack([[p.u0, p.u1, p.v0, p.v1] for p in planes]),
            jnp.float32),
        grids=jnp.asarray(np.stack([p.grid for p in planes]), jnp.float32),
    )


def _render_view_jax(pa: _PlaneArrays, origin, r_wi, fx, fy, cx, cy,
                     width: int, height: int, t_min=0.25):
    """Ray-cast one camera view (jit-traced; all-pixels x all-planes).

    Same geometry/texture math as the original numpy renderer, in float32
    as one fused XLA program — the 300-frame VGA benchmark substrate
    renders in seconds (on the bench chip) instead of ~10 min of numpy.
    """
    F = jnp.float32
    us = (jnp.arange(width, dtype=F) - cx) / fx
    vs = (jnp.arange(height, dtype=F) - cy) / fy
    d_img = jnp.stack(
        [jnp.tile(us[None, :], (height, 1)).ravel(),
         jnp.tile(vs[:, None], (1, width)).ravel(),
         jnp.ones(width * height, F)], axis=-1)  # [P, 3], z=1 => t is depth
    d_w = d_img @ r_wi.T.astype(F)  # [P, 3]
    o = origin.astype(F)

    denom = d_w @ pa.n.T  # [P, K]
    t_num = jnp.einsum("kd,kd->k", pa.p0 - o[None, :], pa.n)  # [K]
    t = jnp.where(jnp.abs(denom) > 1e-12, t_num[None, :] / denom, -1.0)
    # uu = (o + t d - p0) . e1 = (o - p0).e1 + t * (d . e1)
    a1 = jnp.einsum("kd,kd->k", o[None, :] - pa.p0, pa.e1)  # [K]
    a2 = jnp.einsum("kd,kd->k", o[None, :] - pa.p0, pa.e2)
    b1 = d_w @ pa.e1.T  # [P, K]
    b2 = d_w @ pa.e2.T
    uu = a1[None, :] + t * b1
    vv = a2[None, :] + t * b2
    valid = ((jnp.abs(denom) > 1e-12) & (t > t_min)
             & (uu >= pa.uv[None, :, 0]) & (uu <= pa.uv[None, :, 1])
             & (vv >= pa.uv[None, :, 2]) & (vv <= pa.uv[None, :, 3]))
    tv = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(tv, axis=1)  # [P]
    best_t = jnp.take_along_axis(tv, best[:, None], axis=1)[:, 0]
    hit = jnp.isfinite(best_t)

    uu_w = jnp.take_along_axis(uu, best[:, None], axis=1)[:, 0]
    vv_w = jnp.take_along_axis(vv, best[:, None], axis=1)[:, 0]
    S = pa.grids.shape[1]
    # Flatten the grid stack so each texture tap is ONE [P]-sized gather
    # (indexing pa.grids[best] first would materialize a [P, S, S] copy of
    # the winning grid per pixel — 80 GB at VGA).
    flat_grids = pa.grids.reshape(-1)
    base = best.astype(jnp.int32) * (S * S)

    tex = jnp.zeros_like(uu_w)
    for cell, w, sharp in _TEX_OCTAVES:
        gu = uu_w / cell
        gv = vv_w / cell
        iu = jnp.floor(gu).astype(jnp.int32)
        iv = jnp.floor(gv).astype(jnp.int32)
        m = lambda x: jnp.mod(x, S)  # noqa: E731
        pick = lambda a, b: flat_grids[base + m(a) * S + m(b)]  # noqa: E731
        if sharp:
            tex = tex + w * pick(iu, iv)
        else:
            fu = gu - iu
            fv = gv - iv
            g00 = pick(iu, iv)
            g10 = pick(iu + 1, iv)
            g01 = pick(iu, iv + 1)
            g11 = pick(iu + 1, iv + 1)
            tex = tex + w * ((g00 * (1 - fu) + g10 * fu) * (1 - fv)
                             + (g01 * (1 - fu) + g11 * fu) * fv)

    img = jnp.where(hit, tex, 0.0)
    depth = jnp.where(hit, best_t, 0.0)
    return img.reshape(height, width), depth.reshape(height, width)


_render_batch_jit = None


def _render_views(planes, origins, rots, fx, fy, cx, cy, width, height,
                  t_min=0.25, chunk: int = 8):
    """Ray-cast V camera views.  Returns (images [V,H,W] in [0,1], z-depth).

    Views render vmapped in chunks of `chunk` per jitted call: one call per
    view would pay the device-dispatch round trip 2*n_frames times (which
    dwarfs the render on a remote-tunnel TPU), while one call for all views
    would hold [V, H*W, K] intermediates.  8 VGA views x ~30 planes is
    ~2 GB of fused temporaries — comfortably within HBM.
    """
    global _render_batch_jit
    import jax

    sig = (width, height, float(t_min))
    if _render_batch_jit is None or _render_batch_jit[0] != sig:

        def one(pa_, o_, r_, fx_, fy_, cx_, cy_):
            return _render_view_jax(pa_, o_, r_, fx_, fy_, cx_, cy_,
                                    width, height, t_min)

        _render_batch_jit = (sig, jax.jit(
            jax.vmap(one, in_axes=(None, 0, 0, None, None, None, None))))
    pa = _stack_planes(planes)
    V = origins.shape[0]
    imgs = np.empty((V, height, width), np.float64)
    deps = np.empty((V, height, width), np.float64)
    for s in range(0, V, chunk):
        e = min(s + chunk, V)
        # Pad the tail chunk so every call shares one compiled program.
        pad = chunk - (e - s)
        o = np.concatenate([origins[s:e], origins[e - 1:e].repeat(pad, 0)])
        r = np.concatenate([rots[s:e], rots[e - 1:e].repeat(pad, 0)])
        im, dp = _render_batch_jit[1](
            pa, jnp.asarray(o, jnp.float32), jnp.asarray(r, jnp.float32),
            float(fx), float(fy), float(cx), float(cy))
        imgs[s:e] = np.asarray(im)[: e - s]
        deps[s:e] = np.asarray(dp)[: e - s]
    return imgs, deps


def _square_path(room, margin=4.0, corner_radius=1.5):
    """Rounded-rectangle loop inset `margin` from the room walls.

    Returns (perimeter_length, point(s) -> (x, y, yaw_unwrapped)).
    """
    x0, x1, y0, y1 = room
    ax0, ax1 = x0 + margin, x1 - margin
    ay0, ay1 = y0 + margin, y1 - margin
    r = corner_radius
    lw = (ax1 - ax0) - 2 * r  # straight length along x
    lh = (ay1 - ay0) - 2 * r  # straight length along y
    arc = 0.5 * np.pi * r
    # pieces: (kind, length, data); yaw accumulates continuously
    pieces = []
    pieces.append(("s", lw, ((ax0 + r, ay0), (1.0, 0.0), 0.0)))
    pieces.append(("a", arc, ((ax1 - r, ay0 + r), -0.5 * np.pi, 0.0)))
    pieces.append(("s", lh, ((ax1, ay0 + r), (0.0, 1.0), 0.5 * np.pi)))
    pieces.append(("a", arc, ((ax1 - r, ay1 - r), 0.0, 0.5 * np.pi)))
    pieces.append(("s", lw, ((ax1 - r, ay1), (-1.0, 0.0), np.pi)))
    pieces.append(("a", arc, ((ax0 + r, ay1 - r), 0.5 * np.pi, np.pi)))
    pieces.append(("s", lh, ((ax0, ay1 - r), (0.0, -1.0), 1.5 * np.pi)))
    pieces.append(("a", arc, ((ax0 + r, ay0 + r), np.pi, 1.5 * np.pi)))
    total = sum(p[1] for p in pieces)

    def point(s):
        laps, s = divmod(s, total)
        yaw_base = laps * 2.0 * np.pi
        for kind, length, data in pieces:
            if s <= length or (kind is pieces[-1][0] and data is pieces[-1][2]):
                if s > length:
                    s = length
                if kind == "s":
                    (sx, sy), (dx, dy), yaw = data
                    return (sx + dx * s, sy + dy * s, yaw_base + yaw)
                (ccx, ccy), ang0, yaw0 = data
                dang = s / corner_radius
                a = ang0 + dang
                return (ccx + corner_radius * np.cos(a),
                        ccy + corner_radius * np.sin(a),
                        yaw_base + yaw0 + dang)
            s -= length
        raise AssertionError

    return total, point


def _trajectory(motion, n_frames, fps, room, loops=1.0, speed=None):
    """Per-frame (x, y, yaw_unwrapped) arrays for each motion profile."""
    ts = np.arange(n_frames) / fps
    if motion == "forward":
        return 0.35 * ts, np.zeros(n_frames), np.zeros(n_frames)
    if motion == "yaw":
        return np.zeros(n_frames), np.zeros(n_frames), 0.25 * ts
    if motion == "arc":
        return 0.35 * ts, 0.04 * ts * ts, 0.08 * ts
    if motion == "square":
        total, point = _square_path(room)
        if speed is None:
            speed = loops * total / max(ts[-1], 1e-9)
        xyy = np.array([point(speed * t) for t in ts])
        return xyy[:, 0], xyy[:, 1], xyy[:, 2]
    raise ValueError(f"unknown motion {motion!r}")


def _wheel_odom_from_traj(xs, ys, yaws, n_frames, fps, odom_rate, rng,
                          drift_xy=0.0, drift_yaw=0.0):
    """Wheel odometry samples with random-walk drift (integrated wheel
    error — NOT white noise on absolute pose: the extrapolator
    differentiates consecutive samples, so white noise would alias into
    huge velocity noise that no real encoder produces)."""
    n_odom = int(np.ceil((n_frames - 1) / fps * odom_rate)) + 2
    odom = np.zeros((n_odom, 8), dtype=np.float64)
    dt = 1.0 / odom_rate
    dx = dy = dyaw = 0.0
    for k in range(n_odom):
        t = k * dt
        tf = min(t * fps, n_frames - 1)
        i0 = int(np.floor(tf))
        i1 = min(i0 + 1, n_frames - 1)
        a = tf - i0
        x = (1 - a) * xs[i0] + a * xs[i1] + dx
        y = (1 - a) * ys[i0] + a * ys[i1] + dy
        yaw = (1 - a) * yaws[i0] + a * yaws[i1] + dyaw
        odom[k] = [t, x, y, 0.0, 0.0, 0.0, yaw, 1.0]
        if drift_xy > 0:
            dx += rng.normal(scale=drift_xy * np.sqrt(dt))
            dy += rng.normal(scale=drift_xy * np.sqrt(dt))
        if drift_yaw > 0:
            dyaw += rng.normal(scale=drift_yaw * np.sqrt(dt))
    return odom


def _scan_world(pose, room, pillars, n_beams, rng, noise=0.0):
    """2D laser scan of the room walls + pillar AABBs (robot frame)."""
    x0, x1, y0, y1 = room
    px, py = pose[0, 3], pose[1, 3]
    yaw = np.arctan2(pose[1, 0], pose[0, 0])
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    world_ang = angles + yaw
    dx = np.cos(world_ang)
    dy = np.sin(world_ang)
    with np.errstate(divide="ignore", invalid="ignore"):
        tx = np.where(dx > 0, (x1 - px) / dx,
                      np.where(dx < 0, (x0 - px) / dx, np.inf))
        ty = np.where(dy > 0, (y1 - py) / dy,
                      np.where(dy < 0, (y0 - py) / dy, np.inf))
        t = np.minimum(tx, ty)
        for (bx0, bx1, by0, by1) in pillars:
            t1x = (bx0 - px) / np.where(dx == 0, 1e-12, dx)
            t2x = (bx1 - px) / np.where(dx == 0, 1e-12, dx)
            t1y = (by0 - py) / np.where(dy == 0, 1e-12, dy)
            t2y = (by1 - py) / np.where(dy == 0, 1e-12, dy)
            tnear = np.maximum(np.minimum(t1x, t2x), np.minimum(t1y, t2y))
            tfar = np.minimum(np.maximum(t1x, t2x), np.maximum(t1y, t2y))
            hit = (tnear <= tfar) & (tnear > 0)
            t = np.where(hit, np.minimum(t, tnear), t)
    if noise > 0:
        t = t + rng.normal(scale=noise, size=t.shape)
    rx = t * np.cos(angles)
    ry = t * np.sin(angles)
    return np.stack([rx, ry, np.zeros_like(rx)], axis=-1).astype(np.float32)


def generate_textured_sequence(
    n_frames: int = 300,
    width: int = 320,
    height: int = 240,
    motion: str = "square",
    seed: int = 0,
    fps: float = 10.0,
    odom_rate: float = 100.0,
    odom_drift_xy: float = 0.01,
    odom_drift_yaw: float = 0.002,
    camera: StereoCamera | None = None,
    with_laser: bool = False,
    n_beams: int = 180,
    room: tuple = (-3.0, 18.0, -8.0, 8.0),
    z_floor: float = -0.6,
    z_ceil: float = 1.4,
    n_pillars: int = 6,
    pixel_noise: float = 2.0,
    exposure_drift: float = 0.02,
    laser_noise: float = 0.0,
    with_depth: bool = False,
    loops: float = 1.0,
    speed: float | None = None,
) -> SimSequence:
    """Render a textured closed-room sequence with occlusion + noise.

    motion='square' drives a rounded-rectangle loop (`loops` laps over the
    sequence) that revisits its start — the drifted-loop-closure substrate.
    """
    rng = np.random.default_rng(seed)
    cam = camera if camera is not None else default_camera(width, height)

    xs, ys, yaws = _trajectory(motion, n_frames, fps, room, loops, speed)
    # Odometry starts at identity (VISFS convention); shift the WORLD so the
    # first pose is the origin (square paths start inset from the walls).
    x_off, y_off = float(xs[0]), float(ys[0])
    if x_off or y_off:
        assert abs(yaws[0]) < 1e-9, "trajectory must start with yaw 0"
        xs = xs - x_off
        ys = ys - y_off
        room = (room[0] - x_off, room[1] - x_off,
                room[2] - y_off, room[3] - y_off)
    poses = np.stack([
        np.asarray(xyzrpy_to_mat(*[jnp.float32(v) for v in
                                   (xs[i], ys[i], 0.0, 0.0, 0.0, yaws[i])]))
        for i in range(n_frames)
    ]).astype(np.float32)

    planes, pillars = _make_world(
        rng, room, z_floor, z_ceil, n_pillars, np.stack([xs, ys], -1)
    )

    t_ri = np.asarray(cam.t_ri, np.float64)  # image -> robot
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    baseline = float(cam.baseline)

    # Render all 2*n views batched on the device (one vmapped jit call per
    # chunk — per-call dispatch over a remote-tunnel TPU costs more than the
    # render itself, so views must not be issued one by one).
    origins = np.empty((n_frames, 2, 3), np.float64)
    rots = np.empty((n_frames, 3, 3), np.float64)
    for i in range(n_frames):
        t_wi = poses[i].astype(np.float64) @ t_ri
        rots[i] = t_wi[:3, :3]
        origins[i, 0] = t_wi[:3, 3]
        origins[i, 1] = t_wi[:3, 3] + rots[i] @ np.array([baseline, 0.0, 0.0])
    imgs, deps = _render_views(planes, origins.reshape(-1, 3),
                               np.repeat(rots, 2, axis=0), fx, fy, cx, cy,
                               width, height)

    gain, bias = 1.0, 0.0
    lefts, rights, depths = [], [], []
    for i in range(n_frames):
        for img, dst in ((imgs[2 * i], lefts), (imgs[2 * i + 1], rights)):
            out = (img * 175.0 + 35.0) * gain + bias
            if pixel_noise > 0:
                out = out + rng.normal(scale=pixel_noise, size=out.shape)
            dst.append(np.clip(out, 0.0, 255.0).astype(np.float32))
        if with_depth:
            depths.append(deps[2 * i].astype(np.float32))
        if exposure_drift > 0:
            gain = float(np.clip(gain * np.exp(
                rng.normal(scale=exposure_drift)), 0.6, 1.6))
            bias = float(np.clip(bias + rng.normal(scale=exposure_drift * 40),
                                 -25.0, 25.0))

    stamps = np.arange(n_frames, dtype=np.float64) / fps
    odom = _wheel_odom_from_traj(
        xs, ys, yaws, n_frames, fps, odom_rate, rng,
        drift_xy=odom_drift_xy, drift_yaw=odom_drift_yaw,
    )
    laser_scans = None
    if with_laser:
        laser_scans = np.stack([
            _scan_world(poses[i], room, pillars, n_beams, rng, laser_noise)
            for i in range(n_frames)
        ])

    return SimSequence(
        left=np.stack(lefts), right=np.stack(rights), stamps=stamps,
        poses=poses, wheel_odom=odom, points=np.zeros((0, 3), np.float32),
        camera=cam, laser_scans=laser_scans,
        room=room if with_laser else None,
        depth=np.stack(depths) if with_depth else None,
    )


_SIM_CACHE_VERSION = 3  # v3: float32 XLA renderer (pixel values shift ~1e-6)


def cached_textured_sequence(**kwargs) -> SimSequence:
    """generate_textured_sequence with an on-disk npz cache (long sequences
    take ~0.1 s/frame to ray-cast; benchmarks reuse them across runs)."""
    import hashlib
    import json as _json
    import os
    import tempfile

    key = _json.dumps({**kwargs, "_v": _SIM_CACHE_VERSION}, sort_keys=True)
    digest = hashlib.sha256(key.encode()).hexdigest()[:20]
    cache_dir = os.environ.get(
        "VISFS_SIM_CACHE",
        os.path.join(tempfile.gettempdir(), "visfs_sim_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"seq_{digest}.npz")
    cam = kwargs.get("camera") or default_camera(
        kwargs.get("width", 320), kwargs.get("height", 240)
    )
    if os.path.exists(path):
        try:
            z = np.load(path, allow_pickle=False)
            return SimSequence(
                left=z["left"].astype(np.float32),
                right=z["right"].astype(np.float32),
                stamps=z["stamps"], poses=z["poses"],
                wheel_odom=z["wheel_odom"], points=z["points"], camera=cam,
                laser_scans=z["laser_scans"] if "laser_scans" in z else None,
                room=tuple(z["room"]) if "room" in z else None,
                depth=z["depth"] if "depth" in z else None,
            )
        except Exception:
            pass  # stale/corrupt cache: regenerate
    seq = generate_textured_sequence(**{k: v for k, v in kwargs.items()})
    # Quantize to 8-bit BEFORE returning, not just before saving: real
    # cameras emit 8-bit frames, and the cache stores uint8 — returning the
    # raw float render on a cold cache would make cold and warm runs see
    # different pixels (found the hard way: a bistable starved-budget test
    # passed on the cold render and failed on every warm rerun).
    seq = seq._replace(
        left=np.clip(seq.left, 0, 255).astype(np.uint8).astype(np.float32),
        right=np.clip(seq.right, 0, 255).astype(np.uint8).astype(np.float32),
    )
    arrays = dict(
        left=np.clip(seq.left, 0, 255).astype(np.uint8),
        right=np.clip(seq.right, 0, 255).astype(np.uint8),
        stamps=seq.stamps, poses=seq.poses, wheel_odom=seq.wheel_odom,
        points=seq.points,
    )
    if seq.laser_scans is not None:
        arrays["laser_scans"] = seq.laser_scans
        arrays["room"] = np.asarray(seq.room)
    if seq.depth is not None:
        arrays["depth"] = seq.depth
    tmp = path + ".tmp.npz"  # savez appends .npz unless already suffixed
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    return seq


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray) -> float:
    """Absolute trajectory error RMSE over translations (poses [T,4,4]).

    Both trajectories start at identity (VISFS odometry convention), so no
    alignment is performed — this matches comparing odometry outputs.
    """
    d = est_poses[:, :3, 3] - gt_poses[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))
