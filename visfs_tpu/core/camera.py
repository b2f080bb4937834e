"""Pinhole stereo camera model for the TPU-native VISFS engine.

Reference parity: corelib/include/CameraModels/GeometricCamera.h:15-25 and
PinholeModel.  The fixed image->robot axis permutation

    R_ri = [[0, 0, 1],
            [-1, 0, 0],
            [0, -1, 0]]

maps camera axes (x right, y down, z forward) into robot axes (x forward,
y left, z up); the reference hardcodes it in the GeometricCamera constructor
and composes it with the user extrinsic.  Here the camera is a small frozen
pytree usable inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .lie import mat_inv_se3


def image_to_robot_rotation(dtype=jnp.float32) -> jnp.ndarray:
    """The fixed axis permutation R_ri (GeometricCamera.h:18-21)."""
    return jnp.array(
        [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype=dtype
    )


def image_to_robot_transform(dtype=jnp.float32) -> jnp.ndarray:
    T = jnp.eye(4, dtype=dtype)
    return T.at[:3, :3].set(image_to_robot_rotation(dtype))


class StereoCamera(NamedTuple):
    """Rectified pinhole stereo pair.

    fx, fy, cx, cy: left intrinsics; fxr..cyr: right intrinsics;
    baseline: metres; t_ri: 4x4 image->robot transform (axis permutation
    composed with any user extrinsic); width/height: image size in pixels.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    fxr: jnp.ndarray
    fyr: jnp.ndarray
    cxr: jnp.ndarray
    cyr: jnp.ndarray
    baseline: jnp.ndarray
    t_ri: jnp.ndarray
    width: int
    height: int

    @property
    def bf(self):
        return self.baseline * self.fx

    @property
    def t_ir(self):
        """robot -> image transform."""
        return mat_inv_se3(self.t_ri)

    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


def make_stereo_camera(
    fx, fy, cx, cy, baseline, *, fxr=None, fyr=None, cxr=None, cyr=None,
    t_camera_to_robot=None, width=640, height=480, dtype=jnp.float32
) -> StereoCamera:
    """Build a StereoCamera; mirrors System::init (System.cpp:83-99)."""
    f = lambda v: jnp.asarray(v, dtype=dtype)
    t_ri = image_to_robot_transform(dtype)
    if t_camera_to_robot is not None:
        t_ri = jnp.asarray(t_camera_to_robot, dtype=dtype) @ t_ri
    return StereoCamera(
        fx=f(fx), fy=f(fy), cx=f(cx), cy=f(cy),
        fxr=f(fxr if fxr is not None else fx),
        fyr=f(fyr if fyr is not None else fy),
        cxr=f(cxr if cxr is not None else cx),
        cyr=f(cyr if cyr is not None else cy),
        baseline=f(baseline), t_ri=t_ri, width=int(width), height=int(height),
    )


def project(cam: StereoCamera, p_img):
    """Project image-frame 3D points -> left pixel coords (u, v). p_img: [...,3]."""
    z = p_img[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = p_img[..., 0] * inv_z * cam.fx + cam.cx
    v = p_img[..., 1] * inv_z * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: StereoCamera, p_img):
    """Project -> (uL, vL, uR) with uR = uL - bf/z (EdgeStereo::project,
    OptimizeTypeDefine.h:180-187)."""
    z = p_img[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = p_img[..., 0] * inv_z * cam.fx + cam.cx
    v = p_img[..., 1] * inv_z * cam.fy + cam.cy
    ur = u - cam.bf * inv_z
    return jnp.stack([u, v, ur], axis=-1)


def disparity_to_3d(cam: StereoCamera, uv, disparity):
    """Left pixel + disparity -> image-frame 3D point
    (projectDisparityTo3D, MultiviewGeometry.cpp:78-92).

    Returns ([..., 3] points, [...] validity mask).  Invalid entries get NaN
    like the reference's badPoint.
    """
    c = cam.cxr - cam.cx
    denom = disparity + c
    valid = (disparity > 0.0) & (cam.baseline > 0.0) & (jnp.abs(denom) > 1e-9)
    W = cam.baseline / jnp.where(valid, denom, 1.0)
    x = (uv[..., 0] - cam.cx) * W
    y = (uv[..., 1] - cam.cy) * W
    z = cam.fx * W
    p = jnp.stack([x, y, z], axis=-1)
    nan = jnp.full_like(p, jnp.nan)
    return jnp.where(valid[..., None], p, nan), valid


def triangulate_stereo(cam: StereoCamera, uv_left, uv_right, min_depth, max_depth):
    """Batched stereo triangulation -> robot-frame 3D points
    (generateKeyPoints3DStereo, MultiviewGeometry.cpp:57-76).

    Returns ([N,3] robot-frame points, [N] validity).  Depth gates follow the
    reference: z > min_depth (if min_depth >= 0) and z <= max_depth (if
    max_depth > 0).
    """
    disparity = uv_left[..., 0] - uv_right[..., 0]
    p_img, valid = disparity_to_3d(cam, uv_left, disparity)
    z = p_img[..., 2]
    ok_depth = jnp.where(min_depth < 0.0, True, z > min_depth) & jnp.where(
        max_depth <= 0.0, True, z <= max_depth
    )
    valid = valid & ok_depth & jnp.all(jnp.isfinite(p_img), axis=-1)
    p_img_safe = jnp.where(valid[..., None], p_img, 0.0)
    p_robot = (cam.t_ri[:3, :3] @ p_img_safe[..., :, None])[..., 0] + cam.t_ri[:3, 3]
    nan = jnp.full_like(p_robot, jnp.nan)
    return jnp.where(valid[..., None], p_robot, nan), valid
