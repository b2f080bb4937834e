"""Differentiable occupied-space (laser scan-match) factor.

Replaces the reference's ceres::BiCubicInterpolator-based laser factor
(corelib/src/Optimizer/ceres/OccupiedSpace2dFactor.cpp:11-96 and the g2o
EdgeOccupiedObservation, TypeOccupiedSpace2D.h:96-177): the residual of one
scan point is the bicubic-interpolated correspondence cost of the matching
submap at the point's world position under the newest pose.  Because the
interpolation is plain differentiable jnp, the pose Jacobian comes from JAX
autodiff — exactly how the reference embeds ceres autodiff inside its g2o
edge.

Geometry (matching the reference's operator()): with the BA pose Tcw
(world->camera) and a robot-frame scan point Pr,
    P_world = Tcw^-1 * T_ir * Pr,
and the grid is evaluated at
    row = (max_x - P.x)/res - 0.5, col = (max_y - P.y)/res - 0.5
(cells stored [row, col]; out-of-grid taps read kMaxCorrespondenceCost).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lie import quat_conj, quat_rotate
from ..map2d.probability_values import MAX_CORRESPONDENCE_COST


def _cubic_weights(t):
    """Catmull-Rom (cubic convolution, a = -0.5) weights for 4 taps.

    Matches ceres::CubicHermiteSpline with central-difference derivatives.
    """
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return jnp.stack([w0, w1, w2, w3])


def bicubic_cost(cost_grid, rr, cc):
    """Bicubic sample of [H, W] cost grid at continuous (row, col).

    Out-of-grid taps read MAX_CORRESPONDENCE_COST (GridArrayAdapter's huge
    padding, OccupiedSpace2dFactor.cpp:56-76).
    """
    H, W = cost_grid.shape
    r0 = jnp.floor(rr).astype(jnp.int32)
    c0 = jnp.floor(cc).astype(jnp.int32)
    fr = rr - r0
    fc = cc - c0
    wr = _cubic_weights(fr)  # [4]
    wc = _cubic_weights(fc)

    offs = jnp.arange(-1, 3)
    rows = r0 + offs  # [4]
    cols = c0 + offs
    inb_r = (rows >= 0) & (rows < H)
    inb_c = (cols >= 0) & (cols < W)
    rows_c = jnp.clip(rows, 0, H - 1)
    cols_c = jnp.clip(cols, 0, W - 1)
    patch = cost_grid[rows_c[:, None], cols_c[None, :]]
    patch = jnp.where(
        inb_r[:, None] & inb_c[None, :], patch, MAX_CORRESPONDENCE_COST
    )
    return wr @ patch @ wc


def occupied_space_residual(pose_q, pose_t, p_robot, cost_grid,
                            resolution, max_x, max_y, t_ir):
    """Residual of one scan point under pose Tcw = (pose_q, pose_t); scalar."""
    p_img = (t_ir[:3, :3] @ p_robot) + t_ir[:3, 3]
    # world = Tcw^-1 * p_img
    qi = quat_conj(pose_q)
    p_world = quat_rotate(qi, p_img - pose_t)
    rr = (max_x - p_world[0]) / resolution - 0.5
    cc = (max_y - p_world[1]) / resolution - 0.5
    return bicubic_cost(cost_grid, rr, cc)


def occupied_space_terms(pose_q, pose_t, points_robot, points_mask,
                         cost_grid, resolution, max_x, max_y, t_ir,
                         info_weight):
    """Residuals + pose-tangent Jacobians for all scan points.

    Returns (r [K], J [K, 6], w [K]) where J is wrt the BA tangent update
    (t += dt, q = deltaQ(dw) q) of the newest pose.
    """
    from .factors import apply_tangent

    def res_of(delta, p):
        q, t = apply_tangent(pose_q, pose_t, delta)
        return occupied_space_residual(
            q, t, p, cost_grid, resolution, max_x, max_y, t_ir
        )

    zero = jnp.zeros(6, dtype=pose_t.dtype)

    def per_point(p):
        r, J = jax.value_and_grad(res_of, argnums=0)(zero, p)
        return r, J

    r, J = jax.vmap(per_point)(points_robot)
    w = info_weight * points_mask.astype(r.dtype)
    r = jnp.where(points_mask, r, 0.0)
    J = jnp.where(points_mask[:, None], J, 0.0)
    return r, J, w
