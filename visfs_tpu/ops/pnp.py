"""Batched 3D->2D PnP RANSAC motion estimation.

TPU-native replacement for estimateMotion3DTo2D + VISFS::solvePnPRansac
(corelib/src/MultiviewGeometry.cpp:94-216, 219-315), which wrap
cv::solvePnPRansac + an inlier-refinement loop.

Re-imagined as fixed-shape batched work:
  * ``K`` hypotheses run in parallel (vmap).  Hypothesis 0 is the motion
    guess (wheel odometry / constant-velocity prior — the reference always
    seeds PnP with a guess, Tracker.cpp:237-252, Estimator.cpp:188-190);
    the rest run Gauss-Newton on random minimal 4-point subsets from
    randomly perturbed starts, which covers the RANSAC role of rejecting
    gross outliers without a data-dependent loop.
  * every hypothesis is scored by its inlier count over all matches at the
    reprojection threshold; the best wins.
  * the reference's refineModel loop (solvePnPRansac refinement with
    variance-adaptive threshold, refineSigma=3.0, oscillation detection)
    becomes a fixed ``refine_iterations`` loop of masked GN + threshold
    update — same statistical behaviour, static shape.

Pose parameterization matches the BA solver: camera-from-world (q, t) with
the left-quaternion tangent update; Jacobians are the 2D rows of the stereo
factor's analytic Jacobian.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import quat_rotate, quat_to_mat, skew
from ..solver.factors import apply_tangent, solve6x6_spd


@dataclasses.dataclass(frozen=True)
class PnPSettings:
    iterations: int = 50  # Estimator/PnPIterations: hypothesis count
    reproj_error: float = 2.0  # Estimator/PnPReprojError (pixels)
    min_inliers: int = 12  # Estimator/MinInliers
    refine_iterations: int = 5  # Estimator/RefineIterations
    refine_sigma: float = 3.0  # solvePnPRansac default _refineSigma
    gn_iterations: int = 6  # inner Gauss-Newton iterations per hypothesis fit
    # IRLS steps per refineModel round: the reference converges a full
    # solvePnP inside each round; ~3 single-GN IRLS steps reach the same
    # fixed point, so total refine steps = refine_iterations * this.
    refine_steps_per_round: int = 3
    perturbation: float = 0.05  # hypothesis start jitter (m / rad)


class PnPResult(NamedTuple):
    q: jnp.ndarray  # [4] camera-from-world rotation
    t: jnp.ndarray  # [3]
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # int
    ok: jnp.ndarray  # bool — n_inliers >= min_inliers
    mean_err: jnp.ndarray  # mean reprojection error over inliers


def _project(q, t, pw, fx, fy, cx, cy):
    pc = quat_rotate(q, pw) + t
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
    u = pc[..., 0] / z * fx + cx
    v = pc[..., 1] / z * fy + cy
    return jnp.stack([u, v], axis=-1), pc


def _reproj_errors(q, t, pw, uv, fx, fy, cx, cy):
    pred, pc = _project(q, t, pw, fx, fy, cx, cy)
    err = jnp.linalg.norm(pred - uv, axis=-1)
    behind = pc[..., 2] <= 0.05
    return jnp.where(behind, 1e6, err)


def _gn_refine(q, t, pw, uv, weights, fx, fy, cx, cy, n_iters: int):
    """Pose-only Gauss-Newton on weighted points (vmap-safe)."""

    def body(_, qt):
        q, t = qt
        R = quat_to_mat(q)

        def per_point(p, ob):
            rp = R @ p
            pc = rp + t
            z = jnp.where(jnp.abs(pc[2]) < 1e-6, 1e-6, pc[2])
            inv_z = 1.0 / z
            pred = jnp.array([pc[0] * inv_z * fx + cx, pc[1] * inv_z * fy + cy])
            r = ob - pred
            dproj = jnp.array(
                [
                    [fx * inv_z, 0.0, -fx * pc[0] * inv_z * inv_z],
                    [0.0, fy * inv_z, -fy * pc[1] * inv_z * inv_z],
                ]
            )
            J = jnp.concatenate([-dproj, dproj @ skew(rp)], axis=1)  # [2,6]
            return J, r

        J, r = jax.vmap(per_point)(pw, uv)  # [N,2,6], [N,2]
        w = weights[:, None, None]
        H = jnp.einsum("nki,nkj->ij", J * w, J) + 1e-6 * jnp.eye(6, dtype=t.dtype)
        g = -jnp.einsum("nki,nk->i", J * w, r)
        delta = solve6x6_spd(H, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return apply_tangent(q, t, delta)

    return jax.lax.fori_loop(0, n_iters, body, (q, t))


def solve_pnp_ransac(
    pw,
    uv,
    match_mask,
    q0,
    t0,
    fx, fy, cx, cy,
    key,
    settings: PnPSettings = PnPSettings(),
):
    """Estimate camera-from-world pose from 3D-2D correspondences.

    pw: [N,3] points (in the reference frame), uv: [N,2] pixels,
    match_mask: [N] valid correspondences, (q0, t0): initial guess pose.
    Returns PnPResult.
    """
    N = pw.shape[0]
    K = settings.iterations
    dtype = t0.dtype
    maskf = match_mask.astype(dtype)

    # --- hypothesis generation -------------------------------------------
    k_sub, k_pert = jax.random.split(key)
    # minimal 4-subsets without replacement via Gumbel top-k over the mask
    gumbel = jax.random.gumbel(k_sub, (K, N), dtype=dtype)
    scores = jnp.where(match_mask[None, :], gumbel, -jnp.inf)
    _, subset_idx = jax.lax.top_k(scores, 4)  # [K, 4]

    perturb = (
        jax.random.normal(k_pert, (K, 6), dtype=dtype) * settings.perturbation
    )
    perturb = perturb.at[0].set(0.0)  # hypothesis 0 = unperturbed guess

    def fit_hypothesis(idx, d):
        qh, th = apply_tangent(q0, t0, d)
        sub_w = jnp.zeros(N, dtype=dtype).at[idx].set(1.0) * maskf
        qh, th = _gn_refine(qh, th, pw, uv, sub_w, fx, fy, cx, cy,
                            settings.gn_iterations)
        errs = _reproj_errors(qh, th, pw, uv, fx, fy, cx, cy)
        inl = (errs <= settings.reproj_error) & match_mask
        return qh, th, jnp.sum(inl)

    qs, ts, counts = jax.vmap(fit_hypothesis)(subset_idx, perturb)

    # Hypothesis 0 also scored without its 4-point fit (pure guess), so a
    # good prior is never lost to a degenerate subset:
    errs0 = _reproj_errors(q0, t0, pw, uv, fx, fy, cx, cy)
    count0 = jnp.sum((errs0 <= settings.reproj_error) & match_mask)
    qs = jnp.concatenate([q0[None], qs])
    ts = jnp.concatenate([t0[None], ts])
    counts = jnp.concatenate([count0[None], counts])

    best = jnp.argmax(counts)
    q, t = qs[best], ts[best]

    # --- refinement loop (refineModel equivalent) ------------------------
    # The reference alternates "converge solvePnP on the inlier set" with a
    # variance-adaptive threshold update (MultiviewGeometry.cpp:259-273).
    # As a batched program that nested loop (refine_iterations x full GN)
    # costs ~50 sequential solver steps per frame; a flat IRLS loop — one GN
    # step + inlier/threshold update per iteration — converges to the same
    # fixed point (GN is quadratically convergent near the optimum, and the
    # threshold update only shrinks the inlier set between steps) at ~3x
    # fewer sequential steps.
    def refine_body(_, carry):
        q, t, thresh = carry
        errs = _reproj_errors(q, t, pw, uv, fx, fy, cx, cy)
        inl = (errs <= thresh) & match_mask
        w = inl.astype(dtype)
        q2, t2 = _gn_refine(q, t, pw, uv, w, fx, fy, cx, cy, 1)
        errs2 = _reproj_errors(q2, t2, pw, uv, fx, fy, cx, cy)
        inl2 = (errs2 <= thresh) & match_mask
        n2 = jnp.sum(inl2)
        # variance-adaptive threshold (MultiviewGeometry.cpp:269-273)
        e_in = jnp.where(inl2, errs2, 0.0)
        mean = jnp.sum(e_in) / jnp.maximum(n2, 1)
        var = jnp.sum(jnp.where(inl2, (errs2 - mean) ** 2, 0.0)) / jnp.maximum(
            n2 - 1, 1
        )
        new_thresh = jnp.minimum(
            jnp.asarray(settings.reproj_error, dtype),
            settings.refine_sigma * jnp.sqrt(var),
        )
        # keep refined model only if it retains enough inliers
        keep = n2 >= settings.min_inliers
        q = jnp.where(keep, q2, q)
        t = jnp.where(keep, t2, t)
        thresh = jnp.where(keep, new_thresh, thresh)
        return q, t, thresh

    if settings.refine_iterations > 0:
        q, t, _ = jax.lax.fori_loop(
            0, settings.refine_steps_per_round * settings.refine_iterations,
            refine_body,
            (q, t, jnp.asarray(settings.reproj_error, dtype)),
        )

    errs = _reproj_errors(q, t, pw, uv, fx, fy, cx, cy)
    inliers = (errs <= settings.reproj_error) & match_mask
    n_inliers = jnp.sum(inliers)
    mean_err = jnp.sum(jnp.where(inliers, errs, 0.0)) / jnp.maximum(n_inliers, 1)
    ok = n_inliers >= settings.min_inliers
    return PnPResult(q=q, t=t, inliers=inliers, n_inliers=n_inliers, ok=ok,
                     mean_err=mean_err)
