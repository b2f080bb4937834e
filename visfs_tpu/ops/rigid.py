"""Rigid 3D-3D alignment: weighted Kabsch + RANSAC.

Used by loop-closure verification (slam/mapping.py): keyframe snapshots
carry stereo-triangulated 3D points in both frames, so the relative pose is
a closed-form absolute-orientation problem — global, no initial guess —
unlike the 3D->2D PnP path (ops/pnp.py) whose Gauss-Newton hypotheses are
local refinements around a motion prior and would systematically reject
large-viewpoint loops (exactly the loops that matter).

No reference counterpart: VISFS delegates loop closure to rtabmap
(simMapping.launch:10-14); this is part of the in-engine replacement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RigidResult(NamedTuple):
    rotation: jnp.ndarray  # [3, 3] R with a ~= R @ b + t
    translation: jnp.ndarray  # [3]
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # int32
    ok: jnp.ndarray  # bool


def kabsch(p_a, p_b, w):
    """Weighted least-squares rigid transform: argmin Σ w |a - (R b + t)|².

    p_a, p_b: [N, 3]; w: [N] non-negative weights.  Returns (R [3,3], t [3]).
    Degenerate weight sets (sum ~ 0, collinear points) produce a finite but
    meaningless transform — callers gate on the inlier count.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_a = jnp.einsum("n,ni->i", w, p_a) / wsum
    mu_b = jnp.einsum("n,ni->i", w, p_b) / wsum
    ca = p_a - mu_a
    cb = p_b - mu_b
    H = jnp.einsum("n,ni,nj->ij", w, cb, ca)  # [3,3] covariance b->a
    U, _, Vt = jnp.linalg.svd(H)
    V = Vt.T
    d = jnp.sign(jnp.linalg.det(V @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = V @ D @ U.T
    t = mu_a - R @ mu_b
    return R, t


def estimate_rigid_3d(p_a, p_b, mask, key, n_hypotheses: int = 32,
                      inlier_threshold: float = 0.15,
                      min_inliers: int = 6, refine_iterations: int = 3,
                      point_sigma=None):
    """RANSAC rigid alignment of matched 3D point sets.

    p_a/p_b: [N, 3] corresponding points, mask: [N] valid matches.
    Minimal 3-point Kabsch hypotheses scored by 3D inlier count, then IRLS
    refinement (full Kabsch on the inlier set, re-gating each round).

    point_sigma: optional [N] per-match 1-sigma 3D uncertainty.  Stereo
    triangulation error grows as z^2 * sigma_px / bf, so a fixed metric
    gate either rejects every far point or accepts garbage near ones; with
    point_sigma the gate becomes max(inlier_threshold, 3 * sigma_n),
    minimal-set sampling is biased toward certain (near) points, and the
    refit is inverse-variance weighted.
    """
    N = p_a.shape[0]
    dtype = p_a.dtype
    maskf = mask.astype(dtype)
    if point_sigma is None:
        thresh = jnp.full((N,), inlier_threshold, dtype)
        conf = jnp.zeros((N,), dtype)  # uniform sampling
        wref = maskf
    else:
        thresh = jnp.maximum(inlier_threshold, 3.0 * point_sigma)
        conf = -jnp.log(jnp.maximum(point_sigma, 1e-4))
        wref = maskf / jnp.maximum(point_sigma, 1e-4) ** 2

    gumbel = jax.random.gumbel(key, (n_hypotheses, N), dtype=dtype)
    scores = jnp.where(mask[None, :], gumbel + conf[None, :], -jnp.inf)
    _, subset_idx = jax.lax.top_k(scores, 3)  # [K, 3]

    def fit(idx):
        w = jnp.zeros(N, dtype).at[idx].set(1.0) * maskf
        R, t = kabsch(p_a, p_b, w)
        err = jnp.linalg.norm(p_a - (p_b @ R.T + t), axis=-1)
        inl = (err <= thresh) & mask
        return R, t, jnp.sum(inl)

    Rs, ts, counts = jax.vmap(fit)(subset_idx)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]

    def refine(_, carry):
        R, t = carry
        err = jnp.linalg.norm(p_a - (p_b @ R.T + t), axis=-1)
        inl = (err <= thresh) & mask
        w = inl.astype(dtype) * wref
        R2, t2 = kabsch(p_a, p_b, w)
        keep = jnp.sum(inl) >= 3
        return (jnp.where(keep, R2, R), jnp.where(keep, t2, t))

    R, t = jax.lax.fori_loop(0, refine_iterations, refine, (R, t))
    err = jnp.linalg.norm(p_a - (p_b @ R.T + t), axis=-1)
    inliers = (err <= thresh) & mask
    n_inl = jnp.sum(inliers)
    finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    return RigidResult(rotation=R, translation=t, inliers=inliers,
                       n_inliers=n_inl, ok=finite & (n_inl >= min_inliers))
