"""Batched fundamental-matrix RANSAC outlier culling.

Replaces cv::findFundamentalMat(FM_RANSAC) as used by the reference's
optional track-culling path (Tracker::rejectOutlierWithFundationMatrix,
corelib/src/Tracker.cpp:83-96, param Tracker/CullByFundationMatrix):

  * K hypotheses in parallel, each an 8-point linear solve (normalized
    8-point algorithm; the SVD null-space extraction and the rank-2
    projection are batched over hypotheses);
  * inliers scored by Sampson distance at the pixel threshold
    (Tracker/FundationPixelError);
  * the best hypothesis's inlier set is returned — same statistical role
    as OpenCV's sequential RANSAC, fixed shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(pts, mask):
    """Hartley normalization: zero-mean, sqrt(2) RMS radius; returns (pts_n, T)."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / n, 1e-9)
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]],
         [0.0, scale, -scale * mean[1]],
         [0.0, 0.0, 1.0]], dtype=pts.dtype,
    )
    pn = (pts - mean) * scale
    return pn, T


def _eight_point(p1n, p2n, sel_w):
    """Weighted linear 8-point solve -> rank-2 F (normalized coords).

    sel_w: [N] weights selecting the minimal sample (1 for chosen rows).
    """
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
         jnp.ones_like(x1)], axis=-1,
    )
    A = A * sel_w[:, None]
    # null vector of A via eigh of A^T A (batched-friendly, no SVD of tall A)
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    f = V[:, 0]
    F = f.reshape(3, 3)
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def sampson_distance(F, p1, p2):
    """Squared Sampson distance of correspondences under F (pixel^2)."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Fx1 = x1 @ F.T  # [N,3] = F @ x1
    Ftx2 = x2 @ F  # [N,3] = F^T @ x2
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def cull_with_fundamental(p1, p2, mask, key, threshold: float = 1.0,
                          hypotheses: int = 32):
    """RANSAC F-matrix inlier mask for correspondences p1 <-> p2.

    p1, p2: [N, 2] pixels; mask: [N] valid correspondences.
    Returns (inlier_mask [N], F [3, 3]).
    """
    N = p1.shape[0]
    dtype = p1.dtype
    p1n, T1 = _normalize(p1, mask)
    p2n, T2 = _normalize(p2, mask)

    gumbel = jax.random.gumbel(key, (hypotheses, N), dtype=dtype)
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, sel = jax.lax.top_k(scores, 8)  # [K, 8]

    def fit(sel_idx):
        w = jnp.zeros(N, dtype).at[sel_idx].set(1.0) * mask.astype(dtype)
        Fn = _eight_point(p1n, p2n, w)
        F = T2.T @ Fn @ T1  # denormalize
        d = sampson_distance(F, p1, p2)
        inl = (d <= threshold * threshold) & mask
        return F, jnp.sum(inl)

    Fs, counts = jax.vmap(fit)(sel)
    best = jnp.argmax(counts)
    F = Fs[best]
    d = sampson_distance(F, p1, p2)
    inliers = (d <= threshold * threshold) & mask
    return inliers, F
