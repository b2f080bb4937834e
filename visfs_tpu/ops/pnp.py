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

from ..core.lie import mat_to_quat, quat_rotate, quat_to_mat, skew
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
    # Estimator/PnPFlags (Parameters.h:174, default 1 = EPNP like the
    # reference's cv::solvePnPRansac seed, MultiviewGeometry.cpp:238):
    #   0 = Iterative — hypotheses are GN fits from the perturbed prior
    #       (prior-dependent; cannot recover large unmodeled motion);
    #   >=1 = EPNP — hypotheses are closed-form EPnP solves on random
    #       subsets (prior-free; flag 2 "P3P" maps here too: the quartic
    #       P3P needs general-matrix eigensolves XLA lacks on TPU, and
    #       EPnP on a 6-subset fills the same minimal-solver role).
    flags: int = 1
    epnp_subset: int = 6  # subset size for closed-form hypotheses


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


def sym_eigh_3x3(A):
    """Closed-form eigendecomposition of a symmetric 3x3 matrix.

    Returns (eigenvalues ascending [3], eigenvectors as columns [3,3]) like
    jnp.linalg.eigh, but as straight-line VPU arithmetic: XLA lowers
    jnp.linalg.eigh to a QR-iteration custom call with a ~0.7 ms latency
    floor on TPU even for a [K,3,3] batch, which made the EPnP control-point
    PCA the single most expensive op of the PnP stage.

    Eigenvalues use the trigonometric solution of the characteristic cubic;
    eigenvectors come from cross products of rows of (A - lambda I), picking
    the best-conditioned row pair.  Degenerate (near-isotropic) inputs fall
    back to the identity basis — for the PnP use (point-cloud PCA frames)
    any orthonormal completion is valid there.
    """
    dtype = A.dtype
    q = jnp.trace(A) / 3.0
    B = A - q * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    evals = jnp.stack([e_lo, e_mid, e_hi])

    def eigvec(lam):
        M = A - lam * jnp.eye(3, dtype=dtype)
        # candidate eigenvectors: cross products of row pairs
        c01 = jnp.cross(M[0], M[1])
        c02 = jnp.cross(M[0], M[2])
        c12 = jnp.cross(M[1], M[2])
        cands = jnp.stack([c01, c02, c12])
        norms = jnp.linalg.norm(cands, axis=1)
        v = cands[jnp.argmax(norms)]
        ok = jnp.max(norms) > 1e-20
        v = jnp.where(ok, v, jnp.array([1.0, 0.0, 0.0], dtype))
        return v / jnp.linalg.norm(v), ok

    v_hi, ok_hi = eigvec(e_hi)
    v_lo, ok_lo = eigvec(e_lo)
    # orthogonalize v_lo against v_hi (guards the repeated-eigenvalue case
    # where the cross-product vectors are not exactly orthogonal)
    v_lo = v_lo - v_hi * (v_hi @ v_lo)
    n_lo = jnp.linalg.norm(v_lo)
    alt = jnp.cross(v_hi, jnp.where(
        jnp.abs(v_hi[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], dtype),
        jnp.array([0.0, 1.0, 0.0], dtype),
    ))
    v_lo = jnp.where(n_lo > 1e-6, v_lo / jnp.maximum(n_lo, 1e-20),
                     alt / jnp.linalg.norm(alt))
    v_mid = jnp.cross(v_hi, v_lo)
    # fully degenerate (isotropic) input -> identity basis
    iso = p2 <= 1e-12 * (q * q + 1e-30)
    degen = iso | (~ok_hi & ~ok_lo)
    V = jnp.where(degen, jnp.eye(3, dtype=dtype),
                  jnp.stack([v_lo, v_mid, v_hi], axis=1))
    evals = jnp.where(iso, jnp.full(3, q, dtype), evals)
    return evals, V


def _smallest_two_eigvecs(A, iters: int = 6, second: bool = True):
    """Two smallest eigenvectors of a small symmetric PSD matrix by inverse
    iteration (one LU factorization + a few triangular solves) with
    deflation.

    XLA lowers jnp.linalg.eigh to a QR-iteration custom call costing
    ~100 us per tiny matrix on TPU; 50+ of them per frame dominated the PnP
    stage.  Inverse iteration converges at rate (lam1/lam2) per step — for
    the EPnP nullspace problem lam1 ~ 0, so a handful of batched LU solves
    suffice; everything vmaps over hypotheses.  Accuracy is ample for
    hypothesis generation (every hypothesis is GN-polished afterwards).
    """
    n = A.shape[-1]
    dtype = A.dtype
    # Shift keeps the factorization nonsingular when lam1 == 0 exactly.
    eps = 1e-6 * (jnp.trace(A) / n) + 1e-12
    lu, piv = jax.scipy.linalg.lu_factor(A + eps * jnp.eye(n, dtype=dtype))

    def run(x0, deflate):
        def body(_, x):
            y = jax.scipy.linalg.lu_solve((lu, piv), x)
            y = y - deflate * (deflate @ y)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-20)

        # Static tiny trip count: unroll to straight-line code (the
        # dynamic loop costs ~50 us/trip of scalar-cond sync on TPU;
        # these unrolls measured ~+5 fps on the textured bench).
        return jax.lax.fori_loop(0, iters, body, x0, unroll=True)

    # Deterministic, non-degenerate starts (ones + distinct axis kicks).
    base = jnp.ones(n, dtype) / jnp.sqrt(jnp.asarray(n, dtype))
    v1 = run(base.at[0].add(0.5), jnp.zeros(n, dtype))
    if not second:
        return v1, v1
    v2 = run(base.at[1].add(-0.5), v1)
    return v1, v2


def _horn_quat(S, iters: int = 16):
    """Optimal rotation quaternion from the 3x3 correlation S = sum w a b^T
    (b ~= R a): the largest eigenvector of Horn's symmetric 4x4 N matrix,
    by shifted power iteration (matmul-only; replaces a 3x3 SVD that lowers
    to a slow TPU custom call).  Proper rotation by construction."""
    dtype = S.dtype
    tr = S[0, 0] + S[1, 1] + S[2, 2]
    N = jnp.array(
        [
            [tr, S[1, 2] - S[2, 1], S[2, 0] - S[0, 2], S[0, 1] - S[1, 0]],
            [S[1, 2] - S[2, 1], S[0, 0] - S[1, 1] - S[2, 2],
             S[0, 1] + S[1, 0], S[2, 0] + S[0, 2]],
            [S[2, 0] - S[0, 2], S[0, 1] + S[1, 0],
             S[1, 1] - S[0, 0] - S[2, 2], S[1, 2] + S[2, 1]],
            [S[0, 1] - S[1, 0], S[2, 0] + S[0, 2], S[1, 2] + S[2, 1],
             S[2, 2] - S[0, 0] - S[1, 1]],
        ],
        dtype=dtype,
    )
    # Shift to PSD so the largest eigenvalue dominates the iteration.
    c = jnp.sqrt(jnp.sum(N * N)) + 1e-6
    Ns = N + c * jnp.eye(4, dtype=dtype)

    def body(_, x):
        y = Ns @ x
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-20)

    q0 = jnp.array([1.0, 0.1, 0.1, 0.1], dtype)
    q = jax.lax.fori_loop(0, iters, body, q0 / jnp.linalg.norm(q0),
                          unroll=True)
    return jnp.where(q[0] < 0, -q, q)


def _procrustes_pose(pw, pc, w):
    """Weighted rigid fit pc ~= R @ pw + t (Horn's closed form)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_w = jnp.sum(pw * w[:, None], axis=0) / wsum
    mu_c = jnp.sum(pc * w[:, None], axis=0) / wsum
    S = jnp.einsum("n,ni,nj->ij", w, pw - mu_w, pc - mu_c)
    q = _horn_quat(S)
    R = quat_to_mat(q)
    t = mu_c - R @ mu_w
    return R, t


def _epnp_core(ctrl_w, alpha, pw, uv, w, fx, fy, cx, cy, n2: bool = True):
    """EPnP given world control points + barycentric coords.

    Builds the 2n x (3 nc) projection system, extracts the two smallest
    null vectors via eigh(M^T M) (symmetric eigensolve — TPU-supported,
    unlike general eig), resolves scale with the beta cases N=1 and N=2,
    and fits the pose by weighted Procrustes; the better beta case by
    weighted reprojection wins.
    """
    dtype = pw.dtype
    nc = ctrl_w.shape[0]
    wsum = jnp.maximum(jnp.sum(w), 1e-9)

    un = uv[:, 0] - cx
    vn = uv[:, 1] - cy
    sw = jnp.sqrt(w)
    zeros = jnp.zeros_like(alpha)
    mu = jnp.stack([alpha * fx, zeros, alpha * (-un)[:, None]], -1)  # [N,nc,3]
    mv = jnp.stack([zeros, alpha * fy, alpha * (-vn)[:, None]], -1)
    M = jnp.concatenate(
        [mu.reshape(-1, 3 * nc) * sw[:, None],
         mv.reshape(-1, 3 * nc) * sw[:, None]]
    )
    e1, e2 = _smallest_two_eigvecs(M.T @ M, second=n2)
    v1 = e1.reshape(nc, 3)
    v2 = e2.reshape(nc, 3)

    ii, jj = jnp.triu_indices(nc, k=1)  # control-point pairs
    dw = ctrl_w[ii] - ctrl_w[jj]
    dv1 = v1[ii] - v1[jj]
    dv2 = v2[ii] - v2[jj]
    rho = jnp.sum(dw * dw, axis=1)

    def finish(ctrl_c):
        """Enforce cheirality, Procrustes, score."""
        pc = alpha @ ctrl_c  # [N, 3] camera-frame points (up to sign)
        zmean = jnp.sum(pc[:, 2] * w) / wsum
        pc = jnp.where(zmean < 0, -pc, pc)
        R, t = _procrustes_pose(pw, pc, w)
        q = mat_to_quat(R)
        errs = _reproj_errors(q, t, pw, uv, fx, fy, cx, cy)
        err = jnp.sum(jnp.where(w > 0, errs, 0.0)) / wsum
        return q, t, err

    # Beta case N=1: x = beta * v1
    b1 = jnp.sum(jnp.linalg.norm(dv1, axis=1) * jnp.sqrt(rho)) / jnp.maximum(
        jnp.sum(jnp.sum(dv1 * dv1, axis=1)), 1e-12
    )
    qa, ta, ea = finish(b1 * v1)
    if not n2:
        return qa, ta, ea

    # Beta case N=2: solve [|dv1|^2, 2<dv1,dv2>, |dv2|^2] y = rho for
    # y = (b1^2, b1 b2, b2^2) by least squares.
    L = jnp.stack(
        [
            jnp.sum(dv1 * dv1, axis=1),
            2.0 * jnp.sum(dv1 * dv2, axis=1),
            jnp.sum(dv2 * dv2, axis=1),
        ],
        axis=1,
    )
    LtL = L.T @ L + 1e-9 * jnp.eye(3, dtype=dtype)
    y = jnp.linalg.solve(LtL, L.T @ rho)
    b1_2 = jnp.sqrt(jnp.abs(y[0]))
    b2_2 = jnp.sqrt(jnp.abs(y[2])) * jnp.sign(y[1]) * jnp.sign(y[0])
    qb, tb, eb = finish(b1_2 * v1 + b2_2 * v2)

    better_b = eb < ea
    q = jnp.where(better_b, qb, qa)
    t = jnp.where(better_b, tb, ta)
    return q, t, jnp.where(better_b, eb, ea)


def epnp_pose(pw, uv, w, fx, fy, cx, cy, full: bool = True):
    """Weighted EPnP: closed-form camera-from-world pose, no prior.

    The reference seeds its RANSAC with cv::solvePnPRansac(SOLVEPNP_EPNP)
    (MultiviewGeometry.cpp:238).  Control points come from the weighted PCA
    frame of the points; BOTH the general 4-control-point formulation and
    the planar 3-control-point one are solved and the better one by
    reprojection wins (a planar scene makes the 4-point system's last
    control-point columns ~zero, flooding the nullspace with spurious
    vectors — the classic EPnP planar degeneracy).

    Returns (q, t, err): camera-from-world quaternion/translation and the
    mean weighted reprojection error (callers gate on err >= 1e8 for
    degenerate input).

    full=False is the cheap per-hypothesis variant (4 control points,
    beta case N=1 only): a RANSAC hypothesis only needs to land inside
    the GN polish basin, and half the nullspace/Procrustes work per
    hypothesis is the PnP stage's dominant cost.
    """
    dtype = pw.dtype
    wsum = jnp.maximum(jnp.sum(w), 1e-9)

    c0 = jnp.sum(pw * w[:, None], axis=0) / wsum
    d = pw - c0
    cov = jnp.einsum("n,ni,nj->ij", w, d, d) / wsum
    eval3, evec3 = sym_eigh_3x3(cov)  # ascending (closed form, see above)
    scale = jnp.sqrt(jnp.maximum(eval3, 1e-6 * eval3[2] + 1e-10))
    axes = evec3 * scale[None, :]  # columns = (c_i - c0)

    # General (4 control points): barycentric via the full PCA frame
    ctrl4 = jnp.concatenate([c0[None], c0[None] + axes.T], axis=0)
    beta4 = jnp.linalg.solve(axes, d.T).T  # [N, 3]
    alpha4 = jnp.concatenate(
        [1.0 - jnp.sum(beta4, 1, keepdims=True), beta4], 1
    )
    q4, t4, e4 = _epnp_core(ctrl4, alpha4, pw, uv, w, fx, fy, cx, cy,
                            n2=full)
    if not full:
        finite = jnp.all(jnp.isfinite(q4)) & jnp.all(jnp.isfinite(t4)) \
            & jnp.isfinite(e4)
        q4 = jnp.where(finite, q4, jnp.array([1.0, 0, 0, 0], dtype))
        t4 = jnp.where(finite, t4, jnp.zeros(3, dtype))
        return q4, t4, jnp.where(finite, e4, 1e9)

    # Planar (3 control points): the two leading axes only; out-of-plane
    # residual is dropped (it is ~0 when this branch wins).
    ax2 = axes[:, 1:]  # [3, 2] columns = in-plane axes
    ctrl3 = jnp.concatenate([c0[None], c0[None] + ax2.T], axis=0)
    A = ax2.T @ ax2 + 1e-12 * jnp.eye(2, dtype=dtype)
    beta3 = jnp.linalg.solve(A, ax2.T @ d.T).T  # [N, 2]
    alpha3 = jnp.concatenate(
        [1.0 - jnp.sum(beta3, 1, keepdims=True), beta3], 1
    )
    q3, t3, e3 = _epnp_core(ctrl3, alpha3, pw, uv, w, fx, fy, cx, cy)

    planar = e3 < e4
    q = jnp.where(planar, q3, q4)
    t = jnp.where(planar, t3, t4)
    err = jnp.where(planar, e3, e4)
    # Degenerate input (rank-deficient axes, all-zero weights) -> poison the
    # error so callers fall back to other hypotheses.
    finite = jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(t)) \
        & jnp.isfinite(err)
    q = jnp.where(finite, q, jnp.array([1.0, 0, 0, 0], dtype))
    t = jnp.where(finite, t, jnp.zeros(3, dtype))
    return q, t, jnp.where(finite, err, 1e9)


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
    # random subsets without replacement via Gumbel top-k over the mask
    n_sub = settings.epnp_subset if settings.flags >= 1 else 4
    gumbel = jax.random.gumbel(k_sub, (K, N), dtype=dtype)
    scores = jnp.where(match_mask[None, :], gumbel, -jnp.inf)
    _, subset_idx = jax.lax.top_k(scores, n_sub)  # [K, n_sub]

    perturb = (
        jax.random.normal(k_pert, (K, 6), dtype=dtype) * settings.perturbation
    )
    perturb = perturb.at[0].set(0.0)  # hypothesis 0 = unperturbed guess

    def fit_hypothesis(idx, d):
        sub_w = jnp.zeros(N, dtype=dtype).at[idx].set(1.0) * maskf
        if settings.flags >= 1:
            # EPNP/P3P: prior-free closed-form solve on the subset,
            # polished by subset GN (large unmodeled motion recoverable).
            qe, te, ee = epnp_pose(pw, uv, sub_w, fx, fy, cx, cy,
                                   full=False)
            # a degenerate subset falls back to the (perturbed) prior
            qp, tp = apply_tangent(q0, t0, d)
            use_prior = ee >= 1e8
            qh = jnp.where(use_prior, qp, qe)
            th = jnp.where(use_prior, tp, te)
        else:
            # Iterative: GN from the perturbed prior (reference flag 0)
            qh, th = apply_tangent(q0, t0, d)
        qh, th = _gn_refine(qh, th, pw, uv, sub_w, fx, fy, cx, cy,
                            settings.gn_iterations)
        return qh, th, _score(qh, th)

    def _score(qh, th):
        """Inlier count, tie-broken by mean inlier error.  A raw argmax
        over counts is noisy: dozens of hypotheses tie within +-1 inlier
        and the first max may be a loose fit that happens to catch one
        borderline point; the fractional penalty (< 1, so it can never
        outvote a count difference) prefers the tightest fit among them."""
        errs = _reproj_errors(qh, th, pw, uv, fx, fy, cx, cy)
        inl = (errs <= settings.reproj_error) & match_mask
        n = jnp.sum(inl)
        mean_e = jnp.sum(jnp.where(inl, errs, 0.0)) / jnp.maximum(n, 1)
        return n.astype(dtype) - 0.5 * mean_e / settings.reproj_error

    qs, ts, scores = jax.vmap(fit_hypothesis)(subset_idx, perturb)

    # Hypothesis 0 also scored without its subset fit (pure guess), so a
    # good prior is never lost to a degenerate subset:
    qs = jnp.concatenate([q0[None], qs])
    ts = jnp.concatenate([t0[None], ts])
    scores = jnp.concatenate([_score(q0, t0)[None], scores])

    if settings.flags >= 1:
        # One global hypothesis: EPnP over ALL matches (n-point solve).
        qg, tg, eg = epnp_pose(pw, uv, maskf, fx, fy, cx, cy)
        qg2, tg2 = _gn_refine(qg, tg, pw, uv, maskf, fx, fy, cx, cy,
                              settings.gn_iterations)
        scoreg = jnp.where(eg >= 1e8, -1.0, _score(qg2, tg2))
        qs = jnp.concatenate([qs, qg2[None]])
        ts = jnp.concatenate([ts, tg2[None]])
        scores = jnp.concatenate([scores, scoreg[None]])

    best = jnp.argmax(scores)
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
