"""Sliding-window local bundle adjustment: masked dense Schur GN/LM solver.

TPU-native replacement for the reference's dual g2o/ceres backends
(corelib/src/Optimizer/Optimizer.cpp:58-596).  The problem is laid out as
fixed-capacity masked arrays so the entire optimization — residuals, analytic
Jacobians, Schur complement, dense solve, Levenberg damping loop, two-pass
outlier demotion — jits into one XLA computation:

  * poses: ``P`` window slots of inverse camera poses Tcw (quaternion+t),
    one fixed root (Optimizer.cpp:100-114, Estimator.cpp:252);
  * landmarks: ``L`` slots of world points, STABLE features fixed
    (vpt3d->setFixed, Optimizer.cpp:161-166), marginalized via the Schur
    complement on 3x3 blocks (setMarginalized(true));
  * stereo reprojection edges on the dense [L, P] observation grid with
    information I/pixelVariance (Optimizer.cpp:153, 184-196);
  * wheel-odometry pose links between consecutive window slots with
    information I/odometryCovariance (Optimizer.cpp:117-150);
  * two optimization passes of iterations/2 each; between them, visual
    edges with chi2 > robustKernelDelta are demoted and reported as
    outliers (Optimizer.cpp:260-312).

Where the reference hands the reduced system to CSparse/Cholmod, we build the
dense [6P, 6P] Schur complement with batched einsums (MXU work) and solve it
with a dense Cholesky — for the ~6-pose window this is far below one
microsecond of MXU time and removes every sparse-bookkeeping branch.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .factors import (
    StereoIntrinsics,
    apply_tangent,
    huber_weight,
    pose_link_jacobians,
    pose_link_residual,
    inv3x3,
    stereo_jacobians,
    stereo_residual,
)

# Landmark update larger than this is rejected (g2o write-back gate,
# Optimizer.cpp: uNorm(old-new) < 5.0).
_MAX_POINT_MOTION = 5.0
# Abort threshold for diverged optimization (Optimizer.cpp:276).
_MAX_CHI2 = 1.0e12
# Per-pose tangent step larger than this (m/rad) is dropped: a local-window
# correction is never meters — such steps are f32 null-space amplification
# through the tiny Tikhonov floor when a pose is rank-deficiently
# constrained (e.g. laser-only scan match: a 2D grid cannot observe
# z/roll/pitch, so (J^T J + eps I)^-1 blows rounding noise up by 1/eps
# along the null space while chi2 stays flat).
_MAX_POSE_STEP = 2.0


class LaserData(NamedTuple):
    """Occupied-space scan-match terms on the newest pose (strategies 4/5;
    Optimizer.cpp:226-258)."""

    points: jnp.ndarray  # [K, 3] robot-frame scan hits
    mask: jnp.ndarray  # [K] bool
    cost_grid: jnp.ndarray  # [E, E] f32 correspondence costs of the
    # matching submap
    resolution: jnp.ndarray  # scalar
    max_x: jnp.ndarray  # scalar
    max_y: jnp.ndarray  # scalar
    t_ir: jnp.ndarray  # [4, 4] robot -> image transform
    info: jnp.ndarray  # scalar 1/laserCovariance


class BAProblem(NamedTuple):
    """Masked, fixed-shape local BA problem."""

    pose_q: jnp.ndarray  # [P, 4] Tcw rotation (w,x,y,z)
    pose_t: jnp.ndarray  # [P, 3] Tcw translation
    pose_valid: jnp.ndarray  # [P] bool — slot holds a real signature
    pose_fixed: jnp.ndarray  # [P] bool — held constant (root, invalid)
    lm_pos: jnp.ndarray  # [L, 3] world-frame landmark positions
    lm_valid: jnp.ndarray  # [L] bool
    lm_fixed: jnp.ndarray  # [L] bool — STABLE features: constant in BA
    obs: jnp.ndarray  # [L, P, 3] (uL, vL, uR) measurements
    obs_mask: jnp.ndarray  # [L, P] bool
    link_q: jnp.ndarray  # [P-1, 4] measured Tc_i c_{i+1} rotation
    link_t: jnp.ndarray  # [P-1, 3] measured relative translation
    link_mask: jnp.ndarray  # [P-1] bool
    intr: StereoIntrinsics
    laser: LaserData | None = None  # structural None disables laser terms


@dataclasses.dataclass(frozen=True)
class BASettings:
    """Static solver configuration (the Optimizer/* parameter group)."""

    iterations: int = 10
    pixel_variance: float = 1.5
    odometry_covariance: float = 5e-5
    robust_delta: float = 8.0
    use_levenberg: bool = True  # Optimizer/TrustRegion: 0=LM 1=GN
    init_lambda: float = 1e-4


class BAResult(NamedTuple):
    pose_q: jnp.ndarray
    pose_t: jnp.ndarray
    lm_pos: jnp.ndarray
    outliers: jnp.ndarray  # [L, P] bool — demoted visual edges
    chi2: jnp.ndarray  # final robust chi2
    ok: jnp.ndarray  # bool — optimization healthy (no NaN/divergence)


# ---------------------------------------------------------------------------
# Residual/Hessian assembly
# ---------------------------------------------------------------------------

_v_stereo_res = jax.vmap(  # outer: poses (P), inner: landmarks (L)
    jax.vmap(stereo_residual, in_axes=(None, None, 0, 0, None)),
    in_axes=(0, 0, None, 1, None),
    out_axes=1,
)
_v_stereo_jac = jax.vmap(
    jax.vmap(stereo_jacobians, in_axes=(None, None, 0, None)),
    in_axes=(0, 0, None, None),
    out_axes=1,
)
_v_link_res = jax.vmap(pose_link_residual)
_v_link_jac = jax.vmap(pose_link_jacobians)


def _stereo_terms(problem: BAProblem, lm_pos, pose_q, pose_t, active_mask,
                  settings: BASettings):
    """Residuals, robust weights and chi2 of all stereo edges.

    Returns (r [L,P,3], w [L,P] combined info*robust weight, chi2 [L,P]).
    """
    r = _v_stereo_res(pose_q, pose_t, lm_pos, problem.obs, problem.intr)
    w_pix = 1.0 / settings.pixel_variance
    chi2 = w_pix * jnp.sum(r * r, axis=-1)
    w_rob = huber_weight(chi2, settings.robust_delta)
    w = w_pix * w_rob * active_mask.astype(r.dtype)
    return r, w, chi2


def _robust_chi2_total(problem, lm_pos, pose_q, pose_t, active_mask, settings,
                       axis_name=None):
    """activeRobustChi2 equivalent: huberized stereo chi2 + link chi2.

    With ``axis_name`` the landmark axis is a shard_map axis: the stereo sum
    is psum'ed over it and the replicated link/laser terms are added once
    (identically on every device).
    """
    _, _, chi2 = _stereo_terms(
        problem, lm_pos, pose_q, pose_t, active_mask, settings
    )
    d = settings.robust_delta
    rho = jnp.where(
        (d > 0.0) & (chi2 > d * d),
        2.0 * d * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d * d,
        chi2,
    )
    total = jnp.sum(rho * active_mask.astype(rho.dtype))
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)

    r_link = _v_link_res(
        pose_q[:-1], pose_t[:-1], pose_q[1:], pose_t[1:],
        problem.link_q, problem.link_t,
    )
    w_odo = 1.0 / settings.odometry_covariance
    link_chi2 = w_odo * jnp.sum(r_link * r_link, axis=-1)
    total = total + jnp.sum(link_chi2 * problem.link_mask.astype(rho.dtype))

    if problem.laser is not None:
        from .occupied_space import occupied_space_terms

        la = problem.laser
        cur = pose_q.shape[0] - 1
        r_l, _, w_l = occupied_space_terms(
            pose_q[cur], pose_t[cur], la.points, la.mask, la.cost_grid,
            la.resolution, la.max_x, la.max_y, la.t_ir, la.info,
        )
        total = total + jnp.sum(w_l * r_l * r_l)
    return total


def _gn_normal_equations(problem: BAProblem, lm_pos, pose_q, pose_t,
                         active_mask, settings: BASettings, axis_name=None):
    """Build the Schur-reducible normal equations.

    Returns (H_pp [6P,6P], g_p [6P], V [L,3,3], g_l [L,3], W [L,3,6P],
    lm_free [L]).  With ``axis_name`` the landmark axis is a shard_map
    axis: landmark-summed pose terms are psum'ed over ICI and the
    replicated link/laser terms are added once post-psum; the landmark-
    indexed blocks (V, g_l, W) stay local to the shard.
    """
    P = pose_q.shape[0]
    L = lm_pos.shape[0]
    dtype = pose_t.dtype

    r, w, _ = _stereo_terms(problem, lm_pos, pose_q, pose_t, active_mask,
                            settings)
    Jp, Jl = _v_stereo_jac(pose_q, pose_t, lm_pos, problem.intr)
    # Jp: [L,P,3,6], Jl: [L,P,3,3]

    # Per-pose diagonal blocks and gradient (sum over landmarks).
    U = jnp.einsum("lp,lpki,lpkj->pij", w, Jp, Jp)  # [P,6,6]
    g_p_blocks = -jnp.einsum("lp,lpki,lpk->pi", w, Jp, r)  # [P,6]

    # Per-landmark blocks.
    V = jnp.einsum("lp,lpki,lpkj->lij", w, Jl, Jl)  # [L,3,3]
    g_l = -jnp.einsum("lp,lpki,lpk->li", w, Jl, r)  # [L,3]

    # Landmark-pose coupling, laid out as [L, 3, 6P].
    W_lp = jnp.einsum("lp,lpki,lpkj->lpij", w, Jl, Jp)  # [L,P,3,6]
    W = jnp.transpose(W_lp, (0, 2, 1, 3)).reshape(L, 3, 6 * P)

    # Assemble the pose-pose Hessian: stereo diagonal + odometry links.
    H = jnp.zeros((6 * P, 6 * P), dtype=dtype)
    H = H.at[...].set(jax.scipy.linalg.block_diag(*[U[p] for p in range(P)]))
    g_p = g_p_blocks.reshape(6 * P)

    if axis_name is not None:
        # ICI reduction of the landmark-summed camera system; the link and
        # laser terms below are replicated and must be added exactly once.
        H, g_p = jax.lax.psum((H, g_p), axis_name)

    r_link = _v_link_res(
        pose_q[:-1], pose_t[:-1], pose_q[1:], pose_t[1:],
        problem.link_q, problem.link_t,
    )
    J1, J2 = _v_link_jac(
        pose_q[:-1], pose_t[:-1], pose_q[1:], pose_t[1:],
        problem.link_q, problem.link_t,
    )
    w_odo = (1.0 / settings.odometry_covariance) * problem.link_mask.astype(dtype)
    H11 = jnp.einsum("n,nki,nkj->nij", w_odo, J1, J1)
    H22 = jnp.einsum("n,nki,nkj->nij", w_odo, J2, J2)
    H12 = jnp.einsum("n,nki,nkj->nij", w_odo, J1, J2)
    gl1 = -jnp.einsum("n,nki,nk->ni", w_odo, J1, r_link)
    gl2 = -jnp.einsum("n,nki,nk->ni", w_odo, J2, r_link)
    for n in range(P - 1):
        i, j = 6 * n, 6 * (n + 1)
        H = H.at[i : i + 6, i : i + 6].add(H11[n])
        H = H.at[j : j + 6, j : j + 6].add(H22[n])
        H = H.at[i : i + 6, j : j + 6].add(H12[n])
        H = H.at[j : j + 6, i : i + 6].add(H12[n].T)
        g_p = g_p.at[i : i + 6].add(gl1[n])
        g_p = g_p.at[j : j + 6].add(gl2[n])

    # Laser occupied-space terms on the newest pose (strategies 4/5).
    if problem.laser is not None:
        from .occupied_space import occupied_space_terms

        la = problem.laser
        cur = P - 1
        r_l, J_l, w_l = occupied_space_terms(
            pose_q[cur], pose_t[cur], la.points, la.mask, la.cost_grid,
            la.resolution, la.max_x, la.max_y, la.t_ir, la.info,
        )
        Hl = jnp.einsum("k,ki,kj->ij", w_l, J_l, J_l)
        gl = -jnp.einsum("k,ki,k->i", w_l, J_l, r_l)
        s = 6 * cur
        H = H.at[s : s + 6, s : s + 6].add(Hl)
        g_p = g_p.at[s : s + 6].add(gl)

    # Landmarks participating in the Schur reduction: valid, free, observed.
    n_obs = jnp.sum(active_mask, axis=1)
    lm_free = problem.lm_valid & (~problem.lm_fixed) & (n_obs >= 1)
    return H, g_p, V, g_l, W, lm_free


def _solve_schur(H, g_p, V, g_l, W, lm_free, pose_free_mask, lam, use_lm,
                 axis_name=None):
    """Schur-marginalize landmarks, solve poses, back-substitute landmarks.

    With ``axis_name`` (landmark axis sharded via shard_map), the Schur
    subtraction terms are psum'ed over ICI; H/g_p arrive already reduced,
    the pose solve is replicated, and landmark back-substitution stays
    local to the shard.
    """
    P6 = H.shape[0]
    dtype = H.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    # Levenberg damping (Marquardt diagonal scaling) on both blocks.
    damp = jnp.where(use_lm, lam, 0.0)
    Hd = H + damp * jnp.diag(jnp.diagonal(H)) + 1e-8 * jnp.eye(P6, dtype=dtype)
    Vd = V + damp * eye3 * jnp.diagonal(V, axis1=-2, axis2=-1)[:, None, :] \
        + 1e-8 * eye3

    free = lm_free.astype(dtype)
    # Masked inverse: fixed/unused landmarks get identity (contribution zeroed
    # by `free`).  Closed-form adjugate inverse: jnp.linalg.inv on [L,3,3]
    # lowers to a batched-LU custom call costing ~0.2 ms per invocation on
    # TPU (one per solver iteration); the cofactor form is fused VPU work.
    V_safe = jnp.where(lm_free[:, None, None], Vd, eye3)
    V_inv = inv3x3(V_safe)

    # S = H - sum_l W_l^T V_l^{-1} W_l ; g_s = g_p - sum_l W_l^T V_l^{-1} g_l.
    # W is [L,3,6P]; W^T V^{-1} -> [L,6P,3].
    WtVi = jnp.einsum("laj,lab->ljb", W, V_inv * free[:, None, None])
    S_sub = jnp.einsum("ljb,lbk->jk", WtVi, W)
    g_sub = jnp.einsum("ljb,lb->j", WtVi, g_l)
    if axis_name is not None:
        S_sub, g_sub = jax.lax.psum((S_sub, g_sub), axis_name)
    S = Hd - S_sub
    g_s = g_p - g_sub

    # Clamp fixed/invalid poses: identity rows/cols, zero gradient.
    m = pose_free_mask.astype(dtype)  # [6P]
    S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    g_s = g_s * m

    dx_p = jax.scipy.linalg.solve(S, g_s, assume_a="pos")
    dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0) * m

    # Back-substitute landmarks: dx_l = V^{-1}(g_l - W dx_p).
    rhs = g_l - jnp.einsum("lak,k->la", W, dx_p)
    dx_l = jnp.einsum("lab,lb->la", V_inv, rhs) * free[:, None]
    return dx_p, dx_l


def _apply_updates(pose_q, pose_t, lm_pos, dx_p, dx_l, pose_fixed):
    P = pose_q.shape[0]
    deltas = dx_p.reshape(P, 6)
    deltas = jnp.where(pose_fixed[:, None], 0.0, deltas)
    step_norm = jnp.linalg.norm(deltas, axis=-1)
    deltas = jnp.where((step_norm < _MAX_POSE_STEP)[:, None], deltas, 0.0)
    new_q, new_t = jax.vmap(apply_tangent)(pose_q, pose_t, deltas)
    # Reference gate: reject landmark jumps >= 5 m (Optimizer.cpp write-back).
    motion = jnp.linalg.norm(dx_l, axis=-1)
    dx_l = jnp.where((motion < _MAX_POINT_MOTION)[:, None], dx_l, 0.0)
    return new_q, new_t, lm_pos + dx_l


def _optimize_pass(problem: BAProblem, pose_q, pose_t, lm_pos, active_mask,
                   settings: BASettings, num_iters: int, axis_name=None):
    """Run `num_iters` LM/GN iterations with a fixed active-edge mask."""
    P = pose_q.shape[0]
    pose_free = (~problem.pose_fixed) & problem.pose_valid
    pose_free_mask = jnp.repeat(pose_free, 6)
    use_lm = jnp.asarray(settings.use_levenberg)

    def body(_, carry):
        # chi2_cur is carried: the current state's cost only changes when a
        # step is accepted (to chi2_new), so re-evaluating it from scratch
        # every iteration would double the residual-assembly work.
        pose_q, pose_t, lm_pos, lam, chi2_cur = carry
        H, g_p, V, g_l, W, lm_free = _gn_normal_equations(
            problem, lm_pos, pose_q, pose_t, active_mask, settings,
            axis_name,
        )
        dx_p, dx_l = _solve_schur(
            H, g_p, V, g_l, W, lm_free, pose_free_mask, lam, use_lm,
            axis_name,
        )
        cand_q, cand_t, cand_lm = _apply_updates(
            pose_q, pose_t, lm_pos, dx_p, dx_l, problem.pose_fixed
        )
        chi2_new = _robust_chi2_total(
            problem, cand_lm, cand_q, cand_t, active_mask, settings,
            axis_name,
        )
        # accept/reject + lambda adaptation run on psum'ed (replicated)
        # scalars: every shard takes the same branch.  STRICT decrease: a
        # step that leaves chi2 flat moved only along unobservable
        # directions (see _MAX_POSE_STEP) and must not be kept.
        accept = jnp.isfinite(chi2_new) & (chi2_new < chi2_cur)
        accept = accept | (~use_lm)  # plain GN always steps
        pose_q = jnp.where(accept, cand_q, pose_q)
        pose_t = jnp.where(accept, cand_t, pose_t)
        lm_pos = jnp.where(accept, cand_lm, lm_pos)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), lam * 4.0)
        return pose_q, pose_t, lm_pos, lam, chi2_cur

    chi2_0 = _robust_chi2_total(
        problem, lm_pos, pose_q, pose_t, active_mask, settings, axis_name
    )
    init = (pose_q, pose_t, lm_pos,
            jnp.asarray(settings.init_lambda, dtype=pose_t.dtype), chi2_0)
    pose_q, pose_t, lm_pos, _, _ = jax.lax.fori_loop(0, num_iters, body, init)
    return pose_q, pose_t, lm_pos


def local_optimize(problem: BAProblem, settings: BASettings,
                   axis_name=None) -> BAResult:
    """Two-pass sliding-window BA (Optimizer::localOptimize equivalent).

    Pass 1: iterations/2 over all edges.  Visual edges whose chi2 exceeds
    robustKernelDelta are then demoted (reported as outliers,
    Optimizer.cpp:289-301).  Pass 2: iterations/2 over the surviving edges.

    ``axis_name``: when called inside shard_map with the landmark axis
    sharded (parallel/distributed_ba.py), the landmark reductions become
    ICI psums and everything else — LM accept/reject, demotion thresholds,
    divergence checks — runs identically on replicated values, so the
    distributed solver IS this solver.
    """
    half = max(settings.iterations // 2, 1)
    base_mask = problem.obs_mask & problem.lm_valid[:, None] \
        & problem.pose_valid[None, :]
    active = base_mask.astype(problem.pose_t.dtype)

    q1, t1, l1 = _optimize_pass(
        problem, problem.pose_q, problem.pose_t, problem.lm_pos, active,
        settings, half, axis_name,
    )

    _, _, chi2 = _stereo_terms(problem, l1, q1, t1, active, settings)
    outliers = base_mask & (chi2 > settings.robust_delta) \
        if settings.robust_delta > 0.0 else jnp.zeros_like(base_mask)

    chi2_mid = _robust_chi2_total(problem, l1, q1, t1, active, settings,
                                  axis_name)
    diverged1 = ~jnp.isfinite(chi2_mid) | (chi2_mid > _MAX_CHI2)

    if settings.robust_delta > 0.0:
        active2 = (base_mask & ~outliers).astype(active.dtype)
        q2, t2, l2 = _optimize_pass(problem, q1, t1, l1, active2, settings,
                                    half, axis_name)
    else:
        active2 = active
        q2, t2, l2 = q1, t1, l1

    chi2_end = _robust_chi2_total(problem, l2, q2, t2, active2, settings,
                                  axis_name)
    diverged2 = ~jnp.isfinite(chi2_end) | (chi2_end > _MAX_CHI2)
    ok = ~(diverged1 | diverged2)

    # On divergence the reference returns no poses (caller falls back to the
    # initial transform); we return the inputs with ok=False.
    pose_q = jnp.where(ok, q2, problem.pose_q)
    pose_t = jnp.where(ok, t2, problem.pose_t)
    lm_pos = jnp.where(ok, l2, problem.lm_pos)
    return BAResult(pose_q, pose_t, lm_pos, outliers, chi2_end, ok)
