"""Distributed bundle adjustment over a TPU device mesh.

The reference has no multi-device story (SURVEY.md §2.7) — its pod-scale
re-imagining is spatial domain decomposition: landmarks/keyframes shard over
a ``jax.sharding.Mesh`` and the Schur-complement reduction becomes an ICI
collective:

  * ``distributed_local_optimize`` — the sliding-window BA of solver/ba.py
    with the landmark axis sharded via shard_map: every device builds the
    reduced camera system for its landmark shard, one ``psum`` over ICI
    combines the [6P, 6P] Schur complements, the tiny pose solve is
    replicated, and landmark back-substitution stays local to the shard.
    Communication per iteration is O(P^2) floats — independent of landmark
    count, so scaling efficiency approaches 1 as L grows.

  * ``DistributedPoseGraph`` (pose_graph.py) — the global mapping/loop
    closure layer sharded over edges.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..solver import ba
from ..solver.factors import huber_weight, inv3x3


def _stereo_blocks(problem: ba.BAProblem, lm_pos, pose_q, pose_t, active_mask,
                   settings: ba.BASettings):
    """Per-landmark-chunk normal-equation blocks (stereo factors only)."""
    L = lm_pos.shape[0]
    P_ = pose_q.shape[0]
    r = ba._v_stereo_res(pose_q, pose_t, lm_pos, problem.obs, problem.intr)
    w_pix = 1.0 / settings.pixel_variance
    chi2 = w_pix * jnp.sum(r * r, axis=-1)
    w = w_pix * huber_weight(chi2, settings.robust_delta) * active_mask
    Jp, Jl = ba._v_stereo_jac(pose_q, pose_t, lm_pos, problem.intr)

    U = jnp.einsum("lp,lpki,lpkj->pij", w, Jp, Jp)
    g_p = -jnp.einsum("lp,lpki,lpk->pi", w, Jp, r).reshape(6 * P_)
    V = jnp.einsum("lp,lpki,lpkj->lij", w, Jl, Jl)
    g_l = -jnp.einsum("lp,lpki,lpk->li", w, Jl, r)
    W_lp = jnp.einsum("lp,lpki,lpkj->lpij", w, Jl, Jp)
    W = jnp.transpose(W_lp, (0, 2, 1, 3)).reshape(L, 3, 6 * P_)
    H = jax.scipy.linalg.block_diag(*[U[p] for p in range(P_)])
    return H, g_p, V, g_l, W


def _link_blocks(problem: ba.BAProblem, pose_q, pose_t,
                 settings: ba.BASettings):
    """Odometry-link contributions to the pose system (replicated)."""
    P_ = pose_q.shape[0]
    dtype = pose_t.dtype
    r_link = ba._v_link_res(
        pose_q[:-1], pose_t[:-1], pose_q[1:], pose_t[1:],
        problem.link_q, problem.link_t,
    )
    J1, J2 = ba._v_link_jac(
        pose_q[:-1], pose_t[:-1], pose_q[1:], pose_t[1:],
        problem.link_q, problem.link_t,
    )
    w = (1.0 / settings.odometry_covariance) * problem.link_mask.astype(dtype)
    H = jnp.zeros((6 * P_, 6 * P_), dtype=dtype)
    g = jnp.zeros((6 * P_,), dtype=dtype)
    H11 = jnp.einsum("n,nki,nkj->nij", w, J1, J1)
    H22 = jnp.einsum("n,nki,nkj->nij", w, J2, J2)
    H12 = jnp.einsum("n,nki,nkj->nij", w, J1, J2)
    g1 = -jnp.einsum("n,nki,nk->ni", w, J1, r_link)
    g2 = -jnp.einsum("n,nki,nk->ni", w, J2, r_link)
    for n in range(P_ - 1):
        i, j = 6 * n, 6 * (n + 1)
        H = H.at[i:i + 6, i:i + 6].add(H11[n])
        H = H.at[j:j + 6, j:j + 6].add(H22[n])
        H = H.at[i:i + 6, j:j + 6].add(H12[n])
        H = H.at[j:j + 6, i:i + 6].add(H12[n].T)
        g = g.at[i:i + 6].add(g1[n])
        g = g.at[j:j + 6].add(g2[n])
    return H, g


def _make_gn_step(settings: ba.BASettings, mesh: Mesh, axis: str,
                  intr_cls, lam):
    """Build the landmark-sharded Schur GN step (shard_map body)."""

    lm_specs = ba.BAProblem(
        pose_q=P(), pose_t=P(), pose_valid=P(), pose_fixed=P(),
        lm_pos=P(axis), lm_valid=P(axis), lm_fixed=P(axis),
        obs=P(axis), obs_mask=P(axis),
        link_q=P(), link_t=P(), link_mask=P(),
        intr=intr_cls(*(P() for _ in range(len(intr_cls._fields)))),
    )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(lm_specs,),
        out_specs=(P(), P(), P(axis)),
    )
    def step(prob: ba.BAProblem):
        P_ = prob.pose_q.shape[0]
        dtype = prob.pose_t.dtype
        pose_free = (~prob.pose_fixed) & prob.pose_valid
        pose_free_mask = jnp.repeat(pose_free, 6).astype(dtype)
        active = (
            prob.obs_mask & prob.lm_valid[:, None] & prob.pose_valid[None, :]
        ).astype(dtype)
        H_s, g_s, V, g_l, W = _stereo_blocks(
            prob, prob.lm_pos, prob.pose_q, prob.pose_t, active, settings
        )
        n_obs = jnp.sum(active, axis=1)
        lm_free = prob.lm_valid & (~prob.lm_fixed) & (n_obs >= 1)
        free = lm_free.astype(dtype)

        eye3 = jnp.eye(3, dtype=dtype)
        Vd = V + lam * eye3 * jnp.diagonal(V, axis1=-2, axis2=-1)[:, None, :] \
            + 1e-8 * eye3
        V_safe = jnp.where(lm_free[:, None, None], Vd, eye3)
        V_inv = inv3x3(V_safe)  # closed form: no batched-LU custom call

        WtVi = jnp.einsum("laj,lab->ljb", W, V_inv * free[:, None, None])
        S_local = H_s - jnp.einsum("ljb,lbk->jk", WtVi, W)
        gs_local = g_s - jnp.einsum("ljb,lb->j", WtVi, g_l)

        # ICI reduction of the [6P,6P] camera system.
        S = jax.lax.psum(S_local, axis)
        g = jax.lax.psum(gs_local, axis)

        # Odometry links: identical on every device, added once post-psum.
        H_l, g_lnk = _link_blocks(prob, prob.pose_q, prob.pose_t, settings)
        S = S + H_l + lam * jnp.diag(jnp.diagonal(S + H_l)) \
            + 1e-8 * jnp.eye(6 * P_, dtype=dtype)
        g = g + g_lnk

        m = pose_free_mask
        S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        g = g * m
        dx_p = jax.scipy.linalg.solve(S, g, assume_a="pos")
        dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0) * m

        # Local landmark back-substitution on the shard.
        rhs = g_l - jnp.einsum("lak,k->la", W, dx_p)
        dx_l = jnp.einsum("lab,lb->la", V_inv, rhs) * free[:, None]

        deltas = dx_p.reshape(P_, 6)
        deltas = jnp.where(prob.pose_fixed[:, None], 0.0, deltas)
        new_q, new_t = jax.vmap(ba.apply_tangent)(
            prob.pose_q, prob.pose_t, deltas
        )
        return new_q, new_t, prob.lm_pos + dx_l

    return step


def distributed_gn_step(problem: ba.BAProblem, settings: ba.BASettings,
                        mesh: Mesh, axis: str = "lm", lam: float = 1e-4):
    """One Gauss-Newton step of landmark-sharded Schur BA.

    The problem's landmark-indexed leaves ([L, ...]) must have L divisible
    by the mesh axis size.  Returns (pose_q, pose_t, lm_pos).
    """
    step = _make_gn_step(settings, mesh, axis, type(problem.intr), lam)
    return step(problem)


def distributed_local_optimize(problem: ba.BAProblem,
                               settings: ba.BASettings, mesh: Mesh,
                               axis: str = "lm", lam: float = 1e-4):
    """Multi-step distributed BA (fixed GN iterations, landmark-sharded).

    The whole iteration loop compiles once (fori_loop around the shard_map
    body) — one XLA program per (settings, mesh) combination.
    """
    step = _make_gn_step(settings, mesh, axis, type(problem.intr), lam)
    iters = max(settings.iterations, 1)

    @jax.jit
    def run(prob: ba.BAProblem):
        def body(_, carry):
            q, t, lm = carry
            return step(prob._replace(pose_q=q, pose_t=t, lm_pos=lm))

        return jax.lax.fori_loop(
            0, iters, body, (prob.pose_q, prob.pose_t, prob.lm_pos)
        )

    return run(problem)
