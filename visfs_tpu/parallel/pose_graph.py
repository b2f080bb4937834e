"""Distributed pose-graph optimization (global mapping back-end).

The reference delegates global mapping/loop closure to rtabmap outside the
repo (SURVEY.md intro); the TPU-native framework provides it in-engine as a
distributed sparse least-squares solve, the north-star capability of
BASELINE.json config 5:

  * keyframe poses replicated, constraint edges sharded over the mesh;
  * Gauss-Newton with the relative-pose factor (solver/factors.py) and
    Huber robustification;
  * the sparse normal system is never materialized: a matrix-free
    preconditioned conjugate gradient runs with per-edge gather/scatter
    (segment sums) locally and one ``psum`` per matvec over ICI;
  * block-Jacobi (6x6 per pose) preconditioner, also psum-reduced.

Communication per CG iteration is O(6N) for N poses — independent of edge
count, so loop-closure-dense graphs scale with device count.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..solver.factors import (
    apply_tangent,
    huber_weight,
    pose_link_jacobians,
    pose_link_residual,
)


class PoseGraph(NamedTuple):
    """N poses (camera-from-world q/t) + E directed relative-pose edges."""

    pose_q: jnp.ndarray  # [N, 4]
    pose_t: jnp.ndarray  # [N, 3]
    pose_fixed: jnp.ndarray  # [N] bool (gauge anchors)
    edge_i: jnp.ndarray  # [E] int32 from-pose index
    edge_j: jnp.ndarray  # [E] int32 to-pose index
    edge_q: jnp.ndarray  # [E, 4] measured relative rotation (Ti^-1 Tj ... as
    # the pose-link factor's Tc1c2 convention)
    edge_t: jnp.ndarray  # [E, 3]
    edge_info: jnp.ndarray  # [E] scalar information weight
    edge_mask: jnp.ndarray  # [E] bool


_v_res = jax.vmap(pose_link_residual)
_v_jac = jax.vmap(pose_link_jacobians)


def _edge_terms(g: PoseGraph, pose_q, pose_t, huber_delta):
    """Residuals, Jacobians and robust weights for an edge shard."""
    qi = pose_q[g.edge_i]
    ti = pose_t[g.edge_i]
    qj = pose_q[g.edge_j]
    tj = pose_t[g.edge_j]
    r = _v_res(qi, ti, qj, tj, g.edge_q, g.edge_t)
    Ji, Jj = _v_jac(qi, ti, qj, tj, g.edge_q, g.edge_t)
    chi2 = g.edge_info * jnp.sum(r * r, axis=-1)
    w = g.edge_info * huber_weight(chi2, huber_delta) \
        * g.edge_mask.astype(r.dtype)
    return r, Ji, Jj, w, chi2


def _make_gn_step(mesh: Mesh, axis: str, huber_delta, lam, cg_iters):
    specs = PoseGraph(
        pose_q=P(), pose_t=P(), pose_fixed=P(),
        edge_i=P(axis), edge_j=P(axis), edge_q=P(axis), edge_t=P(axis),
        edge_info=P(axis), edge_mask=P(axis),
    )

    @partial(shard_map, mesh=mesh, in_specs=(specs,),
             out_specs=(P(), P(), P()))
    def step(g: PoseGraph):
        N = g.pose_q.shape[0]
        dtype = g.pose_t.dtype
        free = (~g.pose_fixed).astype(dtype)[:, None]  # [N,1]
        r, Ji, Jj, w, chi2 = _edge_terms(g, g.pose_q, g.pose_t, huber_delta)
        total_chi2 = jax.lax.psum(
            jnp.sum(chi2 * g.edge_mask.astype(dtype)), axis
        )

        # gradient b = -J^T W r, scattered per edge then psum'd
        bi = -jnp.einsum("e,eki,ek->ei", w, Ji, r)
        bj = -jnp.einsum("e,eki,ek->ei", w, Jj, r)
        b = jnp.zeros((N, 6), dtype=dtype)
        b = b.at[g.edge_i].add(bi).at[g.edge_j].add(bj)
        b = jax.lax.psum(b, axis) * free

        # block-Jacobi preconditioner: 6x6 diagonal blocks of H
        Pi = jnp.einsum("e,eki,ekj->eij", w, Ji, Ji)
        Pj = jnp.einsum("e,eki,ekj->eij", w, Jj, Jj)
        M = jnp.zeros((N, 6, 6), dtype=dtype)
        M = M.at[g.edge_i].add(Pi).at[g.edge_j].add(Pj)
        M = jax.lax.psum(M, axis)
        M = M + (lam + 1e-6) * jnp.eye(6, dtype=dtype)
        M_inv = jnp.linalg.inv(M)

        def matvec(x):
            """H x with H = J^T W J (+ lam I), matrix-free over edges."""
            yi = jnp.einsum("eki,ei->ek", Ji, x[g.edge_i])
            yj = jnp.einsum("eki,ei->ek", Jj, x[g.edge_j])
            y = yi + yj  # [E, 6] = J_e x
            zi = jnp.einsum("e,eki,ek->ei", w, Ji, y)
            zj = jnp.einsum("e,eki,ek->ei", w, Jj, y)
            z = jnp.zeros((N, 6), dtype=dtype)
            z = z.at[g.edge_i].add(zi).at[g.edge_j].add(zj)
            z = jax.lax.psum(z, axis)
            return (z + lam * x) * free

        def precond(x):
            return jnp.einsum("nij,nj->ni", M_inv, x) * free

        # Preconditioned CG on the 6N system.
        x0 = jnp.zeros((N, 6), dtype=dtype)
        r0 = b - matvec(x0)
        z0 = precond(r0)

        def cg_body(_, carry):
            x, rr, z, p = carry
            Ap = matvec(p)
            rz = jnp.sum(rr * z)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
            x = x + alpha * p
            r_new = rr - alpha * Ap
            z_new = precond(r_new)
            beta = jnp.sum(r_new * z_new) / jnp.where(
                jnp.abs(rz) < 1e-12, 1.0, rz
            )
            return x, r_new, z_new, z_new + beta * p

        dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, z0))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * free

        new_q, new_t = jax.vmap(apply_tangent)(g.pose_q, g.pose_t, dx)
        new_q = jnp.where(g.pose_fixed[:, None], g.pose_q, new_q)
        new_t = jnp.where(g.pose_fixed[:, None], g.pose_t, new_t)
        return new_q, new_t, total_chi2

    return step


def gn_step(graph: PoseGraph, mesh: Mesh, axis: str = "edges",
            huber_delta: float = 1.0, lam: float = 1e-6,
            cg_iters: int = 50):
    """One distributed Gauss-Newton step; returns (pose_q, pose_t, chi2)."""
    return _make_gn_step(mesh, axis, huber_delta, lam, cg_iters)(graph)


def optimize(graph: PoseGraph, mesh: Mesh, iterations: int = 10,
             axis: str = "edges", huber_delta: float = 1.0,
             lam: float = 1e-6, cg_iters: int = 50):
    """Distributed pose-graph optimization; returns (q, t, final chi2).

    One compiled XLA program: fori_loop over the shard_map GN step.
    """
    step = _make_gn_step(mesh, axis, huber_delta, lam, cg_iters)

    @jax.jit
    def run(g: PoseGraph):
        def body(_, carry):
            q, t, _ = carry
            return step(g._replace(pose_q=q, pose_t=t))

        chi0 = jnp.zeros((), g.pose_t.dtype)
        return jax.lax.fori_loop(
            0, iterations, body, (g.pose_q, g.pose_t, chi0)
        )

    return run(graph)
