"""Distributed bundle adjustment over a TPU device mesh.

The reference has no multi-device story (SURVEY.md §2.7) — its pod-scale
re-imagining is spatial domain decomposition: landmarks shard over a
``jax.sharding.Mesh`` and the Schur-complement reduction becomes an ICI
collective.

``distributed_local_optimize`` is not a separate solver: it is
``solver.ba.local_optimize`` itself run under shard_map with the landmark
axis sharded (the solver threads an ``axis_name`` through its reductions).
Every device builds the reduced camera system for its landmark shard, psums
combine the [6P, 6P] Schur terms and chi2 totals over ICI, the tiny pose
solve + LM accept/reject + two-pass chi2 edge demotion + divergence checks
run replicated, and landmark back-substitution stays local.  Semantics are
therefore identical to the single-chip solver by construction — including
adaptive Levenberg damping, outlier demotion between the two passes, the
laser occupied-space terms (strategies 4/5) and the divergence ``ok`` flag.

Communication per iteration is O(P^2) floats — independent of landmark
count, so scaling efficiency approaches 1 as L grows.

``DistributedPoseGraph`` (pose_graph.py) is the global mapping/loop closure
layer sharded over edges.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..solver import ba


def _problem_specs(problem: ba.BAProblem, axis: str) -> ba.BAProblem:
    """PartitionSpecs: landmark-indexed leaves sharded, the rest replicated."""
    laser_specs = None
    if problem.laser is not None:
        laser_specs = type(problem.laser)(
            *(P() for _ in range(len(type(problem.laser)._fields)))
        )
    intr_cls = type(problem.intr)
    return ba.BAProblem(
        pose_q=P(), pose_t=P(), pose_valid=P(), pose_fixed=P(),
        lm_pos=P(axis), lm_valid=P(axis), lm_fixed=P(axis),
        obs=P(axis), obs_mask=P(axis),
        link_q=P(), link_t=P(), link_mask=P(),
        intr=intr_cls(*(P() for _ in range(len(intr_cls._fields)))),
        laser=laser_specs,
    )


def distributed_local_optimize(problem: ba.BAProblem,
                               settings: ba.BASettings, mesh: Mesh,
                               axis: str = "lm") -> ba.BAResult:
    """Landmark-sharded two-pass Schur BA == local_optimize, distributed.

    The problem's landmark-indexed leaves ([L, ...]) must have L divisible
    by the mesh axis size.  Returns a full BAResult (outliers sharded back
    together, replicated poses, divergence flag).
    """
    out_specs = ba.BAResult(
        pose_q=P(), pose_t=P(), lm_pos=P(axis),
        outliers=P(axis), chi2=P(), ok=P(),
    )
    fn = shard_map(
        partial(ba.local_optimize, settings=settings, axis_name=axis),
        mesh=mesh, in_specs=(_problem_specs(problem, axis),),
        out_specs=out_specs,
    )
    return jax.jit(fn)(problem)


def distributed_gn_step(problem: ba.BAProblem, settings: ba.BASettings,
                        mesh: Mesh, axis: str = "lm", lam: float = 1e-4):
    """One undamped Gauss-Newton step of landmark-sharded Schur BA.

    Kept as the minimal building block (used by the scaling benchmark to
    measure per-iteration communication); the production path is
    ``distributed_local_optimize``.  Returns (pose_q, pose_t, lm_pos).
    """
    import dataclasses

    gn = dataclasses.replace(settings, use_levenberg=False, iterations=2,
                             init_lambda=lam)

    def one_step(prob: ba.BAProblem):
        active = (
            prob.obs_mask & prob.lm_valid[:, None] & prob.pose_valid[None, :]
        ).astype(prob.pose_t.dtype)
        q, t, lm = ba._optimize_pass(
            prob, prob.pose_q, prob.pose_t, prob.lm_pos, active, gn, 1,
            axis_name=axis,
        )
        return q, t, lm

    fn = shard_map(
        one_step, mesh=mesh, in_specs=(_problem_specs(problem, axis),),
        out_specs=(P(), P(), P(axis)),
    )
    return jax.jit(fn)(problem)
