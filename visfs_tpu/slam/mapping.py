"""Global mapping back-end: keyframe pose graph with loop closures.

The reference ships odometry only and composes global mapping/loop closure
from rtabmap outside the repo (SURVEY.md intro; launch/simMapping.launch).
The TPU-native framework provides the capability in-engine (BASELINE.json
config 5): VO keyframes accumulate into a fixed-capacity pose graph whose
edges shard across the device mesh, solved by the matrix-free distributed
Gauss-Newton of parallel/pose_graph.py.

Conventions: keyframe poses are stored as robot poses Twr; the graph is
optimized over their inverses Trw so the relative-pose factor's measurement
is the plain odometry delta T_r1r2 (factor residual vanishes when
T1 * T2^-1 == meas with T = Trw).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.lie import mat_inv_se3, mat_to_quat, se3_matrix
from ..parallel import pose_graph


class KeyframeGraph(NamedTuple):
    pose_q: jnp.ndarray  # [N, 4] Twr rotations
    pose_t: jnp.ndarray  # [N, 3]
    stamp: jnp.ndarray  # [N]
    valid: jnp.ndarray  # [N]
    n_nodes: jnp.ndarray  # int32
    edge_i: jnp.ndarray  # [E]
    edge_j: jnp.ndarray  # [E]
    edge_q: jnp.ndarray  # [E, 4] measured T_ri_rj rotation
    edge_t: jnp.ndarray  # [E, 3]
    edge_info: jnp.ndarray  # [E]
    edge_valid: jnp.ndarray  # [E]
    n_edges: jnp.ndarray  # int32


def init_graph(max_nodes: int = 1024, max_edges: int = 4096) -> KeyframeGraph:
    qid = jnp.zeros((max_nodes, 4), jnp.float32).at[:, 0].set(1.0)
    eq = jnp.zeros((max_edges, 4), jnp.float32).at[:, 0].set(1.0)
    return KeyframeGraph(
        pose_q=qid, pose_t=jnp.zeros((max_nodes, 3), jnp.float32),
        stamp=jnp.zeros((max_nodes,), jnp.float32),
        valid=jnp.zeros((max_nodes,), bool),
        n_nodes=jnp.zeros((), jnp.int32),
        edge_i=jnp.zeros((max_edges,), jnp.int32),
        edge_j=jnp.zeros((max_edges,), jnp.int32),
        edge_q=eq, edge_t=jnp.zeros((max_edges, 3), jnp.float32),
        edge_info=jnp.zeros((max_edges,), jnp.float32),
        edge_valid=jnp.zeros((max_edges,), bool),
        n_edges=jnp.zeros((), jnp.int32),
    )


@jax.jit
def add_keyframe(g: KeyframeGraph, pose: jnp.ndarray, stamp,
                 odom_info: float = 1e4) -> KeyframeGraph:
    """Append a keyframe (Twr 4x4); auto-links it to the previous one with
    an odometry edge measured from the current estimates."""
    n = g.n_nodes
    q = mat_to_quat(pose[:3, :3])
    t = pose[:3, 3]
    g = g._replace(
        pose_q=g.pose_q.at[n].set(q),
        pose_t=g.pose_t.at[n].set(t),
        stamp=g.stamp.at[n].set(stamp),
        valid=g.valid.at[n].set(True),
        n_nodes=n + 1,
    )

    def with_edge(g):
        prev = se3_matrix(g.pose_q[n - 1], g.pose_t[n - 1])
        rel = mat_inv_se3(prev) @ pose
        e = g.n_edges
        return g._replace(
            edge_i=g.edge_i.at[e].set(n - 1),
            edge_j=g.edge_j.at[e].set(n),
            edge_q=g.edge_q.at[e].set(mat_to_quat(rel[:3, :3])),
            edge_t=g.edge_t.at[e].set(rel[:3, 3]),
            edge_info=g.edge_info.at[e].set(odom_info),
            edge_valid=g.edge_valid.at[e].set(True),
            n_edges=e + 1,
        )

    return jax.lax.cond(n > 0, with_edge, lambda g: g, g)


@jax.jit
def add_loop_closure(g: KeyframeGraph, i, j, rel: jnp.ndarray,
                     info: float = 1e4) -> KeyframeGraph:
    """Add a loop-closure edge: rel = measured T_ri_rj (4x4)."""
    e = g.n_edges
    return g._replace(
        edge_i=g.edge_i.at[e].set(i),
        edge_j=g.edge_j.at[e].set(j),
        edge_q=g.edge_q.at[e].set(mat_to_quat(rel[:3, :3])),
        edge_t=g.edge_t.at[e].set(rel[:3, 3]),
        edge_info=g.edge_info.at[e].set(info),
        edge_valid=g.edge_valid.at[e].set(True),
        n_edges=e + 1,
    )


def propose_loop_candidates(g: KeyframeGraph, radius: float = 2.0,
                            min_gap: int = 10, max_candidates: int = 16):
    """Proximity-based loop candidates: node pairs whose estimated positions
    are within `radius` but at least `min_gap` indices apart.

    Returns ([K, 2] indices, [K] validity) — candidates only; geometric
    verification (scan/feature matching) produces the actual constraint.
    """
    N = g.pose_t.shape[0]
    d2 = jnp.sum(
        (g.pose_t[:, None, :] - g.pose_t[None, :, :]) ** 2, axis=-1
    )
    ii = jnp.arange(N)
    pairmask = (
        g.valid[:, None] & g.valid[None, :]
        & (ii[None, :] - ii[:, None] >= min_gap)
        & (d2 <= radius * radius)
    )
    flat = pairmask.reshape(-1)
    score = jnp.where(flat, -d2.reshape(-1), -jnp.inf)
    top, idx = jax.lax.top_k(score, max_candidates)
    pairs = jnp.stack([idx // N, idx % N], axis=-1)
    return pairs, jnp.isfinite(top)


def optimize_graph(g: KeyframeGraph, mesh, iterations: int = 10,
                   huber_delta: float = 1.0, cg_iters: int = 50):
    """Run the distributed pose-graph solve; returns the updated graph and
    final chi2.  Node 0 anchors the gauge."""
    # Graph solves over Trw; convert.
    Twr = se3_matrix(g.pose_q, g.pose_t)
    Trw = mat_inv_se3(Twr)
    graph = pose_graph.PoseGraph(
        pose_q=mat_to_quat(Trw[..., :3, :3]),
        pose_t=Trw[..., :3, 3],
        pose_fixed=(~g.valid) | (jnp.arange(g.pose_q.shape[0]) == 0),
        edge_i=g.edge_i, edge_j=g.edge_j,
        edge_q=g.edge_q, edge_t=g.edge_t,
        edge_info=g.edge_info,
        edge_mask=g.edge_valid,
    )
    q, t, chi2 = pose_graph.optimize(
        graph, mesh, iterations=iterations, huber_delta=huber_delta,
        cg_iters=cg_iters,
    )
    Trw_new = se3_matrix(q, t)
    Twr_new = mat_inv_se3(Trw_new)
    g = g._replace(
        pose_q=jnp.where(g.valid[:, None],
                         mat_to_quat(Twr_new[..., :3, :3]), g.pose_q),
        pose_t=jnp.where(g.valid[:, None], Twr_new[..., :3, 3], g.pose_t),
    )
    return g, chi2


class MappingBackend:
    """Host-side driver: accumulate VO keyframes, close loops, optimize.

    Usage:
        backend = MappingBackend(mesh)
        for each VO output: backend.maybe_add(out)   # uses out.keyframe
        backend.add_loop_closure(i, j, rel)           # from verification
        backend.optimize()
        corrected = backend.poses()
    """

    def __init__(self, mesh, max_nodes: int = 1024, max_edges: int = 4096,
                 odom_info: float = 1e4):
        self.mesh = mesh
        self.graph = init_graph(max_nodes, max_edges)
        self.odom_info = odom_info

    def maybe_add(self, frame_output) -> bool:
        """Add a keyframe from a FrameOutput when it is one (and tracked)."""
        if bool(frame_output.keyframe) and not bool(frame_output.lost):
            self.graph = add_keyframe(
                self.graph, jnp.asarray(frame_output.pose),
                jnp.float32(frame_output.stamp), self.odom_info,
            )
            return True
        return False

    def add_keyframe(self, pose, stamp):
        self.graph = add_keyframe(self.graph, jnp.asarray(pose),
                                  jnp.float32(stamp), self.odom_info)

    def add_loop_closure(self, i: int, j: int, rel, info: float = 1e4):
        self.graph = add_loop_closure(
            self.graph, jnp.int32(i), jnp.int32(j), jnp.asarray(rel),
            jnp.float32(info),
        )

    def loop_candidates(self, radius: float = 2.0, min_gap: int = 10):
        pairs, valid = propose_loop_candidates(self.graph, radius, min_gap)
        return np.asarray(pairs)[np.asarray(valid)]

    def optimize(self, iterations: int = 10, cg_iters: int = 50):
        self.graph, chi2 = optimize_graph(
            self.graph, self.mesh, iterations=iterations, cg_iters=cg_iters
        )
        return float(chi2)

    def poses(self) -> np.ndarray:
        """[n, 4, 4] optimized keyframe poses Twr."""
        n = int(self.graph.n_nodes)
        Twr = se3_matrix(self.graph.pose_q[:n], self.graph.pose_t[:n])
        return np.asarray(Twr)
