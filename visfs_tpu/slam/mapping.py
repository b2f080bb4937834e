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

from functools import partial
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
    robot: jnp.ndarray  # [N] int32 — owning robot (multi-robot sessions)
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
        robot=jnp.zeros((max_nodes,), jnp.int32),
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
                 odom_info: float = 1e4, robot=0,
                 prev_node=None) -> KeyframeGraph:
    """Append a keyframe (Twr 4x4); auto-links it with an odometry edge
    measured from the current estimates.

    prev_node selects the odometry-chain predecessor: by default the last
    inserted node (single-robot behavior); a multi-robot session passes
    each robot's own previous keyframe so odometry chains never cross
    robots (pass -1 for a robot's first keyframe: no odometry edge, the
    node is tied to the rest of the graph only by loop closures).

    At capacity the insert is a no-op and the counters stay clamped (the
    scatter would be dropped anyway; clamping keeps n_nodes/n_edges honest
    for host-side bookkeeping)."""
    N = g.pose_q.shape[0]
    n = g.n_nodes
    prev = n - 1 if prev_node is None else jnp.asarray(prev_node, jnp.int32)
    q = mat_to_quat(pose[:3, :3])
    t = pose[:3, 3]
    g = g._replace(
        pose_q=g.pose_q.at[n].set(q, mode="drop"),
        pose_t=g.pose_t.at[n].set(t, mode="drop"),
        stamp=g.stamp.at[n].set(stamp, mode="drop"),
        robot=g.robot.at[n].set(jnp.asarray(robot, jnp.int32), mode="drop"),
        valid=g.valid.at[n].set(n < N, mode="drop"),
        n_nodes=jnp.minimum(n + 1, N),
    )

    def with_edge(g):
        prev_pose = se3_matrix(g.pose_q[prev], g.pose_t[prev])
        rel = mat_inv_se3(prev_pose) @ pose
        return _append_edge(g, prev, n, mat_to_quat(rel[:3, :3]),
                            rel[:3, 3], odom_info)

    return jax.lax.cond((prev >= 0) & (n < N), with_edge, lambda g: g, g)


def _append_edge(g: KeyframeGraph, i, j, rel_q, rel_t, info):
    E = g.edge_i.shape[0]
    e = g.n_edges
    return g._replace(
        edge_i=g.edge_i.at[e].set(i, mode="drop"),
        edge_j=g.edge_j.at[e].set(j, mode="drop"),
        edge_q=g.edge_q.at[e].set(rel_q, mode="drop"),
        edge_t=g.edge_t.at[e].set(rel_t, mode="drop"),
        edge_info=g.edge_info.at[e].set(info, mode="drop"),
        edge_valid=g.edge_valid.at[e].set(e < E, mode="drop"),
        n_edges=jnp.minimum(e + 1, E),
    )


@jax.jit
def add_loop_closure(g: KeyframeGraph, i, j, rel: jnp.ndarray,
                     info: float = 1e4) -> KeyframeGraph:
    """Add a loop-closure edge: rel = measured T_ri_rj (4x4).  No-op at
    edge capacity (see add_keyframe)."""
    return _append_edge(g, i, j, mat_to_quat(rel[:3, :3]), rel[:3, 3], info)


def propose_loop_candidates(g: KeyframeGraph, radius: float = 2.0,
                            min_gap: int = 10, max_candidates: int = 16):
    """Proximity-based loop candidates: node pairs whose estimated positions
    are within `radius` and either belong to DIFFERENT robots (any pair —
    cross-robot closures are what fuses a fleet's maps) or are at least
    `min_gap` indices apart (same-robot revisits; the gap excludes
    trivially-adjacent frames).

    Returns ([K, 2] indices, [K] validity) — candidates only; geometric
    verification (scan/feature matching) produces the actual constraint.
    """
    N = g.pose_t.shape[0]
    d2 = jnp.sum(
        (g.pose_t[:, None, :] - g.pose_t[None, :, :]) ** 2, axis=-1
    )
    ii = jnp.arange(N)
    cross = g.robot[:, None] != g.robot[None, :]
    gap_ok = (ii[None, :] - ii[:, None] >= min_gap) | (
        cross & (ii[None, :] > ii[:, None])
    )
    pairmask = (
        g.valid[:, None] & g.valid[None, :]
        & gap_ok
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
        self.snapshots: dict[int, KeyframeSnapshot] = {}
        # Per-robot tail of the odometry chain (multi-robot sessions): the
        # next keyframe of robot r links to _last_node[r], never to another
        # robot's chain.
        self._last_node: dict[int, int] = {}
        # Pairs already decided by close_loops (accepted or rejected):
        # re-verifying them every call would duplicate edges (multiplying
        # their information in the optimizer) and burn verification time.
        self._decided_pairs: set[tuple[int, int]] = set()

    def maybe_add(self, frame_output, snapshot=None, robot: int = 0) -> bool:
        """Add a keyframe from a FrameOutput when it is one (and tracked)."""
        if bool(frame_output.keyframe) and not bool(frame_output.lost):
            self.add_keyframe(frame_output.pose, frame_output.stamp,
                              snapshot=snapshot, robot=robot)
            return True
        return False

    def add_keyframe(self, pose, stamp, snapshot=None, robot: int = 0):
        """Insert a keyframe; returns its node id, or None when the graph
        is at node capacity (the insert is then a no-op)."""
        node_id = int(self.graph.n_nodes)
        if node_id >= self.graph.pose_q.shape[0]:
            return None
        if snapshot is not None:
            # Bounded by the graph's node capacity — no phantom ids, no
            # unbounded device-memory growth on long runs.
            self.snapshots[node_id] = snapshot
        prev = self._last_node.get(int(robot), -1)
        self.graph = add_keyframe(self.graph, jnp.asarray(pose),
                                  jnp.float32(stamp), self.odom_info,
                                  robot=jnp.int32(robot),
                                  prev_node=jnp.int32(prev))
        self._last_node[int(robot)] = node_id
        return node_id

    def add_loop_closure(self, i: int, j: int, rel, info: float = 1e4):
        self.graph = add_loop_closure(
            self.graph, jnp.int32(i), jnp.int32(j), jnp.asarray(rel),
            jnp.float32(info),
        )

    def loop_candidates(self, radius: float = 2.0, min_gap: int = 10):
        pairs, valid = propose_loop_candidates(self.graph, radius, min_gap)
        return np.asarray(pairs)[np.asarray(valid)]

    def close_loops(self, cam, radius: float = 2.0, min_gap: int = 10,
                    min_inliers: int = 10, min_ncc: float = 0.4,
                    seed: int = 0) -> int:
        """Propose, geometrically verify, and insert loop closures.

        Runs verify_loop (NCC matching + 3D-3D Kabsch RANSAC) on every
        not-yet-decided proximity candidate whose endpoints both carry
        snapshots; accepted closures (>= min_inliers) become graph edges
        with information scaled by the inlier count.  Returns the number
        of closures added.
        """
        key = jax.random.PRNGKey(seed)
        added = 0
        for (i, j) in self.loop_candidates(radius, min_gap):
            pair = (int(i), int(j))
            if pair in self._decided_pairs:
                continue
            si = self.snapshots.get(pair[0])
            sj = self.snapshots.get(pair[1])
            if si is None or sj is None:
                continue
            key, sub = jax.random.split(key)
            rel, ok, n_inl = verify_loop(si, sj, cam, sub,
                                         min_inliers=min_inliers,
                                         min_ncc=min_ncc)
            self._decided_pairs.add(pair)
            if bool(ok) and int(n_inl) >= min_inliers:
                self.add_loop_closure(
                    pair[0], pair[1], rel, info=1e3 * float(n_inl)
                )
                added += 1
        return added

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


# ---------------------------------------------------------------------------
# Loop-closure verification (the role rtabmap plays outside the reference):
# keyframe feature snapshots matched by normalized patch correlation, then a
# PnP-RANSAC relative-pose solve with an inlier gate.
# ---------------------------------------------------------------------------


class KeyframeSnapshot(NamedTuple):
    """Per-keyframe appearance record for loop verification."""

    uv: jnp.ndarray  # [M, 2] left-image pixels
    p_robot: jnp.ndarray  # [M, 3] robot-frame 3D points
    patch: jnp.ndarray  # [M, S*S] zero-mean unit-norm intensity patches
    valid: jnp.ndarray  # [M] bool


@partial(jax.jit, static_argnames=("max_kp", "patch_size", "scales"))
def snapshot_features(features, left_img, cam, max_kp: int = 64,
                      patch_size: int = 8, scales: tuple = (1, 3, 6)):
    """Build a KeyframeSnapshot from the live feature table + left image.

    Selects the `max_kp` longest-tracked features with a current
    observation and valid depth, and builds a multi-scale appearance
    descriptor: for each scale s a ``patch_size x patch_size`` grid
    average-pooled from a ``patch_size*s`` pixel window, each block
    zero-mean/unit-norm, concatenated.  The coarse scales add spatial
    context (discriminative on fine/repetitive texture where a raw 8 px
    window self-matches everywhere) while the fine scale keeps precision;
    pooling low-passes away pixel noise and small revisit misalignment.
    """
    from ..ops.image import extract_patch_bilinear
    from .tracker import backproject

    cur = features.uv.shape[1] - 1
    ok = features.valid & features.obs_mask[:, cur] \
        & (features.depth[:, cur] > 0)
    score = jnp.where(ok, features.track_cnt, -1)
    _, idx = jax.lax.top_k(score, max_kp)
    sel_ok = score[idx] >= 0
    uv = features.uv[idx, cur]
    depth = features.depth[idx, cur]
    p_robot = backproject(cam, uv, depth)

    blocks = []
    for s in scales:
        raw = jax.vmap(
            lambda c: extract_patch_bilinear(left_img, c, patch_size * s)
        )(uv)
        pooled = raw.reshape(
            max_kp, patch_size, s, patch_size, s
        ).mean(axis=(2, 4)).reshape(max_kp, patch_size * patch_size)
        cen = pooled - jnp.mean(pooled, axis=1, keepdims=True)
        blocks.append(
            cen / jnp.maximum(jnp.linalg.norm(cen, axis=1, keepdims=True),
                              1e-6)
        )
    patches = jnp.concatenate(blocks, axis=1) / jnp.sqrt(
        jnp.asarray(float(len(scales)), left_img.dtype)
    )
    return KeyframeSnapshot(uv=uv, p_robot=p_robot, patch=patches,
                            valid=sel_ok)


@partial(jax.jit, static_argnames=("min_inliers", "min_ncc", "ratio",
                                   "px_gate", "depth_sigma_px"))
def verify_loop(snap_i: KeyframeSnapshot, snap_j: KeyframeSnapshot, cam,
                rng_key, min_inliers: int = 10, min_ncc: float = 0.4,
                ratio: float = 0.99, px_gate: float = 3.0,
                depth_sigma_px: float = 0.5):
    """Geometric verification of a loop candidate (i, j).

    Three stages:
      1. appearance matching: normalized cross-correlation of the intensity
         patches (mutual nearest + ratio test);
      2. global initialization: 3-point Kabsch minimal solves on the matched
         stereo-triangulated points (closed-form, needs no pose prior, so
         large-viewpoint loops are handled — unlike seeding a local PnP
         solver with identity), RANSAC-scored by REPROJECTION error in j's
         image.  Scoring in pixels rather than 3D matters: triangulated
         range error grows as z^2/bf, so any metric 3D gate either rejects
         every far landmark or accepts garbage; pixel error is
         depth-insensitive.  Minimal-set sampling is still biased toward
         near (range-certain) points.
      3. precision + gating: PnP RANSAC (same pixel residual) seeded with
         the best Kabsch hypothesis.

    Returns (rel [4,4] = T_ri_rj, ok, n_inliers).
    """
    from ..core.camera import project
    from ..core.lie import mat_apply, mat_to_quat
    from ..ops import pnp
    from ..ops.rigid import kabsch

    if snap_i.uv.shape[0] != snap_j.uv.shape[0]:
        raise ValueError(
            "verify_loop requires snapshots of equal max_kp; got "
            f"{snap_i.uv.shape[0]} vs {snap_j.uv.shape[0]}"
        )
    M = snap_i.uv.shape[0]
    ncc = snap_i.patch @ snap_j.patch.T  # [M, M]
    pairmask = snap_i.valid[:, None] & snap_j.valid[None, :]
    ncc = jnp.where(pairmask, ncc, -2.0)

    best_j = jnp.argmax(ncc, axis=1)  # per-i best j
    row = jnp.take_along_axis(ncc, best_j[:, None], axis=1)[:, 0]
    row2 = jnp.max(
        jnp.where(jax.nn.one_hot(best_j, M, dtype=bool), -2.0, ncc), axis=1
    )
    mutual = jnp.argmax(ncc, axis=0)[best_j] == jnp.arange(M)
    match_ok = (
        snap_i.valid & mutual & (row >= min_ncc)
        & (row2 <= ratio * row)
    )

    # Coarse rel: p_i ~= R p_j + t (j-frame robot coords into i's frame).
    # 3-point Kabsch minimal solves; hypotheses scored by reprojection of
    # i's points into j's image against the matched pixel observations.
    key_k, key_p = jax.random.split(rng_key)
    dtype = snap_i.p_robot.dtype
    p_i = snap_i.p_robot
    p_j = snap_j.p_robot[best_j]
    uv_j = snap_j.uv[best_j]
    maskf = match_ok.astype(dtype)
    # bias minimal sets toward near points (range-certain)
    z_i = jnp.linalg.norm(p_i, axis=-1)
    z_j = jnp.linalg.norm(p_j, axis=-1)
    sigma = (depth_sigma_px / cam.bf) * jnp.sqrt(z_i**4 + z_j**4)
    conf = -jnp.log(jnp.maximum(sigma, 1e-4))
    n_hyp = 48
    gumbel = jax.random.gumbel(key_k, (n_hyp, M), dtype=dtype)
    scores = jnp.where(match_ok[None, :], gumbel + conf[None, :], -jnp.inf)
    _, subsets = jax.lax.top_k(scores, 3)  # [n_hyp, 3]

    def fit(idx):
        w = jnp.zeros(M, dtype).at[idx].set(1.0) * maskf
        R, t = kabsch(p_i, p_j, w)
        # predicted pixel of each matched i-point in j's left image
        p_in_j = (p_i - t) @ R  # rows: R^T (p_i - t)
        p_img = mat_apply(cam.t_ir, p_in_j)
        uv_pred = project(cam, p_img)
        err = jnp.linalg.norm(uv_pred - uv_j, axis=-1)
        inl = match_ok & (err <= px_gate) & (p_img[:, 2] > 0.1)
        return R, t, jnp.sum(inl)

    Rs, ts, counts = jax.vmap(fit)(subsets)
    bh = jnp.argmax(counts)
    coarse_ok = (
        (counts[bh] >= min_inliers)
        & jnp.all(jnp.isfinite(Rs[bh]))
        & jnp.all(jnp.isfinite(ts[bh]))
    )
    rel0 = jnp.eye(4, dtype=dtype)
    rel0 = rel0.at[:3, :3].set(Rs[bh]).at[:3, 3].set(ts[bh])

    # PnP refinement: i's robot-frame points against j's pixels, guess from
    # the Kabsch estimate (same frame conventions as the estimator stage).
    guess_cam = mat_inv_se3(rel0 @ cam.t_ri)
    q0 = mat_to_quat(guess_cam[:3, :3])
    t0 = guess_cam[:3, 3]
    res = pnp.solve_pnp_ransac(
        snap_i.p_robot, snap_j.uv[best_j], match_ok, q0, t0,
        cam.fx, cam.fy, cam.cx, cam.cy, key_p,
        pnp.PnPSettings(iterations=16, min_inliers=min_inliers),
    )
    rel = mat_inv_se3(cam.t_ri @ se3_matrix(res.q, res.t))
    ok = coarse_ok & res.ok
    return jnp.where(res.ok, rel, rel0), ok, res.n_inliers
