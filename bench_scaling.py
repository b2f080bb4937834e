"""Scaling-efficiency benchmark for the distributed mapping back-end.

Weak-scaling measurement of the landmark-sharded distributed Schur BA
(parallel/distributed_ba.py) and the edge-sharded pose-graph solver
(parallel/pose_graph.py) over a device mesh: the per-device problem size is
held constant while the mesh grows, so ideal scaling keeps the wall time
flat (efficiency = t(1) / t(n)).

On this machine it runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``); on a pod slice the same code
shards over real chips with the psum riding ICI.  Prints one JSON line per
mesh size plus a summary line.

Usage: python bench_scaling.py [max_devices]
"""

import json
import os
import sys
import time


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_max}"
        ).strip()

    import jax

    if not os.environ.get("VISFS_SCALING_REAL_CHIPS"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from visfs_tpu.parallel import distributed_ba, pose_graph
    from visfs_tpu.solver import ba
    from visfs_tpu.solver.factors import StereoIntrinsics, project_stereo_point

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(n_max, len(devices))]

    LM_PER_DEV = 4096  # landmarks per device (weak scaling)
    EDGES_PER_DEV = 4096
    P = 6
    intr = StereoIntrinsics(*[jnp.float32(v) for v in (458, 458, 320, 240, 50)])
    rng = np.random.default_rng(0)

    def make_problem(L):
        qid = jnp.zeros((P, 4), jnp.float32).at[:, 0].set(1.0)
        lm = jnp.asarray(
            np.stack([rng.uniform(-2, 2, L), rng.uniform(-2, 2, L),
                      rng.uniform(3, 8, L)], -1), jnp.float32)
        obs = jax.vmap(
            lambda p: jax.vmap(lambda q: project_stereo_point(p, intr))(qid)
        )(lm)
        return ba.BAProblem(
            pose_q=qid,
            pose_t=jnp.zeros((P, 3), jnp.float32).at[:, 2].set(
                0.01 * jnp.arange(P)),
            pose_valid=jnp.ones(P, bool),
            pose_fixed=jnp.zeros(P, bool).at[0].set(True),
            lm_pos=lm + 0.05, lm_valid=jnp.ones(L, bool),
            lm_fixed=jnp.zeros(L, bool),
            obs=obs, obs_mask=jnp.ones((L, P), bool),
            link_q=jnp.zeros((P - 1, 4), jnp.float32).at[:, 0].set(1.0),
            link_t=jnp.zeros((P - 1, 3), jnp.float32),
            link_mask=jnp.zeros(P - 1, bool),
            intr=intr,
        )

    def make_graph(E):
        N = max(E // 8, 16)
        gq = jnp.zeros((N, 4), jnp.float32).at[:, 0].set(1.0)
        gt = jnp.zeros((N, 3), jnp.float32).at[:, 0].set(
            0.1 * jnp.arange(N, dtype=jnp.float32))
        ei = jnp.asarray(rng.integers(0, N - 1, E), jnp.int32)
        ej = ei + 1
        eq = jnp.zeros((E, 4), jnp.float32).at[:, 0].set(1.0)
        et = jnp.zeros((E, 3), jnp.float32).at[:, 0].set(0.1)
        return pose_graph.PoseGraph(
            pose_q=gq, pose_t=gt,
            pose_fixed=jnp.zeros(N, bool).at[0].set(True),
            edge_i=ei, edge_j=ej, edge_q=eq, edge_t=et,
            edge_info=jnp.ones(E, jnp.float32),
            edge_mask=jnp.ones(E, bool),
        )

    settings = ba.BASettings(iterations=5)
    results = []
    for n in sizes:
        mesh_lm = Mesh(np.array(devices[:n]), ("lm",))
        mesh_e = Mesh(np.array(devices[:n]), ("edges",))
        prob = make_problem(LM_PER_DEV * n)
        graph = make_graph(EDGES_PER_DEV * n)

        # warm-up (compile)
        out = distributed_ba.distributed_local_optimize(
            prob, settings, mesh_lm)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = distributed_ba.distributed_local_optimize(
                prob, settings, mesh_lm)
            jax.block_until_ready(out)
        t_ba = (time.perf_counter() - t0) / reps

        out2 = pose_graph.optimize(graph, mesh_e, iterations=3, cg_iters=16)
        jax.block_until_ready(out2)
        t0 = time.perf_counter()
        for _ in range(reps):
            out2 = pose_graph.optimize(graph, mesh_e, iterations=3,
                                       cg_iters=16)
            jax.block_until_ready(out2)
        t_pg = (time.perf_counter() - t0) / reps
        results.append((n, t_ba, t_pg))
        print(json.dumps({
            "devices": n,
            "ba_landmarks": LM_PER_DEV * n,
            "ba_s": round(t_ba, 4),
            "pose_graph_edges": EDGES_PER_DEV * n,
            "pose_graph_s": round(t_pg, 4),
        }))

    if len(results) > 1:
        n1, ba1, pg1 = results[0]
        nN, baN, pgN = results[-1]
        print(json.dumps({
            "metric": "weak_scaling_efficiency",
            "devices": nN,
            "ba_efficiency": round(ba1 / baN, 3),
            "pose_graph_efficiency": round(pg1 / pgN, 3),
        }))


if __name__ == "__main__":
    main()
