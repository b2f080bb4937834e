"""Multi-device tests on the virtual 8-device CPU mesh: distributed BA and
pose-graph optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from visfs_tpu.core import lie
from visfs_tpu.parallel import distributed_ba, pose_graph
from visfs_tpu.solver import ba
from visfs_tpu.solver.factors import StereoIntrinsics

from test_ba import synthetic_problem, pose_errors, L, P


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("lm",))


def pad_to_64(problem):
    """Pad the landmark axis to 64 slots for 8-way sharding."""
    pad = 64 - problem.lm_pos.shape[0]

    def pad_lm(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    return problem._replace(
        lm_pos=pad_lm(problem.lm_pos),
        lm_valid=pad_lm(problem.lm_valid, False),
        lm_fixed=pad_lm(problem.lm_fixed, False),
        obs=pad_lm(problem.obs),
        obs_mask=pad_lm(problem.obs_mask, False),
    )


class TestDistributedBA:
    def test_matches_single_device_convergence(self, rng, mesh):
        problem, gt_q, gt_t, gt_lm, _ = synthetic_problem(rng)
        problem = pad_to_64(problem)
        res = distributed_ba.distributed_local_optimize(
            problem, ba.BASettings(iterations=10), mesh
        )
        assert bool(res.ok)
        terr, aerr = pose_errors(res, gt_q, gt_t)
        assert float(terr.max()) < 2e-3, terr
        assert float(aerr.max()) < 2e-3

    def test_exact_equivalence_on_contaminated_problem(self, rng, mesh):
        """distributed_local_optimize IS local_optimize (same code under
        shard_map): on a noisy problem WITH gross outliers, poses, landmark
        write-backs, the demoted-edge set, chi2 and the ok flag must all
        match the single-device solver (VERDICT r1 item 3)."""
        problem, gt_q, gt_t, _, outlier_gt = synthetic_problem(
            rng, noise_px=0.4, pose_noise=0.02, lm_noise=0.05, n_outliers=8,
        )
        problem = pad_to_64(problem)
        settings = ba.BASettings(iterations=10)

        res_s = ba.local_optimize(problem, settings)
        res_d = distributed_ba.distributed_local_optimize(
            problem, settings, mesh
        )
        assert bool(res_s.ok) and bool(res_d.ok)
        # Identical algorithm, but psum-of-shards reassociates the f32
        # landmark sums vs the single-device einsum -> differences bounded
        # by reduction-order rounding (~1e-5 observed).
        np.testing.assert_allclose(
            np.asarray(res_d.pose_t), np.asarray(res_s.pose_t), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_d.pose_q), np.asarray(res_s.pose_q), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_d.lm_pos), np.asarray(res_s.lm_pos), atol=1e-3
        )
        # identical two-pass outlier demotion
        assert (np.asarray(res_d.outliers) == np.asarray(res_s.outliers)).all()
        # ... and the injected gross outliers are among the demoted edges
        inj = np.zeros_like(np.asarray(res_s.outliers))
        inj[: L] = np.asarray(outlier_gt)
        assert np.asarray(res_d.outliers)[inj].all()
        np.testing.assert_allclose(
            float(res_d.chi2), float(res_s.chi2), rtol=1e-3
        )
        # and the contaminated problem still converges near the truth
        # (noise-limited: 0.4 px observation noise over a 6-pose window)
        terr, aerr = pose_errors(res_d, gt_q, gt_t)
        assert float(terr.max()) < 1.5e-2

    def test_psum_equivalence_with_local_solver(self, rng, mesh):
        """Distributed GN must agree with the single-device normal equations
        on a problem with no damping difference."""
        problem, gt_q, gt_t, _, _ = synthetic_problem(rng, pose_noise=0.01)
        pad = 64 - L

        def pad_lm(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
            )

        pp = problem._replace(
            lm_pos=pad_lm(problem.lm_pos),
            lm_valid=pad_lm(problem.lm_valid, False),
            lm_fixed=pad_lm(problem.lm_fixed, False),
            obs=pad_lm(problem.obs),
            obs_mask=pad_lm(problem.obs_mask, False),
        )
        settings = ba.BASettings(iterations=2, use_levenberg=False)
        q_d, t_d, _ = distributed_ba.distributed_gn_step(
            pp, settings, mesh, lam=0.0
        )
        # single-device reference step via the same blocks
        H, g_p, V, g_l, W, lm_free = ba._gn_normal_equations(
            pp, pp.lm_pos, pp.pose_q, pp.pose_t,
            (pp.obs_mask & pp.lm_valid[:, None] & pp.pose_valid[None, :]
             ).astype(jnp.float32),
            settings,
        )
        pose_free = (~pp.pose_fixed) & pp.pose_valid
        dx_p, _ = ba._solve_schur(
            H, g_p, V, g_l, W, lm_free, jnp.repeat(pose_free, 6),
            jnp.float32(0.0), jnp.asarray(False),
        )
        q_s, t_s, _ = ba._apply_updates(
            pp.pose_q, pp.pose_t, pp.lm_pos, dx_p,
            jnp.zeros_like(pp.lm_pos), pp.pose_fixed,
        )
        np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_s), atol=5e-4)


def build_pose_graph(rng, n_poses=32, loop=True):
    """Chain of poses with odometry edges + optional loop closures."""
    # Ground truth: circle
    qs, ts = [], []
    for i in range(n_poses):
        ang = 2 * np.pi * i / n_poses
        q = lie.quat_positify(
            jnp.array(
                [np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)], dtype=jnp.float32
            )
        )
        t = jnp.array(
            [np.cos(ang) * 3, np.sin(ang) * 3, 0.0], dtype=jnp.float32
        )
        qs.append(q)
        ts.append(t)
    gt_q = jnp.stack(qs)
    gt_t = jnp.stack(ts)

    edges_i, edges_j, eq, et = [], [], [], []
    for i in range(n_poses - 1):
        mq, mt = lie.se3_mul(
            (gt_q[i], gt_t[i]), lie.se3_inv((gt_q[i + 1], gt_t[i + 1]))
        )
        edges_i.append(i)
        edges_j.append(i + 1)
        eq.append(mq)
        et.append(mt)
    if loop:
        for (i, j) in [(0, n_poses - 1), (0, n_poses // 2),
                       (n_poses // 4, 3 * n_poses // 4)]:
            mq, mt = lie.se3_mul(
                (gt_q[i], gt_t[i]), lie.se3_inv((gt_q[j], gt_t[j]))
            )
            edges_i.append(i)
            edges_j.append(j)
            eq.append(mq)
            et.append(mt)
    E = len(edges_i)
    pad = (-E) % 8
    for _ in range(pad):
        edges_i.append(0)
        edges_j.append(1)
        eq.append(eq[0])
        et.append(et[0])
    mask = jnp.asarray([True] * E + [False] * pad)

    # perturb all but pose 0
    noise = rng.normal(size=(n_poses, 6)) * 0.05
    noise[0] = 0
    pq, pt = jax.vmap(lie.pose_update)(
        gt_q, gt_t, jnp.asarray(noise, jnp.float32)
    )

    graph = pose_graph.PoseGraph(
        pose_q=pq, pose_t=pt,
        pose_fixed=jnp.zeros(n_poses, bool).at[0].set(True),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        edge_q=jnp.stack(eq), edge_t=jnp.stack(et),
        edge_info=jnp.ones(len(edges_i), jnp.float32) * 100.0,
        edge_mask=mask,
    )
    return graph, gt_q, gt_t


class TestDistributedPoseGraph:
    def test_loop_closure_convergence(self, rng, mesh):
        mesh_e = Mesh(np.array(jax.devices()[:8]), ("edges",))
        graph, gt_q, gt_t = build_pose_graph(rng)
        q, t, chi2 = pose_graph.optimize(
            graph, mesh_e, iterations=10, cg_iters=60
        )
        terr = jnp.linalg.norm(t - gt_t, axis=-1)
        assert float(terr.max()) < 5e-3, (terr.max(), chi2)
        assert float(chi2) < 1e-4

    def test_anchor_stays_fixed(self, rng, mesh):
        mesh_e = Mesh(np.array(jax.devices()[:8]), ("edges",))
        graph, _, _ = build_pose_graph(rng)
        q, t, _ = pose_graph.optimize(graph, mesh_e, iterations=3)
        np.testing.assert_allclose(t[0], graph.pose_t[0])
        np.testing.assert_allclose(q[0], graph.pose_q[0])
