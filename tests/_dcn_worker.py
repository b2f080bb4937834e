"""Worker process for the multi-process (DCN) distributed-BA test.

Each of N processes brings up jax.distributed against a localhost
coordinator (the CPU-mesh stand-in for a multi-host pod, SURVEY.md §4),
contributes its local virtual CPU devices to a global landmark mesh, runs
``distributed_local_optimize`` on a deterministic contaminated problem,
and checks the replicated outputs against the single-process solver it
also runs locally.  Prints one JSON line on success.

Usage: python tests/_dcn_worker.py <coordinator> <num_procs> <proc_id>
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Multi-process CPU needs a cross-process collectives backend; without it
# each process forms its own single-process world.
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    # The axon sitecustomize force-selects its backend via jax.config, so
    # the env var alone is not enough (same dance as tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from visfs_tpu.parallel.mesh import initialize_multihost

    assert initialize_multihost(
        coordinator_address=coordinator, num_processes=num_procs,
        process_id=proc_id,
    )

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_procs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 4 * num_procs, n_global

    from test_ba import synthetic_problem
    from visfs_tpu.parallel import distributed_ba
    from visfs_tpu.solver import ba

    rng = np.random.default_rng(42)
    problem, gt_q, gt_t, _, _ = synthetic_problem(
        rng, noise_px=0.4, pose_noise=0.02, lm_noise=0.05, n_outliers=6)

    # Pad the landmark axis to a multiple of the global device count.
    L0 = problem.lm_pos.shape[0]
    Lp = ((L0 + n_global - 1) // n_global) * n_global

    def pad_lm(x, fill=0):
        pad = Lp - L0
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    problem = problem._replace(
        lm_pos=pad_lm(problem.lm_pos),
        lm_valid=pad_lm(problem.lm_valid, False),
        lm_fixed=pad_lm(problem.lm_fixed, False),
        obs=pad_lm(problem.obs),
        obs_mask=pad_lm(problem.obs_mask, False),
    )
    settings = ba.BASettings(iterations=10)

    # Single-process reference (identical in every process).
    ref = ba.local_optimize(problem, settings)

    # Global mesh across ALL processes' devices; every leaf becomes a
    # global array (each process supplies its addressable shards from the
    # replicated host copy).
    mesh = Mesh(np.array(jax.devices()), ("lm",))
    specs = distributed_ba._problem_specs(problem, "lm")

    def to_global(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx])

    gproblem = jax.tree_util.tree_map(to_global, problem, specs)
    res = distributed_ba.distributed_local_optimize(gproblem, settings, mesh)

    # Replicated outputs are fully addressable in every process.
    np.testing.assert_allclose(np.asarray(res.pose_q),
                               np.asarray(ref.pose_q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.pose_t),
                               np.asarray(ref.pose_t), atol=1e-5)
    assert bool(res.ok) == bool(ref.ok)
    np.testing.assert_allclose(float(res.chi2), float(ref.chi2), rtol=1e-4)

    # Sharded landmark write-backs: check this process's local shards.
    # Cross-process gloo reductions reassociate float sums differently
    # from the single-device solver; over 10 LM iterations that compounds
    # to ~1e-3 in landmark back-substitution (poses stay at 1e-5).
    for shard in res.lm_pos.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data),
            np.asarray(ref.lm_pos[shard.index]), atol=5e-3)

    print(json.dumps({
        "proc": proc_id, "processes": jax.process_count(),
        "global_devices": n_global, "chi2": float(res.chi2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
