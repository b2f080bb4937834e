"""Multi-process (DCN) distributed-BA test: 2 jax.distributed processes on
a CPU mesh (SURVEY.md §4's multi-host test mandate).

Each worker process (tests/_dcn_worker.py) owns 4 virtual CPU devices,
joins a localhost coordinator, and runs distributed_local_optimize over
the 8-device global mesh — the two-host analog of the single-process
virtual-mesh tests in test_distributed.py.  Workers assert exact agreement
with the single-process solver and print a JSON line; the test asserts
both exit cleanly and saw the full global topology.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

import jax

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_ba_matches_single():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = (str(REPO) + os.pathsep + env.get("PYTHONPATH", ""))
    env["JAX_PLATFORMS"] = "cpu"
    # Workers set their own device-count XLA flag; scrub the parent's.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "_dcn_worker.py"), coordinator,
             "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
    reports = [json.loads(out.strip().splitlines()[-1])
               for _, out, _ in outs]
    for rep in reports:
        assert rep["processes"] == 2
        assert rep["global_devices"] == 8
    assert reports[0]["chi2"] == pytest.approx(reports[1]["chi2"])


def test_initialize_multihost_raises_on_bad_explicit_args():
    """A typo'd coordinator must NOT silently degrade to single-process
    (VERDICT r3 weak #5)."""
    from visfs_tpu.parallel.mesh import initialize_multihost

    if jax.distributed.is_initialized():
        pytest.skip("distributed already live in this process")
    with pytest.raises(Exception):
        # Explicit multi-process topology with no coordinator address
        # fails fast and deterministically (no connect/retry timeout).
        initialize_multihost(num_processes=2, process_id=1)
