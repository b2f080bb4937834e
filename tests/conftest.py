"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  The axon sitecustomize force-registers the TPU tunnel backend via
``jax.config``, so an env var alone is not enough — we must override the
config before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Compile-count canary for the upstream XLA CPU crash (pyproject.toml note:
# a single process SIGSEGVs inside backend_compile_and_load after ~170
# compilations).  The suite runs split across 2 xdist workers to stay below
# the trigger; if a future file-mix reshuffle pushes one worker back over
# it, the crash reports as an opaque worker rc=139 — this hook prints each
# worker's compile count at session end so the diagnosis takes seconds:
# a worker near/above ~170 compiles means re-balance the split (see the
# escape hatches documented in pyproject.toml).
# ---------------------------------------------------------------------------
_COMPILE_EVENTS = [0]

try:
    from jax._src import monitoring as _monitoring

    def _count_compiles(event, *a, **kw):
        if isinstance(event, str) and event.endswith(
                "backend_compile_duration"):
            _COMPILE_EVENTS[0] += 1

    _monitoring.register_event_duration_secs_listener(_count_compiles)
except Exception:  # noqa: BLE001 — private API; canary is best-effort
    pass


def pytest_sessionfinish(session, exitstatus):
    try:
        worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
        line = (f"[canary] worker {worker}: {_COMPILE_EVENTS[0]} XLA "
                "backend compilations this process (crash threshold ~170; "
                "see pyproject.toml)")
        print("\n" + line)
        # xdist workers' stdout is swallowed; append to a rootdir log so
        # the per-worker counts survive (the whole point of the canary:
        # diagnosing a worker rc=139 in seconds).
        if worker != "main":
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".pytest_canary.log")
            with open(path, "a") as fh:
                fh.write(line + "\n")
    except Exception:  # noqa: BLE001 — canary must never fail the suite
        pass
