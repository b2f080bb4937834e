"""Mesh construction helpers: single-host, multi-host, virtual CPU meshes.

The reference has no distributed story; the TPU engine scales via
`jax.sharding.Mesh` over ICI (single host) and DCN (multi-host through
``jax.distributed.initialize``).  These helpers centralize the conventions
used by parallel/distributed_ba.py and parallel/pose_graph.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """jax.distributed bring-up for multi-host pods (DCN).

    Returns True when distributed state is live after the call — including
    the benign repeat-bring-up case (distributed already initialized).
    The one False return is argless auto-detection finding no cluster
    (plain single-process run), also a benign no-op.  A
    failure with EXPLICIT arguments — a typo'd coordinator address, a bad
    process id — re-raises instead of silently degrading to single-process
    (a 2-host run that quietly becomes two 1-host runs would diverge
    without any error; tests/test_dcn.py pins the live path).
    """
    if jax.distributed.is_initialized():
        return True
    explicit = any(v is not None for v in
                   (coordinator_address, num_processes, process_id))
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        if explicit:
            raise
        return False  # no cluster detected: legitimate single-process run


def landmark_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the landmark axis for distributed Schur BA."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("lm",))


def edge_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the constraint-edge axis for pose-graph solves."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("edges",))


def fleet_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh: one VO instance per device (multi-robot /
    multi-session mapping)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("dp",))


def pad_to_devices(x, mesh: Mesh, axis_name: str, axis: int = 0, fill=0):
    """Pad array axis to a multiple of the mesh axis size (shard_map needs
    evenly divisible shards)."""
    import jax.numpy as jnp

    n = mesh.shape[axis_name]
    size = x.shape[axis]
    rem = (-size) % n
    if rem == 0:
        return x
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, rem)
    return jnp.pad(x, pad_widths, constant_values=fill)
