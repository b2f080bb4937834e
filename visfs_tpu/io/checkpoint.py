"""Checkpoint / resume of the full engine state (new capability).

The reference keeps everything in memory and loses it on exit (SURVEY.md §5
"Checkpoint / resume: none").  Here the whole VOState — feature table,
sliding window, submaps, odometry buffer, pose — is one pytree, so orbax
serializes it directly; restore rebuilds against a template from
``init_state`` with the same static configuration.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str | os.PathLike, state) -> None:
    """Serialize a VOState (or any engine pytree) to `path`."""
    path = Path(path).absolute()
    _checkpointer().save(path, jax.device_get(state), force=True)


def restore_state(path: str | os.PathLike, template):
    """Restore a pytree saved by save_state.

    template: a structurally-identical pytree (e.g. from init_state with the
    same config) providing shapes/dtypes/structure.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    restored = _checkpointer().restore(
        path, restore_args=ocp.checkpoint_utils.construct_restore_args(
            jax.device_get(template)
        ),
        item=jax.device_get(template),
    )
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r),
                                  template, restored)


def save_system(path: str | os.PathLike, system) -> None:
    """Checkpoint a slam.system.System: state + config snapshot."""
    from ..config import config_to_parameters

    path = Path(path)
    save_state(path / "state", system.state)
    import json

    (path / "config.json").write_text(
        json.dumps(config_to_parameters(system.cfg), indent=2)
    )


def restore_system(path: str | os.PathLike, system) -> None:
    """Restore a System checkpointed with save_system (config must match)."""
    import json

    from ..config import config_to_parameters

    path = Path(path)
    saved_cfg = json.loads((path / "config.json").read_text())
    if saved_cfg != config_to_parameters(system.cfg):
        raise ValueError(
            "checkpoint config does not match the System configuration"
        )
    system.state = restore_state(path / "state", system.state)


def save_mapping(path: str | os.PathLike, backend) -> None:
    """Checkpoint a slam.mapping.MappingBackend: the keyframe graph, the
    per-keyframe appearance snapshots, and the session bookkeeping
    (per-robot odometry-chain tails, decided loop pairs).

    Long mapping/multi-robot sessions outlive processes; the graph is the
    product.  Stored as one .npz (all leaves are fixed-capacity arrays;
    snapshots stack along a leading node axis).
    """
    import numpy as np

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    g = jax.device_get(backend.graph)
    payload = {f"graph_{k}": np.asarray(v) for k, v in g._asdict().items()}
    snap_ids = sorted(backend.snapshots)
    payload["snap_ids"] = np.asarray(snap_ids, np.int64)
    if snap_ids:
        snaps = [jax.device_get(backend.snapshots[i]) for i in snap_ids]
        for field in snaps[0]._fields:
            payload[f"snap_{field}"] = np.stack(
                [np.asarray(getattr(s, field)) for s in snaps]
            )
    payload["last_node"] = np.asarray(
        sorted(backend._last_node.items()), np.int64
    ).reshape(-1, 2)
    payload["decided"] = np.asarray(
        sorted(backend._decided_pairs), np.int64
    ).reshape(-1, 2)
    payload["odom_info"] = np.asarray(backend.odom_info, np.float64)
    np.savez(path, **payload)


def restore_mapping(path: str | os.PathLike, backend) -> None:
    """Restore a MappingBackend checkpointed with save_mapping.  The
    backend must be constructed with the same node/edge capacities."""
    import jax.numpy as jnp
    import numpy as np

    from ..slam.mapping import KeyframeGraph, KeyframeSnapshot

    d = np.load(Path(path).with_suffix(".npz")
                if not str(path).endswith(".npz") else Path(path))
    fields = {k[len("graph_"):]: jnp.asarray(d[k]) for k in d.files
              if k.startswith("graph_")}
    graph = KeyframeGraph(**fields)
    if graph.pose_q.shape != backend.graph.pose_q.shape \
            or graph.edge_i.shape != backend.graph.edge_i.shape:
        raise ValueError("checkpoint graph capacity does not match backend")
    backend.graph = graph
    backend.snapshots = {}
    ids = d["snap_ids"]
    for j, node_id in enumerate(ids):
        backend.snapshots[int(node_id)] = KeyframeSnapshot(
            **{f: jnp.asarray(d[f"snap_{f}"][j])
               for f in KeyframeSnapshot._fields}
        )
    backend._last_node = {int(r): int(n) for r, n in d["last_node"]}
    backend._decided_pairs = {(int(i), int(j)) for i, j in d["decided"]}
    backend.odom_info = float(d["odom_info"])
