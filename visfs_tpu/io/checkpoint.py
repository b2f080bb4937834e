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
