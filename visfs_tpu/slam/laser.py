"""Laser scan pretreatment (Estimator::laserPretreatment equivalent).

Mirrors corelib/src/Estimator.cpp:116-164: transform the scan into the
sensor-fusion frame, drop returns below the minimum range, convert returns
beyond the maximum range into misses at ``missing_data_ray_length``.  The
reference's per-subdivision re-timestamping exists for rolling-scan motion
compensation with per-point times; with fixed-capacity arrays the whole
scan is handled as one batch (subdivision count kept as API parity but the
pipeline consumes the union).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.lie import mat_apply


class PretreatedScan(NamedTuple):
    origin: jnp.ndarray  # [3] sensor origin in the robot frame
    returns: jnp.ndarray  # [K, 3] robot-frame hit points
    returns_mask: jnp.ndarray  # [K]
    misses: jnp.ndarray  # [K, 3] robot-frame missing-echo endpoints
    misses_mask: jnp.ndarray  # [K]


def pretreat(points, mask, t_laser_to_robot, min_range, max_range,
             missing_data_ray_length) -> PretreatedScan:
    """points: [K, 3] laser-frame; mask: [K]; t_laser_to_robot: [4, 4]."""
    origin = t_laser_to_robot[:3, 3]
    p = mat_apply(t_laser_to_robot, points)
    delta = p - origin
    rng = jnp.linalg.norm(delta, axis=-1)
    ok = mask & (rng >= min_range)
    is_return = ok & (rng <= max_range)
    is_miss = ok & (rng > max_range)
    safe_rng = jnp.maximum(rng, 1e-6)
    miss_pts = origin + (missing_data_ray_length / safe_rng)[:, None] * delta
    return PretreatedScan(
        origin=origin,
        returns=jnp.where(is_return[:, None], p, 0.0),
        returns_mask=is_return,
        misses=jnp.where(is_miss[:, None], miss_pts, 0.0),
        misses_mask=is_miss,
    )
