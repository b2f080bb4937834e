"""Laser scan pretreatment (Estimator::laserPretreatment equivalent).

Mirrors corelib/src/Estimator.cpp:116-164: transform the scan into the
sensor-fusion frame, drop returns below the minimum range, convert returns
beyond the maximum range into misses at ``missing_data_ray_length``.

Rolling-scan motion compensation (Estimator/NumSubDivisionPreScan): the
reference subdivides each scan and re-stamps the parts for per-part pose
interpolation (Estimator.cpp:121-136) — but then transforms every part by
the SAME ``currentGlobalPose`` (Estimator.cpp:379-381), so its compensation
is scaffolding only.  Here the compensation is actually applied: per-point
times quantize into NumSubDivisionPreScan buckets exactly like the
reference's index subdivision (uniform spin -> identical partition), each
bucket's points are de-skewed into the scan-stamp robot frame through the
constant-velocity model ``E(t) = exp(v * t)`` (t <= 0, newest point = 0),
matching the extrapolator's motion model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lie import mat_apply, xyzrpy_to_mat


class PretreatedScan(NamedTuple):
    origin: jnp.ndarray  # [3] sensor origin in the robot frame
    returns: jnp.ndarray  # [K, 3] robot-frame hit points
    returns_mask: jnp.ndarray  # [K]
    misses: jnp.ndarray  # [K, 3] robot-frame missing-echo endpoints
    misses_mask: jnp.ndarray  # [K]


def pretreat(points, mask, t_laser_to_robot, min_range, max_range,
             missing_data_ray_length, times=None, velocity6=None,
             n_subdivisions: int = 1) -> PretreatedScan:
    """points: [K, 3] laser-frame; mask: [K]; t_laser_to_robot: [4, 4].

    times: optional [K] per-point acquisition offsets in seconds (<= 0,
    newest = 0 — io.interface.laser_scan_to_points convention).
    velocity6: optional [6] robot velocity (x, y, z, roll, pitch, yaw)/s
    used to de-skew; zero/None disables compensation.
    n_subdivisions: Estimator/NumSubDivisionPreScan bucket count.
    """
    origin = t_laser_to_robot[:3, 3]
    p = mat_apply(t_laser_to_robot, points)

    if times is not None and velocity6 is not None and n_subdivisions > 1:
        dtype = p.dtype
        big = jnp.asarray(1e9, dtype)
        t_min = jnp.min(jnp.where(mask, times, big))
        t_max = jnp.max(jnp.where(mask, times, -big))
        span = jnp.maximum(t_max - t_min, 1e-9)
        bucket = jnp.clip(
            ((times - t_min) / span * n_subdivisions).astype(jnp.int32),
            0, n_subdivisions - 1,
        )
        # Bucket representative time = subdivision end (the reference
        # re-stamps each part at its last point, Estimator.cpp:129).
        tb = t_min + (jnp.arange(1, n_subdivisions + 1, dtype=dtype)
                      / n_subdivisions) * span
        Eb = jax.vmap(lambda t: xyzrpy_to_mat(*(velocity6 * t)))(tb)
        T = Eb[bucket]  # [K, 4, 4]
        p = jnp.einsum("kij,kj->ki", T[:, :3, :3], p) + T[:, :3, 3]
        # The per-point ray origin moves too; the single-origin
        # approximation below errs by |v|*span (mm at walking speeds),
        # only affecting free-space rays, not the hit points.

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
