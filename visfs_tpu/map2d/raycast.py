"""Vectorized ray rasterization + probability-grid scan insertion.

Replaces RayToPixelMask's per-ray subpixel Bresenham walk
(corelib/src/Map/2d/RayToPixelMask.cpp:145-251) and the
ProbabilityGridRangeDataInserter2D sweep (ProbabilityGridRangeDataInserter2D
.cpp:40-89) with fixed-budget batched array ops:

  * every ray is sampled at ``samples_per_ray`` parametric points (spacing
    <= resolution/2 when the budget allows), producing the crossed-cell set;
  * the reference's update-marker discipline — each cell is updated at most
    once per sweep, hits take precedence over misses — is reproduced with
    scatter-min "ownership" planes instead of a mutable marker bit;
  * unknown-to-grid cells are dropped (static extent replaces growLimits).

The whole insertion is one fused XLA computation; cost is
O(rays * samples) gathers/scatters with no host loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import probability_values as pv
from .grid2d import Grid2D, cell_index, contains, finish_update


def ray_cells(limits, origins, ends, samples: int):
    """Exact cells crossed by rays origin->end (Amanatides-Woo traversal).

    origins, ends: [R, 2] world points.  Returns ([R, S, 2] cell indices,
    [R, S] validity) where S = samples is the static step budget (rays
    crossing more than S cells are truncated; pick S >= num_a + num_b for
    full in-grid coverage).  This is the supercover equivalent of the
    reference's subpixel Bresenham (RayToPixelMask.cpp:145-251), in
    closed form (see traverse_q).
    """
    # Continuous cell coordinates: q = (max - p)/res, cell = floor(q)
    # (matches lround(q - 0.5) of MapLimits::getCellIndex).
    q0 = jnp.stack(
        [
            (limits.max_y - origins[:, 1]) / limits.resolution,
            (limits.max_x - origins[:, 0]) / limits.resolution,
        ],
        axis=-1,
    )
    q1 = jnp.stack(
        [
            (limits.max_y - ends[:, 1]) / limits.resolution,
            (limits.max_x - ends[:, 0]) / limits.resolution,
        ],
        axis=-1,
    )
    idx, emitted = traverse_q(q0, q1, samples)
    valid = emitted & contains(limits, idx)
    return idx, valid


def traverse_q(q0, q1, samples: int):
    """Supercover traversal in continuous cell coordinates.

    q0, q1: [R, 2] start/end in cell units (cell = floor(q)).  Returns
    ([R, S, 2] cell indices, [R, S] emitted) — emitted marks slots on the
    segment; callers add their own grid-bounds check.
    """
    # ------------------------------------------------------------------
    # Closed-form traversal.  The Amanatides walk visits, after i grid-
    # line crossings, the cell cell0 + (step0*k0, step1*(i-k0)) where k0
    # is the number of axis-0 crossings among the i earliest of the two
    # arithmetic progressions  t0(k) = t0ax0 + k*dt0  and
    # t1(m) = t0ax1 + m*dt1  (tie -> axis 0 first, matching the
    # reference's <= pick).  Merging two APs has a floor closed form:
    #     t0(k) <= t1(i-1-k)  <=>  k <= (t0ax1 - t0ax0 + (i-1)*dt1)/
    #                                   (dt0 + dt1)
    # so k0(i) = clamp(floor(.)+1, 0, i).  This removes the 500-step
    # sequential lax.scan the walk used to be (4 such scans per submap
    # insertion dominated the strategy-3 frame time); everything is now
    # one [R, S] elementwise computation.
    # ------------------------------------------------------------------
    F = jnp.float32
    a = q0
    d = q1 - q0
    cell0 = jnp.floor(a).astype(jnp.int32)  # [R, 2]
    step = jnp.where(d > 0, 1, -1).astype(jnp.int32)
    abs_d = jnp.abs(d)
    alive = abs_d > 1e-12  # [R, 2]
    inv_d = jnp.where(alive, 1.0 / jnp.maximum(abs_d, 1e-12), jnp.inf)
    frac = a - jnp.floor(a)
    dist0 = jnp.where(d > 0, 1.0 - frac, frac)
    t0ax = jnp.where(alive, dist0 * inv_d, jnp.inf)  # [R, 2]
    dt = inv_d

    s_idx = jnp.arange(samples, dtype=jnp.int32)[None, :]  # [1, S]
    s_f = s_idx.astype(F)
    num = (t0ax[:, 1:2] - t0ax[:, 0:1]) + (s_f - 1.0) * dt[:, 1:2]
    den = dt[:, 0:1] + dt[:, 1:2]
    K = num / den  # [R, S]; inf/NaN where an axis is degenerate
    K = jnp.clip(jnp.where(jnp.isfinite(K), K, -1.0), -1.0,
                 float(samples))
    k0 = jnp.clip(jnp.floor(K).astype(jnp.int32) + 1, 0, s_idx)
    inf0 = ~alive[:, 0:1]
    inf1 = ~alive[:, 1:2]
    k0 = jnp.where(inf0, 0, jnp.where(inf1, s_idx, k0))  # [R, S]
    k1 = s_idx - k0

    idx = cell0[:, None, :] + jnp.stack(
        [step[:, 0:1] * k0, step[:, 1:2] * k1], axis=-1
    )  # [R, S, 2]

    # Slot i>0 is emitted iff the i-th crossing happened before the ray
    # end (t < 1): the i-th crossing time is the max of the last-taken
    # crossing on each axis.
    k0f = k0.astype(F)
    k1f = k1.astype(F)
    last0 = jnp.where(k0 >= 1, t0ax[:, 0:1] + (k0f - 1.0) * dt[:, 0:1],
                      -jnp.inf)
    last1 = jnp.where(k1 >= 1, t0ax[:, 1:2] + (k1f - 1.0) * dt[:, 1:2],
                      -jnp.inf)
    t_i = jnp.maximum(last0, last1)
    emitted = (s_idx == 0) | (t_i < 1.0)
    return idx, emitted


def _apply_sweep(cells, flat_idx, valid, is_hit, hit_table, miss_table):
    """Apply one full insertion sweep: every candidate cell updated at most
    once, hits taking precedence over misses — the reference's
    update-marker discipline (ProbabilityGrid.cpp:142-153).

    Formulated as ONE scatter-max of an update-class plane (2 = hit,
    1 = miss, 0 = untouched) followed by a DENSE table apply over the whole
    grid.  Per-candidate scatter/gather is the TPU's weak spot (~7 ns per
    element, serialized): the round-1 formulation issued ~9 such ops per
    sweep over the 133k-candidate planes (~25 ms/frame in strategy 3); a
    sorted-ownership variant still needed ~10 candidate-sized gathers and
    was no better.  Here the only candidate-sized op is the single
    class-plane scatter-max; once-per-cell semantics are inherent to the
    dense apply, and hit-over-miss precedence is the max over classes.

    cells: [HW] uint16; flat_idx/valid/is_hit: [N] candidates;
    *_table: [32768] uint16 marker-tagged update tables.
    Returns (new_cells, updated_plane [HW] bool).
    """
    HW = cells.shape[0]
    cls = jnp.where(is_hit, jnp.int32(2), jnp.int32(1))
    plane = jnp.zeros((HW,), jnp.int32)
    plane = plane.at[jnp.where(valid, flat_idx, HW)].max(cls, mode="drop")
    old = cells.astype(jnp.int32)
    new_cells = jnp.where(
        plane == 2, hit_table[old],
        jnp.where(plane == 1, miss_table[old], cells),
    )
    return new_cells, plane > 0


@partial(jax.jit, static_argnames=("samples", "insert_free_space"))
def insert_range_data(
    grid: Grid2D,
    origin,  # [2] world
    hits,  # [H, 2] world hit points
    hits_mask,  # [H]
    misses,  # [M, 2] world missing-echo endpoints
    misses_mask,  # [M]
    hit_table,  # [32768] uint16
    miss_table,
    samples: int = 128,
    insert_free_space: bool = True,
) -> Grid2D:
    """ProbabilityGridRangeDataInserter2D::insert equivalent (one sweep)."""
    limits = grid.limits
    HW = limits.num_x * limits.num_y
    cells_flat = grid.cells.reshape(-1)

    def flatten(idx):
        # flat = num_x * idx_b + idx_a  (Grid2d.h:92-94); cells stored
        # [num_y, num_x] row-major with row = idx_b.
        return idx[..., 1] * limits.num_x + idx[..., 0]

    # One combined candidate sweep, stages concatenated in precedence
    # order (hits, then free-space ray cells, then missing-echo rays):
    # the reference's marker discipline — each cell once, hits first —
    # becomes first-occurrence ownership in (stage, candidate) order.
    hit_idx = cell_index(limits, hits)
    hit_ok = hits_mask & contains(limits, hit_idx)
    cand_idx = [flatten(hit_idx)]
    cand_ok = [hit_ok]
    cand_hit = [jnp.ones(hit_ok.shape, bool)]

    if insert_free_space:
        # free space along rays to hits (endpoint cells lose to the hit
        # stage by ownership order)
        origins = jnp.broadcast_to(origin[None, :], hits.shape)
        ridx, rvalid = ray_cells(limits, origins, hits, samples)
        rvalid = (rvalid & hits_mask[:, None]).reshape(-1)
        cand_idx.append(flatten(ridx).reshape(-1))
        cand_ok.append(rvalid)
        cand_hit.append(jnp.zeros(rvalid.shape, bool))

        # missing-echo rays
        morigins = jnp.broadcast_to(origin[None, :], misses.shape)
        midx, mvalid = ray_cells(limits, morigins, misses, samples)
        mvalid = (mvalid & misses_mask[:, None]).reshape(-1)
        cand_idx.append(flatten(midx).reshape(-1))
        cand_ok.append(mvalid)
        cand_hit.append(jnp.zeros(mvalid.shape, bool))

    cells_flat, updated = _apply_sweep(
        cells_flat,
        jnp.concatenate(cand_idx),
        jnp.concatenate(cand_ok),
        jnp.concatenate(cand_hit),
        hit_table, miss_table,
    )

    new_grid = grid._replace(cells=cells_flat.reshape(grid.cells.shape))
    new_grid = finish_update(new_grid)

    # extend known-cells box over everything updated this sweep (dense
    # row/column reductions over the update plane)
    upd2d = updated.reshape(grid.cells.shape)
    rows = jnp.any(upd2d, axis=1)
    cols = jnp.any(upd2d, axis=0)
    big = jnp.iinfo(jnp.int32).max
    rr = jnp.arange(limits.num_y)
    cc = jnp.arange(limits.num_x)
    bmin = jnp.min(jnp.where(rows, rr, big))
    bmax = jnp.max(jnp.where(rows, rr, -1))
    amin = jnp.min(jnp.where(cols, cc, big))
    amax = jnp.max(jnp.where(cols, cc, -1))
    any_upd = jnp.any(updated)
    kmin = jnp.where(
        any_upd,
        jnp.minimum(new_grid.known_min, jnp.stack([amin, bmin])),
        new_grid.known_min,
    )
    kmax = jnp.where(
        any_upd,
        jnp.maximum(new_grid.known_max, jnp.stack([amax, bmax])),
        new_grid.known_max,
    )
    return new_grid._replace(known_min=kmin.astype(jnp.int32),
                             known_max=kmax.astype(jnp.int32))
