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
    reference's subpixel Bresenham (RayToPixelMask.cpp:145-251) as a
    fixed-length lax.scan, vmapped over rays.
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

    def one_ray(a, b):
        d = b - a
        cell0 = jnp.floor(a).astype(jnp.int32)
        step = jnp.where(d > 0, 1, -1).astype(jnp.int32)
        abs_d = jnp.abs(d)
        inv_d = jnp.where(abs_d > 1e-12, 1.0 / jnp.maximum(abs_d, 1e-12),
                          jnp.inf)
        # parametric distance to the first boundary along each axis
        frac = a - jnp.floor(a)
        dist0 = jnp.where(d > 0, 1.0 - frac, frac)
        t_max0 = jnp.where(abs_d > 1e-12, dist0 * inv_d, jnp.inf)
        t_delta = inv_d

        def body(carry, _):
            cell, t_max, done = carry
            emit = cell
            emit_ok = ~done
            pick0 = t_max[0] <= t_max[1]
            t_hit = jnp.where(pick0, t_max[0], t_max[1])
            new_done = done | (t_hit >= 1.0)
            new_cell = jnp.where(
                pick0, cell.at[0].add(step[0]), cell.at[1].add(step[1])
            )
            new_tmax = jnp.where(
                pick0, t_max.at[0].add(t_delta[0]), t_max.at[1].add(t_delta[1])
            )
            cell = jnp.where(new_done, cell, new_cell)
            t_max = jnp.where(new_done, t_max, new_tmax)
            return (cell, t_max, new_done), (emit, emit_ok)

        (_, _, _), (cells, oks) = jax.lax.scan(
            body, (cell0, t_max0, jnp.zeros((), bool)), None, length=samples
        )
        return cells, oks

    idx, emitted = jax.vmap(one_ray)(q0, q1)
    valid = emitted & contains(limits, idx)
    return idx, valid


def _apply_once(cells, flat_idx, valid, table, not_before=None):
    """Apply a lookup table at flat cell indices, once per cell.

    cells: [HW] uint16; flat_idx: [N] int32 (candidates); valid: [N];
    table: [32768] uint16 update table (marker-tagged outputs);
    not_before: optional [HW] bool plane of cells already updated this sweep
    (those are skipped — hits before misses).
    Returns (new_cells, updated_plane) where updated_plane marks cells
    touched by this pass OR an earlier pass.
    """
    HW = cells.shape[0]
    n = flat_idx.shape[0]

    if not_before is not None:
        fresh = valid & ~jnp.where(valid, not_before[jnp.clip(flat_idx, 0, HW - 1)], True)
    else:
        fresh = valid

    safe_idx = jnp.where(fresh, flat_idx, HW)
    # Ownership: lowest candidate index wins each cell.
    owner = jnp.full((HW + 1,), n, jnp.int32)
    owner = owner.at[safe_idx].min(jnp.arange(n, dtype=jnp.int32),
                                   mode="drop")
    winner = fresh & (owner[jnp.clip(safe_idx, 0, HW)] == jnp.arange(n))

    old = cells[jnp.clip(flat_idx, 0, HW - 1)]
    new_val = table[old.astype(jnp.int32)]
    win_idx = jnp.where(winner, flat_idx, HW)
    new_cells = cells.at[win_idx].set(new_val, mode="drop")

    updated = jnp.zeros((HW,), bool) if not_before is None else not_before
    updated = updated.at[win_idx].set(True, mode="drop")
    return new_cells, updated


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

    # 1. hits at endpoint cells
    hit_idx = cell_index(limits, hits)
    hit_ok = hits_mask & contains(limits, hit_idx)
    cells_flat, updated = _apply_once(
        cells_flat, flatten(hit_idx), hit_ok, hit_table
    )

    if insert_free_space:
        # 2. free space along rays to hits
        origins = jnp.broadcast_to(origin[None, :], hits.shape)
        ridx, rvalid = ray_cells(limits, origins, hits, samples)
        rvalid = rvalid & hits_mask[:, None]
        # exclude the endpoint cell itself (it got the hit update; the
        # reference relies on the marker for this)
        cells_flat, updated = _apply_once(
            cells_flat, flatten(ridx).reshape(-1), rvalid.reshape(-1),
            miss_table, not_before=updated,
        )

        # 3. missing-echo rays
        morigins = jnp.broadcast_to(origin[None, :], misses.shape)
        midx, mvalid = ray_cells(limits, morigins, misses, samples)
        mvalid = mvalid & misses_mask[:, None]
        cells_flat, updated = _apply_once(
            cells_flat, flatten(midx).reshape(-1), mvalid.reshape(-1),
            miss_table, not_before=updated,
        )

    new_grid = grid._replace(cells=cells_flat.reshape(grid.cells.shape))
    new_grid = finish_update(new_grid)

    # extend known-cells box over everything updated this sweep
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
