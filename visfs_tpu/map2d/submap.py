"""Submap2D / ActiveSubmaps2D: cartographer-style two-submap rotation.

Mirrors corelib/src/Map/2d/Submap2D.cpp:88-174 with static shapes: at most
two live submaps; a new one starts when the newest reaches
``num_range_data_limit`` insertions; the oldest is finished (frozen) at
2x the limit and dropped when a third would start.  "Finished" submaps stay
frozen (the reference crops them; with static extents we freeze in place and
expose the known-cells box for consumers).

Both slots share one static square extent (the reference's growth-by-
doubling is replaced by pre-allocation), so the per-slot grid state is plain
stacked arrays and the whole insertion rotation composes into the jitted
per-frame step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import probability_values as pv
from .grid2d import Grid2D, MapLimits, make_limits
from .raycast import insert_range_data


class ActiveSubmaps2D(NamedTuple):
    # Two submap slots; slot 0 = older (matching submap), slot 1 = newer.
    cells: jnp.ndarray  # [2, E, E] uint16
    resolution: jnp.ndarray  # scalar f32
    max_xy: jnp.ndarray  # [2, 2] per-slot upper corner (x, y)
    known_min: jnp.ndarray  # [2, 2] int32
    known_max: jnp.ndarray  # [2, 2] int32
    origin: jnp.ndarray  # [2, 3] submap origin (x, y, yaw)
    num_range_data: jnp.ndarray  # [2] int32
    slot_valid: jnp.ndarray  # [2] bool
    finished: jnp.ndarray  # [2] bool

    @property
    def extent(self) -> int:
        return self.cells.shape[-1]


def grid_slot(s: ActiveSubmaps2D, i) -> Grid2D:
    """Materialize slot i as a Grid2D view (i may be traced)."""
    E = s.extent
    limits = MapLimits(
        resolution=s.resolution,
        max_x=s.max_xy[i, 0],
        max_y=s.max_xy[i, 1],
        num_x=E, num_y=E,
    )
    return Grid2D(
        limits=limits,
        cells=s.cells[i],
        known_min=s.known_min[i],
        known_max=s.known_max[i],
    )


def init_active_submaps(resolution: float, extent_cells: int = 256
                        ) -> ActiveSubmaps2D:
    """Empty two-slot state pre-allocated at extent_cells^2."""
    return ActiveSubmaps2D(
        cells=jnp.full((2, extent_cells, extent_cells), pv.UNKNOWN_VALUE,
                       jnp.uint16),
        resolution=jnp.asarray(resolution, jnp.float32),
        max_xy=jnp.zeros((2, 2), jnp.float32),
        known_min=jnp.full((2, 2), extent_cells, jnp.int32),
        known_max=jnp.full((2, 2), -1, jnp.int32),
        origin=jnp.zeros((2, 3), jnp.float32),
        num_range_data=jnp.zeros((2,), jnp.int32),
        slot_valid=jnp.zeros((2,), bool),
        finished=jnp.zeros((2,), bool),
    )


@partial(jax.jit, static_argnames=("num_range_data_limit", "samples",
                                   "insert_free_space"))
def insert_range_data_active(
    submaps: ActiveSubmaps2D,
    origin,  # [2] world sensor origin
    hits, hits_mask,  # [H, 2], [H]
    misses, misses_mask,  # [M, 2], [M]
    hit_table, miss_table,
    num_range_data_limit: int,
    samples: int = 128,
    insert_free_space: bool = True,
) -> ActiveSubmaps2D:
    """ActiveSubmaps2D::insertRangeData (Submap2D.cpp:112-126).

    Rotation: if no submaps or the newest reached the limit, add a submap at
    the current origin (dropping the oldest if two exist — Submap2D.cpp:
    163-174); then insert the scan into every live, unfinished submap; the
    oldest is marked finished at 2x the limit.
    """
    E = submaps.extent
    res = submaps.resolution

    newest_full = submaps.slot_valid[1] & (
        submaps.num_range_data[1] >= num_range_data_limit
    )
    need_add = (~submaps.slot_valid[0] & ~submaps.slot_valid[1]) | newest_full

    def add_submap(s: ActiveSubmaps2D) -> ActiveSubmaps2D:
        had1 = s.slot_valid[1]
        half = 0.5 * E * res
        new_max = jnp.stack([origin[0] + half, origin[1] + half])

        def rot(x, newv):
            rolled = jnp.where(had1, x.at[0].set(x[1]), x)
            return rolled.at[1].set(newv)

        return s._replace(
            cells=rot(s.cells, jnp.full((E, E), pv.UNKNOWN_VALUE, jnp.uint16)),
            max_xy=rot(s.max_xy, new_max),
            known_min=rot(s.known_min, jnp.full((2,), E, jnp.int32)),
            known_max=rot(s.known_max, jnp.full((2,), -1, jnp.int32)),
            origin=rot(s.origin, jnp.array([origin[0], origin[1], 0.0])),
            num_range_data=rot(s.num_range_data, jnp.zeros((), jnp.int32)),
            # need_add implies both empty (fresh start) or newest full
            # (rotate down) — slot0 live iff slot1 was.
            slot_valid=s.slot_valid.at[0].set(had1).at[1].set(True),
            finished=rot(s.finished, jnp.zeros((), bool)),
        )

    submaps = jax.lax.cond(need_add, add_submap, lambda s: s, submaps)

    def insert_slot(s: ActiveSubmaps2D, i: int) -> ActiveSubmaps2D:
        grid = grid_slot(s, i)
        new_grid = insert_range_data(
            grid, origin, hits, hits_mask, misses, misses_mask,
            hit_table, miss_table, samples=samples,
            insert_free_space=insert_free_space,
        )
        do = s.slot_valid[i] & ~s.finished[i]
        return s._replace(
            cells=s.cells.at[i].set(
                jnp.where(do, new_grid.cells, grid.cells)
            ),
            known_min=s.known_min.at[i].set(
                jnp.where(do, new_grid.known_min, grid.known_min)
            ),
            known_max=s.known_max.at[i].set(
                jnp.where(do, new_grid.known_max, grid.known_max)
            ),
            num_range_data=s.num_range_data.at[i].add(jnp.where(do, 1, 0)),
        )

    submaps = insert_slot(submaps, 0)
    submaps = insert_slot(submaps, 1)

    finish0 = submaps.slot_valid[0] & (
        submaps.num_range_data[0] >= 2 * num_range_data_limit
    )
    return submaps._replace(
        finished=submaps.finished.at[0].set(submaps.finished[0] | finish0)
    )


def matching_grid(submaps: ActiveSubmaps2D) -> Grid2D:
    """The submap used for scan matching: the oldest live slot
    (LocalMap uses submaps().front(), LocalMap.cpp:343-360)."""
    i = jnp.where(submaps.slot_valid[0], 0, 1)
    return grid_slot(submaps, i)


def has_matching_submap(submaps: ActiveSubmaps2D):
    return submaps.slot_valid[0] | submaps.slot_valid[1]
