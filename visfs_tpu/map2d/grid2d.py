"""2D occupancy grid with cartographer-style geometry, static-shape arrays.

Mirrors MapLimits / Grid2D / ProbabilityGrid (corelib/include/Map/2d/
MapLimits.h, Grid2d.h, ProbabilityGrid.h):

  * world->cell: idx_a = lround((max_y - p.y)/res - 0.5),
                 idx_b = lround((max_x - p.x)/res - 0.5)  (flipped axes,
                 MapLimits.h:153-175); cells stored as a [num_y, num_x]
                 array indexed [idx_b, idx_a] to match the reference's flat
                 index numX * idx.y() + idx.x() (Grid2d.h:92-94);
  * uint16 cells with the probability_values codec;
  * the update-marker single-update-per-sweep semantics are enforced by the
    vectorized inserter (raycast.py) rather than a mutable marker bit, but
    ``finish_update`` clears markers identically for API parity;
  * dynamic growth (Grid2d.cpp:34-65) is replaced by a pre-allocated static
    extent: the grid is sized up-front (init_grid ``cells`` argument) and
    out-of-range updates are dropped — the TPU-native answer to
    data-dependent reallocation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import probability_values as pv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MapLimits:
    """Grid geometry; cell counts are static pytree metadata so grid shapes
    stay compile-time constants under jit."""

    resolution: jnp.ndarray  # scalar f32
    max_x: jnp.ndarray  # upper corner x (scalar)
    max_y: jnp.ndarray  # upper corner y
    num_x: int = dataclasses.field(metadata=dict(static=True))
    num_y: int = dataclasses.field(metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


class Grid2D(NamedTuple):
    limits: MapLimits
    cells: jnp.ndarray  # [num_y, num_x] uint16 correspondence-cost values
    # known-cells bounding box (min_a, min_b, max_a, max_b), inclusive;
    # empty iff min > max.
    known_min: jnp.ndarray  # [2] int32
    known_max: jnp.ndarray  # [2] int32


def make_limits(resolution, max_x, max_y, num_x: int, num_y: int) -> MapLimits:
    return MapLimits(
        resolution=jnp.asarray(resolution, jnp.float32),
        max_x=jnp.asarray(max_x, jnp.float32),
        max_y=jnp.asarray(max_y, jnp.float32),
        num_x=int(num_x),
        num_y=int(num_y),
    )


def cell_index(limits: MapLimits, points):
    """World [..., 2] -> cell index [..., 2] = (idx_a, idx_b).

    idx_a counts from max_y down (compared against num_x in ``contains``),
    idx_b counts from max_x down — exactly MapLimits::getCellIndex.
    """
    a = jnp.round(
        (limits.max_y - points[..., 1]) / limits.resolution - 0.5
    ).astype(jnp.int32)
    b = jnp.round(
        (limits.max_x - points[..., 0]) / limits.resolution - 0.5
    ).astype(jnp.int32)
    return jnp.stack([a, b], axis=-1)


def cell_center(limits: MapLimits, index):
    """Cell index [..., 2] -> world center (MapLimits::getCellCenter)."""
    x = limits.max_x - limits.resolution * (index[..., 1] + 0.5)
    y = limits.max_y - limits.resolution * (index[..., 0] + 0.5)
    return jnp.stack([x, y], axis=-1)


def contains(limits: MapLimits, index):
    """MapLimits::contains — idx_a < num_x, idx_b < num_y (sic, flipped)."""
    return (
        (index[..., 0] >= 0) & (index[..., 1] >= 0)
        & (index[..., 0] < limits.num_x) & (index[..., 1] < limits.num_y)
    )


def init_grid(limits: MapLimits) -> Grid2D:
    return Grid2D(
        limits=limits,
        cells=jnp.full((limits.num_y, limits.num_x), pv.UNKNOWN_VALUE,
                       jnp.uint16),
        known_min=jnp.array([limits.num_x, limits.num_y], jnp.int32),
        known_max=jnp.array([-1, -1], jnp.int32),
    )


def _cell_value(grid: Grid2D, index):
    """Gather raw uint16 values at [..., 2] indices (row = idx_b, col = idx_a)."""
    a = jnp.clip(index[..., 0], 0, grid.limits.num_x - 1)
    b = jnp.clip(index[..., 1], 0, grid.limits.num_y - 1)
    return grid.cells[b, a]


def correspondence_cost(grid: Grid2D, index, cost_table):
    """Grid2D::getCorrespondenceCost with out-of-grid -> max cost."""
    raw = _cell_value(grid, index).astype(jnp.int32)
    cost = cost_table[raw]
    return jnp.where(
        contains(grid.limits, index), cost, pv.MAX_CORRESPONDENCE_COST
    )


def probability(grid: Grid2D, index, cost_table):
    """ProbabilityGrid::getProbability (out-of-grid -> kMinProbability)."""
    cost = correspondence_cost(grid, index, cost_table)
    p = 1.0 - cost
    return jnp.where(contains(grid.limits, index), p, pv.MIN_PROBABILITY)


def is_known(grid: Grid2D, index):
    return contains(grid.limits, index) & (
        _cell_value(grid, index) != pv.UNKNOWN_VALUE
    )


def set_probability(grid: Grid2D, index, prob):
    """ProbabilityGrid::setProbability at [..., 2] indices (batched)."""
    import numpy as np

    value = jnp.asarray(
        pv.correspondence_cost_to_value(
            pv.probability_to_correspondence_cost(np.asarray(prob))
        ),
        jnp.uint16,
    )
    a = index[..., 0]
    b = index[..., 1]
    cells = grid.cells.at[b, a].set(value, mode="drop")
    return _extend_known(grid._replace(cells=cells), index)


def _extend_known(grid: Grid2D, index):
    inb = contains(grid.limits, index)
    big = jnp.iinfo(jnp.int32).max
    idx_min = jnp.min(
        jnp.where(inb[..., None], index, big).reshape(-1, 2), axis=0
    )
    idx_max = jnp.max(
        jnp.where(inb[..., None], index, -1).reshape(-1, 2), axis=0
    )
    return grid._replace(
        known_min=jnp.minimum(grid.known_min, idx_min),
        known_max=jnp.maximum(grid.known_max, idx_max),
    )


def apply_lookup_table(grid: Grid2D, index, table):
    """ProbabilityGrid::applyLookUpTable for a single [2] cell index.

    Honors the update-marker discipline: a cell already >= kUpdateMarker is
    not updated again until finish_update (ProbabilityGrid.cpp:142-153).
    Returns (grid, applied: bool).
    """
    a, b = index[0], index[1]
    inb = contains(grid.limits, index)
    old = grid.cells[b, a]
    fresh = inb & (old < pv.UPDATE_MARKER)
    new = jnp.asarray(table)[old.astype(jnp.int32)]
    cells = grid.cells.at[b, a].set(jnp.where(fresh, new, old))
    grid = _extend_known(grid._replace(cells=cells), index[None, :])
    return grid, fresh


def finish_update(grid: Grid2D) -> Grid2D:
    """Clear any update markers (Grid2D::finishUpdate)."""
    cells = jnp.where(
        grid.cells >= pv.UPDATE_MARKER, grid.cells - pv.UPDATE_MARKER,
        grid.cells,
    ).astype(jnp.uint16)
    return grid._replace(cells=cells)


def compute_cropped_limits(grid: Grid2D):
    """(offset [2], (num_a, num_b)) of the known-cells box
    (Grid2D::computeCroppedLimits); empty grid -> ((0,0), (1,1))."""
    empty = jnp.any(grid.known_max < grid.known_min)
    offset = jnp.where(empty, jnp.zeros(2, jnp.int32), grid.known_min)
    size = jnp.where(
        empty, jnp.ones(2, jnp.int32), grid.known_max - grid.known_min + 1
    )
    return offset, size


def grid_to_image(grid: Grid2D, cost_table):
    """Render correspondence costs to a [num_y, num_x] uint8 image.

    The reference's grid2Image has a stride bug (indexes i*rows+j,
    Grid2d.cpp:67-76, SURVEY known quirks); this is the intended row-major
    version.
    """
    cost = cost_table[grid.cells.astype(jnp.int32)]
    img = jnp.ceil(cost * 255.0)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)
