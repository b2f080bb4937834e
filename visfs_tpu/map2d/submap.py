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
from .raycast import traverse_q


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

    # ------------------------------------------------------------------
    # Both slots inserted in ONE batched sweep.  Per-candidate scatters
    # and full-grid table gathers are latency-floored ops on TPU (cost
    # ~flat in element count at these sizes), so running the two slots as
    # separate insert_range_data calls paid every floor twice; batching
    # the slot axis — one traversal, one scatter into a [2, E*E] class
    # plane, one combined-table gather — roughly halves the strategy-3
    # submap insertion time.  Semantics are identical to two
    # raycast.insert_range_data calls (update-marker discipline,
    # hit-over-miss precedence, known-box growth), which
    # tests/test_map2d.py pins for the single-grid path and
    # tests/test_laser_fusion.py end-to-end.
    # ------------------------------------------------------------------
    HW = E * E
    do = submaps.slot_valid & ~submaps.finished  # [2]
    max_xy = submaps.max_xy  # [2, 2] (x, y) upper corners

    def q_of(points):
        """World [N, 2] -> per-slot continuous cell coords [2, N, 2]."""
        return jnp.stack(
            [
                (max_xy[:, None, 1] - points[None, :, 1]) / res,
                (max_xy[:, None, 0] - points[None, :, 0]) / res,
            ],
            axis=-1,
        )

    def flat_ok(idx):
        """Cell index [..., 2] -> (flat [...], in-grid [...])."""
        ok = ((idx[..., 0] >= 0) & (idx[..., 1] >= 0)
              & (idx[..., 0] < E) & (idx[..., 1] < E))
        return idx[..., 1] * E + idx[..., 0], ok

    # hits: round(q - 0.5) == floor for the cell index (cell_index())
    hq = q_of(hits)  # [2, H, 2]
    hit_idx = jnp.round(hq - 0.5).astype(jnp.int32)
    hflat, hok = flat_ok(hit_idx)
    hok = hok & hits_mask[None, :]
    cand_flat = [hflat]
    cand_ok = [hok]
    cand_hit = [jnp.ones(hok.shape, bool)]

    if insert_free_space:
        n_h = hits.shape[0]
        n_m = misses.shape[0]
        oq = q_of(origin[None, :])[:, 0]  # [2, 2]
        endq = jnp.concatenate([q_of(hits), q_of(misses)], axis=1)
        R = n_h + n_m
        q0 = jnp.broadcast_to(oq[:, None, :], (2, R, 2)).reshape(2 * R, 2)
        ridx, remit = traverse_q(q0, endq.reshape(2 * R, 2), samples)
        ridx = ridx.reshape(2, R, samples, 2)
        remit = remit.reshape(2, R, samples)
        rmask = jnp.concatenate([hits_mask, misses_mask])[None, :, None]
        rflat, rok = flat_ok(ridx)
        rok = rok & remit & rmask
        cand_flat.append(rflat.reshape(2, -1))
        cand_ok.append(rok.reshape(2, -1))
        cand_hit.append(jnp.zeros((2, R * samples), bool))

    flat = jnp.concatenate(cand_flat, axis=1)  # [2, N]
    ok = jnp.concatenate(cand_ok, axis=1) & do[:, None]
    is_hit = jnp.concatenate(cand_hit, axis=1)

    # one scatter-max of the update-class plane for BOTH slots
    gflat = flat + jnp.arange(2, dtype=jnp.int32)[:, None] * HW
    cls = jnp.where(is_hit, jnp.int32(2), jnp.int32(1)).reshape(-1)
    plane = jnp.zeros((2 * HW,), jnp.int32)
    plane = plane.at[jnp.where(ok.reshape(-1), gflat.reshape(-1),
                               2 * HW)].max(cls, mode="drop")

    # one combined-table gather: class 0 -> identity, 1 -> miss, 2 -> hit
    ident = jnp.arange(32768, dtype=jnp.uint16)
    ctab = jnp.concatenate([ident, miss_table, hit_table])
    old = submaps.cells.reshape(-1).astype(jnp.int32)
    newc = ctab[plane * 32768 + old]
    # finish_update inline (Grid2D::finishUpdate): strip update markers
    newc = jnp.where(newc >= pv.UPDATE_MARKER, newc - pv.UPDATE_MARKER,
                     newc).astype(jnp.uint16)
    new_cells = newc.reshape(2, E, E)

    # known-cells box growth per slot (dense reductions over the plane)
    upd = (plane > 0).reshape(2, E, E)
    rows = jnp.any(upd, axis=2)  # [2, E] over idx_b
    cols = jnp.any(upd, axis=1)
    big = jnp.iinfo(jnp.int32).max
    rr = jnp.arange(E)[None, :]
    bmin = jnp.min(jnp.where(rows, rr, big), axis=1)
    bmax = jnp.max(jnp.where(rows, rr, -1), axis=1)
    amin = jnp.min(jnp.where(cols, rr, big), axis=1)
    amax = jnp.max(jnp.where(cols, rr, -1), axis=1)
    any_upd = jnp.any(upd, axis=(1, 2))  # [2]
    kmin = jnp.where(
        any_upd[:, None],
        jnp.minimum(submaps.known_min, jnp.stack([amin, bmin], axis=-1)),
        submaps.known_min,
    ).astype(jnp.int32)
    kmax = jnp.where(
        any_upd[:, None],
        jnp.maximum(submaps.known_max, jnp.stack([amax, bmax], axis=-1)),
        submaps.known_max,
    ).astype(jnp.int32)

    submaps = submaps._replace(
        cells=new_cells,
        known_min=kmin,
        known_max=kmax,
        num_range_data=submaps.num_range_data + do.astype(jnp.int32),
    )

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
