"""Map subsystem acceptance tests — ports of the reference's four Boost.Test
suites (tests/Map/2d/UT4*, SURVEY.md §4) plus static-shape specifics."""

import numpy as np
import jax.numpy as jnp
import pytest

from visfs_tpu.map2d import probability_values as pv
from visfs_tpu.map2d import grid2d, raycast, submap


# ---------------------------------------------------------------------------
# UT4ProbabilityValues
# ---------------------------------------------------------------------------

class TestProbabilityValues:
    def test_odds_conversions(self):
        for p in (pv.MIN_PROBABILITY, pv.MAX_PROBABILITY, 0.5):
            assert pv.probability_from_odds(pv.odds(p)) == pytest.approx(p)

    def test_odds_conversions_correspondence_cost(self):
        for c in (pv.MIN_CORRESPONDENCE_COST, pv.MAX_CORRESPONDENCE_COST, 0.5):
            out = pv.probability_to_correspondence_cost(
                pv.probability_from_odds(
                    pv.odds(pv.correspondence_cost_to_probability(c))
                )
            )
            assert out == pytest.approx(c)

    def test_value_conversion_roundtrip(self):
        i = np.arange(32768)
        a = pv.probability_value_to_correspondence_cost_value(
            pv.correspondence_cost_value_to_probability_value(i)
        )
        np.testing.assert_array_equal(a, i)
        b = pv.correspondence_cost_value_to_probability_value(
            pv.probability_value_to_correspondence_cost_value(i)
        )
        np.testing.assert_array_equal(b, i)

    def test_value_conversion_roundtrip_with_marker(self):
        i = np.arange(1, 32768) + pv.UPDATE_MARKER
        a = pv.probability_value_to_correspondence_cost_value(
            pv.correspondence_cost_value_to_probability_value(i)
        )
        np.testing.assert_array_equal(a, i)

    def test_lookup_table_symmetry(self):
        """valueToProbability(i) == valueToCorrespondenceCost(i) for i>0."""
        p = pv.value_to_probability_table()[:32768]
        c = pv.value_to_correspondence_cost_table()[:32768]
        assert p[0] == pytest.approx(1.0 - c[0])
        np.testing.assert_allclose(p[1:], c[1:], rtol=1e-6)

    def test_cell_update(self):
        prob_table = pv.compute_lookup_table_to_apply_odds(pv.odds(0.9))
        cost_table = pv.compute_lookup_table_to_apply_correspondence_cost_odds(
            pv.odds(0.9)
        )
        # unknown cell
        p_post = pv.value_to_probability(prob_table[0])
        c_post = pv.value_to_correspondence_cost(cost_table[0])
        assert p_post == pytest.approx(1.0 - c_post)
        # sweep of probabilities (vectorized version of the 5000-point loop)
        n = 5000
        p = (np.arange(n) / n) * (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY) \
            + pv.MIN_PROBABILITY
        pg = pv.probability_to_value(p)
        cg = pv.correspondence_cost_to_value(
            pv.probability_to_correspondence_cost(p)
        )
        np.testing.assert_array_equal(pg, 32768 - cg)
        p_post = pv.value_to_probability(prob_table[pg])
        c_post = pv.value_to_correspondence_cost(cost_table[cg])
        np.testing.assert_allclose(p_post, 1.0 - c_post, rtol=5e-5)

    def test_multiple_cell_update(self):
        prob_table = pv.compute_lookup_table_to_apply_odds(pv.odds(0.55))
        cost_table = pv.compute_lookup_table_to_apply_correspondence_cost_odds(
            pv.odds(0.55)
        )
        n = 500
        p = (np.arange(n) / n) * (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY) \
            + pv.MIN_PROBABILITY
        pg = pv.probability_to_value(p) + pv.UPDATE_MARKER
        cg = pv.correspondence_cost_to_value(
            pv.probability_to_correspondence_cost(p)
        ) + pv.UPDATE_MARKER
        for _ in range(20):
            pg = prob_table[pg - pv.UPDATE_MARKER].astype(np.int64)
            cg = cost_table[cg - pv.UPDATE_MARKER].astype(np.int64)
        p_post = pv.value_to_probability(pg)
        c_post = pv.value_to_correspondence_cost(cg)
        np.testing.assert_allclose(p_post, 1.0 - c_post, rtol=5e-7)

    def test_equality_of_odds_tables(self):
        prob_table = pv.compute_lookup_table_to_apply_odds(0.3)
        cost_table = pv.compute_lookup_table_to_apply_correspondence_cost_odds(0.3)
        i = np.arange(32768)
        lhs = prob_table[i]
        rhs = pv.correspondence_cost_value_to_probability_value(
            cost_table[pv.probability_value_to_correspondence_cost_value(i)]
        )
        np.testing.assert_array_equal(lhs, rhs)


# ---------------------------------------------------------------------------
# UT4ProbabilityGrid
# ---------------------------------------------------------------------------

def cost_table():
    return jnp.asarray(pv.value_to_correspondence_cost_table())


class TestProbabilityGrid:
    def test_apply_odds_semantics(self):
        """Port of UT4ProbabilityGrid ApplyOdds (single update per sweep)."""
        limits = grid2d.make_limits(1.0, 1.0, 1.0, 2, 2)
        grid = grid2d.init_grid(limits)
        ct = cost_table()
        for idx in ([0, 0], [0, 1], [1, 0], [1, 1]):
            i = jnp.asarray(idx)
            assert bool(grid2d.contains(limits, i))
            assert not bool(grid2d.is_known(grid, i))

        t9 = jnp.asarray(
            pv.compute_lookup_table_to_apply_correspondence_cost_odds(
                pv.odds(0.9)
            )
        )
        t1 = jnp.asarray(
            pv.compute_lookup_table_to_apply_correspondence_cost_odds(
                pv.odds(0.1)
            )
        )
        t42 = jnp.asarray(
            pv.compute_lookup_table_to_apply_correspondence_cost_odds(
                pv.odds(0.42)
            )
        )

        i10 = jnp.asarray([1, 0])
        grid = grid2d.set_probability(grid, i10[None, :], np.array([0.5]))
        assert float(grid2d.probability(grid, i10, ct)) == pytest.approx(0.5, abs=1e-4)
        grid, ok = grid2d.apply_lookup_table(grid, i10, t9)
        assert bool(ok)
        grid = grid2d.finish_update(grid)
        assert float(grid2d.probability(grid, i10, ct)) > 0.5

        i01 = jnp.asarray([0, 1])
        grid = grid2d.set_probability(grid, i01[None, :], np.array([0.5]))
        grid, _ = grid2d.apply_lookup_table(grid, i01, t1)
        grid = grid2d.finish_update(grid)
        assert float(grid2d.probability(grid, i01, ct)) < 0.5

        # odds on an unknown cell
        i11 = jnp.asarray([1, 1])
        grid, _ = grid2d.apply_lookup_table(grid, i11, t42)
        assert float(grid2d.probability(grid, i11, ct)) == pytest.approx(
            0.42, abs=1e-2
        )
        # further updates ignored until finish_update
        grid, applied = grid2d.apply_lookup_table(grid, i11, t9)
        assert not bool(applied)
        assert float(grid2d.probability(grid, i11, ct)) == pytest.approx(
            0.42, abs=1e-2
        )
        grid = grid2d.finish_update(grid)
        grid, applied = grid2d.apply_lookup_table(grid, i11, t9)
        assert bool(applied)
        assert float(grid2d.probability(grid, i11, ct)) > 0.42

    def test_get_probability(self):
        limits = grid2d.make_limits(1.0, 1.0, 2.0, 2, 2)
        grid = grid2d.init_grid(limits)
        ct = cost_table()
        idx = grid2d.cell_index(limits, jnp.asarray([-0.5, 0.5]))
        grid = grid2d.set_probability(
            grid, idx[None, :], np.array([pv.MAX_PROBABILITY])
        )
        assert float(grid2d.probability(grid, idx, ct)) == pytest.approx(
            pv.MAX_PROBABILITY, abs=1e-4
        )
        for pt in ([-0.5, 1.5], [0.5, 0.5], [0.5, 1.5]):
            i = grid2d.cell_index(limits, jnp.asarray(pt))
            assert bool(grid2d.contains(limits, i))
            assert not bool(grid2d.is_known(grid, i))

    def test_get_cell_index(self):
        """Port of UT4ProbabilityGrid GetCellIndex — exact conventions."""
        limits = grid2d.make_limits(2.0, 8.0, 14.0, 14, 8)
        cases = [
            ((7.0, 13.0), (0, 0)),
            ((7.0, -13.0), (13, 0)),
            ((-7.0, 13.0), (0, 7)),
            ((-7.0, -13.0), (13, 7)),
            ((0.5, 0.5), (6, 3)),
            ((1.5, 1.5), (6, 3)),
            ((0.5, -0.5), (7, 3)),
            ((-0.5, 0.5), (6, 4)),
            ((-0.5, -0.5), (7, 4)),
        ]
        for pt, expect in cases:
            idx = grid2d.cell_index(limits, jnp.asarray(pt))
            assert tuple(np.asarray(idx)) == expect, (pt, np.asarray(idx))

    def test_correct_cropping(self):
        rng = np.random.default_rng(0)
        limits = grid2d.make_limits(0.05, 10.0, 10.0, 400, 400)
        grid = grid2d.init_grid(limits)
        aa, bb = np.meshgrid(np.arange(100, 300), np.arange(100, 300),
                             indexing="ij")
        idx = jnp.asarray(np.stack([aa.ravel(), bb.ravel()], -1))
        probs = rng.uniform(pv.MIN_PROBABILITY, pv.MAX_PROBABILITY,
                            idx.shape[0])
        grid = grid2d.set_probability(grid, idx, probs)
        offset, size = grid2d.compute_cropped_limits(grid)
        np.testing.assert_array_equal(np.asarray(offset), [100, 100])
        np.testing.assert_array_equal(np.asarray(size), [200, 200])

    def test_grid_to_image_smoke(self):
        limits = grid2d.make_limits(0.05, 1.0, 1.0, 32, 32)
        grid = grid2d.init_grid(limits)
        img = grid2d.grid_to_image(grid, cost_table())
        assert img.shape == (32, 32)
        assert img.dtype == jnp.uint8


# ---------------------------------------------------------------------------
# UT4RayToPixelMask (spirit port: the sampled cell set on unambiguous rays)
# ---------------------------------------------------------------------------

class TestRayCells:
    def setup_method(self, _):
        self.limits = grid2d.make_limits(1.0, 16.0, 16.0, 32, 32)

    def cells_of(self, begin, end, samples=128):
        idx, valid = raycast.ray_cells(
            self.limits, jnp.asarray([begin]), jnp.asarray([end]), samples
        )
        cells = {
            tuple(c) for c, v in zip(np.asarray(idx[0]), np.asarray(valid[0]))
            if v
        }
        return cells

    def test_single_cell(self):
        c = self.cells_of([0.5, 0.5], [0.9, 0.9])
        assert len(c) == 1

    def test_axis_aligned(self):
        c = self.cells_of([0.5, 0.5], [0.5, 8.5])
        a0 = int(np.asarray(grid2d.cell_index(self.limits,
                                              jnp.asarray([0.5, 0.5])))[1])
        # 9 cells in a straight vertical line, same second coordinate
        assert len(c) == 9
        assert all(cc[1] == a0 for cc in c)

    def test_diagonal(self):
        c = self.cells_of([0.5, 0.5], [8.5, 8.5])
        # perfect diagonal: at least the 9 diagonal cells
        diag = {
            tuple(np.asarray(grid2d.cell_index(
                self.limits, jnp.asarray([0.5 + k, 0.5 + k])
            )))
            for k in range(9)
        }
        assert diag.issubset(c)

    def test_full_coverage_vs_dense_sampling(self):
        """The fixed sample budget must cover every cell a dense walk finds
        for in-grid rays of moderate length."""
        rng = np.random.default_rng(3)
        for _ in range(10):
            begin = rng.uniform(2, 14, 2)
            end = rng.uniform(2, 14, 2)
            coarse = self.cells_of(begin, end, samples=128)
            dense = self.cells_of(begin, end, samples=4096)
            assert coarse == dense, (begin, end)


# ---------------------------------------------------------------------------
# Scan insertion + UT4Submap2D
# ---------------------------------------------------------------------------

class TestInsertion:
    def test_hits_become_occupied_free_space_cleared(self):
        limits = grid2d.make_limits(0.1, 3.2, 3.2, 64, 64)
        grid = grid2d.init_grid(limits)
        hit_t, miss_t = pv.hit_miss_tables(0.55, 0.49)
        ct = cost_table()
        origin = jnp.asarray([0.0, 0.0])
        hits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [-1.5, -1.5]])
        mask = jnp.ones(3, bool)
        grid = raycast.insert_range_data(
            grid, origin, hits, mask, jnp.zeros((1, 2)), jnp.zeros(1, bool),
            hit_t, miss_t,
        )
        for h in np.asarray(hits):
            idx = grid2d.cell_index(limits, jnp.asarray(h))
            assert float(grid2d.probability(grid, idx, ct)) > 0.5
        # mid-ray cells are free-ish
        mid = grid2d.cell_index(limits, jnp.asarray([1.0, 0.0]))
        assert float(grid2d.probability(grid, mid, ct)) < 0.5

    def test_repeated_hits_accumulate(self):
        limits = grid2d.make_limits(0.1, 3.2, 3.2, 64, 64)
        grid = grid2d.init_grid(limits)
        hit_t, miss_t = pv.hit_miss_tables(0.55, 0.49)
        ct = cost_table()
        origin = jnp.asarray([0.0, 0.0])
        hits = jnp.asarray([[2.0, 0.0]])
        idx = grid2d.cell_index(limits, jnp.asarray([2.0, 0.0]))
        last = 0.5
        for _ in range(5):
            grid = raycast.insert_range_data(
                grid, origin, hits, jnp.ones(1, bool),
                jnp.zeros((1, 2)), jnp.zeros(1, bool), hit_t, miss_t,
            )
            p = float(grid2d.probability(grid, idx, ct))
            assert p > last  # monotone increase toward certainty
            last = p

    def test_duplicate_hits_single_update_per_sweep(self):
        """Two identical hit points in one sweep update the cell once."""
        limits = grid2d.make_limits(0.1, 3.2, 3.2, 64, 64)
        hit_t, miss_t = pv.hit_miss_tables(0.55, 0.49)
        ct = cost_table()
        origin = jnp.asarray([0.0, 0.0])
        idx = grid2d.cell_index(limits, jnp.asarray([2.0, 0.0]))

        g1 = raycast.insert_range_data(
            grid2d.init_grid(limits), origin, jnp.asarray([[2.0, 0.0]]),
            jnp.ones(1, bool), jnp.zeros((1, 2)), jnp.zeros(1, bool),
            hit_t, miss_t,
        )
        g2 = raycast.insert_range_data(
            grid2d.init_grid(limits), origin,
            jnp.asarray([[2.0, 0.0], [2.0, 0.0]]), jnp.ones(2, bool),
            jnp.zeros((1, 2)), jnp.zeros(1, bool), hit_t, miss_t,
        )
        assert float(grid2d.probability(g1, idx, ct)) == pytest.approx(
            float(grid2d.probability(g2, idx, ct))
        )

    def test_missing_echo_rays_mark_free(self):
        limits = grid2d.make_limits(0.1, 3.2, 3.2, 64, 64)
        grid = grid2d.init_grid(limits)
        hit_t, miss_t = pv.hit_miss_tables(0.55, 0.49)
        ct = cost_table()
        origin = jnp.asarray([0.0, 0.0])
        grid = raycast.insert_range_data(
            grid, origin, jnp.zeros((1, 2)), jnp.zeros(1, bool),
            jnp.asarray([[2.5, 0.0]]), jnp.ones(1, bool), hit_t, miss_t,
        )
        mid = grid2d.cell_index(limits, jnp.asarray([1.2, 0.0]))
        assert float(grid2d.probability(grid, mid, ct)) < 0.5


class TestActiveSubmaps:
    def test_rotation_invariants(self):
        """Port of UT4Submap2D TheRightNumberOfRangeDataAreInserted."""
        k = 10
        s = submap.init_active_submaps(0.05, extent_cells=32)
        hit_t, miss_t = pv.hit_miss_tables(0.55, 0.49)
        origin = jnp.zeros(2)
        no_hits = jnp.zeros((1, 2))
        no_mask = jnp.zeros(1, bool)

        finished_counts = []
        for i in range(100):
            prev_finished = bool(s.finished[0]) and bool(s.slot_valid[0])
            s = submap.insert_range_data_active(
                s, origin, no_hits, no_mask, no_hits, no_mask,
                hit_t, miss_t, num_range_data_limit=k,
            )
            # at most 2 submaps, exactly one unfinished
            live = np.asarray(s.slot_valid)
            fin = np.asarray(s.finished)
            assert live.sum() <= 2
            unfinished = (live & ~fin).sum()
            assert unfinished >= 1
            if live.sum() == 2:
                # the older submap has at least k scans
                assert int(s.num_range_data[0]) >= k
            # a finished submap has exactly 2k scans
            if live[0] and fin[0]:
                finished_counts.append(int(s.num_range_data[0]))

        assert finished_counts and all(c == 2 * k for c in finished_counts)

    def test_matching_grid_is_oldest(self):
        k = 3
        s = submap.init_active_submaps(0.05, extent_cells=32)
        hit_t, miss_t = pv.hit_miss_tables(0.55, 0.49)
        for i in range(2 * k):
            s = submap.insert_range_data_active(
                s, jnp.zeros(2), jnp.zeros((1, 2)), jnp.zeros(1, bool),
                jnp.zeros((1, 2)), jnp.zeros(1, bool), hit_t, miss_t,
                num_range_data_limit=k,
            )
        assert bool(submap.has_matching_submap(s))
        g = submap.matching_grid(s)
        assert g.cells.shape == (32, 32)
