"""Tests for the batched front-end: pyramids, LK optical flow, GFTT."""

import numpy as np
import jax
import jax.numpy as jnp

from visfs_tpu.ops import image as im
from visfs_tpu.ops.gftt import gftt_detect, min_eig_score
from visfs_tpu.ops.lk import LKParams, lk_track, lk_track_bidirectional


def checker_texture(h, w, seed=0):
    """Random smooth texture with strong corners."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), dtype=np.float32))
    return jnp.asarray(img[:h, :w])


def shift_image(img, dx, dy):
    """Shift by integer pixels with edge padding."""
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


class TestImageOps:
    def test_pyr_down_shape(self):
        img = checker_texture(240, 320)
        small = im.pyr_down(img)
        assert small.shape == (120, 160)

    def test_patch_extraction_center(self):
        img = jnp.arange(100.0, dtype=jnp.float32).reshape(10, 10)
        patch = im.extract_patch_bilinear(img, jnp.array([5.0, 5.0]), 3)
        np.testing.assert_allclose(patch[1, 1], img[5, 5])

    def test_patch_subpixel(self):
        img = jnp.tile(jnp.arange(10.0, dtype=jnp.float32), (10, 1))
        patch = im.extract_patch_bilinear(img, jnp.array([4.5, 5.0]), 3)
        # Linear ramp in x: value at x=4.5 is 4.5
        np.testing.assert_allclose(patch[1, 1], 4.5, atol=1e-5)

    def test_clahe_preserves_range(self):
        img = checker_texture(240, 320)
        out = im.clahe(img)
        assert out.shape == img.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0


class TestGFTT:
    def test_detects_bright_corners(self):
        # A few isolated bright squares on black
        img = np.zeros((240, 320), dtype=np.float32)
        gt = [(60, 50), (200, 120), (120, 200), (260, 60)]
        for (x, y) in gt:
            img[y : y + 10, x : x + 10] = 200.0
        res = gftt_detect(jnp.asarray(img), 20, 0.01, 20)
        found = np.asarray(res.points[res.valid])
        # every square contributes corners; check each square has a detection
        for (x, y) in gt:
            d = np.linalg.norm(found - np.array([x, y]), axis=-1)
            assert d.min() < 15.0, (x, y, found)

    def test_min_distance_spacing(self):
        img = checker_texture(240, 320, seed=3)
        res = gftt_detect(img, 50, 0.01, 24)
        pts = np.asarray(res.points[res.valid])
        if len(pts) > 1:
            d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
            d[np.arange(len(pts)), np.arange(len(pts))] = 1e9
            assert d.min() >= 24.0

    def test_existing_feature_suppression(self):
        img = checker_texture(240, 320, seed=4)
        first = gftt_detect(img, 30, 0.01, 24)
        pts = first.points
        res = gftt_detect(
            img, 30, 0.01, 24, existing_pts=pts, existing_mask=first.valid
        )
        new_pts = np.asarray(res.points[res.valid])
        old_pts = np.asarray(pts[first.valid])
        if len(new_pts) and len(old_pts):
            d = np.linalg.norm(new_pts[:, None] - old_pts[None, :], axis=-1)
            assert d.min() >= 24.0

    def test_score_ordering(self):
        img = checker_texture(240, 320, seed=5)
        res = gftt_detect(img, 40, 0.01, 20)
        s = np.asarray(res.scores[res.valid])
        assert (np.diff(s) <= 1e-4).all()


class TestLK:
    def test_tracks_integer_shift(self):
        img = checker_texture(240, 320, seed=1)
        img = im.gaussian5(img)  # smooth for better gradients
        shifted = shift_image(img, 3, 2)
        pts = jnp.asarray(
            [[100.0, 100.0], [160.0, 80.0], [220.0, 150.0], [60.0, 180.0]],
            dtype=jnp.float32,
        )
        res = lk_track(img, shifted, pts, pts, jnp.ones(4, dtype=bool),
                       LKParams(win_size=21, max_level=3))
        assert bool(res.status.all()), res.status
        flow = np.asarray(res.points - pts)
        np.testing.assert_allclose(flow[:, 0], 3.0, atol=0.25)
        np.testing.assert_allclose(flow[:, 1], 2.0, atol=0.25)

    def test_tracks_subpixel_shift(self):
        h, w = 240, 320
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img_f = lambda dx: np.sin((xx - dx) * 0.25) * np.cos(yy * 0.21) * 80 + 120

        img0 = jnp.asarray(img_f(0.0))
        img1 = jnp.asarray(img_f(1.6))
        pts = jnp.asarray([[150.0, 120.0], [90.0, 60.0]], dtype=jnp.float32)
        # max_level=1: the ~25px-period sinusoid aliases at coarser levels
        # (any tracker false-locks half a period off on periodic texture).
        res = lk_track(img0, img1, pts, pts, jnp.ones(2, dtype=bool),
                       LKParams(max_level=1))
        assert bool(res.status.all())
        flow = np.asarray(res.points - pts)
        np.testing.assert_allclose(flow[:, 0], 1.6, atol=0.15)
        np.testing.assert_allclose(flow[:, 1], 0.0, atol=0.15)

    def test_large_motion_needs_pyramid(self):
        img = im.gaussian5(checker_texture(240, 320, seed=2))
        shifted = shift_image(img, 17, -9)
        pts = jnp.asarray([[120.0, 120.0], [200.0, 100.0]], dtype=jnp.float32)
        res = lk_track(img, shifted, pts, pts, jnp.ones(2, dtype=bool),
                       LKParams(max_level=3))
        assert bool(res.status.all())
        flow = np.asarray(res.points - pts)
        np.testing.assert_allclose(flow[:, 0], 17.0, atol=0.5)
        np.testing.assert_allclose(flow[:, 1], -9.0, atol=0.5)

    def test_initial_guess_helps(self):
        """Projected-guess seeding (OPTFLOW_USE_INITIAL_FLOW path)."""
        img = im.gaussian5(checker_texture(240, 320, seed=6))
        shifted = shift_image(img, 30, 0)
        pts = jnp.asarray([[100.0, 120.0]], dtype=jnp.float32)
        guess = pts + jnp.asarray([[28.0, 0.0]])
        res = lk_track(img, shifted, pts, guess, jnp.ones(1, dtype=bool))
        assert bool(res.status.all())
        np.testing.assert_allclose(
            np.asarray(res.points[0]), [130.0, 120.0], atol=0.5
        )

    def test_flat_region_fails_min_eig(self):
        img = jnp.full((240, 320), 100.0, dtype=jnp.float32)
        pts = jnp.asarray([[100.0, 100.0]], dtype=jnp.float32)
        res = lk_track(img, img, pts, pts, jnp.ones(1, dtype=bool))
        assert not bool(res.status[0])

    def test_bidirectional_consistency_gate(self):
        img = im.gaussian5(checker_texture(240, 320, seed=7))
        shifted = shift_image(img, 4, 1)
        pts = jnp.asarray(
            [[80.0, 90.0], [150.0, 140.0], [240.0, 60.0]], dtype=jnp.float32
        )
        res = lk_track_bidirectional(
            img, shifted, pts, pts, jnp.ones(3, dtype=bool), fb_threshold=1.5
        )
        assert bool(res.status.all())

    def test_invalid_mask_respected(self):
        img = im.gaussian5(checker_texture(240, 320, seed=8))
        pts = jnp.asarray([[80.0, 90.0], [150.0, 140.0]], dtype=jnp.float32)
        mask = jnp.asarray([True, False])
        res = lk_track(img, img, pts, pts, mask)
        assert bool(res.status[0])
        assert not bool(res.status[1])


class TestSimToLK:
    def test_track_simulated_frames(self):
        from visfs_tpu.io.sim import generate_sequence
        from visfs_tpu.ops.gftt import gftt_detect

        seq = generate_sequence(n_frames=3, n_points=300, seed=9)
        img0 = jnp.asarray(seq.left[0])
        img1 = jnp.asarray(seq.left[1])
        det = gftt_detect(img0, 80, 0.01, 16)
        res = lk_track_bidirectional(
            img0, img1, det.points, det.points, det.valid
        )
        n_det = int(det.valid.sum())
        n_trk = int(res.status.sum())
        assert n_det >= 40, n_det
        assert n_trk >= 0.7 * n_det, (n_det, n_trk)
