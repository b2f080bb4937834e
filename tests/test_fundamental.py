"""Fundamental-matrix RANSAC culling tests."""

import numpy as np
import jax
import jax.numpy as jnp

from visfs_tpu.ops.fundamental import cull_with_fundamental, sampson_distance


def make_scene(rng, n=120, outliers=20):
    """Two views of a 3D scene with known epipolar geometry + outliers."""
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(4, 10, n)], -1,
    )
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    # camera 2: translated + slightly rotated
    t = np.array([0.3, 0.05, 0.1])
    ang = 0.05
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]]
    )

    def proj(P):
        return np.stack([P[:, 0] / P[:, 2] * fx + cx,
                         P[:, 1] / P[:, 2] * fy + cy], -1)

    p1 = proj(pts)
    p2 = proj((R @ pts.T).T + t)
    gt_out = np.zeros(n, bool)
    bad = rng.choice(n, size=outliers, replace=False)
    p2[bad] += rng.uniform(15, 60, size=(outliers, 2))
    gt_out[bad] = True
    return (jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
            gt_out)


def test_separates_outliers(rng):
    p1, p2, gt_out = make_scene(rng)
    mask = jnp.ones(p1.shape[0], bool)
    inl, F = cull_with_fundamental(p1, p2, mask, jax.random.PRNGKey(0),
                                   threshold=1.5, hypotheses=64)
    inl = np.asarray(inl)
    # all gross outliers culled; most inliers kept
    assert not inl[gt_out].any()
    assert inl[~gt_out].mean() > 0.9


def test_epipolar_constraint_holds(rng):
    p1, p2, gt_out = make_scene(rng, outliers=0)
    mask = jnp.ones(p1.shape[0], bool)
    inl, F = cull_with_fundamental(p1, p2, mask, jax.random.PRNGKey(1),
                                   threshold=1.0)
    d = np.asarray(sampson_distance(F, p1, p2))
    assert np.median(d) < 0.5


def test_mask_respected(rng):
    p1, p2, _ = make_scene(rng, outliers=0)
    mask = jnp.zeros(p1.shape[0], bool).at[:60].set(True)
    inl, _ = cull_with_fundamental(p1, p2, mask, jax.random.PRNGKey(2))
    assert not np.asarray(inl)[60:].any()


def test_e2e_with_fundamental_culling(rng):
    """Full VO with FlowBack off + F-matrix culling on (the reference's
    alternative outlier path)."""
    from visfs_tpu.io.sim import ate_rmse, generate_sequence
    from visfs_tpu.slam.system import System

    seq = generate_sequence(n_frames=8, n_points=400, seed=51,
                            motion="forward")
    cam = seq.camera
    sys_ = System({
        "Tracker/MaxFeatures": 150,
        "Tracker/MinDistance": 16,
        "Tracker/FlowBack": False,
        "Tracker/CullByFundationMatrix": True,
        "Tracker/FundationPixelError": 2.0,
    })
    sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
              float(cam.baseline), width=cam.width, height=cam.height)
    outs = sys_.run_sequence(seq.stamps, seq.left, seq.right)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    assert ate_rmse(est, seq.poses) < 0.02
