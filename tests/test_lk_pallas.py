"""Pallas LK kernel vs the pure-jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from visfs_tpu.ops import image as im
from visfs_tpu.ops.lk import LKParams, _track_level
from visfs_tpu.ops.image import scharr_gradients
from visfs_tpu.ops.pallas.lk_kernel import lk_level_pallas


def texture(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), dtype=np.float32))
    return im.gaussian5(jnp.asarray(img[:h, :w]))


def test_pallas_level_matches_jnp_reference():
    params = LKParams(win_size=11, iterations=20, eps=0.01)
    img0 = texture(120, 160, seed=5)
    img1 = jnp.roll(jnp.roll(img0, 2, axis=0), 3, axis=1)
    pad = params.win_size // 2 + 2
    imf = jnp.pad(img0, pad, mode="edge")
    imt = jnp.pad(img1, pad, mode="edge")
    gx, gy = scharr_gradients(imf)

    pts = jnp.asarray(
        [[40.0, 30.0], [80.0, 60.0], [120.0, 90.0], [60.0, 100.0]],
        jnp.float32,
    ) + pad
    flow0 = jnp.zeros((4, 2), jnp.float32)
    active = jnp.ones(4, bool)

    flow_j, ok_j, eig_j = _track_level(imf, imt, gx, gy, pts, flow0, active,
                                       params)
    flow_p, ok_p, eig_p = lk_level_pallas(
        imf, imt, gx, gy, pts, flow0, active.astype(jnp.float32),
        win=params.win_size, iterations=params.iterations, eps=params.eps,
        min_eig_threshold=params.min_eig_threshold, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(flow_p), np.asarray(flow_j),
                               atol=0.05)
    np.testing.assert_array_equal(np.asarray(ok_p > 0), np.asarray(ok_j))
    np.testing.assert_allclose(np.asarray(eig_p), np.asarray(eig_j),
                               rtol=1e-3)
    # and the flow is the known shift (x=3, y=2)
    np.testing.assert_allclose(np.asarray(flow_p[:, 0]), 3.0, atol=0.3)
    np.testing.assert_allclose(np.asarray(flow_p[:, 1]), 2.0, atol=0.3)


def test_pallas_inactive_features_pass_through():
    params = LKParams(win_size=11, iterations=10)
    img = texture(100, 120, seed=6)
    pad = params.win_size // 2 + 2
    imf = jnp.pad(img, pad, mode="edge")
    gx, gy = scharr_gradients(imf)
    pts = jnp.asarray([[50.0, 50.0], [70.0, 40.0]], jnp.float32) + pad
    flow0 = jnp.asarray([[1.5, -0.5], [0.3, 0.2]], jnp.float32)
    active = jnp.asarray([0.0, 1.0], jnp.float32)
    flow, ok, _ = lk_level_pallas(
        imf, imf, gx, gy, pts, flow0, active,
        win=params.win_size, iterations=params.iterations, eps=params.eps,
        min_eig_threshold=params.min_eig_threshold, interpret=True,
    )
    # inactive feature untouched
    np.testing.assert_array_equal(np.asarray(flow[0]), np.asarray(flow0[0]))


def test_xcorr_iteration_matches_direct():
    """The correlation-form iteration (LKParams.iter_mode='xcorr') equals
    the direct patch-sampling form up to float reassociation, and the
    Pallas loop kernel (interpret mode here) matches the jnp xcorr path."""
    img0 = texture(120, 160, seed=9)
    img1 = jnp.roll(jnp.roll(img0, 1, axis=0), 2, axis=1)
    base = dict(win_size=11, iterations=20, eps=0.01)
    pad = 11 // 2 + 2
    imf = jnp.pad(img0, pad, mode="edge")
    imt = jnp.pad(img1, pad, mode="edge")
    gx, gy = scharr_gradients(imf)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(20, 90, size=(16, 2)), jnp.float32) + pad
    flow0 = jnp.zeros((16, 2), jnp.float32)
    active = jnp.ones(16, bool)

    outs = {}
    for name, p in [
        ("direct", LKParams(**base, iter_mode="direct")),
        ("xcorr-jnp", LKParams(**base, iter_mode="xcorr",
                               backend="jnp-xcorr")),
        ("xcorr-pallas", LKParams(**base, iter_mode="xcorr",
                                  backend="pallas-xcorr")),
    ]:
        outs[name] = _track_level(imf, imt, gx, gy, pts, flow0, active, p)

    f_direct, ok_d, eig_d = outs["direct"]
    for name in ("xcorr-jnp", "xcorr-pallas"):
        f, ok, eig = outs[name]
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_direct),
                                   atol=0.02, err_msg=name)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_d))
        np.testing.assert_allclose(np.asarray(eig), np.asarray(eig_d),
                                   rtol=1e-4)
    # the two xcorr backends are the same formulation — tighter agreement
    np.testing.assert_allclose(np.asarray(outs["xcorr-pallas"][0]),
                               np.asarray(outs["xcorr-jnp"][0]), atol=2e-3)
