"""Micro-benchmarks for the LK front-end pieces on the live backend.

Measurement through the remote dev tunnel: `block_until_ready` does not
reliably wait for device completion, so every benchmark CHAINS the
computation (each call consumes the previous call's output) and fetches one
scalar at the end — wall time then covers the whole dependent chain.  The
one-off fetch latency (~30 ms through the tunnel) is measured separately
and subtracted.

Usage: python tools/lk_microbench.py [--what all|step|lk|xcorr] [--reps 100]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, carry, reps, fetch):
    """Time `reps` chained calls; returns ms/call (fetch latency removed)."""
    import jax

    # warm (compile) + measure fetch latency
    c = step_fn(carry)
    np.asarray(fetch(c))
    t0 = time.perf_counter()
    np.asarray(fetch(c))
    t_fetch = time.perf_counter() - t0

    samples = []
    for _ in range(3):
        c = carry
        t0 = time.perf_counter()
        for _ in range(reps):
            c = step_fn(c)
        np.asarray(fetch(c))
        samples.append((time.perf_counter() - t0 - t_fetch) / reps * 1e3)
    return float(np.median(samples))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all")
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    print("backend:", jax.default_backend())

    N, win = 240, 21
    key = jax.random.PRNGKey(0)

    if args.what in ("all", "xcorr"):
        from functools import partial

        from visfs_tpu.ops.lk import _xcorr_maps

        for margin in (10, 4):
            R = win + 1 + 2 * margin
            region = jax.random.normal(key, (N, R, R), jnp.float32)
            gx = jax.random.normal(key, (N, win, win), jnp.float32)
            gy = jax.random.normal(key, (N, win, win), jnp.float32)
            A = R - win + 1

            @partial(jax.jit, static_argnames=("mode",))
            def step(carry, mode):
                reg = region + carry * 1e-20
                if mode == "einsum":
                    c1, c2 = _xcorr_maps(reg, gx, gy, win)
                else:
                    n, r, _ = reg.shape
                    rhs = jnp.stack([gx, gy], 1).reshape(2 * n, 1, win, win)
                    out = jax.lax.conv_general_dilated(
                        jnp.repeat(reg[None], 2, axis=1), rhs, (1, 1),
                        "VALID",
                        dimension_numbers=("NCHW", "OIHW", "NCHW"),
                        feature_group_count=2 * n,
                        preferred_element_type=jnp.float32,
                    )
                    o = out[0].reshape(n, 2, r - win + 1, r - win + 1)
                    c1, c2 = o[:, 0], o[:, 1]
                return jnp.sum(c1) * 0.0 + jnp.sum(c2) * 0.0 + carry + 1.0

            for mode in ("einsum", "conv"):
                t = chain_time(lambda c: step(c, mode), jnp.zeros(()),
                               args.reps, lambda c: c)
                print(f"xcorr margin={margin} R={R} A={A} [{mode}]: "
                      f"{t:.3f} ms")

    if args.what in ("all", "lk"):
        from visfs_tpu.ops.lk import (LKParams, build_lk_pyramid,
                                      lk_track_bidirectional_pyr)

        H, W = 480, 640
        base = jax.random.uniform(key, (H, W), jnp.float32) * 255
        from visfs_tpu.ops.image import gaussian5

        img0 = gaussian5(base)
        img1 = jnp.roll(img0, (2, 3), (0, 1))
        imgr = jnp.roll(img0, (0, -10), (0, 1))
        ptsT = jax.random.uniform(key, (120, 2), jnp.float32) * jnp.array(
            [W - 60, H - 60]) + 30
        ptsS = jax.random.uniform(key, (240, 2), jnp.float32) * jnp.array(
            [W - 60, H - 60]) + 30

        for backend in ("jnp", "jnp-xcorr", "pallas-xcorr", "pallas"):
            p = LKParams(backend=backend,
                         iter_mode=("xcorr" if "xcorr" in backend
                                    else "direct"))

            @jax.jit
            def both(carry):
                i0 = img0 + carry * 1e-20
                p0 = build_lk_pyramid(i0, p)
                p1 = build_lk_pyramid(img1, p)
                pr = build_lk_pyramid(imgr, p)
                t = lk_track_bidirectional_pyr(
                    p0, p1, ptsT, ptsT, jnp.ones(ptsT.shape[0], bool), p,
                    1.5)
                s = lk_track_bidirectional_pyr(
                    p1, pr, ptsS, ptsS, jnp.ones(ptsS.shape[0], bool), p,
                    0.5)
                return jnp.sum(t.points) * 0.0 + jnp.sum(s.points) * 0.0 \
                    + carry + 1.0

            try:
                t = chain_time(both, jnp.zeros(()), args.reps, lambda c: c)
                print(f"lk pyr+temporal(120)+stereo(240) bidir [{backend}]: "
                      f"{t:.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"lk [{backend}]: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")

    if args.what in ("all", "step"):
        from visfs_tpu.io.sim import cached_textured_sequence
        from visfs_tpu.slam.system import System

        seq = cached_textured_sequence(n_frames=40, width=640, height=480,
                                       motion="square", seed=0, speed=2.0)
        cam = seq.camera
        s = System({"Tracker/MaxFeatures": 120, "Tracker/MinDistance": 40,
                    "LocalMap/MapSize": 5, "Optimizer/Iterations": 20})
        s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               float(cam.baseline), width=cam.width, height=cam.height)
        lefts = [jax.device_put(jnp.asarray(f, jnp.float32))
                 for f in seq.left]
        rights = [jax.device_put(jnp.asarray(f, jnp.float32))
                  for f in seq.right]
        jax.block_until_ready((lefts, rights))
        for i in range(3):
            s.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                        rights[i])
        s.drain_outputs()
        t0 = time.perf_counter()
        reps = 0
        for _ in range(3):
            for i in range(3, 40):
                s.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                            rights[i])
                reps += 1
        s.drain_outputs()
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"vo_step sustained: {dt:.3f} ms/frame ({1e3 / dt:.1f} fps)")


if __name__ == "__main__":
    main()
