"""Amortized per-stage device-time profile (README stage table source).

Unlike host-synced per-frame stage timing (which adds one host round trip
per stage and, under a remote dev tunnel, transport noise), this tool
measures each stage jit by dispatching it K times back-to-back on fixed
inputs and syncing once, so the per-call figure is the true sequential
device+dispatch cost.  The stage jits are the exact functions the fused
production step inlines (slam/system.py: track_stage_impl /
estimator_prepare / local_optimize / estimator_finalize), mirroring the
reference's per-thread stage timers (Signature.h:62-73).

Usage: python tools/ablate_stages.py [reps] [--s3]
  --s3 profiles the strategy-3 mapping configuration (stereo+laser+wheel,
  occupancy submap building — the simMapping.launch operating point
  proper); default is the stereo-only headline configuration.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _amortized(fn, reps):
    fn()  # warmup / compile
    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax

    if os.environ.get("VISFS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VISFS_BENCH_PLATFORM"])
    import jax.numpy as jnp

    from visfs_tpu.io.sim import cached_textured_sequence
    from visfs_tpu.slam import system as S
    from visfs_tpu.slam.system import System

    args = [a for a in sys.argv[1:]]
    s3 = "--s3" in args
    args = [a for a in args if a != "--s3"]
    reps = int(args[0]) if args else 30

    seq = cached_textured_sequence(
        n_frames=300, width=640, height=480, motion="square",
        seed=1 if s3 else 0, speed=2.0, with_laser=s3,
        n_beams=180 if s3 else 0,
    )
    cam = seq.camera
    params = {
        "Tracker/MaxFeatures": 120,
        "Tracker/MinDistance": 40,
        "Tracker/QualityLevel": 0.05,
        "LocalMap/MapSize": 5,
        "Optimizer/Iterations": 20,
        "Estimator/Force3DoF": True,
        "Estimator/ToleranceTranslation": 0.40,
    }
    if s3:
        params["System/SensorStrategy"] = 3
    sys_ = System(params, scan_capacity=256)
    sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
              float(cam.baseline), width=cam.width, height=cam.height)

    lefts = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.left]
    rights = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.right]
    jax.block_until_ready((lefts, rights))

    scans = ([np.asarray(sc, np.float32) for sc in seq.laser_scans]
             if s3 else None)
    wheel = seq.wheel_odom if s3 else None
    odom_i = 0

    def feed(i):
        nonlocal odom_i
        if wheel is not None:
            j = odom_i
            while j < len(wheel) and wheel[j][0] <= seq.stamps[i] + 1e-9:
                j += 1
            if j > odom_i:
                rows = wheel[odom_i:j]
                sys_.input_wheel_odometry_batch(rows[:, 0], rows[:, 1:7])
                odom_i = j
        sys_.input_primary_sensor_data(
            float(seq.stamps[i]), lefts[i], rights[i],
            scan=None if scans is None else scans[i])

    # Advance to a steady-state frame so stage inputs are realistic.
    for i in range(30):
        feed(i)
    sys_.drain_outputs()

    st = sys_.state
    i = 30
    stamp = jnp.float32(float(seq.stamps[i]))
    left, right = lefts[i], rights[i]

    scan_args = (None, None, None)
    if s3:
        K = sys_._scan_capacity
        pts = np.zeros((K, 3), np.float32)
        msk = np.zeros((K,), bool)
        sc = scans[i][:K]
        pts[: len(sc)] = sc
        msk[: len(sc)] = True
        scan_args = (jnp.asarray(pts), jnp.asarray(msk),
                     jnp.zeros((K,), jnp.float32))

    ts = S._track_stage(st, left, right, stamp, sys_.camera, sys_.settings,
                        sys_.lk_params, sys_._cfg_hash)
    problem, ctx = S._prepare_stage(st, ts, stamp, sys_.camera, sys_.settings,
                                    *scan_args)
    res_ba = S._ba_stage(problem, sys_.settings.ba)
    jax.block_until_ready((ts, ctx, res_ba))

    prep_label = ("prepare (PnP + wheel init + laser pretreat + insert)"
                  if s3 else "prepare (PnP RANSAC + window insert)")
    fin_label = ("finalize (fusion+marg+submap raycast insert)"
                 if s3 else "finalize (fusion+marginalize+feedback)")
    rows = [
        ("track (CLAHE+pyramids+LK x4+GFTT+triang)", _amortized(
            lambda: S._track_stage(st, left, right, stamp, sys_.camera,
                                   sys_.settings, sys_.lk_params,
                                   sys_._cfg_hash), reps)),
        (prep_label, _amortized(
            lambda: S._prepare_stage(st, ts, stamp, sys_.camera,
                                     sys_.settings, *scan_args), reps)),
        ("local bundle (Schur GN/LM, 2x10 it)", _amortized(
            lambda: S._ba_stage(problem, sys_.settings.ba), reps)),
        (fin_label, _amortized(
            lambda: S._finalize_stage(st, ts, ctx, res_ba, stamp, sys_.camera,
                                      sys_.settings), reps)),
    ]
    from functools import partial

    vo_nodonate = partial(
        jax.jit, static_argnames=("cfg_est", "lk_params", "cfg_hash"),
    )(S.vo_step_impl)
    kw = {}
    if s3:
        kw = dict(scan_points=scan_args[0], scan_mask=scan_args[1],
                  scan_times=scan_args[2])
    fused = _amortized(
        lambda: vo_nodonate(st, left, right, stamp, sys_.camera,
                            sys_.settings, sys_.lk_params, sys_._cfg_hash,
                            **kw),
        reps)

    mode = "strategy-3 mapping" if s3 else "stereo (strategy 0)"
    print(f"\n[{mode}]")
    print(f"{'stage':<50}{'ms/call':>9}")
    total = 0.0
    for name, ms in rows:
        print(f"{name:<50}{ms:>9.2f}")
        total += ms
    print(f"{'sum of stages':<50}{total:>9.2f}")
    print(f"{'fused vo_step (one XLA program)':<50}{fused:>9.2f}")


if __name__ == "__main__":
    main()
