"""Amortized per-stage device-time profile (README stage table source).

Unlike host-synced per-frame stage timing (which adds one host round trip
per stage and, under a remote dev tunnel, transport noise), this tool
measures each stage jit by dispatching it K times back-to-back on fixed
inputs and syncing once, so the per-call figure is the true sequential
device+dispatch cost.  The stage jits are the exact functions the fused
production step inlines (slam/system.py: track_stage_impl /
estimator_prepare / local_optimize / estimator_finalize), mirroring the
reference's per-thread stage timers (Signature.h:62-73).

Usage: python tools/ablate_stages.py [reps] (default 30).
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

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seq = cached_textured_sequence(
        n_frames=300, width=640, height=480, motion="square", seed=0,
        speed=2.0,
    )
    cam = seq.camera
    sys_ = System({
        "Tracker/MaxFeatures": 120,
        "Tracker/MinDistance": 40,
        "LocalMap/MapSize": 5,
        "Optimizer/Iterations": 20,
    })
    sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
              float(cam.baseline), width=cam.width, height=cam.height)

    lefts = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.left]
    rights = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.right]
    jax.block_until_ready((lefts, rights))

    # Advance to a steady-state frame so stage inputs are realistic.
    for i in range(30):
        sys_.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                       rights[i])
    sys_.drain_outputs()

    st = sys_.state
    i = 30
    stamp = jnp.float32(float(seq.stamps[i]))
    left, right = lefts[i], rights[i]

    ts = S._track_stage(st, left, right, stamp, sys_.camera, sys_.settings,
                        sys_.lk_params, sys_._cfg_hash)
    problem, ctx = S._prepare_stage(st, ts, stamp, sys_.camera, sys_.settings,
                                    None, None, None)
    res_ba = S._ba_stage(problem, sys_.settings.ba)
    jax.block_until_ready((ts, ctx, res_ba))

    rows = [
        ("track (CLAHE+pyramids+LK x4+GFTT+triang)", _amortized(
            lambda: S._track_stage(st, left, right, stamp, sys_.camera,
                                   sys_.settings, sys_.lk_params,
                                   sys_._cfg_hash), reps)),
        ("prepare (PnP RANSAC + window insert)", _amortized(
            lambda: S._prepare_stage(st, ts, stamp, sys_.camera,
                                     sys_.settings, None, None, None), reps)),
        ("local bundle (Schur GN/LM, 2x10 it)", _amortized(
            lambda: S._ba_stage(problem, sys_.settings.ba), reps)),
        ("finalize (fusion+marginalize+feedback)", _amortized(
            lambda: S._finalize_stage(st, ts, ctx, res_ba, stamp, sys_.camera,
                                      sys_.settings), reps)),
    ]
    from functools import partial

    vo_nodonate = partial(
        jax.jit, static_argnames=("cfg_est", "lk_params", "cfg_hash"),
    )(S.vo_step_impl)
    fused = _amortized(
        lambda: vo_nodonate(st, left, right, stamp, sys_.camera,
                            sys_.settings, sys_.lk_params, sys_._cfg_hash),
        reps)

    print(f"\n{'stage':<44}{'ms/call':>9}")
    total = 0.0
    for name, ms in rows:
        print(f"{name:<44}{ms:>9.2f}")
        total += ms
    print(f"{'sum of stages':<44}{total:>9.2f}")
    print(f"{'fused vo_step (one XLA program)':<44}{fused:>9.2f}")


if __name__ == "__main__":
    main()
