"""Per-stage HOST-SYNCED timing profile of the VO pipeline.

NOTE: each stage sample includes one host<->device sync; under a remote
dev tunnel that adds ~30 ms of transport per stage, swamping device time.
Prefer tools/ablate_stages.py (amortized per-stage device cost) and
tools/op_profile.py (exact per-op device times from a profiler trace) —
those produced the README budget table.

Runs the textured benchmark sequence through System(profile_stages=True) —
four host-synced stage jits (track / BA-prepare / local bundle / finalize),
the reference's per-thread stage timers (Signature.h:62-73) — and prints a
p50/p90 table per stage.  Stage timings include one host sync each, so the
total exceeds the fused-step frame cost; use bench.py for throughput.

Usage: python tools/profile_stages.py [n_frames] (default 60; TPU unless
VISFS_BENCH_PLATFORM=cpu).
"""

import os
import sys

import numpy as np


def main():
    import jax

    if os.environ.get("VISFS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VISFS_BENCH_PLATFORM"])
    import jax.numpy as jnp

    from visfs_tpu.io.sim import cached_textured_sequence
    from visfs_tpu.slam.system import System

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
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
    }, profile_stages=True)
    sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
              float(cam.baseline), width=cam.width, height=cam.height)

    lefts = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.left]
    rights = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.right]
    jax.block_until_ready((lefts, rights))

    rows = []
    for i in range(min(n, len(lefts))):
        sys_.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                       rights[i])
        out = sys_.output_odometry_info()
        if i >= 3:  # skip jit warmup frames
            rows.append((float(out.time_tracking),
                         float(out.local_bundle_time),
                         float(out.time_estimation),
                         float(out.time_total)))
    r = np.asarray(rows) * 1e3
    est_excl_ba = r[:, 2] - r[:, 1]
    names = ["tracking (CLAHE+GFTT+LK+stereo)",
             "local bundle (Schur GN/LM)",
             "estimation excl. BA (PnP+fuse+submap)",
             "frame total (4 synced stages)"]
    cols = np.stack([r[:, 0], r[:, 1], est_excl_ba, r[:, 3]], 1)
    print(f"{'stage':<40}{'p50 ms':>9}{'p90 ms':>9}")
    for k, name in enumerate(names):
        print(f"{name:<40}{np.percentile(cols[:, k], 50):>9.2f}"
              f"{np.percentile(cols[:, k], 90):>9.2f}")


if __name__ == "__main__":
    main()
