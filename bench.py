"""Benchmark: stereo-VO frames/s per chip on the fused jitted pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ pipeline publishes no numbers (BASELINE.md); its
real-time envelope is bounded by the per-frame ceres budget of 0.06 s
(Optimizer.cpp:524) => ~16.7 frames/s sustained on CPU.  vs_baseline is
measured fps against that envelope; the BASELINE.json target is >= 5x.

Config mirrors the simMapping.launch operating point: 120 features,
window 5, 20 solver iterations (launch/simMapping.launch:53-88).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    if os.environ.get("VISFS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VISFS_BENCH_PLATFORM"])

    import jax.numpy as jnp

    from visfs_tpu.io.sim import ate_rmse, generate_sequence
    from visfs_tpu.slam.system import System

    n_frames = int(os.environ.get("VISFS_BENCH_FRAMES", "30"))
    width = int(os.environ.get("VISFS_BENCH_WIDTH", "640"))
    height = int(os.environ.get("VISFS_BENCH_HEIGHT", "480"))

    seq = generate_sequence(
        n_frames=n_frames, n_points=900, width=width, height=height,
        motion="arc", seed=0,
    )
    cam = seq.camera
    sys_ = System(
        {
            "Tracker/MaxFeatures": 120,
            # simMapping.launch uses 40 px at VGA; scale for other sizes
            "Tracker/MinDistance": max(12, 40 * width // 640),
            "LocalMap/MapSize": 5,
            "Optimizer/Iterations": 20,
        }
    )
    sys_.init(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.baseline), width=cam.width, height=cam.height,
    )

    # Pre-stage all frames in device memory: the benchmark measures per-chip
    # pipeline throughput (in deployment frames arrive over PCIe/DMA, not
    # re-uploaded per step; under the dev tunnel host->device copies would
    # otherwise dominate).
    lefts = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.left]
    rights = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.right]
    jax.block_until_ready(lefts)
    jax.block_until_ready(rights)

    # Warm-up: compile + first two frames.
    sys_.input_primary_sensor_data(float(seq.stamps[0]), lefts[0], rights[0])
    sys_.input_primary_sensor_data(float(seq.stamps[1]), lefts[1], rights[1])
    while sys_.output_odometry_info() is not None:
        pass

    t0 = time.perf_counter()
    for i in range(2, n_frames):
        sys_.input_primary_sensor_data(float(seq.stamps[i]), lefts[i], rights[i])
    # One batched drain (blocks until the device finished all steps).
    outs = sys_.drain_outputs()
    elapsed = time.perf_counter() - t0
    fps = (n_frames - 2) / elapsed

    # Sanity: the trajectory must be tracked, not garbage.
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, seq.poses[2:2 + len(est)]) if len(est) else float("inf")
    lost = sum(bool(o.lost) for o in outs)
    baseline_fps = 1.0 / 0.06  # reference per-frame solver budget envelope
    result = {
        "metric": "stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": f"fps@{width}x{height} (ATE {ate:.4f} m, lost {lost}/{len(outs)})",
        "vs_baseline": round(fps / baseline_fps, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
