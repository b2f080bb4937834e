"""ATE determinism check: the textured bench across semantically-identical
build variants (float-reassociation-level differences only).

The round-4 lottery measured 0.165/0.223/0.301/0.356 m across such
variants; after the corner-starvation fix the spread must stay within the
bench gate.  Prints one ATE line per variant and the spread.

Usage: python tools/ate_variants.py [--frames 300]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "default": {},
    "unroll5": {"Tracker/FlowUnroll": 5},
    "unroll1": {"Tracker/FlowUnroll": 1},
    "gather": {"Tracker/FlowRegionExtract": "gather"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from visfs_tpu.io.sim import ate_rmse, cached_textured_sequence
    from visfs_tpu.slam.system import System

    seq = cached_textured_sequence(
        n_frames=args.frames, width=640, height=480, motion="square",
        seed=0, speed=2.0,
    )
    cam = seq.camera
    lefts = [jnp.asarray(f, jnp.float32) for f in seq.left]
    rights = [jnp.asarray(f, jnp.float32) for f in seq.right]

    ates = {}
    for name, extra in VARIANTS.items():
        params = {
            "Tracker/MaxFeatures": 120,
            "Tracker/MinDistance": 40,
            "Tracker/QualityLevel": 0.05,
            "LocalMap/MapSize": 5,
            "Optimizer/Iterations": 20,
            "Estimator/Force3DoF": True,
            "Estimator/ToleranceTranslation": 0.40,
        }
        params.update(extra)
        s = System(params)
        s.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               float(cam.baseline), width=cam.width, height=cam.height)
        for i in range(args.frames):
            s.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                        rights[i])
        outs = s.drain_outputs()
        est = np.stack([np.asarray(o.pose) for o in outs])
        ate = float(ate_rmse(est, seq.poses[:len(est)]))
        lost = sum(bool(o.lost) for o in outs)
        ates[name] = ate
        print(f"{name:10s} ATE {ate:.4f} m  lost {lost}", flush=True)

    vals = np.array(list(ates.values()))
    print(f"spread: min {vals.min():.4f} max {vals.max():.4f} "
          f"range {vals.max() - vals.min():.4f}")


if __name__ == "__main__":
    main()
