"""Instrument the textured-loop bench for corner inlier starvation.

Runs the exact bench sequence (io.sim.cached_textured_sequence, square loop,
300 frames) and prints a per-frame table of tracking diagnostics aligned to
the ground-truth yaw rate, then summarizes the 4 corner segments: inlier
minima, re-detect yield, per-frame pose error growth.  This is the
measurement backing the round-5 corner-robustness work (reference machinery
being matched: Tracker.cpp:322-341 getMask+GFTT top-up, LocalMap.cpp:95-126
keyframe policy).

Usage:
  python tools/diagnose_corners.py [--platform cpu|axon] [--frames 300]
      [--width 640 --height 480] [--csv out.csv]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--npz", default=None, help="save est+gt poses")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from visfs_tpu.io.sim import ate_rmse, cached_textured_sequence
    from visfs_tpu.slam.system import System

    seq = cached_textured_sequence(
        n_frames=args.frames, width=args.width, height=args.height,
        motion="square", seed=args.seed, speed=2.0,
    )
    cam = seq.camera
    sys_ = System({
        "Tracker/MaxFeatures": 120,
        "Tracker/MinDistance": max(12, 40 * args.width // 640),
        "Tracker/QualityLevel": 0.05,
        "LocalMap/MapSize": 5,
        "Optimizer/Iterations": 20,
        "Estimator/Force3DoF": True,
        "Estimator/ToleranceTranslation": 0.40,
    })
    sys_.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
              float(cam.baseline), width=cam.width, height=cam.height)

    lefts = [jnp.asarray(f, jnp.float32) for f in seq.left]
    rights = [jnp.asarray(f, jnp.float32) for f in seq.right]

    outs = []
    for i in range(args.frames):
        sys_.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                       rights[i])
        while True:
            o = sys_.output_odometry_info()
            if o is None:
                break
            outs.append(o)
    outs.extend(sys_.drain_outputs())

    # ground-truth yaw + yaw rate per frame
    yaw = np.array([np.arctan2(p[1, 0], p[0, 0]) for p in seq.poses])
    yaw_un = np.unwrap(yaw)
    dt = np.diff(seq.stamps, prepend=seq.stamps[0] - 1.0 / 30)
    yaw_rate = np.abs(np.gradient(yaw_un, seq.stamps))

    est = np.stack([np.asarray(o.pose) for o in outs])
    gt = seq.poses[:len(est)]
    if args.npz:
        np.savez(args.npz, est=est, gt=gt, stamps=seq.stamps[:len(est)])
    # per-frame translational error after global alignment on the full run
    ate = ate_rmse(est, gt)

    # Per-frame delta-pose error: compare frame-to-frame translation vs GT
    def deltas(poses):
        return np.stack([
            np.linalg.inv(poses[i - 1]) @ poses[i]
            for i in range(1, len(poses))
        ])

    d_est = deltas(est)
    d_gt = deltas(gt)
    dterr = np.linalg.norm(d_est[:, :3, 3] - d_gt[:, :3, 3], axis=1)
    # delta yaw error
    dyaw_est = np.arctan2(d_est[:, 1, 0], d_est[:, 0, 0])
    dyaw_gt = np.arctan2(d_gt[:, 1, 0], d_gt[:, 0, 0])
    dyerr = np.abs(np.unwrap(dyaw_est - dyaw_gt))

    rows = []
    for i, o in enumerate(outs):
        rows.append(dict(
            frame=i,
            yaw_rate=float(yaw_rate[i]) if i < len(yaw_rate) else 0.0,
            n_features=int(o.n_features),
            n_matches=int(o.n_matches),
            n_inliers=int(o.n_inliers),
            n_new=int(o.n_new),
            keyframe=bool(o.keyframe),
            lost=bool(o.lost),
            ba_ok=bool(o.ba_ok),
            ba_chi2=float(o.ba_chi2),
            dterr=float(dterr[i - 1]) if 0 < i <= len(dterr) else 0.0,
            dyerr=float(dyerr[i - 1]) if 0 < i <= len(dyerr) else 0.0,
        ))

    if args.csv:
        import csv
        with open(args.csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

    # segment the trajectory: corner = |yaw_rate| > 0.4 rad/s
    corner = yaw_rate[:len(rows)] > 0.4
    print(f"ATE {ate:.4f} m over {len(est)} frames; "
          f"{int(corner.sum())} corner frames")
    print("frame  yawrate  feat match inl new kf lost  dterr    dyerr")
    worst = sorted(rows, key=lambda r: -r["dterr"])[:15]
    for r in rows:
        flag = " <== worst" if r in worst else ""
        seg = "C" if corner[r["frame"]] else " "
        if corner[r["frame"]] or r["n_inliers"] < 60 or flag:
            print(f"{r['frame']:5d}{seg} {r['yaw_rate']:6.2f} "
                  f"{r['n_features']:5d} {r['n_matches']:5d} "
                  f"{r['n_inliers']:3d} {r['n_new']:3d} "
                  f"{int(r['keyframe'])}  {int(r['lost'])}  "
                  f"{r['dterr']:8.4f} {r['dyerr']:8.4f}{flag}")

    # corner summary (ATE repeated here so `tail` catches it)
    print(f"ATE {ate:.4f} m over {len(est)} frames")
    inl = np.array([r["n_inliers"] for r in rows])
    nnew = np.array([r["n_new"] for r in rows])
    dterr_a = np.array([r["dterr"] for r in rows])
    for name, m in (("corner", corner), ("straight", ~corner)):
        if m.sum() == 0:
            continue
        print(f"{name:9s}: inliers min/p10/med = {inl[m].min():3d}/"
              f"{int(np.percentile(inl[m], 10)):3d}/"
              f"{int(np.median(inl[m])):3d}   n_new med = "
              f"{int(np.median(nnew[m])):3d}   dterr med/max = "
              f"{np.median(dterr_a[m]):.4f}/{dterr_a[m].max():.4f}")


if __name__ == "__main__":
    main()
