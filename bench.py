"""Benchmark: stereo-VO frames/s per chip on the fused jitted pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ pipeline publishes no numbers (BASELINE.md); its
real-time envelope is bounded by the per-frame ceres budget of 0.06 s
(Optimizer.cpp:524) => ~16.7 frames/s sustained on CPU.  vs_baseline is
measured fps against that envelope; the BASELINE.json target is >= 5x.

Config mirrors the simMapping.launch operating point: 120 features,
window 5, 20 solver iterations (launch/simMapping.launch:53-88).

Phases (trim with env knobs):
  1. throughput — 300-frame textured square-loop sequence (occlusion,
     pixel noise, exposure drift — io.sim.generate_textured_sequence), fed
     asynchronously, drained at the end: sustained fps + ATE + lost count.
  2. latency — per-frame host-synced pass over the first
     VISFS_BENCH_LAT_FRAMES frames: p50/p99 per-frame wall latency.  Each
     sample includes one host<->device sync; the sync overhead of the
     running transport is MEASURED in-process (trivial jitted op
     dispatch+fetch) and reported alongside, so tunnel transport (~30 ms
     on the remote dev TPU, absent in deployment) is attributed, not
     assumed.
  3. fleet — VISFS_BENCH_FLEET (default 8) vmapped lockstep streams on one
     chip (slam.fleet.FleetSystem): aggregate frames/s/chip and the
     aggregate-vs-single-stream scaling factor.
  4. mapping-s3 — the simMapping.launch operating point proper
     (SensorStrategy 3: stereo+laser+wheel, occupancy submap building)
     over VISFS_BENCH_S3_FRAMES (120, 0 skips) textured frames:
     throughput + ATE of the full mapping configuration.

The bench FAILS (exit 1) when accuracy degrades past ATE 0.15 m or any
frame is lost — perf cannot silently trade accuracy (VISFS_BENCH_NO_GATE=1
disables, for ablations).

Env knobs: VISFS_BENCH_FRAMES (300), VISFS_BENCH_WIDTH/HEIGHT (640x480),
VISFS_BENCH_FLEET (8, 0 skips), VISFS_BENCH_LAT_FRAMES (60, 0 skips),
VISFS_BENCH_PLATFORM (force a jax platform), VISFS_SIM_CACHE (seq cache dir).
"""

import json
import os
import time

import numpy as np


def _make_system(System, cam, width):
    sys_ = System(_params(width))
    sys_.init(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.baseline), width=cam.width, height=cam.height,
    )
    return sys_


def _params(width):
    # The full simMapping.launch operating point (launch:53-88), minus the
    # laser/wheel-only knobs (applied by the s3 phase via SensorStrategy=3)
    # and System/Monitor+logging.  Force3DoF matters: the reference deploys
    # on planar robots and flattens z/roll/pitch — without it the textured
    # loop accumulates ~0.3 m of z drift that never cancels.
    return {
        "Tracker/MaxFeatures": 120,
        # simMapping.launch uses 40 px at VGA; scale for other sizes
        "Tracker/MinDistance": max(12, 40 * width // 640),
        "Tracker/QualityLevel": 0.05,
        "LocalMap/MapSize": 5,
        "Optimizer/Iterations": 20,
        "Estimator/Force3DoF": True,
        "Estimator/ToleranceTranslation": 0.40,
    }


def main():
    import jax

    if os.environ.get("VISFS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VISFS_BENCH_PLATFORM"])

    import jax.numpy as jnp

    from visfs_tpu.io.sim import ate_rmse, cached_textured_sequence
    from visfs_tpu.slam.system import System

    n_frames = int(os.environ.get("VISFS_BENCH_FRAMES", "300"))
    width = int(os.environ.get("VISFS_BENCH_WIDTH", "640"))
    height = int(os.environ.get("VISFS_BENCH_HEIGHT", "480"))
    fleet_b = int(os.environ.get("VISFS_BENCH_FLEET", "8"))
    lat_frames = int(os.environ.get("VISFS_BENCH_LAT_FRAMES", "60"))

    # Constant 2 m/s regardless of frame count (with loops= the generator
    # scales speed so short smoke runs get untrackable per-frame motion).
    seq = cached_textured_sequence(
        n_frames=n_frames, width=width, height=height, motion="square",
        seed=0, speed=2.0,
    )
    cam = seq.camera

    # Pre-stage all frames in device memory: the benchmark measures per-chip
    # pipeline throughput (in deployment frames arrive over PCIe/DMA, not
    # re-uploaded per step; under the dev tunnel host->device copies would
    # otherwise dominate).
    lefts = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.left]
    rights = [jax.device_put(jnp.asarray(f, jnp.float32)) for f in seq.right]
    jax.block_until_ready(lefts)
    jax.block_until_ready(rights)

    # ---- phase 1: sustained throughput ---------------------------------
    sys_ = _make_system(System, cam, width)
    sys_.input_primary_sensor_data(float(seq.stamps[0]), lefts[0], rights[0])
    sys_.input_primary_sensor_data(float(seq.stamps[1]), lefts[1], rights[1])
    while sys_.output_odometry_info() is not None:
        pass

    t0 = time.perf_counter()
    for i in range(2, n_frames):
        sys_.input_primary_sensor_data(float(seq.stamps[i]), lefts[i], rights[i])
    outs = sys_.drain_outputs()  # blocks until the device finished all steps
    elapsed = time.perf_counter() - t0
    fps = (n_frames - 2) / elapsed

    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, seq.poses[2:2 + len(est)]) if len(est) else float("inf")
    lost = sum(bool(o.lost) for o in outs)

    # ---- phase 2: per-frame latency percentiles ------------------------
    # Each sample includes one host<->device sync.  The sync overhead of
    # THIS transport is measured (not assumed) by timing a dispatch+fetch
    # of a trivial jitted op: under a remote dev tunnel it is ~30 ms and
    # vanishes when the driver runs on the TPU host.
    lat_txt = ""
    if lat_frames > 1:
        triv = jax.jit(lambda x: x + 1.0)
        tx = jnp.zeros((4,))
        jax.device_get(triv(tx))
        sync_samples = []
        for _ in range(20):
            t1 = time.perf_counter()
            jax.device_get(triv(tx))
            sync_samples.append(time.perf_counter() - t1)
        sync_ms = float(np.percentile(np.asarray(sync_samples) * 1e3, 50))

        sys_ = _make_system(System, cam, width)
        sys_.input_primary_sensor_data(float(seq.stamps[0]), lefts[0],
                                       rights[0])
        sys_.output_odometry_info()
        lats = []
        for i in range(1, min(lat_frames, n_frames)):
            t1 = time.perf_counter()
            sys_.input_primary_sensor_data(float(seq.stamps[i]), lefts[i],
                                           rights[i])
            sys_.output_odometry_info()  # per-frame host sync
            lats.append(time.perf_counter() - t1)
        lats = np.asarray(lats[2:]) * 1e3  # skip jit warm frames
        lat_txt = (f", lat p50 {np.percentile(lats, 50):.1f}"
                   f"/p99 {np.percentile(lats, 99):.1f} ms incl "
                   f"{sync_ms:.1f} ms measured transport sync")

    # ---- phase 3: fleet aggregate --------------------------------------
    fleet_txt = ""
    if fleet_b > 0:
        from visfs_tpu.slam.fleet import FleetSystem

        fs = FleetSystem(_params(width), n_streams=fleet_b)
        fs.init(float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
                float(cam.baseline), width=cam.width, height=cam.height)
        nf = min(n_frames, 40)
        # Offset starting frames so streams are out of phase (decorrelated
        # convergence, like independent robots).
        offs = [(k * 7) % max(n_frames - nf, 1) for k in range(fleet_b)]
        stampsB = np.stack(
            [seq.stamps[o:o + nf] for o in offs], 1).astype(np.float32)
        lB = [jnp.stack([lefts[o + i] for o in offs]) for i in range(nf)]
        rB = [jnp.stack([rights[o + i] for o in offs]) for i in range(nf)]
        jax.block_until_ready((lB, rB))
        fs.input_primary_sensor_data(stampsB[0], lB[0], rB[0])
        fs.input_primary_sensor_data(stampsB[1], lB[1], rB[1])
        fs.drain_outputs()
        t0 = time.perf_counter()
        for i in range(2, nf):
            fs.input_primary_sensor_data(stampsB[i], lB[i], rB[i])
        fs.drain_outputs()
        dt = time.perf_counter() - t0
        agg = (nf - 2) * fleet_b / dt
        fleet_txt = (f", fleet x{fleet_b} {agg:.0f} fps/chip aggregate = "
                     f"{agg / fps:.2f}x single-stream")

    # ---- phase 4: strategy-3 mapping operating point -------------------
    # The simMapping.launch configuration (stereo+laser+wheel, submap
    # building) — the BASELINE.json multi-robot-mapping north star.
    # Informational: failure here must not sink the headline bench.
    s3_txt = ""
    s3_frames = int(os.environ.get("VISFS_BENCH_S3_FRAMES", "120"))
    if s3_frames > 2:
        try:
            seq3 = cached_textured_sequence(
                n_frames=s3_frames, width=width, height=height,
                motion="square", seed=1, speed=2.0, with_laser=True,
                n_beams=180,
            )
            p3 = _params(width)
            p3["System/SensorStrategy"] = 3
            s3 = System(p3, scan_capacity=256)
            s3.init(float(cam.fx), float(cam.fy), float(cam.cx),
                    float(cam.cy), float(cam.baseline), width=cam.width,
                    height=cam.height)
            l3 = [jax.device_put(jnp.asarray(f, jnp.float32))
                  for f in seq3.left]
            r3 = [jax.device_put(jnp.asarray(f, jnp.float32))
                  for f in seq3.right]
            jax.block_until_ready((l3, r3))
            odom_i = 0
            wheel = seq3.wheel_odom

            scans3 = [np.asarray(sc, np.float32)
                      for sc in seq3.laser_scans]

            def feed(i):
                nonlocal odom_i
                j = odom_i
                while (j < len(wheel)
                       and wheel[j][0] <= seq3.stamps[i] + 1e-9):
                    j += 1
                if j > odom_i:  # one dispatch for the frame's ~10 samples
                    rows = wheel[odom_i:j]
                    s3.input_wheel_odometry_batch(rows[:, 0], rows[:, 1:7])
                    odom_i = j
                s3.input_primary_sensor_data(
                    float(seq3.stamps[i]), l3[i], r3[i], scan=scans3[i])

            feed(0)
            feed(1)
            s3.drain_outputs()
            t0 = time.perf_counter()
            for i in range(2, s3_frames):
                feed(i)
            outs3 = s3.drain_outputs()
            dt3 = time.perf_counter() - t0
            fps3 = (s3_frames - 2) / dt3
            est3 = np.stack([np.asarray(o.pose) for o in outs3])
            ate3 = ate_rmse(est3, seq3.poses[2:2 + len(est3)])
            s3_txt = (f", mapping-s3 {fps3:.1f} fps "
                      f"(ATE {ate3:.3f} m, {s3_frames}f w/ laser+wheel)")
        except Exception as e:  # noqa: BLE001 — informational phase
            s3_txt = f", mapping-s3 unavailable ({type(e).__name__})"

    baseline_fps = 1.0 / 0.06  # reference per-frame solver budget envelope
    result = {
        "metric": "stereo_vo_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": (f"fps@{width}x{height} textured {n_frames}f "
                 f"(ATE {ate:.4f} m, lost {lost}/{len(outs)}"
                 f"{lat_txt}{fleet_txt}{s3_txt})"),
        "vs_baseline": round(fps / baseline_fps, 3),
    }
    print(json.dumps(result))

    # ---- accuracy gate ---------------------------------------------------
    # Perf work must not silently trade accuracy: fail the bench when the
    # 300-frame textured loop degrades.  Ceilings: ATE <= 0.15 m (round 5:
    # deterministic 0.135 + margin; the residual is the corner-rotation LK
    # floor, see README) and zero lost frames.  VISFS_BENCH_NO_GATE=1
    # skips (for ablation experiments only).
    if not os.environ.get("VISFS_BENCH_NO_GATE"):
        if ate > 0.15 or lost > 0:
            print(f"BENCH GATE FAILED: ATE {ate:.4f} m (ceiling 0.15), "
                  f"lost {lost} (ceiling 0). Note: the textured-loop ATE "
                  "has a documented bistability (PARITY.md 'Known issues'); "
                  "if the triggering change is semantically neutral, rerun "
                  "and ablate before concluding a real regression.",
                  flush=True)
            raise SystemExit(1)


if __name__ == "__main__":
    # The dev TPU's remote-compile service intermittently drops requests
    # ("HTTP 500" / "response body closed") under load; retry transient
    # infrastructure errors so a flaky compile doesn't read as a bench
    # failure.  Gate failures (SystemExit) are NOT retried.
    import traceback

    for attempt in range(3):
        try:
            main()
            break
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001 — infra errors are opaque
            msg = f"{type(e).__name__}: {e}"
            if attempt == 2:
                raise
            print(f"bench attempt {attempt + 1} failed ({msg[:200]}); "
                  "retrying", flush=True)
            traceback.print_exc()
            time.sleep(20)
