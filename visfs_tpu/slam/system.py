"""System: the top-level engine — one jitted step per frame.

The reference System (corelib/src/System.cpp) spawns Tracker/Estimator/
Monitor threads connected by mutex-guarded queues polled at 5 ms.  Here the
entire per-frame pipeline — CLAHE, extrapolation, LK tracking, re-detection,
stereo triangulation, PnP, window insertion, Schur BA, fusion overrides,
marginalization, outlier feedback — is a single jitted
``step(state, left, right, stamp) -> (state, FrameOutput)``: latency hiding
comes from XLA async dispatch (the host can feed frame N+1 while the device
runs frame N) rather than thread pipelining.

Host API mirrors the reference surface (System.h:30-53):
  * ``init(...)``                    — camera intrinsics/extrinsics;
  * ``input_primary_sensor_data``    — stereo pair (+ stamp);
  * ``input_wheel_odometry``         — odometry samples at ~100 Hz;
  * ``output_odometry_info``         — pose + TrackInfo/EstimateInfo.
"""

from __future__ import annotations

import collections
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VISFSConfig, config_from_parameters
from ..core.camera import StereoCamera, make_stereo_camera
from ..core.lie import mat_to_xyzrpy, se3_matrix
from ..ops.lk import LKParams
from ..ops.lk import lk_pad as _lk_pad
from ..ops.pnp import PnPSettings
from ..solver.ba import BASettings
from . import extrapolator as extr
from .estimator import (
    EstimatorSettings,
    estimator_finalize,
    estimator_prepare,
    marginalize,
)
from .state import FrameOutput, VOState, init_state
from .tracker import tracker_step


def build_cfg_hash(cfg: VISFSConfig) -> tuple:
    """Static tracker/system extras passed to vo_step (hashable)."""
    return (
        cfg.tracker_max_features,
        cfg.tracker_quality_level,
        cfg.tracker_min_distance,
        cfg.tracker_flow_back,
        cfg.tracker_min_depth,
        cfg.tracker_max_depth,
        cfg.system_clahe,
        cfg.system_wheel_odometry_freq,
        cfg.tracker_cull_by_fundation_matrix,
        cfg.tracker_fundation_pixel_error,
    )


def _build_settings(cfg: VISFSConfig) -> EstimatorSettings:
    return EstimatorSettings(
        sensor_strategy=cfg.system_sensor_strategy,
        min_inliers=cfg.estimator_min_inliers,
        pnp=PnPSettings(
            iterations=cfg.estimator_pnp_iterations,
            reproj_error=cfg.estimator_pnp_reproj_error,
            min_inliers=cfg.estimator_min_inliers,
            refine_iterations=cfg.estimator_refine_iterations,
            flags=cfg.estimator_pnp_flags,
        ),
        ba=BASettings(
            iterations=cfg.optimizer_iterations,
            pixel_variance=cfg.optimizer_pixel_variance,
            odometry_covariance=cfg.optimizer_odometry_covariance,
            robust_delta=cfg.optimizer_robust_kernel_delta,
            use_levenberg=(cfg.optimizer_trust_region == 0),
        ),
        tolerance_translation=cfg.estimator_tolerance_translation,
        force_3dof=cfg.estimator_force_3dof,
        map_size=cfg.local_map_map_size,
        max_features=cfg.tracker_max_features,
        min_parallax=cfg.local_map_min_parallax,
        min_translation=cfg.local_map_min_translation,
        min_laser_range=cfg.estimator_min_laser_range,
        max_laser_range=cfg.estimator_max_laser_range,
        missing_data_ray_length=cfg.estimator_missing_data_ray_length,
        laser_covariance=cfg.optimizer_laser_covariance,
        # the active submaps are owned by LocalMap and use its group
        # (LocalMap.cpp:44)
        num_range_data=cfg.local_map_num_range_data_limit,
        insert_free_space=cfg.local_map_insert_free_space,
        num_subdivisions=cfg.estimator_num_sub_division_pre_scan,
    )


class TrackStage(NamedTuple):
    """Front-end stage output (everything the back-end stages consume)."""

    trk: object  # tracker.TrackerOutput
    window: object  # WindowState after marginalization
    guess: jnp.ndarray  # [4,4] motion prior
    wheel_pose: jnp.ndarray  # [4,4]
    wheel_ok: jnp.ndarray
    key: jnp.ndarray  # next carried rng key
    subkey: jnp.ndarray  # estimator RANSAC key
    left: jnp.ndarray  # post-CLAHE images (stored as prev_* next frame)
    right: jnp.ndarray


def track_stage_impl(
    state: VOState,
    left,
    right,
    stamp,
    cam: StereoCamera,
    cfg_est: EstimatorSettings,
    lk_params: LKParams,
    cfg_hash: tuple,  # static extras: (max_features, quality, min_dist,
    # flow_back, min_depth, max_depth, clahe, wheel_freq)
) -> TrackStage:
    """Front-end: CLAHE, window slide, extrapolation, LK tracking (the
    reference Tracker thread, Tracker.cpp:167-419)."""
    (max_features, quality_level, min_distance, flow_back, min_depth,
     max_depth, use_clahe, wheel_freq, cull_fund, fund_thresh) = cfg_hash

    if use_clahe:
        from ..ops.image import clahe

        left = clahe(left)
        right = clahe(right)

    # Slide the window (previous frame's keyframe decision).
    features, window = marginalize(state.features, state.window, state.keyframe)

    # Motion prior.
    guess, wheel_pose, wheel_ok, prev_w6, prev_w_valid = extr.extrapolate_pose(
        state.odom, stamp, state.prev_stamp,
        state.velocity, state.velocity_valid,
        jnp.concatenate(
            [state.prev_wheel_t,
             jnp.stack(mat_to_xyzrpy(se3_matrix(state.prev_wheel_q,
                                                state.prev_wheel_t))[3:])]
        ),
        state.prev_wheel_valid,
        cfg_est.sensor_strategy,
        wheel_freq,
    )

    key, subkey, trk_key = jax.random.split(state.rng_key, 3)

    # Reconstruct the carried previous-left pyramid (built by last frame's
    # tracker_step) so only the current left/right pyramids are computed.
    prev_pyr = None
    if state.prev_pyr:
        from ..ops.lk import LKPyramid, lk_pad

        h, w = state.prev_left.shape
        prev_pyr = LKPyramid(
            levels=tuple(lv[0] for lv in state.prev_pyr),
            gx=tuple(lv[1] for lv in state.prev_pyr),
            gy=tuple(lv[2] for lv in state.prev_pyr),
            height=h, width=w, pad=lk_pad(lk_params),
        )

    trk = tracker_step(
        features, state.prev_left, state.prev_right, left, right,
        state.has_prev, guess, state.blocked_uv, state.blocked_valid,
        state.next_fid, state.frame_count, cam,
        max_features=max_features, quality_level=quality_level,
        min_distance=min_distance, min_inliers=cfg_est.min_inliers,
        flow_back=flow_back, min_depth=min_depth, max_depth=max_depth,
        lk_params=lk_params,
        rgbd=(cfg_est.sensor_strategy == 1),
        cull_fundamental=cull_fund, fundamental_threshold=fund_thresh,
        rng_key=trk_key,
        prev_pyr=prev_pyr,
    )
    return TrackStage(
        trk=trk, window=window, guess=guess, wheel_pose=wheel_pose,
        wheel_ok=wheel_ok, key=key, subkey=subkey, left=left, right=right,
    )


def prepare_stage_impl(
    state: VOState,
    ts: TrackStage,
    stamp,
    cam: StereoCamera,
    cfg_est: EstimatorSettings,
    scan_points=None,
    scan_mask=None,
    scan_times=None,
):
    """Back-end problem assembly (Estimator.cpp:166-252)."""
    return estimator_prepare(
        state._replace(window=ts.window), ts.trk, stamp, ts.wheel_pose,
        ts.wheel_ok, ts.guess, cam, cfg_est, ts.subkey,
        scan_points=scan_points, scan_mask=scan_mask, scan_times=scan_times,
    )


def finalize_stage_impl(
    state: VOState,
    ts: TrackStage,
    ctx,
    res_ba,
    stamp,
    cam: StereoCamera,
    cfg_est: EstimatorSettings,
):
    """Post-BA fusion + state assembly (Estimator.cpp:275-449)."""
    est = estimator_finalize(state, ctx, res_ba, stamp, cam, cfg_est)
    left, right, trk = ts.left, ts.right, ts.trk
    wheel_pose, wheel_ok, key = ts.wheel_pose, ts.wheel_ok, ts.key

    from ..core.lie import mat_to_quat

    wheel_q_new = mat_to_quat(wheel_pose[:3, :3])
    wheel_t_new = wheel_pose[:3, 3]

    new_state = VOState(
        features=est.features,
        window=est.window,
        counters=est.counters,
        odom=state.odom,
        prev_left=left,
        prev_right=right,
        has_prev=jnp.ones((), bool),
        pose_q=est.pose_q,
        pose_t=est.pose_t,
        prev_wheel_q=jnp.where(wheel_ok, wheel_q_new, state.prev_wheel_q),
        prev_wheel_t=jnp.where(wheel_ok, wheel_t_new, state.prev_wheel_t),
        prev_wheel_valid=wheel_ok | state.prev_wheel_valid,
        velocity=est.velocity6,
        velocity_valid=est.velocity_valid,
        prev_stamp=stamp,
        next_fid=trk.next_fid,
        frame_count=state.frame_count + 1,
        keyframe=est.keyframe,
        lost=est.lost,
        blocked_uv=est.blocked_uv,
        blocked_valid=est.blocked_valid,
        rng_key=key,
        laser=est.laser,
        prev_pyr=trk.left_pyr,
    )

    out = FrameOutput(
        pose=se3_matrix(est.pose_q, est.pose_t),
        transform=est.transform,
        lost=est.lost,
        n_features=jnp.sum(est.features.obs_mask[:, -1]),
        n_matches=est.n_matches,
        n_inliers=est.n_inliers,
        n_new=trk.n_new,
        keyframe=est.keyframe,
        ba_chi2=est.ba_chi2,
        ba_ok=est.ba_ok,
        velocity=est.velocity6,
        stamp=stamp,
        covariance=est.covariance,
    )
    return new_state, out


def vo_step_impl(
    state: VOState,
    left,
    right,
    stamp,
    cam: StereoCamera,
    cfg_est: EstimatorSettings,
    lk_params: LKParams,
    cfg_hash: tuple,
    scan_points=None,  # [K, 3] laser-frame scan (strategies >= 3)
    scan_mask=None,
    scan_times=None,  # [K] per-point time offsets (<= 0, newest = 0)
):
    """The fused production step: track -> prepare -> BA -> finalize in one
    XLA program.  The stage functions are the same ones the profiled path
    jits separately, so both paths compute identically."""
    from ..solver import ba as ba_mod

    ts = track_stage_impl(
        state, left, right, stamp, cam, cfg_est, lk_params, cfg_hash
    )
    problem, ctx = prepare_stage_impl(
        state, ts, stamp, cam, cfg_est, scan_points, scan_mask, scan_times
    )
    res_ba = ba_mod.local_optimize(problem, cfg_est.ba)
    return finalize_stage_impl(state, ts, ctx, res_ba, stamp, cam, cfg_est)


vo_step = partial(
    jax.jit,
    static_argnames=("cfg_est", "lk_params", "cfg_hash"),
    donate_argnames=("state",),
)(vo_step_impl)

# Stage-split jits for the profiled path (no donation: `state` is shared
# across the stage calls of one frame).
_track_stage = partial(
    jax.jit, static_argnames=("cfg_est", "lk_params", "cfg_hash"),
)(track_stage_impl)
_prepare_stage = partial(
    jax.jit, static_argnames=("cfg_est",),
)(prepare_stage_impl)


@partial(jax.jit, static_argnames=("settings",))
def _ba_stage(problem, settings):
    from ..solver import ba as ba_mod

    return ba_mod.local_optimize(problem, settings)


_finalize_stage = partial(
    jax.jit, static_argnames=("cfg_est",),
)(finalize_stage_impl)


@jax.jit
def _push_odometry(state: VOState, stamp, pose6, vel6) -> VOState:
    return state._replace(
        odom=extr.add_odometry(state.odom, stamp, pose6, vel6)
    )


@jax.jit
def _push_odometry_batch(state: VOState, stamps, pose6, vel6,
                         valid) -> VOState:
    """Push K odometry samples in ONE dispatch (scan over the ring buffer).

    At the reference's 100 Hz odometry rate (Parameters.h:141) a 10 Hz
    camera sees ~10 samples per frame; dispatching one tiny jit per sample
    costs ~0.5-1 ms each on the host and dominated the strategy-3 wall
    time once the device side got fast.
    """
    def body(odom, row):
        st, p6, v6, ok = row
        new = extr.add_odometry(odom, st, p6, v6)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, odom
        ), None

    odom, _ = jax.lax.scan(body, state.odom, (stamps, pose6, vel6, valid))
    return state._replace(odom=odom)


class System:
    """Host-side driver owning device state (reference System.h API)."""

    # feature_capacity_factor sizes the feature table at factor*MaxFeatures
    # slots.  Live tracks never exceed MaxFeatures; the extra slots hold
    # marginalized features' in-window observations (BA history).  3x is
    # sized so that corner-turn churn (most of the population replaced
    # within a window length) cannot exhaust free slots and stall
    # re-detection — at 2x the allocator famine produced an oscillating
    # population and corner tracking collapses.  Since the LK passes are
    # compacted to live features (slam/tracker.py), capacity is window
    # history only and does not affect the per-frame LK cost.
    def __init__(self, parameters=None, feature_capacity_factor: int = 3,
                 seed: int = 0, scan_capacity: int = 512,
                 submap_extent_cells: int = 256,
                 profile_stages: bool = False):
        self.cfg: VISFSConfig = (
            parameters if isinstance(parameters, VISFSConfig)
            else config_from_parameters(parameters)
        )
        self.settings = _build_settings(self.cfg)
        self.lk_params = LKParams(
            win_size=self.cfg.tracker_flow_win_size,
            max_level=self.cfg.tracker_flow_max_level,
            iterations=self.cfg.tracker_flow_iterations,
            eps=self.cfg.tracker_flow_eps,
            compute_dtype=self.cfg.tracker_flow_compute_dtype,
            unroll=self.cfg.tracker_flow_unroll,
            region_extract=(
                "matmul" if self.cfg.tracker_flow_region_extract == "auto"
                else self.cfg.tracker_flow_region_extract),
        )
        self._cfg_hash = build_cfg_hash(self.cfg)
        self._capacity_factor = feature_capacity_factor
        self._seed = seed
        self._scan_capacity = scan_capacity
        self._submap_extent = submap_extent_cells
        self.camera: Optional[StereoCamera] = None
        self.state: Optional[VOState] = None
        self._results = collections.deque()
        self._pending = None
        # profile_stages: run the per-frame pipeline as four synced stage
        # jits (track / BA-prepare / local bundle / finalize) and populate
        # FrameOutput's timing fields from host wall clocks — the
        # reference's per-thread stage timers (Signature.h:62-73).  The
        # default fused async path leaves them zero (no host-visible stage
        # boundary) and is faster; enable profiling for diagnostics.
        self.profile_stages = profile_stages

    # -- reference System::init (System.cpp:83-99) ------------------------
    def init(self, fx, fy, cx, cy, baseline, *, width, height,
             fxr=None, fyr=None, cxr=None, cyr=None,
             transform_camera_to_robot=None, transform_laser_to_robot=None):
        self.camera = make_stereo_camera(
            fx, fy, cx, cy, baseline, fxr=fxr, fyr=fyr, cxr=cxr, cyr=cyr,
            t_camera_to_robot=transform_camera_to_robot,
            width=width, height=height,
        )
        laser = None
        if self.cfg.system_sensor_strategy >= 3:
            import dataclasses as _dc

            from .state import init_laser_state

            # Size the fixed raycast sample budget so supercover rays are
            # never silently truncated: a ray of range R crosses at most
            # ~2R/resolution cells, and nothing beyond the submap extent
            # can land in the grid anyway.
            res = self.cfg.local_map_map_resolution
            need = int(2.0 * max(self.cfg.estimator_max_laser_range,
                                 self.cfg.estimator_missing_data_ray_length)
                       / max(res, 1e-6)) + 8
            cap = 2 * self._submap_extent + 8
            self.settings = _dc.replace(
                self.settings, raycast_samples=min(need, cap)
            )
            laser = init_laser_state(
                resolution=self.cfg.local_map_map_resolution,
                extent_cells=self._submap_extent,
                hit_probability=self.cfg.local_map_hit_probability,
                miss_probability=self.cfg.local_map_miss_probability,
                t_laser_robot=transform_laser_to_robot,
            )
        self.state = init_state(
            height, width,
            capacity=int(self._capacity_factor * self.cfg.tracker_max_features),
            window=self.cfg.local_map_map_size + 1,
            seed=self._seed,
            laser=laser,
            lk_pad=_lk_pad(self.lk_params),
            lk_max_level=self.lk_params.max_level,
            lk_dtype=jnp.dtype(self.lk_params.compute_dtype),
        )

    # -- reference System::inputPrimarySensorData -------------------------
    def input_primary_sensor_data(self, stamp: float, left, right,
                                  scan=None, scan_times=None):
        """Feed one stereo frame (+ optional [K, 3] laser-frame scan and
        [K] per-point time offsets for rolling-scan de-skew, <= 0 with the
        newest point at 0 — io.interface.laser_scan_to_points convention).
        """
        assert self.state is not None, "call init() first"
        self._collect_pending()
        left = jnp.asarray(left, dtype=jnp.float32)
        right = jnp.asarray(right, dtype=jnp.float32)
        scan_points = scan_mask = scan_t = None
        if self.cfg.system_sensor_strategy >= 3:
            K = self._scan_capacity
            pts = np.zeros((K, 3), np.float32)
            msk = np.zeros((K,), bool)
            tms = np.zeros((K,), np.float32)
            if scan is not None:
                scan = np.asarray(scan, np.float32)[:K]
                pts[: len(scan)] = scan
                msk[: len(scan)] = True
                if scan_times is not None:
                    st = np.asarray(scan_times, np.float32)[:K]
                    tms[: len(st)] = st
            scan_points = jnp.asarray(pts)
            scan_mask = jnp.asarray(msk)
            # zero times -> de-skew degenerates to identity, so the jit
            # signature stays stable whether or not times are supplied
            scan_t = jnp.asarray(tms)
        if self.profile_stages:
            out = self._step_profiled(
                jnp.float32(stamp), left, right, scan_points, scan_mask,
                scan_t,
            )
        else:
            self.state, out = vo_step(
                self.state, left, right, jnp.float32(stamp), self.camera,
                self.settings, self.lk_params, self._cfg_hash,
                scan_points=scan_points, scan_mask=scan_mask,
                scan_times=scan_t,
            )
        # Async: don't block on the result; collect on the next call/output.
        self._pending = out

    def _step_profiled(self, stamp, left, right, scan_points, scan_mask,
                       scan_times=None):
        """Synced stage-by-stage step filling FrameOutput timing fields."""
        t0 = time.perf_counter()
        ts = _track_stage(
            self.state, left, right, stamp, self.camera, self.settings,
            self.lk_params, self._cfg_hash,
        )
        jax.block_until_ready(ts)
        t1 = time.perf_counter()
        problem, ctx = _prepare_stage(
            self.state, ts, stamp, self.camera, self.settings,
            scan_points, scan_mask, scan_times,
        )
        jax.block_until_ready(ctx)
        t2 = time.perf_counter()
        res_ba = _ba_stage(problem, self.settings.ba)
        jax.block_until_ready(res_ba)
        t3 = time.perf_counter()
        self.state, out = _finalize_stage(
            self.state, ts, ctx, res_ba, stamp, self.camera, self.settings,
        )
        jax.block_until_ready(out)
        t4 = time.perf_counter()
        return out._replace(
            time_tracking=np.float32(t1 - t0),
            time_estimation=np.float32(t4 - t1),
            local_bundle_time=np.float32(t3 - t2),
            time_total=np.float32(t4 - t0),
        )

    # -- reference System::inputWheelOdometry -----------------------------
    def input_wheel_odometry(self, stamp: float, pose6, velocity6=None):
        assert self.state is not None, "call init() first"
        pose6 = jnp.asarray(pose6, dtype=jnp.float32)
        vel6 = (
            jnp.asarray(velocity6, dtype=jnp.float32)
            if velocity6 is not None else jnp.zeros(6, jnp.float32)
        )
        self.state = _push_odometry(
            self.state, jnp.float32(stamp), pose6, vel6
        )

    def input_wheel_odometry_batch(self, stamps, pose6, velocity6=None):
        """Push K samples ([K], [K,6], optional [K,6]) in one dispatch —
        equivalent to K input_wheel_odometry calls in order.  Batches are
        padded to a multiple of 16 slots (masked) so the jit signature
        stays stable across varying per-frame sample counts."""
        assert self.state is not None, "call init() first"
        stamps = np.asarray(stamps, np.float32)
        K = len(stamps)
        if K == 0:
            return
        Kp = -(-K // 16) * 16
        st = np.zeros(Kp, np.float32)
        st[:K] = stamps
        p6 = np.zeros((Kp, 6), np.float32)
        p6[:K] = np.asarray(pose6, np.float32).reshape(K, 6)
        v6 = np.zeros((Kp, 6), np.float32)
        if velocity6 is not None:
            v6[:K] = np.asarray(velocity6, np.float32).reshape(K, 6)
        ok = np.zeros(Kp, bool)
        ok[:K] = True
        self.state = _push_odometry_batch(
            self.state, jnp.asarray(st), jnp.asarray(p6), jnp.asarray(v6),
            jnp.asarray(ok),
        )

    def _collect_pending(self):
        # Keep results on-device: forcing a transfer here would insert a
        # host<->device round trip into every frame and serialize the
        # pipeline.  Transfers happen when results are popped.
        if self._pending is not None:
            self._results.append(self._pending)
            self._pending = None

    # -- reference System::outputOdometryInfo -----------------------------
    def output_odometry_info(self):
        """Pop the oldest finished frame result, or None."""
        self._collect_pending()
        if self._results:
            return jax.device_get(self._results.popleft())
        return None

    def keyframe_snapshot(self, max_kp: int = 64, patch_size: int = 8,
                          scales: tuple = (1, 3, 6)):
        """Appearance snapshot of the latest processed frame's features,
        for loop-closure verification in the mapping back-end
        (slam/mapping.py verify_loop)."""
        from .mapping import snapshot_features

        assert self.state is not None, "call init() first"
        return snapshot_features(
            self.state.features, self.state.prev_left, self.camera,
            max_kp=max_kp, patch_size=patch_size, scales=scales,
        )

    def drain_outputs(self):
        """Fetch every finished frame result in one host transfer."""
        self._collect_pending()
        outs = list(self._results)
        self._results.clear()
        return jax.device_get(outs)

    def run_sequence(self, stamps, lefts, rights, wheel_odom=None,
                     scans=None, scan_times=None):
        """Convenience batch driver: feed a whole sequence, return outputs.

        wheel_odom: optional [K, 8] rows (stamp, x,y,z,roll,pitch,yaw, valid)
        interleaved by timestamp like the ROS callbacks would.
        scans: optional per-frame [K_i, 3] laser-frame point arrays.
        scan_times: optional per-frame [K_i] point time offsets (de-skew).
        """
        outs = []
        odom_i = 0
        for i in range(len(stamps)):
            if wheel_odom is not None:
                while (odom_i < len(wheel_odom)
                       and wheel_odom[odom_i][0] <= stamps[i] + 1e-9):
                    row = wheel_odom[odom_i]
                    self.input_wheel_odometry(float(row[0]), row[1:7])
                    odom_i += 1
            self.input_primary_sensor_data(
                float(stamps[i]), lefts[i], rights[i],
                scan=None if scans is None else scans[i],
                scan_times=None if scan_times is None else scan_times[i],
            )
            out = self.output_odometry_info()
            if out is not None:
                outs.append(out)
        self._collect_pending()
        while self._results:
            outs.append(self._results.popleft())
        return outs
