"""Back-end estimator stage: motion init, window insertion, local BA, fusion.

Replaces the reference Estimator thread (corelib/src/Estimator.cpp:166-449
process) as pure array transformations over the VOState:

  * initial transform from wheel-odometry delta (strategy >= 2,
    Estimator.cpp:179-185) or batched PnP RANSAC (:188-190);
  * window insertion + keyframe decision (LocalMap::insertSignature,
    LocalMap.cpp:48-131);
  * BA problem assembly (LocalMap.cpp:228-294) and the two-pass Schur
    solver (solver/ba.py);
  * post-BA inlier re-gate and transform recomputation from the two newest
    optimized poses (Estimator.cpp:275-299);
  * wheel-vs-visual translation tolerance override (:325-366);
  * Force3DoF flattening (:368-375);
  * LocalMap write-back with outlier-edge removal and error-vertex blocking
    (updateLocalMap, LocalMap.cpp:170-226) feeding the tracker's blocked
    mask next frame;
  * velocity guess for extrapolation (guessVelocity, :451-470).

Window marginalization (LocalMap::removeSignature semantics: drop oldest on
keyframe else second-newest, LocalMap.cpp:142-147) is applied at the *start*
of the next step (slam/system.py) so the newest signature always lives in
slot W-1 — semantically identical, shape-static.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import StereoCamera
from ..core.lie import (
    flatten_3dof,
    mat_apply,
    mat_inv_se3,
    mat_to_quat,
    mat_to_xyzrpy,
    quat_to_mat,
    se3_matrix,
    xyzrpy_to_mat,
)
from ..ops import pnp
from ..solver import ba
from ..solver.factors import StereoIntrinsics
from .state import I32, FeatureTable, KeyframeCounters, VOState, WindowState
from .tracker import TrackerOutput

_BAD_COVARIANCE = 9999.0


@dataclasses.dataclass(frozen=True)
class EstimatorSettings:
    sensor_strategy: int = 0
    min_inliers: int = 12
    pnp: pnp.PnPSettings = pnp.PnPSettings()
    ba: ba.BASettings = ba.BASettings()
    tolerance_translation: float = 0.32
    force_3dof: bool = False
    map_size: int = 5  # LocalMap/MapSize (window = map_size + 1)
    max_features: int = 300
    min_parallax: float = 60.0
    min_translation: float = 0.5
    # Laser fusion (strategies >= 3)
    min_laser_range: float = 0.1
    max_laser_range: float = 30.0
    missing_data_ray_length: float = 5.0
    laser_covariance: float = 0.1
    # Estimator/NumSubDivisionPreScan: rolling-scan de-skew buckets
    num_subdivisions: int = 5
    num_range_data: int = 90  # Map/2dNumRangeData
    insert_free_space: bool = True
    # Fixed per-ray supercover sample budget; must cover the longest ray
    # (~2*range/resolution cells) or free-space updates truncate silently.
    # System.init sizes it from MaxLaserRange/MissingDataRayLength/extent.
    raycast_samples: int = 128


class EstimatorContext(NamedTuple):
    """Everything estimator_prepare computes that estimator_finalize needs.

    The split around the BA solve exists so the host can time the three
    stages (prepare / local bundle / finalize) independently when profiling
    (the reference's per-thread stage timers, Signature.h:62-73); the fused
    production step calls prepare -> local_optimize -> finalize inside one
    jit with zero duplication.
    """

    features: FeatureTable
    window: WindowState
    counters: KeyframeCounters
    keyframe: jnp.ndarray
    transform: jnp.ndarray  # [4,4] pre-BA initial transform
    transform_ok: jnp.ndarray
    inlier_mask: jnp.ndarray
    run_ba: jnp.ndarray
    map_available: jnp.ndarray
    lm_ba: jnp.ndarray
    bootstrap: jnp.ndarray
    sig_pose: jnp.ndarray
    pose_mat: jnp.ndarray
    prev_wheel_mat: jnp.ndarray
    wheel_pose_eff: jnp.ndarray
    wheel_valid_eff: jnp.ndarray
    n_matches: jnp.ndarray
    scan: object = None  # laser.PretreatedScan (strategies >= 3) or None


class EstimatorResult(NamedTuple):
    features: FeatureTable
    window: WindowState
    counters: KeyframeCounters
    pose_q: jnp.ndarray
    pose_t: jnp.ndarray
    transform: jnp.ndarray  # [4,4] accepted frame delta
    keyframe: jnp.ndarray
    lost: jnp.ndarray
    velocity6: jnp.ndarray
    velocity_valid: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    ba_chi2: jnp.ndarray
    ba_ok: jnp.ndarray
    blocked_uv: jnp.ndarray
    blocked_valid: jnp.ndarray
    covariance: jnp.ndarray
    laser: object = None  # updated LaserState (strategies >= 3)


def keyframe_update(c: KeyframeCounters, n_new, transform, transform_ok,
                    parallax_mean, max_features: int, min_translation: float,
                    min_parallax: float):
    """Keyframe decision + counter update (LocalMap.cpp:95-126).

    The reference accumulates |t| componentwise per frame and fires when
      * newFeatureCount > 0.2 * maxFeature (LocalMap.cpp:99), or
      * signatureCount > 10 AND the SQUARED norm of the accumulated
        translation exceeds MinTranslation *directly* — the threshold is
        not squared in the comparison (LocalMap.cpp:105-106), or
      * accumulated mean parallax >= MinParallax (LocalMap.cpp:116-121).
    Any firing clears all counters (clearCounters).  The reference's
    else-if chain is equivalent to this OR: whichever branch fires, the
    counters reset, so skipped accumulations are unobservable.
    """
    new_feature_count = c.new_feature_count + n_new
    signature_count = c.signature_count + 1
    translation_count = c.translation_count + jnp.where(
        transform_ok, jnp.abs(transform[:3, 3]), 0.0
    )
    parallax_count = c.parallax_count + parallax_mean

    cond_feat = new_feature_count > (0.2 * max_features)
    cond_trans = (signature_count > 10) & (
        jnp.sum(translation_count * translation_count) > min_translation
    )
    cond_par = parallax_count >= min_parallax
    keyframe = cond_feat | cond_trans | cond_par
    counters = KeyframeCounters(
        new_feature_count=jnp.where(keyframe, 0, new_feature_count),
        signature_count=jnp.where(keyframe, 0, signature_count),
        parallax_count=jnp.where(keyframe, 0.0, parallax_count),
        translation_count=jnp.where(keyframe, 0.0, translation_count),
    )
    return keyframe, counters


def _twr_to_tcw(pose_q, pose_t, t_ri):
    """Window poses Twr -> inverse camera poses Tcw (Optimizer.cpp:100-114)."""
    Twr = se3_matrix(pose_q, pose_t)
    Twc = Twr @ t_ri
    Tcw = mat_inv_se3(Twc)
    return mat_to_quat(Tcw[..., :3, :3]), Tcw[..., :3, 3]


def _tcw_to_twr(q, t, t_ir):
    """Inverse camera poses back to robot poses (Optimizer.cpp:319-340)."""
    Tcw = se3_matrix(q, t)
    Twc = mat_inv_se3(Tcw)
    return Twc @ t_ir  # Twr = Twc * Tri^-1 ; t_ir = Tri^-1


def estimator_prepare(
    state: VOState,
    trk: TrackerOutput,
    stamp,
    wheel_pose,  # [4,4] aligned global wheel pose for this frame
    wheel_valid,
    guess_delta,  # [4,4] extrapolator motion prior
    cam: StereoCamera,
    cfg: EstimatorSettings,
    rng_key,
    scan_points=None,  # [K, 3] laser-frame scan (strategies >= 3)
    scan_mask=None,  # [K]
    scan_times=None,  # [K] per-point time offsets (<= 0, newest = 0)
) -> Tuple[ba.BAProblem, EstimatorContext]:
    W = trk.features.window
    cur = W - 1
    prev = W - 2
    features = trk.features
    window = state.window
    dtype = state.pose_t.dtype
    eye4 = jnp.eye(4, dtype=dtype)
    zero4 = jnp.zeros((4, 4), dtype=dtype)
    frame_id = state.frame_count

    pose_mat = se3_matrix(state.pose_q, state.pose_t)
    prev_wheel_mat = se3_matrix(state.prev_wheel_q, state.prev_wheel_t)

    # ------------------------------------------------------------------
    # 1. Initial transform (Estimator.cpp:176-200)
    # ------------------------------------------------------------------
    finite_prev = jnp.all(jnp.isfinite(trk.prev_p_robot), axis=-1)
    match_mask = trk.temporal_mask & finite_prev
    n_matches = jnp.sum(match_mask)
    # Sanitize masked-out entries: NaNs would poison the PnP reductions even
    # at zero weight (0 * NaN = NaN).
    prev_p_robot = jnp.where(
        finite_prev[:, None], trk.prev_p_robot, jnp.zeros(3, dtype)
    )

    use_wheel = (cfg.sensor_strategy >= 2) & wheel_valid
    wheel_delta = mat_inv_se3(prev_wheel_mat) @ wheel_pose
    wheel_delta = jnp.where(state.prev_wheel_valid, wheel_delta, eye4)

    # PnP branch: prev-robot-frame 3D points against current pixels, with
    # the "camera pose" (guess * Tri)^-1 mapping robot-frame points into the
    # current camera (MultiviewGeometry.cpp:137-146).
    guess_cam = mat_inv_se3(guess_delta @ cam.t_ri)
    q0 = mat_to_quat(guess_cam[:3, :3])
    t0 = guess_cam[:3, 3]
    res_pnp = pnp.solve_pnp_ransac(
        prev_p_robot, trk.temporal_uv, match_mask, q0, t0,
        cam.fx, cam.fy, cam.cx, cam.cy, rng_key, cfg.pnp,
    )
    # transform = (Tri * pnp)^-1 (MultiviewGeometry.cpp:147-157)
    pnp_mat = se3_matrix(res_pnp.q, res_pnp.t)
    pnp_transform = mat_inv_se3(cam.t_ri @ pnp_mat)
    pnp_valid = res_pnp.ok & (n_matches >= cfg.min_inliers)

    transform = jnp.where(
        use_wheel, wheel_delta, jnp.where(pnp_valid, pnp_transform, zero4)
    )
    inlier_mask = jnp.where(use_wheel, match_mask, res_pnp.inliers & match_mask)
    transform_ok = use_wheel | pnp_valid

    # Bootstrap: an empty window accepts the first frame unconditionally at
    # the current pose (the reference reaches the same state one frame later
    # because its tracker keeps words in the Signature even when the
    # estimator can't produce a transform yet).
    bootstrap = ~jnp.any(state.window.valid)
    sig_pose = jnp.where(transform_ok, pose_mat @ transform, pose_mat)
    wheel_pose_eff = jnp.where(
        wheel_valid, wheel_pose,
        jnp.where(
            (cfg.sensor_strategy >= 2) & transform_ok,
            prev_wheel_mat @ transform, zero4,
        ),
    )
    wheel_valid_eff = wheel_valid | (
        (cfg.sensor_strategy >= 2) & transform_ok & state.prev_wheel_valid
    )

    # ------------------------------------------------------------------
    # 2. Window insertion + keyframe decision (LocalMap::insertSignature)
    # ------------------------------------------------------------------
    inserted = transform_ok | bootstrap
    window = WindowState(
        frame_id=window.frame_id.at[cur].set(
            jnp.where(inserted, frame_id, -1)
        ),
        valid=window.valid.at[cur].set(inserted),
        pose_q=window.pose_q.at[cur].set(mat_to_quat(sig_pose[:3, :3])),
        pose_t=window.pose_t.at[cur].set(sig_pose[:3, 3]),
        wheel_q=window.wheel_q.at[cur].set(
            mat_to_quat(wheel_pose_eff[:3, :3])
        ),
        wheel_t=window.wheel_t.at[cur].set(wheel_pose_eff[:3, 3]),
        wheel_valid=window.wheel_valid.at[cur].set(wheel_valid_eff),
        stamp=window.stamp.at[cur].set(stamp),
    )
    # Observations of a non-inserted (lost) frame stay in the table so the
    # tracker keeps continuity — the window slot is simply invalid and BA
    # ignores its column (the reference equivalently keeps words in the
    # Signature while skipping LocalMap::insertSignature).

    # New features: convert stored robot-frame points to world (LocalMap.cpp:76)
    is_new = features.valid & (features.start_frame == frame_id)
    pw_world = mat_apply(sig_pose, features.pw)
    features = features._replace(
        pw=jnp.where(is_new[:, None], pw_world, features.pw)
    )
    # NEW_ADDED -> STABLE after > map_size observations (LocalMap.cpp:84-88)
    obs_count = jnp.sum(features.obs_mask, axis=1)
    features = features._replace(
        stable=features.stable | (features.valid & (obs_count > cfg.map_size))
    )

    # Keyframe decision (LocalMap.cpp:95-126)
    # parallax: mean displacement of temporal matches
    prev_uv = features.uv[:, prev]
    dpix = jnp.linalg.norm(trk.temporal_uv - prev_uv, axis=-1)
    n_par = jnp.maximum(jnp.sum(trk.temporal_mask), 1)
    parallax_mean = jnp.sum(jnp.where(trk.temporal_mask, dpix, 0.0)) / n_par
    keyframe, counters = keyframe_update(
        state.counters, trk.n_new, transform, transform_ok, parallax_mean,
        cfg.max_features, cfg.min_translation, cfg.min_parallax,
    )

    # ------------------------------------------------------------------
    # 2b. Laser pretreatment (Estimator.cpp:203-207, laserPretreatment)
    # ------------------------------------------------------------------
    use_laser = cfg.sensor_strategy >= 3 and state.laser is not None \
        and scan_points is not None
    if use_laser:
        from . import laser as laser_mod

        # De-skew with the carried velocity guess (zero when invalid:
        # compensation degrades to identity).
        vel = jnp.where(state.velocity_valid, state.velocity,
                        jnp.zeros(6, dtype))
        scan = laser_mod.pretreat(
            scan_points, scan_mask, state.laser.t_laser_robot,
            cfg.min_laser_range, cfg.max_laser_range,
            cfg.missing_data_ray_length,
            times=scan_times, velocity6=vel,
            n_subdivisions=cfg.num_subdivisions,
        )

    # ------------------------------------------------------------------
    # 3. Local BA (Estimator.cpp:215-315)
    # ------------------------------------------------------------------
    n_valid_sigs = jnp.sum(window.valid)
    n_live_feat = jnp.sum(features.valid)
    map_available = (n_valid_sigs >= 2) & (n_live_feat >= cfg.min_inliers)
    run_ba = transform_ok & (jnp.sum(inlier_mask) > cfg.min_inliers) \
        & map_available

    t_ri = cam.t_ri
    tcw_q, tcw_t = _twr_to_tcw(window.pose_q, window.pose_t, t_ri)

    # wheel-odometry links between consecutive valid slots (getSignatureLinks)
    w_mat = se3_matrix(window.wheel_q, window.wheel_t)
    rel = mat_inv_se3(w_mat[:-1]) @ w_mat[1:]
    # Tc1c2 = Tir * Tr1r2 * Tri (Optimizer.cpp:130-133)
    link_mat = cam.t_ir @ rel @ t_ri
    link_mask = (
        window.wheel_valid[:-1] & window.wheel_valid[1:]
        & window.valid[:-1] & window.valid[1:]
        & (cfg.sensor_strategy >= 2)
    )

    # landmarks need >= 2 window observations (LocalMap.cpp:276)
    lm_ba = features.valid & (obs_count >= 2)
    bf = cam.bf
    disparity = jnp.where(
        features.depth > 1e-6, bf / jnp.maximum(features.depth, 1e-6), 0.0
    )
    obs3 = jnp.stack(
        [
            features.uv[..., 0],
            features.uv[..., 1],
            features.uv[..., 0] - disparity,
        ],
        axis=-1,
    )

    # root: second-newest valid slot is fixed (Estimator.cpp:252 rootId)
    pose_fixed = (~window.valid) | (
        jnp.arange(W) == (W - 2)
    )

    intr = StereoIntrinsics(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=bf)

    # Laser-only strategies (4/5) drop visual landmarks and scan-match the
    # newest pose against the matching submap (Estimator.cpp:243-250).
    ba_obs_mask = features.obs_mask & lm_ba[:, None]
    laser_data = None
    if use_laser and cfg.sensor_strategy in (4, 5):
        from ..map2d.submap import has_matching_submap, matching_grid

        grid = matching_grid(state.laser.submaps)
        have_map = has_matching_submap(state.laser.submaps)
        cost_grid = state.laser.cost_table[grid.cells.astype(jnp.int32)]
        laser_data = ba.LaserData(
            points=scan.returns,
            mask=scan.returns_mask & have_map,
            cost_grid=cost_grid,
            resolution=grid.limits.resolution,
            max_x=grid.limits.max_x,
            max_y=grid.limits.max_y,
            t_ir=cam.t_ir,
            info=jnp.asarray(1.0 / cfg.laser_covariance, dtype),
        )
        ba_obs_mask = jnp.zeros_like(ba_obs_mask)

    problem = ba.BAProblem(
        pose_q=tcw_q, pose_t=tcw_t,
        pose_valid=window.valid, pose_fixed=pose_fixed,
        lm_pos=features.pw, lm_valid=lm_ba, lm_fixed=features.stable,
        obs=obs3, obs_mask=ba_obs_mask,
        link_q=mat_to_quat(link_mat[..., :3, :3]),
        link_t=link_mat[..., :3, 3],
        link_mask=link_mask,
        intr=intr,
        laser=laser_data,
    )
    ctx = EstimatorContext(
        features=features,
        window=window,
        counters=counters,
        keyframe=keyframe,
        transform=transform,
        transform_ok=transform_ok,
        inlier_mask=inlier_mask,
        run_ba=run_ba,
        map_available=map_available,
        lm_ba=lm_ba,
        bootstrap=bootstrap,
        sig_pose=sig_pose,
        pose_mat=pose_mat,
        prev_wheel_mat=prev_wheel_mat,
        wheel_pose_eff=wheel_pose_eff,
        wheel_valid_eff=wheel_valid_eff,
        n_matches=n_matches,
        scan=scan if use_laser else None,
    )
    return problem, ctx


def estimator_finalize(
    state: VOState,
    ctx: EstimatorContext,
    res_ba: ba.BAResult,
    stamp,
    cam: StereoCamera,
    cfg: EstimatorSettings,
) -> EstimatorResult:
    features = ctx.features
    window = ctx.window
    W = window.valid.shape[0]
    cur = W - 1
    prev = W - 2
    dtype = state.pose_t.dtype
    zero4 = jnp.zeros((4, 4), dtype=dtype)
    pose_mat = ctx.pose_mat
    transform = ctx.transform
    transform_ok = ctx.transform_ok
    inlier_mask = ctx.inlier_mask
    run_ba = ctx.run_ba
    use_laser = (cfg.sensor_strategy >= 3 and state.laser is not None
                 and ctx.scan is not None)
    scan = ctx.scan
    wheel_valid_eff = ctx.wheel_valid_eff
    prev_wheel_mat = ctx.prev_wheel_mat
    wheel_pose_eff = ctx.wheel_pose_eff
    map_available = ctx.map_available
    bootstrap = ctx.bootstrap
    sig_pose = ctx.sig_pose
    lm_ba = ctx.lm_ba

    ba_ok = res_ba.ok & run_ba

    # Post-BA: drop features with outlier edges from the inlier set
    # (Estimator.cpp:277-289)
    feat_outlier = jnp.any(res_ba.outliers, axis=1) & run_ba
    inlier_mask = inlier_mask & ~feat_outlier
    n_inliers = jnp.sum(inlier_mask)
    enough = n_inliers >= cfg.min_inliers

    opt_twr = _tcw_to_twr(res_ba.pose_q, res_ba.pose_t, cam.t_ir)
    current_global = jnp.where(
        ba_ok & enough, opt_twr[cur], pose_mat @ transform
    )
    transform = jnp.where(
        ba_ok & enough,
        mat_inv_se3(opt_twr[prev]) @ opt_twr[cur],
        jnp.where(ba_ok & ~enough, zero4, transform),
    )
    transform_ok = transform_ok & ~(ba_ok & ~enough)

    # ------------------------------------------------------------------
    # 4. Wheel tolerance override (Estimator.cpp:325-366)
    # ------------------------------------------------------------------
    # prev_wheel_valid gate: without a previous wheel pose, d_wheel would be
    # the ABSOLUTE wheel pose (prev = init identity) — after a restart
    # mid-odom-frame or a wheel dropout that "delta" spans the whole odom
    # origin offset / k frames and must not override a 1-frame visual
    # transform.
    wheel_branch = (wheel_valid_eff & state.prev_wheel_valid
                    & map_available & (cfg.sensor_strategy >= 2))
    d_wheel = mat_inv_se3(prev_wheel_mat) @ wheel_pose_eff
    wx, wy, _, _, _, _ = mat_to_xyzrpy(d_wheel)
    vx, vy, _, _, _, _ = mat_to_xyzrpy(transform)
    dx, dy = wx - vx, wy - vy
    denom = wx * wx + wy * wy
    wheel_moving = jnp.abs(denom) > 1e-12
    exceed = (dx * dx + dy * dy) / jnp.where(wheel_moving, denom, 1.0) \
        > cfg.tolerance_translation
    override = wheel_branch & (
        (wheel_moving & exceed) | (~wheel_moving)
    )
    transform = jnp.where(override, d_wheel, transform)
    current_global = jnp.where(override, pose_mat @ d_wheel, current_global)
    transform_ok = transform_ok | override

    # ------------------------------------------------------------------
    # 5. Force3DoF (Estimator.cpp:368-375)
    # ------------------------------------------------------------------
    if cfg.force_3dof:
        # Flatten the transform too (the reference flattens before either
        # is consumed): downstream velocity guess and the next frame's
        # sig_pose = pose @ transform must not reintroduce z/roll/pitch.
        current_global = flatten_3dof(current_global)
        transform = flatten_3dof(transform)

    # ------------------------------------------------------------------
    # 5b. Submap insertion at the fused global pose (Estimator.cpp:377-388)
    # ------------------------------------------------------------------
    laser_state = state.laser
    if use_laser:
        from ..map2d.submap import insert_range_data_active

        # On bootstrap with no transform, current_global = pose_mat @ zero4
        # is the zero matrix — scans must be placed at the signature pose
        # (== pose_mat on the first frame), never through the zero product.
        pose_for_map = jnp.where(transform_ok, current_global,
                                 jnp.where(bootstrap, sig_pose, pose_mat))
        hits_w = mat_apply(pose_for_map, scan.returns)[:, :2]
        miss_w = mat_apply(pose_for_map, scan.misses)[:, :2]
        origin_w = mat_apply(pose_for_map, scan.origin)[:2]
        new_submaps = insert_range_data_active(
            laser_state.submaps, origin_w,
            hits_w, scan.returns_mask, miss_w, scan.misses_mask,
            laser_state.hit_table, laser_state.miss_table,
            num_range_data_limit=cfg.num_range_data,
            samples=cfg.raycast_samples,
            insert_free_space=cfg.insert_free_space,
        )
        do_insert = (transform_ok | bootstrap) & jnp.any(scan.returns_mask)
        merged = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_insert, new, old),
            new_submaps, laser_state.submaps,
        )
        laser_state = laser_state._replace(submaps=merged)

    # ------------------------------------------------------------------
    # 6. LocalMap write-back (updateLocalMap, Estimator.cpp:391-395)
    # ------------------------------------------------------------------
    full_window = jnp.all(window.valid)
    do_update = ba_ok & full_window & transform_ok
    new_q = mat_to_quat(current_global[:3, :3])
    new_t = current_global[:3, 3]
    opt_q = mat_to_quat(opt_twr[..., :3, :3]).at[cur].set(new_q)
    opt_t = opt_twr[..., :3, 3].at[cur].set(new_t)
    window = window._replace(
        pose_q=jnp.where(do_update, opt_q, window.pose_q).at[cur].set(
            jnp.where(transform_ok, new_q, window.pose_q[cur])
        ),
        pose_t=jnp.where(do_update, opt_t, window.pose_t).at[cur].set(
            jnp.where(transform_ok, new_t, window.pose_t[cur])
        ),
    )
    # landmark write-back for NEW_ADDED features only (LocalMap.cpp:183-189)
    lm_update = do_update & lm_ba & ~features.stable
    features = features._replace(
        pw=jnp.where(lm_update[:, None], res_ba.lm_pos, features.pw)
    )

    # Outlier-edge removal + error-vertex blocking (LocalMap.cpp:191-226)
    rm_obs = res_ba.outliers & do_update
    obs_mask2 = features.obs_mask & ~rm_obs
    obs_count2 = jnp.sum(obs_mask2, axis=1)
    if W >= 3:
        third_newest_id = window.frame_id[W - 3]
    else:
        # No "third newest" slot in a degenerate <=1-size window: blocking
        # by age is disabled (W-3 would wrap to the newest slot and block
        # nearly everything).
        third_newest_id = jnp.asarray(-1, window.frame_id.dtype)
    error_feature = (
        features.valid
        & (obs_count2 == 0)
        & ~features.stable
        & (features.start_frame < third_newest_id)
        & jnp.any(rm_obs, axis=1)
    )
    # blocked words: their LAST OBSERVED position (for the detection mask).
    # uv[:, cur] is zero for features not tracked into the current frame —
    # using it would block detection around pixel (0, 0) instead.
    last_col = (W - 1) - jnp.argmax(
        features.obs_mask[:, ::-1].astype(I32), axis=1
    )
    last_col = jnp.where(jnp.any(features.obs_mask, axis=1), last_col, 0)
    last_uv = jnp.take_along_axis(
        features.uv, last_col[:, None, None].repeat(2, axis=2), axis=1
    )[:, 0]
    B = state.blocked_uv.shape[0]
    blk_score = jnp.where(error_feature, 1.0, -jnp.inf)
    _, blk_idx = jax.lax.top_k(blk_score, min(B, blk_score.shape[0]))
    blocked_valid = jnp.take(error_feature, blk_idx)
    blocked_uv = jnp.take(last_uv, blk_idx, axis=0)
    if blocked_valid.shape[0] < B:
        pad = B - blocked_valid.shape[0]
        blocked_valid = jnp.concatenate(
            [blocked_valid, jnp.zeros(pad, bool)]
        )
        blocked_uv = jnp.concatenate(
            [blocked_uv, jnp.zeros((pad, 2), dtype)]
        )

    features = features._replace(
        obs_mask=obs_mask2,
        valid=features.valid & ~error_feature,
        track_cnt=jnp.where(error_feature, 0, features.track_cnt),
    )

    # ------------------------------------------------------------------
    # 7. Outputs + carried scalars (Estimator.cpp:397-447)
    # ------------------------------------------------------------------
    lost = ~transform_ok
    dt = stamp - state.prev_stamp
    x, y, z, roll, pitch, yaw = mat_to_xyzrpy(transform)
    vel6 = jnp.stack([x, y, z, roll, pitch, yaw]) / jnp.maximum(dt, 1e-6)
    velocity6 = jnp.where(lost, jnp.zeros(6, dtype), vel6)
    velocity_valid = ~lost & (dt > 0)

    pose_q = jnp.where(lost, state.pose_q, new_q)
    pose_t = jnp.where(lost, state.pose_t, new_t)

    cov_scale = jnp.where(lost, _BAD_COVARIANCE, 1.0)
    covariance = jnp.eye(6, dtype=dtype) * cov_scale

    return EstimatorResult(
        features=features,
        window=window,
        counters=ctx.counters,
        pose_q=pose_q,
        pose_t=pose_t,
        transform=jnp.where(transform_ok, transform, zero4),
        keyframe=ctx.keyframe,
        lost=lost,
        velocity6=velocity6,
        velocity_valid=velocity_valid,
        n_matches=ctx.n_matches,
        n_inliers=n_inliers,
        ba_chi2=res_ba.chi2,
        ba_ok=ba_ok,
        blocked_uv=blocked_uv,
        blocked_valid=blocked_valid,
        covariance=covariance,
        laser=laser_state,
    )


def estimator_step(
    state: VOState,
    trk: TrackerOutput,
    stamp,
    wheel_pose,
    wheel_valid,
    guess_delta,
    cam: StereoCamera,
    cfg: EstimatorSettings,
    rng_key,
    scan_points=None,
    scan_mask=None,
    scan_times=None,
) -> EstimatorResult:
    """Full back-end step = prepare -> local BA -> finalize (the fused
    production path; the split exists for host-side stage profiling)."""
    problem, ctx = estimator_prepare(
        state, trk, stamp, wheel_pose, wheel_valid, guess_delta, cam, cfg,
        rng_key, scan_points=scan_points, scan_mask=scan_mask,
        scan_times=scan_times,
    )
    res_ba = ba.local_optimize(problem, cfg.ba)
    return estimator_finalize(state, ctx, res_ba, stamp, cam, cfg)


def marginalize(features: FeatureTable, window: WindowState, keyframe,
                ) -> Tuple[FeatureTable, WindowState]:
    """Slide the window before a new frame (LocalMap::removeSignature).

    Newest stays at slot W-1 -> after sliding it sits at W-2 and W-1 is
    free.  If the window is full: keyframe drops the oldest (slot 0,
    shift-left), otherwise the second-newest (slot W-2) is dropped
    (LocalMap.cpp:142-147).  A non-full window just shifts left.
    """
    W = window.valid.shape[0]
    full = jnp.all(window.valid)
    shift = jnp.arange(1, W + 1) % W  # [1, 2, ..., W-1, 0]
    drop2 = jnp.concatenate(
        [jnp.arange(0, W - 2), jnp.array([W - 1, 0])]
    )
    perm = jnp.where(full & ~keyframe, drop2, shift)
    # The slide happens EVERY frame, including after a lost frame whose
    # window slot is invalid: the tracker reads the previous frame's
    # observations from column W-2, so the lost frame's re-detections must
    # move there like any other frame's (the reference equivalently keeps
    # Tracker::lastSignature_ continuity regardless of LocalMap
    # insertion).  An earlier round gated the slide on window.valid[W-1]
    # "to avoid draining older signatures during lost streaks"; that
    # silently parked the lost frame's features in the current column,
    # desyncing tracking forever (every frame re-detected, matched
    # nothing, and leaked table slots until famine).  Sliding an invalid
    # newest slot is harmless — validity moves with it, BA ignores
    # invalid columns — and a lost streak longer than the window drains
    # it to the bootstrap path, which IS the desired full re-init.

    def g(x):
        return jnp.take(x, perm, axis=0)

    window2 = WindowState(
        frame_id=g(window.frame_id).at[W - 1].set(-1),
        valid=g(window.valid).at[W - 1].set(False),
        pose_q=g(window.pose_q).at[W - 1].set(
            jnp.array([1.0, 0, 0, 0], window.pose_q.dtype)
        ),
        pose_t=g(window.pose_t).at[W - 1].set(0.0),
        wheel_q=g(window.wheel_q).at[W - 1].set(
            jnp.array([1.0, 0, 0, 0], window.wheel_q.dtype)
        ),
        wheel_t=g(window.wheel_t).at[W - 1].set(0.0),
        wheel_valid=g(window.wheel_valid).at[W - 1].set(False),
        stamp=g(window.stamp).at[W - 1].set(0.0),
    )

    def gc(x):
        return jnp.take(x, perm, axis=1)

    obs = gc(features.obs_mask).at[:, W - 1].set(False)
    features2 = features._replace(
        uv=gc(features.uv).at[:, W - 1].set(0.0),
        uv_right=gc(features.uv_right).at[:, W - 1].set(0.0),
        depth=gc(features.depth).at[:, W - 1].set(0.0),
        obs_mask=obs,
    )

    # Feature cleanup (LocalMap.cpp:152-162): no observations left AND
    # (STABLE or last seen before the window start) -> free the slot.
    obs_count = jnp.sum(obs, axis=1)
    oldest_id = jnp.min(
        jnp.where(window2.valid, window2.frame_id, jnp.iinfo(jnp.int32).max)
    )
    dead = features2.valid & (obs_count == 0) & (
        features2.stable | (features2.end_frame < oldest_id)
    )
    features2 = features2._replace(
        valid=features2.valid & ~dead,
        track_cnt=jnp.where(dead, 0, features2.track_cnt),
    )
    return features2, window2
