"""Front-end tracker stage: feature lifecycle per frame, fully batched.

Replaces the reference Tracker thread (corelib/src/Tracker.cpp:167-419
imageProcess) with one jit-safe stage over the fixed-capacity feature table:

  * temporal tracking: pyramidal LK from the previous left image with
    projected-guess initialization (Tracker.cpp:237-258), reverse-flow
    consistency at 1.5 px (Tracker.cpp:260-274);
  * lost-tracking detection vs MinInliers (Tracker.cpp:303-307);
  * re-detection: GFTT top-up to MaxFeatures with min-distance suppression
    around surviving tracks (track-count priority is inherent: live tracks
    always suppress candidates) and blocked words at half radius
    (getMask, Tracker.cpp:116-141);
  * stereo matching: left->right LK with 0.5 px reverse gate
    (Tracker.cpp:344-382), triangulation with depth gating
    (generateKeyPoints3DStereo);
  * track-counter update (Tracker.cpp:98-114).

Conventions: at stage entry the feature table's newest occupied observation
column is W-2 (the previous frame); the current frame writes column W-1.
The estimator stage later marginalizes one slot and shifts columns left.

Deviations from the reference (documented, behavior-equivalent):
  * on lost tracking the reference returns without words and re-bootstraps
    on the *next* frame; we drop the tracks and re-detect on the current
    frame immediately (one frame faster to recover);
  * Tracker/CullByFundationMatrix selects an 8-point + Sampson-distance
    RANSAC cull (ops/fundamental.py) applied instead of the reverse-flow
    gate, mirroring the reference's either/or at Tracker.cpp:260-277.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.camera import StereoCamera, triangulate_stereo
from ..core.lie import mat_apply, mat_inv_se3
from ..ops.gftt import gftt_detect
from ..ops.lk import (LKParams, build_lk_pyramid, lk_track_bidirectional_pyr,
                      lk_track_pyr)
from .state import FeatureTable, I32


class TrackerOutput(NamedTuple):
    features: FeatureTable  # table with current-frame observations written
    left_pyr: tuple  # ((img, gx, gy) per level) — carried to the next frame
    temporal_mask: jnp.ndarray  # [F] tracked from prev frame (pre-stereo)
    temporal_uv: jnp.ndarray  # [F, 2] current-frame uv of temporal matches
    prev_p_robot: jnp.ndarray  # [F, 3] prev-frame robot-frame 3D points
    n_tracked: jnp.ndarray  # temporal survivors
    n_new: jnp.ndarray  # newly added features
    track_lost: jnp.ndarray  # bool
    next_fid: jnp.ndarray  # updated id counter


def backproject(cam: StereoCamera, uv, depth):
    """Pixels + image-frame depth -> robot-frame 3D points ([...,2],[...]) ."""
    z = depth
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    p_img = jnp.stack([x, y, z], axis=-1)
    return mat_apply(cam.t_ri, p_img)


def tracker_step(
    features: FeatureTable,
    prev_left, prev_right,  # noqa: ARG001 (right kept for parity/monitor)
    left, right,
    has_prev,
    guess_delta,  # [4,4] robot-frame motion prior prev->cur
    blocked_uv, blocked_valid,
    next_fid,
    frame_id,
    cam: StereoCamera,
    *,
    max_features: int,
    quality_level: float,
    min_distance: int,
    min_inliers: int,
    flow_back: bool,
    min_depth: float,
    max_depth: float,
    lk_params: LKParams,
    rgbd: bool = False,
    cull_fundamental: bool = False,
    fundamental_threshold: float = 1.0,
    rng_key=None,
    prev_pyr=None,
) -> TrackerOutput:
    Fcap = features.capacity
    W = features.window
    prev_col = W - 2
    cur_col = W - 1
    dtype = left.dtype

    # One pyramid (+ gradients) per unique image, shared by all four LK
    # passes — the reference likewise shares cv::buildOpticalFlowPyramid
    # outputs across its calcOpticalFlowPyrLK calls (Tracker.cpp:207-360).
    # prev_pyr may be passed in (carried state from the previous frame).
    if prev_pyr is None:
        prev_pyr = build_lk_pyramid(prev_left, lk_params)
    left_pyr = build_lk_pyramid(left, lk_params)
    right_pyr = None if rgbd else build_lk_pyramid(right, lk_params)

    # ------------------------------------------------------------------
    # 1. Temporal tracking prev -> cur, COMPACTED to live features
    # ------------------------------------------------------------------
    # At most max_features slots carry a previous-frame observation (the
    # per-frame write budget), so the LK passes run on a compact [M] buffer
    # instead of all Fcap table slots: the pass sizes stay constant no
    # matter how large the table capacity is (capacity only buys window
    # history for marginalized features, it must not cost LK time).
    M = max_features
    prev_mask = features.valid & features.obs_mask[:, prev_col] & has_prev
    # Stable argsort: live slots first, ascending slot order.
    comp_idx = jnp.argsort(~prev_mask)[:M]
    comp_live = prev_mask[comp_idx]  # [M]
    prev_uv_c = features.uv[comp_idx, prev_col]
    prev_depth_c = features.depth[comp_idx, prev_col]
    p_prev_robot_c = backproject(cam, prev_uv_c, prev_depth_c)

    # Projected initial guess (Tracker.cpp:237-252): project prev 3D points
    # through the inverse motion guess into the current camera.
    t_ir = cam.t_ir
    guess_inv = mat_inv_se3(guess_delta)
    p_cur_img = mat_apply(t_ir @ guess_inv, p_prev_robot_c)
    z = jnp.where(jnp.abs(p_cur_img[:, 2]) < 1e-6, 1e-6, p_cur_img[:, 2])
    guess_uv = jnp.stack(
        [
            p_cur_img[:, 0] / z * cam.fx + cam.cx,
            p_cur_img[:, 1] / z * cam.fy + cam.cy,
        ],
        axis=-1,
    )
    good_guess = (p_cur_img[:, 2] > 0.05) & jnp.all(
        jnp.isfinite(guess_uv), axis=-1
    )
    init_uv_c = jnp.where(good_guess[:, None], guess_uv, prev_uv_c)

    if flow_back:
        trk_c = lk_track_bidirectional_pyr(
            prev_pyr, left_pyr, prev_uv_c, init_uv_c, comp_live, lk_params,
            fb_threshold=1.5,
        )
    else:
        trk_c = lk_track_pyr(prev_pyr, left_pyr, prev_uv_c, init_uv_c,
                             comp_live, lk_params)
        if cull_fundamental:
            # Tracker/CullByFundationMatrix path (Tracker.cpp:275-277,
            # 83-96): epipolar RANSAC replaces the reverse-flow gate.
            from ..ops.fundamental import cull_with_fundamental

            inl, _ = cull_with_fundamental(
                prev_uv_c, trk_c.points, trk_c.status & comp_live, rng_key,
                threshold=fundamental_threshold,
            )
            trk_c = trk_c._replace(status=trk_c.status & inl)

    inb_c = (
        (trk_c.points[:, 0] >= 0) & (trk_c.points[:, 0] < cam.width)
        & (trk_c.points[:, 1] >= 0) & (trk_c.points[:, 1] < cam.height)
    )
    tm_c = trk_c.status & inb_c & comp_live
    n_tracked = jnp.sum(tm_c)

    # Lost tracking (Tracker.cpp:303-307): drop everything, re-bootstrap now.
    track_lost = has_prev & (n_tracked < min_inliers)
    tm_c = tm_c & ~track_lost
    n_tracked = jnp.sum(tm_c)

    # Scatter the compact temporal results back to table-slot layout for
    # the estimator (PnP correspondences) and the feature-table write.
    temporal_uv = jnp.zeros((Fcap, 2), dtype=trk_c.points.dtype
                            ).at[comp_idx].set(trk_c.points)
    temporal_mask = jnp.zeros((Fcap,), bool).at[comp_idx].set(tm_c)
    p_prev_robot = jnp.zeros((Fcap, 3), dtype=p_prev_robot_c.dtype
                             ).at[comp_idx].set(p_prev_robot_c)

    # ------------------------------------------------------------------
    # 2. Re-detection top-up (budget = MaxFeatures - survivors)
    # ------------------------------------------------------------------
    det = gftt_detect(
        left, max_features, quality_level, min_distance,
        existing_pts=temporal_uv, existing_mask=temporal_mask,
        blocked_pts=blocked_uv, blocked_mask=blocked_valid,
    )
    budget = jnp.maximum(max_features - n_tracked, 0)
    rank = jnp.arange(det.points.shape[0])
    new_uv = det.points
    new_cand = det.valid & (rank < budget)

    # ------------------------------------------------------------------
    # 3. Depth association: stereo LK matching + triangulation, or (RGBD)
    #    direct depth lookup with a virtual disparity — the docx §1
    #    unification the reference declares but leaves TODO
    #    (Tracker.cpp:228).
    # ------------------------------------------------------------------
    all_uv = jnp.concatenate([trk_c.points, new_uv], axis=0)  # [2M]
    all_mask = jnp.concatenate([tm_c, new_cand], axis=0)
    if rgbd:
        # `right` is the depth image (meters).  Sample at feature positions;
        # the virtual right observation uR = uL - bf/z feeds the same BA
        # stereo factor (doc/Stereo&&RGBDBAOptimization.docx §1).
        xi = jnp.clip(all_uv[:, 0].astype(jnp.int32), 0, cam.width - 1)
        yi = jnp.clip(all_uv[:, 1].astype(jnp.int32), 0, cam.height - 1)
        z = right[yi, xi]
        depth_ok = (
            jnp.isfinite(z)
            & jnp.where(min_depth < 0.0, z > 0.0, z > min_depth)
            & jnp.where(max_depth <= 0.0, True, z <= max_depth)
        )
        cur_ok = all_mask & depth_ok
        z_safe = jnp.where(cur_ok, z, 1.0)
        uvr_all = jnp.stack(
            [all_uv[:, 0] - cam.bf / z_safe, all_uv[:, 1]], axis=-1
        )
        x_img = (all_uv[:, 0] - cam.cx) / cam.fx * z_safe
        y_img = (all_uv[:, 1] - cam.cy) / cam.fy * z_safe
        p_img = jnp.stack([x_img, y_img, z_safe], axis=-1)
        p3d_robot = mat_apply(cam.t_ri, p_img)
        p_img_z = jnp.where(cur_ok, z_safe, 0.0)
        st_points = uvr_all
    else:
        if flow_back:
            st = lk_track_bidirectional_pyr(
                left_pyr, right_pyr, all_uv, all_uv, all_mask, lk_params,
                fb_threshold=0.5,
            )
        else:
            st = lk_track_pyr(left_pyr, right_pyr, all_uv, all_uv, all_mask,
                              lk_params)
        st_inb = (
            (st.points[:, 0] >= 0) & (st.points[:, 0] < cam.width)
            & (st.points[:, 1] >= 0) & (st.points[:, 1] < cam.height)
        )
        stereo_ok = st.status & st_inb & all_mask
        p3d_robot, tri_ok = triangulate_stereo(
            cam, all_uv, st.points, min_depth, max_depth
        )
        cur_ok = stereo_ok & tri_ok
        p_img_z = jnp.where(
            cur_ok,
            mat_apply(cam.t_ir,
                      jnp.where(cur_ok[:, None], p3d_robot, 0.0))[:, 2],
            0.0,
        )
        st_points = st.points

    # Scatter the compact stereo results for surviving tracks back to
    # table-slot layout; the new-candidate half stays compact ([M]) for
    # the allocation pass below.
    trk_ok = jnp.zeros((Fcap,), bool).at[comp_idx].set(cur_ok[:M])
    trk_uvr = jnp.zeros((Fcap, 2), dtype=st_points.dtype
                        ).at[comp_idx].set(st_points[:M])
    trk_depth = jnp.zeros((Fcap,), dtype=p_img_z.dtype
                          ).at[comp_idx].set(p_img_z[:M])
    new_ok = cur_ok[M:]
    new_uvr = st_points[M:]
    new_depth = p_img_z[M:]

    # ------------------------------------------------------------------
    # 4. Write surviving tracks' current observations into column W-1
    # ------------------------------------------------------------------
    f = features
    uv = f.uv.at[:, cur_col].set(jnp.where(trk_ok[:, None], temporal_uv, 0.0))
    uvr = f.uv_right.at[:, cur_col].set(
        jnp.where(trk_ok[:, None], trk_uvr, 0.0)
    )
    depth = f.depth.at[:, cur_col].set(jnp.where(trk_ok, trk_depth, 0.0))
    obs = f.obs_mask.at[:, cur_col].set(trk_ok)
    end_frame = jnp.where(trk_ok, frame_id, f.end_frame)
    track_cnt = jnp.where(trk_ok, f.track_cnt + 1, jnp.zeros_like(f.track_cnt))

    # ------------------------------------------------------------------
    # 5. Allocate slots for accepted new features
    # ------------------------------------------------------------------
    free = ~f.valid
    n_free = jnp.sum(free)
    # indices of free slots, ascending; non-free pushed to the end
    slot_rank = jnp.arange(Fcap)
    slot_order = jnp.argsort(jnp.where(free, slot_rank, Fcap + slot_rank))
    accepted = new_ok
    acc_rank = jnp.cumsum(accepted.astype(I32)) - 1  # rank among accepted
    has_slot = accepted & (acc_rank < n_free)
    target_slot = jnp.where(
        has_slot, slot_order[jnp.clip(acc_rank, 0, Fcap - 1)], Fcap
    )  # Fcap = out-of-bounds -> dropped by scatter

    n_new = jnp.sum(has_slot)
    new_fids = jnp.where(has_slot, next_fid + acc_rank, -1)

    fid = f.fid.at[target_slot].set(new_fids, mode="drop")
    valid = f.valid.at[target_slot].set(has_slot, mode="drop")
    uv = uv.at[target_slot, cur_col].set(new_uv, mode="drop")
    uvr = uvr.at[target_slot, cur_col].set(new_uvr, mode="drop")
    depth = depth.at[target_slot, cur_col].set(new_depth, mode="drop")
    obs = obs.at[target_slot].set(
        jnp.zeros((max_features, W), dtype=bool).at[:, cur_col].set(has_slot),
        mode="drop",
    )
    # world positions: pw = Twr_cur * p_robot — the caller supplies the pose
    # later; store robot-frame point for now, converted by the estimator
    # when the signature pose is known (LocalMap.cpp:76: Twr * p).
    pw = f.pw.at[target_slot].set(p3d_robot[M:], mode="drop")
    stable = f.stable.at[target_slot].set(jnp.zeros(max_features, bool),
                                          mode="drop")
    track_cnt = track_cnt.at[target_slot].set(
        jnp.ones(max_features, I32), mode="drop"
    )
    start_frame = f.start_frame.at[target_slot].set(
        jnp.full(max_features, frame_id, I32), mode="drop"
    )
    end_frame = end_frame.at[target_slot].set(
        jnp.full(max_features, frame_id, I32), mode="drop"
    )

    new_features = FeatureTable(
        fid=fid, valid=valid, uv=uv, uv_right=uvr, depth=depth, obs_mask=obs,
        pw=pw, stable=stable, track_cnt=track_cnt,
        start_frame=start_frame, end_frame=end_frame,
    )
    return TrackerOutput(
        features=new_features,
        left_pyr=tuple(
            (left_pyr.levels[i], left_pyr.gx[i], left_pyr.gy[i])
            for i in range(len(left_pyr.levels))
        ),
        temporal_mask=temporal_mask,
        temporal_uv=temporal_uv,
        prev_p_robot=p_prev_robot,
        n_tracked=n_tracked,
        n_new=n_new,
        track_lost=track_lost,
        next_fid=next_fid + n_new,
    )
