"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for the reference's four cv::calcOpticalFlowPyrLK
call sites (corelib/src/Tracker.cpp:207,257,263,354,360): temporal forward
flow with projected initial guess, reverse-flow consistency, and left<->right
stereo matching all share this one batched kernel family.

Semantics follow OpenCV's implementation:
  * image pyramids with 5x5 binomial downsampling;
  * per level, the spatial gradient matrix G is computed once from the
    `from` patch; the iterative update samples only the `to` patch;
  * termination: max iterations OR per-feature step below eps
    (Tracker params FlowIterations=30, FlowEps=0.01, FlowWinSize=21,
    FlowMaxLevel=3 — Parameters.h:154-157);
  * OPTFLOW_LK_GET_MIN_EIGENVALS + minEigThreshold=1e-4: features whose
    min eigenvalue of G / window-area falls below threshold are failed.

All features are tracked in parallel (vmap over the feature axis); the
iteration loop is a lax.while_loop on the still-active set so typical
sequences stop after a handful of iterations instead of the worst case 30.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import build_pyramid, scharr_gradients


class LKParams(NamedTuple):
    win_size: int = 21
    max_level: int = 3
    iterations: int = 30
    eps: float = 0.01
    min_eig_threshold: float = 1e-4
    # Image-math dtype: "float32" (exact reference semantics) or
    # "bfloat16".  bf16 runs the patch-sampling selector matmuls — the
    # front-end's dominant MXU work — at the MXU's native-rate.  Pixel
    # values round to ~0.4%; every selector matmul row has <= 2 nonzero
    # taps (tent/one-hot weights), so there is no long-sum accumulation
    # error.  Coordinates, tent-weight construction, G statistics, and the
    # flow state itself stay float32 throughout.
    compute_dtype: str = "float32"
    # Iterations per while-loop step.  The loop bookkeeping (scalar cond +
    # any() reduction) costs more than the tiny per-iteration matmuls, so
    # several iterations run per check; converged features' updates are
    # masked to zero so the eps exit only coarsens in granularity, never in
    # semantics.  unroll >= iterations turns the loop into a fully static
    # chain (no early exit, maximal async pipelining).
    unroll: int = 3
    # Setup-patch extraction: True = one-hot region gather + in-region tent
    # matmuls; False = tent selectors against the full level image.  Both
    # are numerically identical; see _track_level.
    setup_region: bool = True
    # How the integer-aligned row regions are pulled out of the level
    # image: "matmul" = one-hot selector contraction (fuses into the MXU
    # stream; best single-stream latency), "gather" = one jnp.take of the
    # region rows (one DMA gather; ~HBM-bandwidth cost, amortizes the TPU
    # gather latency floor across a vmapped fleet axis, where the one-hot
    # contraction's N*Rows*H*W FLOPs scale linearly with batch).
    # Numerically identical either way.
    region_extract: str = "matmul"
    # "jnp" (default) or "pallas".  The Pallas kernel (ops/pallas) keeps
    # each pyramid level resident in VMEM and runs one feature's full
    # iteration loop per grid step with aligned-block loads + dynamic
    # rotates.  It is numerically interchangeable with the jnp path but
    # serializes features over the grid, while the jnp formulation batches
    # all features through selector-matmul sampling — measured ~1.6x faster
    # at 240 features / VGA — so jnp is the default.
    backend: str = "jnp"
    # Iteration-loop formulation:
    #   "xcorr"  (default): the per-iteration patch sample collapses to a
    #     bilinear lookup in per-feature cross-correlation maps
    #     C1[a,b] = sum_pq region[a+p, b+q] * gx[p,q] (and C2 for gy),
    #     computed once at level setup — EXACTLY equal (up to float
    #     reassociation) to sampling the patch and reducing against the
    #     gradients, because bilinear sampling is linear in integer shifts.
    #     Each iteration then costs ~2x484 MACs/feature instead of two
    #     patch matmuls, and on TPU the whole loop runs inside ONE Pallas
    #     kernel (ops/pallas/lk_xcorr.py) — the fused-step's dominant cost
    #     was ~2000 tiny per-iteration kernel launches.
    #   "direct": sample the patch every iteration via tent-selector
    #     matmuls (the round-3 formulation; reference for equivalence
    #     tests).
    # Measured on the real chip (round 4): the xcorr map SETUP is a
    # batched-small-matmul ("npac,npq->nacq", batch 360, inner dims 21-42)
    # that the MXU pads to 128-lane tiles at ~3% utilization — ~0.65 ms
    # per level vs ~0.19 ms for the ENTIRE direct iteration sweep, so
    # xcorr loses end-to-end (48 vs 70 fps) despite its in-kernel loop
    # being ~free.  It also perturbs the textured-bench trajectory (ATE
    # 0.38 vs 0.17; sub-eps convergence-path divergence compounds over
    # 300 frames).  Kept as an opt-in experiment; "direct" is the
    # production default.
    iter_mode: str = "direct"


class LKResult(NamedTuple):
    points: jnp.ndarray  # [N, 2] tracked positions in `to` image
    status: jnp.ndarray  # [N] bool
    err: jnp.ndarray  # [N] min-eigenvalue error measure


class LKPyramid(NamedTuple):
    """Precomputed padded image pyramid + Scharr gradients.

    Building this once per image and sharing it across the four LK passes
    (temporal forward/reverse, stereo forward/reverse — the reference's four
    calcOpticalFlowPyrLK call sites share pyramids the same way via
    cv::buildOpticalFlowPyramid) saves ~60% of the front-end time: pyramid
    construction + gradients dominate over the iteration loop itself.
    """

    levels: tuple  # per level: padded image [Hl+2p, Wl+2p]
    gx: tuple  # per level: Scharr x-gradient of the padded image
    gy: tuple  # per level: Scharr y-gradient
    height: int  # unpadded level-0 dims (static)
    width: int
    pad: int


def lk_pad(params: LKParams) -> int:
    """Border padding of LK pyramid levels (window radius + interpolation
    guard).  Single source of truth — the carried-pyramid state
    (slam/state.init_pyramid_state) and the pyramid reconstruction in
    slam/system must size buffers with exactly this value."""
    return params.win_size // 2 + 2


def build_lk_pyramid(img, params: LKParams = LKParams()) -> LKPyramid:
    """Padded pyramid + gradients for use as either `from` or `to` image."""
    img = img.astype(jnp.dtype(params.compute_dtype))
    pad = lk_pad(params)
    levels, gxs, gys = [], [], []
    for im in build_pyramid(img, params.max_level):
        imp = jnp.pad(im, pad, mode="edge")
        gx, gy = scharr_gradients(imp)
        levels.append(imp)
        gxs.append(gx)
        gys.append(gy)
    h, w = img.shape
    return LKPyramid(tuple(levels), tuple(gxs), tuple(gys), h, w, pad)


def _track_level(img_from, img_to, grad_x, grad_y, pts_from, flow, active,
                 params: LKParams):
    """One pyramid level of LK for all features.

    pts_from: [N,2] feature positions at this level's scale.
    flow: [N,2] current flow estimate at this level's scale.
    Returns (flow, ok, min_eig).
    """
    win = params.win_size
    area = win * win
    h, w = img_from.shape
    # fdtype is the image-math dtype (float32, or bfloat16 under
    # LKParams.compute_dtype="bfloat16").  Coordinates, tent-weight
    # CONSTRUCTION, G statistics and the flow state are always float32:
    # bf16 cannot even represent integer row indices > 256 exactly, and the
    # G inverse / step updates need the full mantissa.  Only the selector
    # matmuls (the MXU-heavy sampling work) run in fdtype; each selector
    # row has <= 2 nonzero taps, so bf16 costs one rounding of the inputs
    # and nothing in accumulation.
    fdtype = img_from.dtype
    F = jnp.float32

    x0 = jnp.clip(pts_from[:, 0].astype(F) - win // 2, 0.0, w - win - 1.0)
    y0 = jnp.clip(pts_from[:, 1].astype(F) - win // 2, 0.0, h - win - 1.0)
    if params.setup_region:
        # Two-stage setup: integer-aligned (win+2)^2 regions of the three
        # planes via ONE-HOT selector contractions (XLA rewrites
        # dot(one_hot(iota==idx), X) into a cheap dynamic gather), then the
        # exact bilinear tent weights applied INSIDE the small region as
        # tiny batched matmuls.  Identical numerics to the full-image tent
        # path at ~1/500th of the nominal contraction FLOPs.
        Rs = win + 2
        six = jnp.clip(jnp.floor(x0).astype(jnp.int32), 0, w - Rs)
        siy = jnp.clip(jnp.floor(y0).astype(jnp.int32), 0, h - Rs)
        taps_s = jnp.arange(Rs, dtype=jnp.int32)
        rx = (jnp.arange(w, dtype=jnp.int32)[None, None, :]
              == (six[:, None, None] + taps_s[None, :, None])).astype(fdtype)
        if params.region_extract == "gather":
            # One row gather for all three planes, then one-hot column
            # contraction inside the [N, Rs, W] strip (cheap: W-sized).
            stack3 = jnp.stack([img_from, grad_x, grad_y])  # [3, H, W]
            ridx = siy[:, None] + taps_s[None, :]  # [N, Rs]
            rows3 = jnp.take(stack3, ridx, axis=1)  # [3, N, Rs, W]
            reg3 = jnp.einsum("snrw,ncw->nsrc", rows3, rx,
                              preferred_element_type=fdtype)
        else:
            ry = (jnp.arange(h, dtype=jnp.int32)[None, None, :]
                  == (siy[:, None, None]
                      + taps_s[None, :, None])).astype(fdtype)
            reg3 = []
            for plane in (img_from, grad_x, grad_y):
                rows_p = jnp.einsum("nrh,hw->nrw", ry, plane,
                                    preferred_element_type=fdtype)
                reg3.append(jnp.einsum("nrw,ncw->nrc", rows_p, rx,
                                       preferred_element_type=fdtype))
            reg3 = jnp.stack(reg3, axis=1)  # [N, 3, Rs, Rs]
        offy = y0 - siy.astype(F)
        offx = x0 - six.astype(F)
        taps_r = jnp.arange(Rs, dtype=F)
        taps_p = jnp.arange(win, dtype=F)
        sy = jnp.maximum(
            0.0,
            1.0 - jnp.abs(taps_r[None, None, :]
                          - (offy[:, None, None] + taps_p[None, :, None])),
        ).astype(fdtype)  # [N, win, Rs]
        sx = jnp.maximum(
            0.0,
            1.0 - jnp.abs(taps_r[None, None, :]
                          - (offx[:, None, None] + taps_p[None, :, None])),
        ).astype(fdtype)
        rows3 = jnp.einsum("npr,nsrc->nspc", sy, reg3,
                           preferred_element_type=fdtype)
        patches = jnp.einsum("nspc,nqc->nspq", rows3, sx,
                             preferred_element_type=F)  # [N,3,win,win] f32
    else:
        # Bilinear win x win patches of (image, grad_x, grad_y) for every
        # feature via separable tent-selector matmuls instead of
        # per-feature gathers: a vmap'd dynamic_slice lowers to a TPU
        # gather with a ~0.6 ms latency floor per call site regardless of
        # size, while
        #     patch = Sy @ img @ Sx^T,  S[p, r] = max(0, 1 - |r - (x0+p)|)
        # is exact 2-D bilinear interpolation as two MXU matmuls that fuse
        # with the rest of the level setup.
        stack3 = jnp.stack([img_from, grad_x, grad_y])  # [3, H, W]
        rows_h = jnp.arange(h, dtype=F)
        rows_w = jnp.arange(w, dtype=F)
        taps_p = jnp.arange(win, dtype=F)
        sy = jnp.maximum(
            0.0,
            1.0 - jnp.abs(rows_h[None, None, :]
                          - (y0[:, None, None] + taps_p[None, :, None])),
        ).astype(fdtype)  # [N, win, H]
        sx = jnp.maximum(
            0.0,
            1.0 - jnp.abs(rows_w[None, None, :]
                          - (x0[:, None, None] + taps_p[None, :, None])),
        ).astype(fdtype)  # [N, win, W]
        rows3 = jnp.einsum("nph,shw->nspw", sy, stack3,
                           preferred_element_type=fdtype)  # [N, 3, win, W]
        patches = jnp.einsum("nspw,nqw->nspq", rows3, sx,
                             preferred_element_type=F)  # [N,3,win,win] f32
    patch_i = patches[:, 0]
    gx = patches[:, 1]
    gy = patches[:, 2]
    g11 = jnp.sum(gx * gx, axis=(1, 2))
    g12 = jnp.sum(gx * gy, axis=(1, 2))
    g22 = jnp.sum(gy * gy, axis=(1, 2))
    det = g11 * g22 - g12 * g12
    trace = g11 + g22
    min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
    min_eig = min_eig / area
    ok_g = (min_eig > params.min_eig_threshold) & (det > 1e-12)

    inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
    # inverse of G (2x2), scaled
    gi11 = g22 * inv_det
    gi12 = -g12 * inv_det
    gi22 = g11 * inv_det

    # ------------------------------------------------------------------
    # Iteration loop with matmul-based patch sampling.
    #
    # Per-iteration gathers (vmap'd dynamic slices at evolving positions)
    # cost ~0.2 ms/iteration on TPU and dominate the front-end.  Instead we
    # extract one (win + 2*margin)^2 region per feature ONCE at the initial
    # position, and inside the loop sample the bilinear patch from it with
    # separable tent-weight selector matmuls:
    #     patch = Sy @ region @ Sx^T,   S[p, r] = max(0, 1 - |r - (off + p)|)
    # which is exactly 2-D bilinear interpolation, expressed as two small
    # batched matmuls (MXU work, no dynamic indexing).  Features whose flow
    # drifts beyond the margin clamp to the region edge and are culled by
    # the reverse-flow/bounds checks downstream.
    # ------------------------------------------------------------------
    margin = 10
    R = win + 1 + 2 * margin
    half = win // 2

    # Integer-aligned R x R regions of img_to per feature, again as one-hot
    # selector matmuls instead of a per-feature gather (same rationale as
    # the setup patches above).
    ctr = pts_from + flow
    oix = jnp.clip(
        jnp.floor(ctr[:, 0]).astype(jnp.int32) - half - margin, 0, w - R
    )
    oiy = jnp.clip(
        jnp.floor(ctr[:, 1]).astype(jnp.int32) - half - margin, 0, h - R
    )
    taps_r = jnp.arange(R, dtype=jnp.int32)
    rx = (jnp.arange(w, dtype=jnp.int32)[None, None, :]
          == (oix[:, None, None] + taps_r[None, :, None])).astype(fdtype)
    if params.region_extract == "gather":
        region_rows = jnp.take(
            img_to, oiy[:, None] + taps_r[None, :], axis=0)  # [N, R, W]
    else:
        ry = (jnp.arange(h, dtype=jnp.int32)[None, None, :]
              == (oiy[:, None, None] + taps_r[None, :, None])).astype(fdtype)
        region_rows = jnp.einsum("nph,hw->npw", ry, img_to,
                                 preferred_element_type=fdtype)  # [N, R, W]
    region = jnp.einsum("npw,nqw->npq", region_rows, rx,
                        preferred_element_type=fdtype)  # [N, R, R]
    origin = jnp.stack([oix, oiy], axis=-1).astype(F)  # (x, y) corners

    taps = jnp.arange(R, dtype=F)  # [R]
    prows = jnp.arange(win, dtype=F)  # [win]

    if params.iter_mode == "xcorr":
        return _iterate_xcorr(region, patch_i, gx, gy, gi11, gi12, gi22,
                              ok_g, min_eig, pts_from, flow, active, origin,
                              half, params)

    def sample_patches(flow):
        # top-left corner of the patch in region coordinates
        offx = pts_from[:, 0].astype(F) + flow[:, 0] - half - origin[:, 0]
        offy = pts_from[:, 1].astype(F) + flow[:, 1] - half - origin[:, 1]
        offx = jnp.clip(offx, 0.0, R - win - 1.0)
        offy = jnp.clip(offy, 0.0, R - win - 1.0)
        # tent selectors [N, win, R] (built f32, applied in fdtype)
        sy = jnp.maximum(
            0.0,
            1.0 - jnp.abs(taps[None, None, :]
                          - (offy[:, None, None] + prows[None, :, None])),
        ).astype(fdtype)
        sx = jnp.maximum(
            0.0,
            1.0 - jnp.abs(taps[None, None, :]
                          - (offx[:, None, None] + prows[None, :, None])),
        ).astype(fdtype)
        tmp = jnp.einsum("npr,nrc->npc", sy, region,
                         preferred_element_type=fdtype)  # [N, win, R]
        return jnp.einsum("npc,nqc->npq", tmp, sx,
                          preferred_element_type=F)  # [N, win, win] f32

    def one_step(flow, active_now):
        patch_j = sample_patches(flow)
        diff = patch_i - patch_j
        b1 = jnp.sum(diff * gx, axis=(1, 2))
        b2 = jnp.sum(diff * gy, axis=(1, 2))
        dx = gi11 * b1 + gi12 * b2
        dy = gi12 * b1 + gi22 * b2
        step = jnp.stack([dx, dy], axis=-1)
        new_flow = flow + jnp.where(active_now[:, None], step, 0.0)
        step_sq = jnp.sum(step * step, axis=-1)
        still = active_now & (step_sq >= params.eps * params.eps)
        return new_flow, still

    # Unroll `params.unroll` iterations per while step: the loop
    # bookkeeping and kernel-launch overhead (~16 us/iteration) dominates
    # the tiny per-iteration matmuls.  Converged features' updates are
    # masked to zero, so a coarser eps-exit granularity is harmless; the
    # iteration CAP stays exact — the while loop runs the largest multiple
    # of `unroll` below it and the remainder is peeled afterwards.
    unroll = min(max(params.unroll, 1), max(params.iterations, 1))
    main_iters = (params.iterations // unroll) * unroll

    def body(carry):
        flow, active_now, it = carry
        for _ in range(unroll):
            flow, active_now = one_step(flow, active_now)
        return flow, active_now, it + unroll

    def cond(carry):
        _, active_now, it = carry
        return (it < main_iters) & jnp.any(active_now)

    flow, active_now, _ = jax.lax.while_loop(
        cond, body, (flow, active & ok_g, jnp.zeros((), jnp.int32))
    )
    for _ in range(params.iterations - main_iters):
        flow, active_now = one_step(flow, active_now)
    return flow, ok_g, min_eig


def _xcorr_maps(region, gx, gy, win: int):
    """Per-feature cross-correlation maps of the `to` region against the
    `from` gradients: C[n,a,b] = sum_pq region[n,a+p,b+q] * g[n,p,q].

    Two-stage contraction with static shifted slices (no gathers): stack
    the win row-shifts of the region, contract p on the MXU, then sum the
    win shifted column-diagonals.  ~N*A*R*win^2 MACs — about the cost of
    EIGHT direct iterations, amortizing the 30-iteration loop.
    """
    N, R, _ = region.shape
    A = R - win + 1
    F = jnp.float32
    # RS[n, p, a, c] = region[n, a+p, c]
    RS = jnp.stack([region[:, p:p + A, :] for p in range(win)], axis=1)
    Y1 = jnp.einsum("npac,npq->nacq", RS, gx, preferred_element_type=F)
    Y2 = jnp.einsum("npac,npq->nacq", RS, gy, preferred_element_type=F)
    C1 = sum(Y1[:, :, q:q + A, q] for q in range(win))  # [N, A, A]
    C2 = sum(Y2[:, :, q:q + A, q] for q in range(win))
    return C1, C2


def _iterate_xcorr(region, patch_i, gx, gy, gi11, gi12, gi22, ok_g, min_eig,
                   pts_from, flow, active, origin, half, params: LKParams):
    """LK iteration loop in correlation form (see LKParams.iter_mode).

    b1 = sum (patch_i - patch_j) * gx = c1_const - bilinear(C1, off), and
    likewise for gy — exact up to float reassociation, since the bilinear
    patch sample is linear in the four integer-shifted patches.
    """
    F = jnp.float32
    win = params.win_size
    N, R, _ = region.shape
    A = R - win + 1
    C1, C2 = _xcorr_maps(region, gx, gy, win)
    c1_const = jnp.sum(patch_i * gx, axis=(1, 2))
    c2_const = jnp.sum(patch_i * gy, axis=(1, 2))
    base_x = pts_from[:, 0].astype(F) - half - origin[:, 0]
    base_y = pts_from[:, 1].astype(F) - half - origin[:, 1]

    # Backend: the Pallas loop kernel on real TPUs ("pallas-xcorr" forces
    # it, running the interpreter off-TPU for tests), the jnp while_loop
    # otherwise ("jnp-xcorr" forces that even on TPU).
    if params.backend == "jnp-xcorr":
        use_pallas = False
    elif params.backend == "pallas-xcorr":
        use_pallas = True
    else:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .pallas.lk_xcorr import lk_xcorr_iterate

        return lk_xcorr_iterate(
            C1, C2, c1_const, c2_const, gi11, gi12, gi22,
            base_x, base_y, flow, active & ok_g,
            iterations=params.iterations, eps=params.eps,
            max_off=float(R - win - 1),
            interpret=(jax.default_backend() != "tpu"),
        ), ok_g, min_eig

    ar = jnp.arange(A, dtype=F)

    def interp(C, wa, wb):
        return jnp.einsum("nab,na,nb->n", C, wa, wb,
                          preferred_element_type=F)

    def one_step(flow, active_now):
        offx = jnp.clip(base_x + flow[:, 0], 0.0, R - win - 1.0)
        offy = jnp.clip(base_y + flow[:, 1], 0.0, R - win - 1.0)
        wa = jnp.maximum(0.0, 1.0 - jnp.abs(ar[None, :] - offy[:, None]))
        wb = jnp.maximum(0.0, 1.0 - jnp.abs(ar[None, :] - offx[:, None]))
        b1 = c1_const - interp(C1, wa, wb)
        b2 = c2_const - interp(C2, wa, wb)
        dx = gi11 * b1 + gi12 * b2
        dy = gi12 * b1 + gi22 * b2
        step = jnp.stack([dx, dy], axis=-1)
        new_flow = flow + jnp.where(active_now[:, None], step, 0.0)
        step_sq = jnp.sum(step * step, axis=-1)
        still = active_now & (step_sq >= params.eps * params.eps)
        return new_flow, still

    unroll = min(max(params.unroll, 1), max(params.iterations, 1))
    main_iters = (params.iterations // unroll) * unroll

    def body(carry):
        flow, active_now, it = carry
        for _ in range(unroll):
            flow, active_now = one_step(flow, active_now)
        return flow, active_now, it + unroll

    def cond(carry):
        _, active_now, it = carry
        return (it < main_iters) & jnp.any(active_now)

    flow, active_now, _ = jax.lax.while_loop(
        cond, body, (flow, active & ok_g, jnp.zeros((), jnp.int32))
    )
    for _ in range(params.iterations - main_iters):
        flow, active_now = one_step(flow, active_now)
    return flow, ok_g, min_eig


def lk_track_pyr(pyr_from: LKPyramid, pyr_to: LKPyramid, pts_from, pts_init,
                 valid_mask, params: LKParams = LKParams()):
    """Track pts_from (in pyr_from's image) into pyr_to's image.

    Core LK over precomputed pyramids (see LKPyramid).  pts_init: [N,2]
    initial guesses in the `to` image (projected prediction, or just
    pts_from) — the OPTFLOW_USE_INITIAL_FLOW path (Tracker.cpp:251-258).
    valid_mask: [N] features to track.

    Returns LKResult(points, status, err).
    """
    h, w = pyr_from.height, pyr_from.width
    half = params.win_size // 2
    # Every level is padded by the window radius so windows never clip the
    # border (clamped extraction would silently shift patch content and
    # diverge the iteration — OpenCV handles this with partial-window
    # masking instead).
    pad = pyr_from.pad

    scale_top = 2.0 ** params.max_level
    flow = (pts_init - pts_from) / scale_top
    ok = valid_mask

    use_pallas = params.backend == "pallas"

    min_eig = jnp.zeros(pts_from.shape[0], dtype=jnp.float32)
    for level in range(params.max_level, -1, -1):
        scale = 2.0 ** level
        pts_l = pts_from / scale + pad
        img_f = pyr_from.levels[level]
        img_t = pyr_to.levels[level]
        gx = pyr_from.gx[level]
        gy = pyr_from.gy[level]
        if use_pallas:
            from .pallas.lk_kernel import lk_level_pallas

            flow, okf, min_eig = lk_level_pallas(
                img_f, img_t, gx, gy, pts_l, flow,
                ok.astype(img_f.dtype),
                win=params.win_size, iterations=params.iterations,
                eps=params.eps,
                min_eig_threshold=params.min_eig_threshold,
                # Mosaic only compiles on TPU; CPU (tests, virtual meshes)
                # runs the same kernel in the Pallas interpreter.
                interpret=(jax.default_backend() != "tpu"),
            )
            ok_g = okf > 0.0
        else:
            flow, ok_g, min_eig = _track_level(
                img_f, img_t, gx, gy, pts_l, flow, ok, params
            )
        ok = ok & ok_g
        if level > 0:
            flow = flow * 2.0

    pts_to = pts_from + flow
    inb = (
        (pts_to[:, 0] >= half)
        & (pts_to[:, 0] < w - half)
        & (pts_to[:, 1] >= half)
        & (pts_to[:, 1] < h - half)
    )
    status = ok & inb & valid_mask
    return LKResult(points=pts_to, status=status, err=min_eig)


def lk_track_bidirectional_pyr(pyr_from: LKPyramid, pyr_to: LKPyramid,
                               pts_from, pts_init, valid_mask,
                               params: LKParams = LKParams(),
                               fb_threshold: float = 1.5):
    """Forward LK + reverse-flow consistency gate (Tracker.cpp:260-274).

    The reverse pass is seeded with the original positions
    (OPTFLOW_USE_INITIAL_FLOW with cornersReverse = cornersFrom) and a track
    survives only if |reverse(forward(p)) - p| <= fb_threshold.
    """
    fwd = lk_track_pyr(pyr_from, pyr_to, pts_from, pts_init, valid_mask,
                       params)
    rev = lk_track_pyr(pyr_to, pyr_from, fwd.points, pts_from, fwd.status,
                       params)
    dist = jnp.linalg.norm(rev.points - pts_from, axis=-1)
    status = fwd.status & rev.status & (dist <= fb_threshold)
    return LKResult(points=fwd.points, status=status, err=fwd.err)


@partial(jax.jit, static_argnames=("params",))
def lk_track(img_from, img_to, pts_from, pts_init, valid_mask,
             params: LKParams = LKParams()):
    """lk_track_pyr on freshly built pyramids (standalone convenience)."""
    return lk_track_pyr(
        build_lk_pyramid(img_from, params), build_lk_pyramid(img_to, params),
        pts_from, pts_init, valid_mask, params,
    )


@partial(jax.jit, static_argnames=("params", "fb_threshold"))
def lk_track_bidirectional(img_from, img_to, pts_from, pts_init, valid_mask,
                           params: LKParams = LKParams(),
                           fb_threshold: float = 1.5):
    """lk_track_bidirectional_pyr on freshly built pyramids."""
    return lk_track_bidirectional_pyr(
        build_lk_pyramid(img_from, params), build_lk_pyramid(img_to, params),
        pts_from, pts_init, valid_mask, params, fb_threshold=fb_threshold,
    )
