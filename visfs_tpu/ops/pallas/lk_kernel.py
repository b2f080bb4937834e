"""Pallas TPU kernel for the pyramidal LK iteration loop.

Keeps the whole pyramid level (image pair + from-gradients) resident in
VMEM and runs each feature's full iteration loop in one grid step.  Mosaic
rejects dynamic VMEM loads at unaligned offsets ("cannot statically prove
index is a multiple of 8"), so patch reads load an (8,128)-aligned 32x256
block and shift out the misalignment with dynamic in-register rotates
(pltpu.roll); images are alignment-padded by the wrapper.

Grid: one program per feature.  The image blocks use a constant index map so
Mosaic keeps them in VMEM across the grid; per-feature scalars (positions,
flow, status) live in SMEM (Mosaic forbids scalar stores to VMEM).
Numerics match ops/lk.py (same bilinear patch extraction, gradient matrix,
eps/min-eig termination; cross-checked in tests and on-device to <0.01 px).

Measured on one real chip (240 features, VGA, win 21, 3 levels): ~5.4 ms vs
~3.4 ms for the jnp selector-matmul path — the grid serializes features
while the jnp path batches them, so this kernel is the opt-in backend
(LKParams.backend="pallas"), kept as the VMEM-resident reference
implementation and for shapes where feature counts are small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BLK_ROWS = 32  # win+1 (<=22) + sublane misalignment (<=7), rounded to 8
_BLK_COLS = 256  # win+1 + lane misalignment (<=127), rounded to 128


def _bilinear_patch(img_ref, cx, cy, win: int, orig_h: int, orig_w: int):
    """win x win patch centered at (cx, cy) from a VMEM image ref.

    Mirrors ops/image.extract_patch_bilinear: integer-aligned (win+1)^2
    region + 4-tap blend; border clamp at the ORIGINAL image bounds
    (orig_h/orig_w — img_ref is alignment-padded beyond them).  Mosaic only
    allows dynamic VMEM loads at sublane/lane-aligned offsets, so the load
    is rounded down to an (8, 128)-aligned corner of a 32x256 block and the
    misalignment is removed with dynamic in-register rotates (pltpu.roll);
    the padding guarantees aligned blocks never run off the array (see
    lk_level_pallas).
    """
    half = win // 2
    x0 = cx - half
    y0 = cy - half
    ix = jnp.floor(x0).astype(jnp.int32)
    iy = jnp.floor(y0).astype(jnp.int32)
    fx = x0 - ix.astype(x0.dtype)
    fy = y0 - iy.astype(y0.dtype)
    ix = jnp.clip(ix, 0, orig_w - win - 2)
    iy = jnp.clip(iy, 0, orig_h - win - 2)
    iy8 = (iy // 8) * 8
    ix128 = (ix // 128) * 128
    blk = img_ref[pl.ds(iy8, _BLK_ROWS), pl.ds(ix128, _BLK_COLS)]
    blk = pltpu.roll(blk, -(iy - iy8), 0)
    blk = pltpu.roll(blk, -(ix - ix128), 1)
    region = blk[: win + 1, : win + 1]
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    return (
        w00 * region[:-1, :-1]
        + w10 * region[:-1, 1:]
        + w01 * region[1:, :-1]
        + w11 * region[1:, 1:]
    )


def _lk_level_kernel(pts_ref, flow_in_ref, active_ref,  # SMEM inputs
                     img_from_ref, img_to_ref, gx_ref, gy_ref,  # VMEM
                     flow_out_ref, ok_ref, eig_ref,  # SMEM outputs
                     *, win: int, iterations: int, eps: float,
                     min_eig_threshold: float, orig_h: int, orig_w: int):
    i = pl.program_id(0)
    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    active = active_ref[i, 0] > 0.0

    patch_i = _bilinear_patch(img_from_ref, px, py, win, orig_h, orig_w)
    gx = _bilinear_patch(gx_ref, px, py, win, orig_h, orig_w)
    gy = _bilinear_patch(gy_ref, px, py, win, orig_h, orig_w)
    g11 = jnp.sum(gx * gx)
    g12 = jnp.sum(gx * gy)
    g22 = jnp.sum(gy * gy)
    det = g11 * g22 - g12 * g12
    trace = g11 + g22
    min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) \
        * 0.5 / (win * win)
    ok_g = (min_eig > min_eig_threshold) & (det > 1e-12)

    inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
    gi11 = g22 * inv_det
    gi12 = -g12 * inv_det
    gi22 = g11 * inv_det

    fx0 = flow_in_ref[i, 0]
    fy0 = flow_in_ref[i, 1]

    def cond(carry):
        _, _, it, run = carry
        return run & (it < iterations)

    def body(carry):
        fx, fy, it, _ = carry
        patch_j = _bilinear_patch(img_to_ref, px + fx, py + fy, win,
                                  orig_h, orig_w)
        diff = patch_i - patch_j
        b1 = jnp.sum(diff * gx)
        b2 = jnp.sum(diff * gy)
        dx = gi11 * b1 + gi12 * b2
        dy = gi12 * b1 + gi22 * b2
        keep_going = (dx * dx + dy * dy) >= (eps * eps)
        return fx + dx, fy + dy, it + 1, keep_going

    run0 = active & ok_g
    fx, fy, _, _ = jax.lax.while_loop(
        cond, body, (fx0, fy0, jnp.zeros((), jnp.int32), run0)
    )

    flow_out_ref[i, 0] = jnp.where(run0, fx, fx0)
    flow_out_ref[i, 1] = jnp.where(run0, fy, fy0)
    ok_ref[i, 0] = jnp.where(ok_g, 1.0, 0.0)
    eig_ref[i, 0] = min_eig


@functools.partial(
    jax.jit,
    static_argnames=("win", "iterations", "eps", "min_eig_threshold",
                     "interpret"),
)
def lk_level_pallas(img_from, img_to, gx, gy, pts, flow_in, active, *,
                    win: int, iterations: int, eps: float,
                    min_eig_threshold: float, interpret: bool = False):
    """One pyramid level of LK for all features (Pallas kernel).

    img_*: [H, W] f32 (pre-padded so windows never clip); pts: [N, 2]
    level-scale positions; flow_in: [N, 2]; active: [N] f32 mask.
    Returns (flow_out [N,2], ok [N] f32, min_eig [N]).
    """
    n = pts.shape[0]
    h, w = img_from.shape
    # Alignment padding: the kernel loads (8,128)-aligned 32x256 blocks at
    # corners up to (h - win - 2, w - win - 2); pad so those blocks always
    # fit.  Padded area is never selected (clip uses the original bounds).
    hp = -(-h // 8) * 8 + _BLK_ROWS
    wp = -(-w // 128) * 128 + _BLK_COLS
    pad_spec = ((0, hp - h), (0, wp - w))
    img_from = jnp.pad(img_from, pad_spec)
    img_to = jnp.pad(img_to, pad_spec)
    gx = jnp.pad(gx, pad_spec)
    gy = jnp.pad(gy, pad_spec)
    kernel = functools.partial(
        _lk_level_kernel, win=win, iterations=iterations, eps=eps,
        min_eig_threshold=min_eig_threshold, orig_h=h, orig_w=w,
    )
    img_spec = pl.BlockSpec(img_from.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    smem2 = pl.BlockSpec((n, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    smem1 = pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    flow, ok, eig = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[smem2, smem2, smem1, img_spec, img_spec, img_spec,
                  img_spec],
        out_specs=[smem2, smem1, smem1],
        out_shape=[
            jax.ShapeDtypeStruct((n, 2), img_from.dtype),
            jax.ShapeDtypeStruct((n, 1), img_from.dtype),
            jax.ShapeDtypeStruct((n, 1), img_from.dtype),
        ],
        interpret=interpret,
    )(pts, flow_in, active[:, None], img_from, img_to, gx, gy)
    return flow, ok[:, 0], eig[:, 0]
