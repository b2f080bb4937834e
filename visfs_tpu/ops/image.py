"""Image primitives: separable filters, pyramids, gradients, bilinear sampling.

These are the building blocks of the TPU front-end that replaces the
reference's OpenCV calls (cv::goodFeaturesToTrack, cv::calcOpticalFlowPyrLK,
cv::pyrDown implicitly inside LK — corelib/src/Tracker.cpp:181,207,257).
Images are single-channel float32 [H, W] arrays in [0, 255]; all ops are
static-shape and jit/vmap-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _conv1d(img, kernel, axis):
    """Separable 'same' convolution along one axis with edge replication.

    Implemented as shift-and-add over static slices rather than
    lax.conv_general_dilated: a 1-channel conv on TPU pads the channel dim
    to the full 128-lane register width (~128x wasted MXU work plus layout
    transposes), while k<=5 shifted adds are pure fusable VPU work.
    """
    k = int(kernel.shape[0])
    pad = k // 2
    h, w = img.shape
    if axis == 0:
        img_p = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
        out = kernel[0] * lax.slice(img_p, (0, 0), (h, w))
        for i in range(1, k):
            out = out + kernel[i] * lax.slice(img_p, (i, 0), (i + h, w))
    else:
        img_p = jnp.pad(img, ((0, 0), (pad, pad)), mode="edge")
        out = kernel[0] * lax.slice(img_p, (0, 0), (h, w))
        for i in range(1, k):
            out = out + kernel[i] * lax.slice(img_p, (0, i), (h, i + w))
    return out


def sep_filter(img, kv, kh):
    """Apply vertical kernel kv then horizontal kernel kh."""
    return _conv1d(_conv1d(img, kv, 0), kh, 1)


def gaussian5(img):
    """5x5 binomial blur (the pyrDown kernel)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=img.dtype) / 16.0
    return sep_filter(img, k, k)


def _pyr_down_matrix(n: int, dtype):
    """[ceil(n/2), n] banded matrix fusing 5-tap binomial blur + 2x decimate.

    Row i holds the kernel [1,4,6,4,1]/16 centered at column 2i with edge
    replication (taps clamped to [0, n-1] accumulate at the border).
    """
    import numpy as np

    n_out = (n + 1) // 2
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    m = np.zeros((n_out, n), dtype=np.float32)
    for i in range(n_out):
        for j, wgt in enumerate(k):
            col = min(max(2 * i + j - 2, 0), n - 1)
            m[i, col] += wgt
    return jnp.asarray(m, dtype=dtype)


def pyr_down(img):
    """Blur + 2x decimate (cv::pyrDown semantics, even output size floor).

    Expressed as two constant banded matmuls (blur and decimation fused):
    a strided slice [::2, ::2] needs cross-lane shuffles on TPU (~0.8 ms at
    VGA), while the banded matmuls are a few-microsecond MXU op.
    """
    h, w = img.shape
    gy = _pyr_down_matrix(h, img.dtype)
    gx = _pyr_down_matrix(w, img.dtype)
    return gy @ img @ gx.T


def build_pyramid(img, max_level: int):
    """List of images, level 0 = full resolution ... max_level coarsest."""
    levels = [img]
    for _ in range(max_level):
        levels.append(pyr_down(levels[-1]))
    return levels


def scharr_gradients(img):
    """Scharr 3x3 x/y gradients (OpenCV LK uses Scharr-like deriv kernel).

    Returns (Ix, Iy) scaled by 1/32 like cv::Scharr default normalization
    used inside calcOpticalFlowPyrLK's buildOpticalFlowPyramid derivatives.
    """
    smooth = jnp.array([3.0, 10.0, 3.0], dtype=img.dtype) / 16.0
    diff = jnp.array([-1.0, 0.0, 1.0], dtype=img.dtype) / 2.0
    ix = sep_filter(img, smooth, diff)
    iy = sep_filter(img, diff, smooth)
    return ix, iy


def sobel_gradients(img):
    """Sobel 3x3 gradients (used by the GFTT min-eigenvalue score)."""
    smooth = jnp.array([1.0, 2.0, 1.0], dtype=img.dtype)
    diff = jnp.array([-1.0, 0.0, 1.0], dtype=img.dtype)
    ix = sep_filter(img, smooth, diff)
    iy = sep_filter(img, diff, smooth)
    return ix, iy


def box_filter(img, size: int):
    """size x size box sum (not normalized)."""
    k = jnp.ones((size,), dtype=img.dtype)
    return sep_filter(img, k, k)


@partial(jax.jit, static_argnums=(2,))
def extract_patch_bilinear(img, center, size: int):
    """Bilinearly-interpolated size x size patch centered at `center` (x, y).

    The patch samples positions center + (dx, dy) for dx,dy in
    [-(size//2), ..., size//2].  Out-of-bounds samples clamp to the border.
    Returns [size, size] (row = y, col = x).
    """
    h, w = img.shape
    half = size // 2
    x0 = center[0] - half
    y0 = center[1] - half
    ix = jnp.floor(x0).astype(jnp.int32)
    iy = jnp.floor(y0).astype(jnp.int32)
    fx = x0 - ix.astype(img.dtype)
    fy = y0 - iy.astype(img.dtype)

    # Gather a (size+1)x(size+1) integer-aligned region then blend 4 shifts.
    ix = jnp.clip(ix, 0, w - size - 1)
    iy = jnp.clip(iy, 0, h - size - 1)
    region = lax.dynamic_slice(img, (iy, ix), (size + 1, size + 1))
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


def in_bounds(pts, width, height, margin=0.0):
    """[..., 2] (x, y) points inside the image with a margin."""
    x, y = pts[..., 0], pts[..., 1]
    return (
        (x >= margin) & (x < width - margin) & (y >= margin) & (y < height - margin)
    )


def clahe(img, clip_limit: float = 3.0, grid: int = 8, n_bins: int = 256):
    """Contrast-limited adaptive histogram equalization (System.cpp:107-111).

    A static-shape JAX re-formulation of cv::createCLAHE(3.0, (8,8)):
    per-tile clipped histograms -> CDF LUTs, bilinear LUT interpolation
    between tile centers.  Image must be divisible into grid x grid tiles
    (pad beforehand if not); values in [0, 255].
    """
    h, w = img.shape
    th, tw = h // grid, w // grid
    img_c = img[: th * grid, : tw * grid]
    tiles = img_c.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(grid * grid, th * tw)

    bins = jnp.clip(tiles.astype(jnp.int32), 0, n_bins - 1)
    hist = jax.vmap(
        lambda b: jnp.zeros(n_bins, dtype=jnp.float32).at[b].add(1.0)
    )(bins)

    clip = clip_limit * (th * tw) / n_bins
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / n_bins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    luts = (cdf * (n_bins - 1)).reshape(grid, grid, n_bins)

    # Bilinear interpolation between tile-center LUTs.
    ys = (jnp.arange(h, dtype=jnp.float32) - th / 2) / th
    xs = (jnp.arange(w, dtype=jnp.float32) - tw / 2) / tw
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, grid - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, grid - 1)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)[:, None]
    fx = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)[None, :]

    v = jnp.clip(img.astype(jnp.int32), 0, n_bins - 1)
    lut00 = luts[y0[:, None], x0[None, :], v]
    lut01 = luts[y0[:, None], x1[None, :], v]
    lut10 = luts[y1[:, None], x0[None, :], v]
    lut11 = luts[y1[:, None], x1[None, :], v]
    out = (
        (1 - fy) * ((1 - fx) * lut00 + fx * lut01)
        + fy * ((1 - fx) * lut10 + fx * lut11)
    )
    return out.astype(img.dtype)
