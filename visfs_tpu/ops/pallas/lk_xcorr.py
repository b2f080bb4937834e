"""Pallas TPU kernel: the LK iteration loop over cross-correlation maps.

The level setup (ops/lk.py `_iterate_xcorr`) reduces each LK iteration to
two bilinear lookups in per-feature correlation maps C1/C2 ([N, A, A],
A = R - win + 1 = 22 at the default window) plus a 2x2 solve — ~20 FLOPs
per feature.  Running that loop in XLA still costs ~3 kernel launches per
iteration (the fused step's dominant cost: ~2000 tiny launches per frame);
here the ENTIRE loop runs in one pallas_call with everything VMEM-resident
([N, 512] flattened maps ≈ 1.5 MB), as pure VPU element-wise work
vectorized across the feature sublanes:

    w[n, l] = tent(a(l) - offy_n) * tent(b(l) - offx_n)     l = a*A + b
    b1 = c1_const - sum_l C1[n, l] * w[n, l]   (same for C2)
    step = G^-1 b;  flow += step;  active &= |step| >= eps

Numerics are identical to the jnp xcorr path (same formulation, f32); the
early-exit semantics match ops/lk.py exactly (iteration cap + per-feature
eps freeze + whole-loop exit when no feature is active).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(c1_ref, c2_ref, scal_ref, flow_in_ref, flow_out_ref, state_ref,
            *, A: int, lanes: int, iterations: int, eps: float,
            max_off: float):
    # scal: [N, 8] = (c1_const, c2_const, gi11, gi12, gi22, base_x, base_y,
    #                 active).  Loop state (fx, fy, active) lives in the
    # [N, 128] VMEM scratch — Mosaic cannot legalize narrow [N, 1] vector
    # while-loop carries (vpad layouts at scf.yield), so the carry holds
    # scalars only and the vectors round-trip through the scratch ref.
    c1c = scal_ref[:, 0:1]
    c2c = scal_ref[:, 1:2]
    gi11 = scal_ref[:, 2:3]
    gi12 = scal_ref[:, 3:4]
    gi22 = scal_ref[:, 4:5]
    base_x = scal_ref[:, 5:6]
    base_y = scal_ref[:, 6:7]
    act0 = scal_ref[:, 7:8] > 0.0

    C1 = c1_ref[:]  # [N, lanes]
    C2 = c2_ref[:]
    n = C1.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 1)
    a_idx = (lane // A).astype(jnp.float32)  # row (y) shift
    b_idx = (lane % A).astype(jnp.float32)  # col (x) shift
    pad = lane >= A * A
    a_idx = jnp.where(pad, -1e6, a_idx)

    eps2 = eps * eps

    state_ref[:, 0:1] = flow_in_ref[:, 0:1]
    state_ref[:, 1:2] = flow_in_ref[:, 1:2]
    state_ref[:, 2:3] = jnp.where(act0, 1.0, 0.0)

    def cond(carry):
        it, go = carry
        return (it < iterations) & go

    def body(carry):
        it, _ = carry
        fx = state_ref[:, 0:1]
        fy = state_ref[:, 1:2]
        act = state_ref[:, 2:3] > 0.0
        offx = jnp.clip(base_x + fx, 0.0, max_off)  # [N, 1]
        offy = jnp.clip(base_y + fy, 0.0, max_off)
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(a_idx - offy))
             * jnp.maximum(0.0, 1.0 - jnp.abs(b_idx - offx)))
        b1 = c1c - jnp.sum(C1 * w, axis=1, keepdims=True)
        b2 = c2c - jnp.sum(C2 * w, axis=1, keepdims=True)
        dx = gi11 * b1 + gi12 * b2
        dy = gi12 * b1 + gi22 * b2
        new_act = act & ((dx * dx + dy * dy) >= eps2)
        state_ref[:, 0:1] = fx + jnp.where(act, dx, 0.0)
        state_ref[:, 1:2] = fy + jnp.where(act, dy, 0.0)
        state_ref[:, 2:3] = jnp.where(new_act, 1.0, 0.0)
        return it + 1, jnp.any(new_act)

    jax.lax.while_loop(cond, body,
                       (jnp.zeros((), jnp.int32), jnp.any(act0)))
    flow_out_ref[:, 0:1] = state_ref[:, 0:1]
    flow_out_ref[:, 1:2] = state_ref[:, 1:2]


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "eps", "max_off", "interpret"),
)
def lk_xcorr_iterate(C1, C2, c1_const, c2_const, gi11, gi12, gi22,
                     base_x, base_y, flow, active, *, iterations: int,
                     eps: float, max_off: float, interpret: bool = False):
    """Run the LK iteration loop on correlation maps; returns flow [N,2].

    C1/C2: [N, A, A] f32; the rest are [N] f32/bool; flow [N, 2].
    """
    N, A, _ = C1.shape
    lanes = -(-(A * A) // 128) * 128
    Np = -(-N // 8) * 8

    def pad_n(x, fill=0.0):
        return jnp.pad(x, ((0, Np - N),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    Cp1 = pad_n(jnp.pad(C1.reshape(N, A * A),
                        ((0, 0), (0, lanes - A * A))))
    Cp2 = pad_n(jnp.pad(C2.reshape(N, A * A),
                        ((0, 0), (0, lanes - A * A))))
    scal = pad_n(jnp.stack(
        [c1_const, c2_const, gi11, gi12, gi22, base_x, base_y,
         active.astype(jnp.float32)], axis=-1))
    flow_p = pad_n(flow)

    kernel = functools.partial(
        _kernel, A=A, lanes=lanes, iterations=iterations, eps=eps,
        max_off=max_off,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((Np, 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Np, 128), jnp.float32)],
        interpret=interpret,
    )(Cp1, Cp2, scal, flow_p)
    return out[:N]
