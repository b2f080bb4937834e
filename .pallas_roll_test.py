import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 128, 256
def kern(idx_ref, img_ref, out_ref):
    i = pl.program_id(0)
    iy = idx_ref[i, 0]; ix = idx_ref[i, 1]
    iy8 = (iy // 8) * 8; ix128 = (ix // 128) * 128
    blk = img_ref[pl.ds(iy8, 16), pl.ds(ix128, 128)]
    r = pltpu.roll(blk, -(iy - iy8), 0)
    r = pltpu.roll(r, -(ix - ix128), 1)
    out_ref[i, 0] = r[0, 0]  # should equal img[iy, ix]

@jax.jit
def run(idx, img):
    n = idx.shape[0]
    return pl.pallas_call(
        kern, grid=(n,),
        in_specs=[pl.BlockSpec((n,2), lambda i: (0,0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((H,W), lambda i: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n,1), lambda i: (0,0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n,1), jnp.float32),
    )(idx, img)

img = jnp.asarray(np.arange(H*W).reshape(H,W), jnp.float32)
idx = jnp.asarray([[5, 30],[40, 100],[87, 7]], jnp.int32)
out = np.asarray(run(idx, img)).ravel()
exp = np.asarray([img[5,30], img[40,100], img[87,7]])
print("roll-select:", out, "expected:", exp, "match:", np.allclose(out, exp))
