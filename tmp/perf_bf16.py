"""Does the VPU run bf16 elementwise ops at 2x f32 lane throughput?

Times a chained min/max/mul loop on (64,128) f32 vs (64,256) bf16 (same
vreg count IF bf16 packs 2/lane).  If bf16 ~= f32 wall time at 2x the
elements, the bf16-AABB slab idea halves interior cost; if bf16 (64,256)
costs ~2x f32 (64,128), there is no packed ALU and the idea is dead."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

ITERS = 256
OPS = 96  # chained ops per iteration


def make_kernel(dtype, cols):
    def kernel(x_ref, o_ref):
        def body(state):
            it, v = state
            w = v
            for i in range(OPS // 3):
                w = jnp.minimum(w * jnp.float32(1.0001).astype(dtype), v)
                w = jnp.maximum(w + jnp.float32(0.0001).astype(dtype), v * w)
                v = jnp.minimum(v, w)
            return (it + 1, v)

        _, v = jax.lax.while_loop(
            lambda s: s[0] < ITERS, body, (jnp.int32(0), x_ref[...])
        )
        o_ref[...] = v

    return kernel


def make_run(dtype, cols):
    call = pl.pallas_call(
        make_kernel(dtype, cols),
        grid=(1,),
        in_specs=[pl.BlockSpec((256, cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, cols), dtype),
    )

    def f(x):
        return call(x)

    return f, jnp.ones((256, cols), dtype)


for_args = [("f32  (256,512)", jnp.float32, 512),
            ("bf16 (256,512)", jnp.bfloat16, 512),
            ("bf16 (256,1024)", jnp.bfloat16, 1024),
            ("f32  (256,1024)", jnp.float32, 1024)]
ts = []
for label, dt, c in for_args:
    f, x = make_run(dt, c)
    ts.append(timed(label, f, x))
t32, t16a, t16b, t32b = ts
print(f"bf16(2x)/f32(1x): {t16b / t32:.2f}x  "
      f"(1.0 => packed ALU, 2.0 => no packing)")
print(f"f32(2x)/f32(1x):  {t32b / t32:.2f}x (sanity: ~2.0)")
