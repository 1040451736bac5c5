"""MXU leaf-block prototype v3 — per-row epilogue, no narrow concats.

Per row per visit: build (8,128) comp rows, ONE transpose -> (128,8),
one thin matmul (128,8)@(8,768), epilogue on (128,128) slices with
(128,1) per-ray broadcasts, lane reductions, results stored column-wise
into a (128,W) scratch and transposed back once per iteration."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

W = 16
LANES = 128
NB = 64
ITERS = 32

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
rays = jax.random.normal(k1, (8, W, LANES), jnp.float32)
mtab = jax.random.normal(k2, (NB * 8, 768), jnp.float32) * 0.1

tiny = 1e-30
big = 3.0e38


def kernel(rays_ref, mtab_ref, obest_ref, nbcol, best_scr):
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmin = rays_ref[6]

    best_scr[...] = jnp.abs(rays_ref[7]) + 1.0

    def body(state):
        it = state
        best = best_scr[...]
        for j in range(W):
            pre = jnp.concatenate(
                [ox[j:j+1], oy[j:j+1], oz[j:j+1],
                 jnp.ones((1, LANES), jnp.float32),
                 dx[j:j+1], dy[j:j+1], dz[j:j+1],
                 jnp.zeros((1, LANES), jnp.float32)], axis=0)  # (8,128)
            xo = pre.T                                          # (128,8)
            bidx = (it * W + j) % NB
            m = mtab_ref[pl.ds(bidx * 8, 8), :]                 # (8,768)
            ab = jnp.dot(xo, m, preferred_element_type=jnp.float32)
            a0, a1, a2 = ab[:, 0:128], ab[:, 128:256], ab[:, 256:384]
            b0, b1, b2 = ab[:, 384:512], ab[:, 512:640], ab[:, 640:768]
            # per-ray bounds: transpose tmin/best rows via the same trick
            tb = jnp.concatenate(
                [tmin[j:j+1], best[j:j+1],
                 jnp.zeros((6, LANES), jnp.float32)], axis=0)   # (8,128)
            tbt = tb.T                                          # (128,8)
            tmin_t = tbt[:, 0:1]
            best_t = tbt[:, 1:2]
            inv = 1.0 / jnp.where(jnp.abs(b0) < tiny, 1.0, b0)
            t = -a0 * inv
            u = a1 + t * b1
            v = a2 + t * b2
            valid = ((jnp.abs(b0) > tiny) & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t >= tmin_t) & (t < best_t))
            tv = jnp.where(valid, t, big)
            trow = jnp.min(tv, axis=1, keepdims=True)           # (128,1)
            lane = jax.lax.broadcasted_iota(jnp.int32, tv.shape, 1)
            wid = jnp.max(jnp.where(tv <= trow, lane, -1), axis=1,
                          keepdims=True)
            newb = jnp.minimum(trow, best_t)                    # (128,1)
            nbcol[:, pl.ds(j, 1)] = newb
            nbcol[:, pl.ds(W + j, 1)] = wid.astype(jnp.float32)
        allcol = nbcol[...]                                     # (128, 2W)
        back = allcol.T                                         # (2W, 128)
        best_scr[...] = back[0:W, :]
        return it + 1

    jax.lax.while_loop(lambda it: it < ITERS, body, jnp.int32(0))
    obest_ref[...] = best_scr[...]


call = pl.pallas_call(
    kernel,
    grid=(1,),
    in_specs=[
        pl.BlockSpec(rays.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mtab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((W, LANES), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((W, LANES), jnp.float32),
    scratch_shapes=[pltpu.VMEM((LANES, 2 * W), jnp.float32),
                    pltpu.VMEM((W, LANES), jnp.float32)],
)

t = timed("mxu block kernel v3", call, rays, mtab)
visits = W * ITERS
print(f"{t / visits * 1e9:8.1f} ns per (row, 128-tri block) visit")
print(f"vs production 8-tri leaf row-visit ~72 ns -> worth it when a "
      f"block replaces > {t / visits * 1e9 / 72:.1f} 8-tri leaf visits")
