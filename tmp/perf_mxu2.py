"""MXU leaf-block prototype v2 — grouped rows, vectorized epilogue.

Measures the wall cost of one (row, 128-tri block) visit:
  per group of G=8 rows: build (64,128) comp matrix, ONE transpose,
  8 thin matmuls (128,8)@(8,768) into a stacked (1024,768) scratch,
  vectorized epilogue + lane reductions, one transpose back.

Decision number: ns per row-block-visit.  Production 8-tri leaf visits
cost ~72 ns/row; a block visit serves 16x the triangles, so the design
wins where rows need > (cost/72) * 8 tris of leaf work per phase.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

W = 16          # resident rows (small for fast compile)
G = 8           # rows per matmul group
LANES = 128
NB = 64         # resident blocks
ITERS = 32      # block visits per row per call

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
rays = jax.random.normal(k1, (8, W, LANES), jnp.float32)
mtab = jax.random.normal(k2, (NB * 8, 768), jnp.float32) * 0.1

tiny = 1e-30
big = 3.0e38


def kernel(rays_ref, mtab_ref, obest_ref, scr, best_scr):
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmin = rays_ref[6]

    best_scr[...] = jnp.abs(rays_ref[7]) + 1.0

    def body(state):
        it = state
        best = best_scr[...]
        for g0 in range(0, W, G):
            # (G*8, 128) comp matrix for this group
            pre_rows = []
            for j in range(g0, g0 + G):
                pre_rows.append(ox[j:j+1])
                pre_rows.append(oy[j:j+1])
                pre_rows.append(oz[j:j+1])
                pre_rows.append(dx[j:j+1])
                pre_rows.append(dy[j:j+1])
                pre_rows.append(dz[j:j+1])
                pre_rows.append(tmin[j:j+1])
                pre_rows.append(best[j:j+1])
            pre = jnp.concatenate(pre_rows, axis=0)      # (64,128)
            xt = pre.T                                    # (128,64)
            for g in range(G):
                j = g0 + g
                x8 = xt[:, g*8:(g+1)*8]                   # (128,8) o,d,tmin,best
                xo = jnp.concatenate(
                    [x8[:, 0:3], jnp.ones((LANES, 1), jnp.float32),
                     x8[:, 3:6],
                     jnp.zeros((LANES, 1), jnp.float32)], axis=1)  # (128,8)
                bidx = (it * W + j) % NB
                m = mtab_ref[pl.ds(bidx * 8, 8), :]       # (8,768)
                ab = jnp.dot(xo, m, preferred_element_type=jnp.float32)
                scr[pl.ds(g * LANES, LANES), :] = ab
            out = scr[pl.ds(0, G * LANES), :]             # (1024,768)
            a0, a1, a2 = out[:, 0:128], out[:, 128:256], out[:, 256:384]
            b0, b1, b2 = out[:, 384:512], out[:, 512:640], out[:, 640:768]
            inv = 1.0 / jnp.where(jnp.abs(b0) < tiny, 1.0, b0)
            t = -a0 * inv
            u = a1 + t * b1
            v = a2 + t * b2
            # per-ray tmin/best replicated: rebuild from xt columns
            tmin_t = jnp.concatenate(
                [xt[:, g*8+6:g*8+7] for g in range(G)], axis=0)  # (1024,1)
            best_t = jnp.concatenate(
                [xt[:, g*8+7:g*8+8] for g in range(G)], axis=0)
            valid = ((jnp.abs(b0) > tiny) & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t >= tmin_t) & (t < best_t))
            tv = jnp.where(valid, t, big)
            trow = jnp.min(tv, axis=1, keepdims=True)     # (1024,1)
            lane = jax.lax.broadcasted_iota(jnp.int32, tv.shape, 1)
            wid = jnp.max(jnp.where(tv <= trow, lane, -1), axis=1,
                          keepdims=True)
            newb = jnp.minimum(trow, best_t)              # (1024,1)
            # transpose back: (128, G) column assembly -> (G,128)
            cols = jnp.concatenate(
                [newb[g*LANES:(g+1)*LANES] for g in range(G)], axis=1)
            backt = cols.T                                # (G,128)
            widc = jnp.concatenate(
                [wid[g*LANES:(g+1)*LANES].astype(jnp.float32)
                 for g in range(G)], axis=1).T
            best_scr[pl.ds(g0, G), :] = backt + 0.0 * widc
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
    scratch_shapes=[pltpu.VMEM((G * LANES, 768), jnp.float32),
                    pltpu.VMEM((W, LANES), jnp.float32)],
)

t = timed("mxu block kernel", call, rays, mtab)
visits = W * ITERS
print(f"{t / visits * 1e9:8.1f} ns per (row, 128-tri block) visit "
      f"({t / visits / 128 * 1e9:6.2f} ns per 8-tri equivalent)")
print(f"vs production 8-tri leaf row-visit ~72 ns -> breakeven at "
      f"{t / visits * 1e9 / 72 * 8:.0f} tris of true leaf need per block")
