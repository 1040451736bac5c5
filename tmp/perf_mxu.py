"""MXU leaf-block prototype cost measurement.

Candidate leaf redesign: leaves hold 128 triangles as plane records
M = (4 coeffs, 3*128) — one (128,4)@(4,384) matmul per {o,d} against a
per-row TRANSPOSED ray matrix gives all 6 dots per (ray, tri) pair; the
VPU epilogue then runs on (128,128) tiles = 2-3 tile-ops per triangle
instead of ~40 for the current 8-tri-per-row Moller-Trumbore block.

This script measures, inside a while_loop shaped like the traversal
kernel (W rows each doing one visit per iteration, dynamic block fetch):

  a) the current-style VPU leaf visit (8 tris/row/visit)  [baseline]
  b) the MXU block visit (128 tris/row/visit): build (8,128) ray matrix,
     transpose, 2 thin matmuls, epilogue, lane-reduce, transpose back

Reported as ns/visit and ns/tri-row (128 rays vs one tri each).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

W = 64
LANES = 128
NB = 256          # leaf blocks resident (dynamic fetch index cycles these)
ITERS = 64        # visits per row per kernel call

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
rays = jax.random.normal(k1, (8, W, LANES), jnp.float32)
mblocks = jax.random.normal(k2, (NB * 4, 384), jnp.float32)   # (4, 3*128) per block
tri8 = jax.random.normal(k3, (NB, LANES), jnp.float32)        # current-style rows

tiny = 1e-30
big = 3.0e38


def kernel_mxu(rays_ref, mtab_ref, out_ref, acc, it_ref=None):
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmin, tmax = rays_ref[6], rays_ref[7]

    def body(state):
        it, best = state
        newbest = best
        for j in range(W):
            # build the (8,128) pre-transpose matrix for row j
            pre = jnp.concatenate(
                [ox[j:j+1], oy[j:j+1], oz[j:j+1],
                 dx[j:j+1], dy[j:j+1], dz[j:j+1],
                 tmin[j:j+1], best[j:j+1]], axis=0)       # (8,128)
            xt = pre.T                                     # (128,8) transpose
            xo = jnp.concatenate(
                [xt[:, 0:3], jnp.ones((LANES, 1), jnp.float32)], axis=1)
            xd = jnp.concatenate(
                [xt[:, 3:6], jnp.zeros((LANES, 1), jnp.float32)], axis=1)
            tmin_t = xt[:, 6:7]
            best_t = xt[:, 7:8]
            bidx = (it * W + j) % NB
            m = mtab_ref[pl.ds(bidx * 4, 4), :]            # (4, 384)
            a = jnp.dot(xo, m, preferred_element_type=jnp.float32)  # (128,384)
            b = jnp.dot(xd, m, preferred_element_type=jnp.float32)
            a0, a1, a2 = a[:, 0:128], a[:, 128:256], a[:, 256:384]
            b0, b1, b2 = b[:, 0:128], b[:, 128:256], b[:, 256:384]
            inv = 1.0 / jnp.where(jnp.abs(b0) < tiny, 1.0, b0)
            t = -a0 * inv
            u = a1 + t * b1
            v = a2 + t * b2
            valid = ((jnp.abs(b0) > tiny) & (u >= 0.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (t >= tmin_t) & (t < best_t))
            tv = jnp.where(valid, t, big)
            trow = jnp.min(tv, axis=1, keepdims=True)      # (128,1)
            hit = trow < big
            lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            wid = jnp.max(jnp.where(tv <= trow, lane, -1), axis=1,
                          keepdims=True)                   # winner id
            # transpose results back: (128, 8) -> (8, 128)
            res = jnp.concatenate(
                [jnp.minimum(trow, best_t), wid.astype(jnp.float32),
                 hit.astype(jnp.float32),
                 jnp.zeros((LANES, 5), jnp.float32)], axis=1)
            rt = res.T                                     # (8,128)
            newbest = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0) == j,
                rt[0:1, :], newbest)
        return (it + 1, newbest)

    def cond(state):
        return state[0] < ITERS

    _, best = jax.lax.while_loop(cond, body, (jnp.int32(0), tmax + 0.0))
    out_ref[...] = best


def kernel_vpu(rays_ref, tri_ref, out_ref, acc):
    """Current-style leaf visit: 8 tris (16 slots each) per row per visit,
    lane-broadcast scalar coefficients — op-count replica of the production
    leaf block (Moller-Trumbore, ~40 tile-ops per tri)."""
    ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
    dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
    tmin, tmax = rays_ref[6], rays_ref[7]

    def body(state):
        it, best = state
        # one fetched row per traversal row, rolled: approximate with a
        # dynamic row fetch per row (same as production nscr fill)
        newbest = best
        for j in range(W):
            bidx = (it * W + j) % NB
            lf = tri_ref[pl.ds(bidx, 1), :]    # (1,128)
            b_r = best
            t_min = tmin
            for k in range(8):
                s = k * 16
                def coll(i):
                    return jax.lax.dynamic_slice(lf, (0, s + i), (1, 1))
                v0x, v0y, v0z = coll(0), coll(1), coll(2)
                e1x, e1y, e1z = coll(3), coll(4), coll(5)
                e2x, e2y, e2z = coll(6), coll(7), coll(8)
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < tiny, 1.0, det)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                mu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                mv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                mt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                valid = ((jnp.abs(det) > tiny) & (mu >= 0.0) & (mv >= 0.0)
                         & (mu + mv <= 1.0) & (mt >= t_min) & (mt < b_r))
                b_r = jnp.where(valid, mt, b_r)
            newbest = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
                == (j % W), b_r, newbest)
        return (it + 1, newbest)

    def cond(state):
        return state[0] < ITERS

    _, best = jax.lax.while_loop(cond, body, (jnp.int32(0), tmax + 0.0))
    out_ref[...] = best


def run(kern, tab):
    call = pl.pallas_call(
        functools.partial(kern),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(rays.shape, lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab.shape, lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, LANES), lambda w: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, LANES), jnp.float32)],
    )
    return call(rays, tab)


t_mxu = timed("mxu block visit (128 tris/row/visit)", run, kernel_mxu, mblocks)
t_vpu = timed("vpu 8-tri visit  (8 tris/row/visit)", run, kernel_vpu, tri8)

visits = W * ITERS
print(f"MXU: {t_mxu / visits * 1e9:8.1f} ns/visit  "
      f"({t_mxu / visits / 128 * 1e9:6.2f} ns per tri-row-128)")
print(f"VPU: {t_vpu / visits * 1e9:8.1f} ns/visit  "
      f"({t_vpu / visits / 8 * 1e9:6.2f} ns per tri-row-128)")
print(f"per-tri speedup: {(t_vpu / 8) / (t_mxu / 128):.2f}x")
