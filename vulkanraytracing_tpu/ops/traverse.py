"""Per-ray vectorized BVH traversal (reference backend).

The production trace path is ops.traverse_packet (packet traversal — see
its docstring for why packets fit the TPU).  This module keeps the classic
per-ray formulation: every ray advances independently with its own cursor
and stack, all rays lockstep through a while_loop with masking.  It is the
oracle the packet path is validated against (the same role the reference's
ray-query compute backend plays for its RT-pipeline backend,
Config.hpp:10-14), and it is faster than packets for fully incoherent ray
sets where packet divergence dominates.

Per iteration each ray does ONE (R, 16) node gather (both children's AABBs
+ ids — the child-AABBs-in-parent layout from accel.lbvh), two slab tests,
and up to 2*LEAF_SIZE masked triangle intersections.  Stacks are (R, D)
arrays updated with one-hot compare-selects: XLA scatter with per-row
dynamic columns serializes on TPU (~200x slower, measured).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.accel.lbvh import LEAF_SIZE
from vulkanraytracing_tpu.ops.intersect import Hit
from vulkanraytracing_tpu.scene.types import BVH, TraceGeometry

_BIG_T = jnp.float32(3.0e38)
_DONE = jnp.int32(-2147483648)  # cursor sentinel: traversal finished
STACK_DEPTH = 64
MAX_ITERS = 16384


# not @jax.jit — see traverse_packet.traverse_packets for the rationale
def _traverse(
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool,
    any_hit: bool,
    stack_depth: int = STACK_DEPTH,
) -> Hit:
    r = o.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32

    # robust inverse direction (no inf/NaN in the slab test)
    tiny = jnp.float32(1e-20)
    d_safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv_d = 1.0 / d_safe

    state = dict(
        cursor=jnp.where(t_min <= t_max, i32(0), _DONE),
        sp=jnp.zeros((r,), i32),
        stack=jnp.zeros((r, stack_depth), i32),
        best_t=jnp.where(t_max < _BIG_T, t_max, _BIG_T),
        u=jnp.zeros((r,), f32),
        v=jnp.zeros((r,), f32),
        tri=jnp.zeros((r,), i32),
        det=jnp.ones((r,), f32),
        hit_found=jnp.zeros((r,), bool),
        iters=jnp.int32(0),
    )

    lane_iota = jax.lax.broadcasted_iota(i32, (r, stack_depth), 1)

    def cond(s):
        return jnp.any(s["cursor"] != _DONE) & (s["iters"] < MAX_ITERS)

    def body(s):
        active = s["cursor"] != _DONE
        node_sel = jnp.where(active, s["cursor"], 0)
        node = bvh.nodes[node_sel]  # (R, 12)
        child_ids_all = bvh.child_index[node_sel]  # (R, 2)

        best_t = s["best_t"]
        u, v, tri_best, det_best = s["u"], s["v"], s["tri"], s["det"]
        hit_found = s["hit_found"]

        descend, t_enter, child_ids = [], [], []
        for c in (0, 1):
            lo = node[:, 6 * c : 6 * c + 3]
            hi = node[:, 6 * c + 3 : 6 * c + 6]
            idx = child_ids_all[:, c]
            child_ids.append(idx)
            is_leaf = idx < 0

            # slab test (pruned by per-ray best)
            t0 = (lo - o) * inv_d
            t1 = (hi - o) * inv_d
            tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
            tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), best_t)
            box_hit = (tn <= tf) & active

            # inline leaf intersection over the LEAF_SIZE range
            packed = ~idx
            start = packed >> 4
            count = packed & 15
            leaf_active = is_leaf & box_hit
            base = jnp.where(leaf_active, start, 0)
            for k in range(LEAF_SIZE):
                tid = jnp.minimum(base + k, bvh.tris.shape[0] - 1)
                rec = bvh.tris[tid]  # (R, 12)
                tv0, te1, te2 = rec[:, 0:3], rec[:, 3:6], rec[:, 6:9]
                flags = bvh.tri_flags[tid]
                cull_disable = (flags & 1) != 0
                candidate = (flags & 6) != 0  # opaque or alpha-tested

                pvec = jnp.cross(d, te2)
                mt_det = jnp.sum(te1 * pvec, axis=-1)
                inv_det = 1.0 / jnp.where(jnp.abs(mt_det) < tiny, 1.0, mt_det)
                tvec = o - tv0
                mu = jnp.sum(tvec * pvec, axis=-1) * inv_det
                qvec = jnp.cross(tvec, te1)
                mv = jnp.sum(d * qvec, axis=-1) * inv_det
                mt = jnp.sum(te2 * qvec, axis=-1) * inv_det

                valid = (
                    leaf_active & (k < count)
                    & (jnp.abs(mt_det) > tiny)
                    & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                    & (mt >= t_min) & (mt < best_t)
                    & candidate
                )
                if cull_backface:
                    valid &= (mt_det > tiny) | cull_disable

                closer = valid & (mt < best_t)
                best_t = jnp.where(closer, mt, best_t)
                u = jnp.where(closer, mu, u)
                v = jnp.where(closer, mv, v)
                tri_best = jnp.where(closer, base + k, tri_best)
                det_best = jnp.where(closer, mt_det, det_best)
                hit_found |= closer

            descend.append(box_hit & ~is_leaf)
            t_enter.append(tn)

        d0, d1 = descend
        both = d0 & d1
        near_is_0 = t_enter[0] <= t_enter[1]
        near = jnp.where(near_is_0, child_ids[0], child_ids[1])
        far = jnp.where(near_is_0, child_ids[1], child_ids[0])

        next_cursor = jnp.where(
            both, near, jnp.where(d0, child_ids[0], child_ids[1])
        )
        go_down = d0 | d1

        # Stack push/pop via one-hot masked updates (no scatter).
        sp = s["sp"]
        stack = s["stack"]
        push = both & (sp < stack_depth)
        at_sp = lane_iota == sp[:, None]
        stack = jnp.where(at_sp & push[:, None], far[:, None], stack)
        sp = jnp.where(push, sp + 1, sp)

        can_pop = sp > 0
        at_top = lane_iota == (sp - 1)[:, None]
        popped = jnp.sum(jnp.where(at_top, stack, 0), axis=1)
        next_cursor = jnp.where(
            go_down, next_cursor, jnp.where(can_pop, popped, _DONE)
        )
        sp = jnp.where(go_down, sp, jnp.where(can_pop, sp - 1, sp))

        if any_hit:
            next_cursor = jnp.where(hit_found, _DONE, next_cursor)
        next_cursor = jnp.where(active, next_cursor, _DONE)

        return dict(
            cursor=next_cursor, sp=sp, stack=stack, best_t=best_t,
            u=u, v=v, tri=tri_best, det=det_best, hit_found=hit_found,
            iters=s["iters"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    t = jnp.where(out["hit_found"], out["best_t"], _BIG_T)
    return Hit(
        t=t, u=out["u"], v=out["v"], tri=out["tri"], backface=out["det"] < 0.0
    )


def intersect_closest_bvh(
    geom: TraceGeometry,
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool = True,
    use_pallas: bool = False,
) -> Hit:
    """Closest hit through the LBVH (traceRayEXT semantics)."""
    if use_pallas:
        from vulkanraytracing_tpu.ops import traverse_pallas

        return traverse_pallas.intersect_closest(
            geom, bvh, o, d, t_min, t_max, cull_backface
        )
    del geom
    return _traverse(
        bvh, o, d, t_min, t_max, cull_backface=cull_backface, any_hit=False
    )


def intersect_any_bvh(
    geom: TraceGeometry,
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    use_pallas: bool = False,
) -> Array:
    """Visibility query (TerminateOnFirstHit, no backface cull)."""
    if use_pallas:
        from vulkanraytracing_tpu.ops import traverse_pallas

        return traverse_pallas.intersect_any(geom, bvh, o, d, t_min, t_max)
    del geom
    hit = _traverse(
        bvh, o, d, t_min, t_max, cull_backface=False, any_hit=True
    )
    return hit.is_hit
