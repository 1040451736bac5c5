"""Packet BVH traversal — the TPU-shaped hot path.

Per-ray traversal needs a data-dependent gather per ray per step, which on
TPU pays per-op dispatch overhead times the *maximum* step count over the
whole wavefront.  Packet traversal restructures the loop so the inner work
is exactly what the VPU is built for:

- rays are grouped into packets of LANE (default 256) spatially coherent
  rays (the renderer feeds 16x16 pixel tiles — the same locality trick as
  the reference's thread-group swizzle, Compute/ThreadGroupTiling.glsl:18-69);
- each packet shares ONE traversal cursor + stack: the per-step BVH node
  fetch is a tiny (P, 16) row gather instead of an (R,)-wide one, and the
  AABB/triangle tests are dense (P, C, K, L) VPU ops with no gathers at all;
- a packet descends into a child iff ANY live lane's slab test passes
  (per-lane best-t pruned), ordered near-first by the minimum entry t.

TPU-layout notes (these dominate performance):

- all hot arrays keep the LANE axis minor (multiple of 128); vector math is
  written in explicit x/y/z component form because any materialized
  (..., L, 3) tensor gets its minor dim padded 3 -> 128 by TPU tiling —
  a measured ~40x HBM-traffic blowup;
- both children and all LEAF_SIZE leaf triangles are processed as ONE
  batched elementwise DAG per iteration (shape (P, C, K, L)) so XLA fuses
  the Moller-Trumbore chain into a couple of kernels instead of dozens of
  dispatches;
- the loop state is minimal (best_t + winning tri id); the winner's
  (u, v, det) are recomputed by a single MT test after the loop;
- per-packet stacks are updated with one-hot compare-selects — XLA scatter
  with per-row dynamic columns serializes on TPU (~200x slower, measured).

Packet divergence (lanes idling while the packet visits nodes they'd skip)
replaces per-ray divergence; for primary/shadow tiles the packet union stays
within ~2-3x of a single ray's visit count, and bounce rays remain
pixel-coherent.  Leaves are LEAF_SIZE-triangle Morton-contiguous ranges
(accel.lbvh) fetched as one (P, C, K, 12) gather.
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
_DONE = jnp.int32(-2147483648)
LANE = 256
STACK_DEPTH = 48
MAX_ITERS = 16384


def _pad_to(x: Array, n: int, value) -> Array:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], axis=0
    )


GROUP_PACKETS = 256  # packets per independent while_loop group


# NOTE: intentionally NOT @jax.jit: nested jit (this function traced inside
# render_frame's jit) followed by a standalone call at new shapes trips a
# jax 0.9.0 executable-resolution bug ("Execution supplied N buffers but
# compiled program expected M").  Callers on the hot path are jitted at the
# top level; standalone calls trace eagerly (the while_loop still compiles).
def traverse_packets(
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool,
    any_hit: bool,
    lane: int = LANE,
    stack_depth: int = STACK_DEPTH,
    max_iters: int = MAX_ITERS,
    group_packets: int = GROUP_PACKETS,
) -> tuple[Hit, Array]:
    """Trace rays through the BVH in packet groups.

    Packets are processed in groups of ``group_packets``, each group running
    its own while_loop (sequenced by lax.map): a group over empty sky exits
    after a few node visits instead of idling — dense and masked — for the
    worst packet of the whole frame.  Spatial tiling makes groups
    depth-coherent, so this recovers most of the per-packet-exit win without
    giving up wide VPU shapes."""
    r_orig = o.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    raw_pack = -(-r_orig // lane)
    group_packets = min(group_packets, raw_pack)
    n_groups = -(-raw_pack // group_packets)
    n_pack = n_groups * group_packets
    r = n_pack * lane

    o = _pad_to(o, r, 0.0)
    d = _pad_to(d, r, 1.0)
    t_min = _pad_to(t_min, r, 1.0).reshape(n_pack, lane)
    t_max = _pad_to(t_max, r, 0.0).reshape(n_pack, lane)  # padding = dead

    # SOA components, LANE minor, grouped: (G, gp, L)
    def comp(a, j):
        return a[:, j].reshape(n_groups, group_packets, lane)

    tiny = jnp.float32(1e-20)

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c)

    group_args = dict(
        ox=comp(o, 0), oy=comp(o, 1), oz=comp(o, 2),
        dx=comp(d, 0), dy=comp(d, 1), dz=comp(d, 2),
        t_min=t_min.reshape(n_groups, group_packets, lane),
        t_max=t_max.reshape(n_groups, group_packets, lane),
    )

    k_iota = jnp.arange(LEAF_SIZE, dtype=i32)

    def run_group(g):
        ox, oy, oz = g["ox"], g["oy"], g["oz"]
        dx, dy, dz = g["dx"], g["dy"], g["dz"]
        t_min, t_max = g["t_min"], g["t_max"]
        n_pack = group_packets
        inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        has_work = jnp.any(t_min <= t_max, axis=1)
        state = dict(
            cursor=jnp.where(has_work, i32(0), _DONE),     # (P,)
            sp=jnp.zeros((n_pack,), i32),
            stack=jnp.zeros((n_pack, stack_depth), i32),
            best_t=jnp.where(t_max < _BIG_T, t_max, _BIG_T),  # (P, L)
            tri=jnp.zeros((n_pack, lane), i32),
            hit_found=jnp.zeros((n_pack, lane), bool),
            iters=jnp.int32(0),
        )

        stack_iota = jax.lax.broadcasted_iota(i32, (n_pack, stack_depth), 1)

        def cond(s):
            return jnp.any(s["cursor"] != _DONE) & (s["iters"] < max_iters)

        def body(s):
            active = s["cursor"] != _DONE                   # (P,)
            node_sel = jnp.where(active, s["cursor"], 0)
            node = bvh.nodes[node_sel]                      # (P, 12)
            idx = bvh.child_index[node_sel]                 # (P, C)

            best_t = s["best_t"]
            tri = s["tri"]
            hit_found = s["hit_found"]
            if any_hit:
                lane_live = active[:, None] & ~hit_found
            else:
                lane_live = jnp.broadcast_to(active[:, None], best_t.shape)

            is_leaf = idx < 0

            # --- slab test, component form: (P, C, L) ---
            def nodecol(j):  # (P, C, 1)
                return node[:, (j, 6 + j)][:, :, None]

            def slab_axis(lo, hi, oc, inv):  # -> (tn, tf) over one axis
                a = (lo - oc[:, None, :]) * inv[:, None, :]
                b = (hi - oc[:, None, :]) * inv[:, None, :]
                return jnp.minimum(a, b), jnp.maximum(a, b)

            nx, fx = slab_axis(nodecol(0), nodecol(3), ox, inv_dx)
            ny, fy = slab_axis(nodecol(1), nodecol(4), oy, inv_dy)
            nz, fz = slab_axis(nodecol(2), nodecol(5), oz, inv_dz)
            tn = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, t_min[:, None, :]))
            tf = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, best_t[:, None, :]))
            lane_hit = (tn <= tf) & lane_live[:, None, :]
            child_hit = jnp.any(lane_hit, axis=2)           # (P, C)

            # --- leaves: one gather + one batched component-form MT (P, C, K, L) ---
            packed = ~idx
            start = packed >> 4
            count = packed & 15                             # (P, C)
            leaf_active = is_leaf & child_hit
            base = jnp.where(leaf_active, start, 0)
            tid = jnp.minimum(
                base[:, :, None] + k_iota[None, None, :], bvh.tris.shape[0] - 1
            )                                               # (P, C, K)
            rec = bvh.tris[tid]                             # (P, C, K, 12)

            def tcol(j):  # (P, C, K, 1)
                return rec[:, :, :, j, None]

            obx, oby, obz = (c[:, None, None, :] for c in (ox, oy, oz))  # (P,1,1,L)
            dbx, dby, dbz = (c[:, None, None, :] for c in (dx, dy, dz))

            e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
            e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)
            # pvec = d x e2
            pvx = dby * e2z - dbz * e2y
            pvy = dbz * e2x - dbx * e2z
            pvz = dbx * e2y - dby * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz          # (P, C, K, L)
            inv_det = 1.0 / jnp.where(jnp.abs(det) < tiny, 1.0, det)
            tvx = obx - tcol(0)
            tvy = oby - tcol(1)
            tvz = obz - tcol(2)
            mu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            # qvec = tvec x e1
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            mv = (dbx * qvx + dby * qvy + dbz * qvz) * inv_det
            mt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

            flags = bvh.tri_flags[tid]                      # (P, C, K)
            cull_disable = (flags & 1) != 0
            candidate = (flags & 6) != 0  # opaque or alpha-tested
            k_in_leaf = leaf_active[:, :, None] & (
                k_iota[None, None, :] < count[:, :, None]
            )                                                # (P, C, K)

            tri_valid = (
                (k_in_leaf & candidate)[..., None]
                & lane_live[:, None, None, :]
                & (jnp.abs(det) > tiny)
                & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                & (mt >= t_min[:, None, None, :])
                # <= (not <): inclusive window upper bound like the brute
                # oracle's, keeping equal-t ties as candidates for the
                # deterministic id tie-break below
                & (mt <= best_t[:, None, None, :])
            )
            if cull_backface:
                tri_valid &= (det > tiny) | cull_disable[..., None]

            mt = jnp.where(tri_valid, mt, _BIG_T)
            # reduce the C*K candidate axis to the per-lane best; the winner's
            # (u, v, det) are recomputed once after the loop
            ck = 2 * LEAF_SIZE
            mt2 = mt.reshape(n_pack, ck, lane)
            new_t = jnp.min(mt2, axis=1)
            ck_tri = (base[:, :, None] + k_iota[None, None, :]).reshape(n_pack, ck)
            # lowest id among this visit's equal-t winners (masked min —
            # also replaces the former argmin+onehot select)
            sel_tri = jnp.min(
                jnp.where(mt2 == new_t[:, None, :], ck_tri[:, :, None],
                          jnp.int32(2**31 - 1)),
                axis=1,
            )
            have_new = new_t < _BIG_T
            if any_hit:
                take = have_new & (new_t <= best_t)
            else:
                # lexicographic (t, id) merge across visits: equal-t ties
                # resolve to the lowest triangle id, bit-matching the brute
                # oracle's argmin (cornell wall-corner ties flipped shading
                # normals between backends — tools/ab/nee_tap_probe.py)
                cur_id = jnp.where(hit_found, tri, jnp.int32(2**31 - 1))
                take = have_new & (
                    (new_t < best_t)
                    | ((new_t == best_t) & (sel_tri < cur_id))
                )
            best_t = jnp.where(take, new_t, best_t)
            tri = jnp.where(take, sel_tri, tri)
            hit_found |= take

            # --- descent decision ---
            descend_c = child_hit & ~is_leaf                 # (P, C)
            t_enter_c = jnp.min(jnp.where(lane_hit, tn, _BIG_T), axis=2)
            d0 = descend_c[:, 0]
            d1 = descend_c[:, 1]
            both = d0 & d1
            near_is_0 = t_enter_c[:, 0] <= t_enter_c[:, 1]
            near = jnp.where(near_is_0, idx[:, 0], idx[:, 1])
            far = jnp.where(near_is_0, idx[:, 1], idx[:, 0])
            next_cursor = jnp.where(both, near, jnp.where(d0, idx[:, 0], idx[:, 1]))
            go_down = d0 | d1

            # stack push/pop via one-hot masked updates (no scatter)
            sp = s["sp"]
            stack = s["stack"]
            push = both & (sp < stack_depth)
            at_sp = stack_iota == sp[:, None]
            stack = jnp.where(at_sp & push[:, None], far[:, None], stack)
            sp = jnp.where(push, sp + 1, sp)

            can_pop = sp > 0
            at_top = stack_iota == (sp - 1)[:, None]
            popped = jnp.sum(jnp.where(at_top, stack, 0), axis=1)
            next_cursor = jnp.where(
                go_down, next_cursor, jnp.where(can_pop, popped, _DONE)
            )
            sp = jnp.where(go_down, sp, jnp.where(can_pop, sp - 1, sp))

            if any_hit:
                all_hit = jnp.all(hit_found | (t_min > t_max), axis=1)
                next_cursor = jnp.where(all_hit, _DONE, next_cursor)
            next_cursor = jnp.where(active, next_cursor, _DONE)

            return dict(
                cursor=next_cursor, sp=sp, stack=stack, best_t=best_t,
                tri=tri, hit_found=hit_found, iters=s["iters"] + 1,
            )

        out = jax.lax.while_loop(cond, body, state)
        return out["best_t"], out["tri"], out["hit_found"], out["iters"]

    best_t_g, tri_g, hit_g, iters_g = jax.lax.map(run_group, group_args)

    def flat(x):
        return x.reshape(r)[:r_orig]

    # one final MT test against the winning triangle reconstructs (u, v, det)
    hit_found = flat(hit_g)
    tri = flat(tri_g)
    rec = bvh.tris[jnp.where(hit_found, tri, 0)]
    of = o[:r_orig]
    df = d[:r_orig]
    pvec = jnp.cross(df, rec[:, 6:9])
    fdet = jnp.sum(rec[:, 3:6] * pvec, axis=-1)
    finv = 1.0 / jnp.where(jnp.abs(fdet) < tiny, 1.0, fdet)
    tvec = of - rec[:, 0:3]
    fu = jnp.sum(tvec * pvec, axis=-1) * finv
    fv = jnp.sum(df * jnp.cross(tvec, rec[:, 3:6]), axis=-1) * finv

    t = jnp.where(hit_found, flat(best_t_g), _BIG_T)
    return Hit(
        t=t,
        u=fu,
        v=fv,
        tri=tri,
        backface=hit_found & (fdet < 0.0),
    ), jnp.sum(iters_g)


def intersect_closest_packet(
    geom: TraceGeometry,
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool = True,
    lane: int = LANE,
) -> Hit:
    from vulkanraytracing_tpu.ops.traverse_wide import _canon_rays

    o, d, t_min, t_max = _canon_rays(o, d, t_min, t_max)
    del geom  # geometry lives pre-packed in bvh.tris
    hit, _ = traverse_packets(
        bvh, o, d, t_min, t_max, cull_backface=cull_backface, any_hit=False,
        lane=lane,
    )
    return hit


def intersect_any_packet(
    geom: TraceGeometry,
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    lane: int = LANE,
) -> Array:
    from vulkanraytracing_tpu.ops.traverse_wide import _canon_rays

    o, d, t_min, t_max = _canon_rays(o, d, t_min, t_max)
    del geom
    hit, _ = traverse_packets(
        bvh, o, d, t_min, t_max, cull_backface=False, any_hit=True, lane=lane
    )
    return hit.is_hit
