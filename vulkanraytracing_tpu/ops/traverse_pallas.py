"""Pallas packet-traversal kernel — the hand-written TPU hot loop.

The XLA packet traversal (ops.traverse_packet) pays HBM round trips for the
wavefront state on every while_loop iteration because each iteration is a
separate XLA computation over R-sized arrays.  This kernel moves the WHOLE
traversal loop inside one Pallas program: per-packet cursor/stack are scalar
loop carries (stack in SMEM), per-lane best-t/tri live in registers, and the
BVH stays VMEM-resident — zero HBM traffic per traversal step.  Measured
~19x over the XLA packet path on VMEM-resident scenes.

TPU-memory facts this design is built around (all measured):

- a VMEM-resident (N, 12) table is lane-padded 12 -> 128 (10.7x): tables
  must be packed densely into 128-lane rows.  Nodes pack 8 per row
  (16 f32 slots each: 12 AABB floats + 4 pad), child ids 64 per row in a
  separate int32 table (int bits must never ride in f32 arrays — XLA
  flushes denormals, and all small ints are denormal f32 patterns);
- every dynamically-indexed read of a VMEM table costs a full-table stack
  temporary in Mosaic, so each traversal step does ONE dynamic-slice per
  table into a tiny VMEM scratch and then reads the scratch at computed
  offsets;
- rays are chunked at the caller (lax.map, with an optimization_barrier so
  XLA cannot fuse the chunk slices into the kernel call and pin every
  chunk's buffers at once).

Packets are 1024 rays shaped (8, 128) — exactly one VPU tile per vector op.
Leaf ranges and flags follow accel.lbvh's encoding, so both builders (LBVH
and native SAH) work unchanged.  Off-TPU the kernel runs in interpret mode,
which is how CI validates it (SURVEY.md section 4 item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkanraytracing_tpu.accel.lbvh import LEAF_SIZE
from vulkanraytracing_tpu.ops.intersect import Hit
from vulkanraytracing_tpu.scene.types import BVH, TraceGeometry

_BIG_T = jnp.float32(3.0e38)
LANE_ROWS = 8
LANE_COLS = 128
LANE = LANE_ROWS * LANE_COLS  # 1024 rays per packet
STACK_DEPTH = 64
MAX_ITERS = 65536
CHUNK_PACKETS = 64  # rays per pallas_call = CHUNK_PACKETS * LANE

NODE_SLOTS = 16       # 12 AABB floats + 4 pad; 8 nodes per 128-lane row
NODES_PER_ROW = LANE_COLS // NODE_SLOTS
TRI_SLOTS = 16        # 9 floats (v0, e1, e2) + 3 flag floats + 4 pad
TRIS_PER_ROW = LANE_COLS // TRI_SLOTS
IDS_PER_ROW = LANE_COLS // 2     # child-id pairs per int32 row

# VMEM gate: packed tables cost ~132 B/tri; leave room for ray chunks.
VMEM_TRI_LIMIT = 400_000


def pallas_supported(bvh: BVH) -> bool:
    return bvh.tris.shape[0] <= VMEM_TRI_LIMIT


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _packed_tables(bvh: BVH):
    """Dense 128-lane table packing (traceable jnp ops, so it works both
    standalone and inlined inside an outer jit like render_frame; XLA CSEs
    the packing across the trace calls of one frame).

    Integer data stays in int32 arrays and flags become 0/1 floats — int
    bits must never ride in f32 arrays (XLA flushes denormals, and all
    small ints are denormal f32 patterns).

    Returns (node_tab f32 (ceil(N/8)+1, 128), child_tab i32
    (ceil(N/64)+1, 128), tri_tab f32 (ceil(T/8)+1, 128))."""
    nodes = bvh.nodes            # (N, 12)
    child = bvh.child_index      # (N, 2)
    tris = bvh.tris              # (T, 12) (9 used)
    flags = bvh.tri_flags        # (T,)
    n, t = nodes.shape[0], tris.shape[0]

    def pad_rows(x, per):
        rows = (-(-x.shape[0] // per) + 1) * per  # +1 row: fetches never overrun
        return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

    node_tab = pad_rows(
        jnp.pad(nodes, ((0, 0), (0, NODE_SLOTS - 12))), NODES_PER_ROW
    ).reshape(-1, LANE_COLS)

    child_tab = pad_rows(child, IDS_PER_ROW).reshape(-1, LANE_COLS)

    flag_cols = jnp.stack(
        [
            (flags & 1).astype(jnp.float32),
            ((flags & 6) != 0).astype(jnp.float32),
        ],
        axis=1,
    )
    tri_rec = jnp.concatenate(
        [tris[:, :9], flag_cols, jnp.zeros((t, TRI_SLOTS - 11), jnp.float32)],
        axis=1,
    )
    tri_tab = pad_rows(tri_rec, TRIS_PER_ROW).reshape(-1, LANE_COLS)
    return node_tab, child_tab, tri_tab


def _kernel(cull_backface: bool, any_hit: bool):
    tiny = 1e-30  # python floats: jnp scalars would be captured consts
    big = 3.0e38

    def kernel(
        node_ref,       # (NR, 128) f32 VMEM — 8 nodes/row, 16 slots each
        child_ref,      # (CR, 128) i32 VMEM — 64 id-pairs/row
        tri_ref,        # (TR, 128) f32 VMEM — 8 tris/row, 16 slots each
        ox_ref, oy_ref, oz_ref,      # (8, 128) f32 per-packet block
        dx_ref, dy_ref, dz_ref,
        tmin_ref, tmax_ref,
        best_ref,       # (8, 128) f32 out
        tri_out_ref,    # (8, 128) i32 out
        hit_ref,        # (8, 128) i32 out
        stack_ref,      # (STACK_DEPTH,) i32 SMEM
    ):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_min = tmin_ref[...]
        t_max = tmax_ref[...]

        def safe_inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c
            )

        inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        live0 = t_min <= t_max

        def slab_child(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, best_t, live):
            ax = (lo_x - ox) * inv_dx
            bx = (hi_x - ox) * inv_dx
            ay = (lo_y - oy) * inv_dy
            by = (hi_y - oy) * inv_dy
            az = (lo_z - oz) * inv_dz
            bz = (hi_z - oz) * inv_dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
                jnp.maximum(jnp.minimum(az, bz), t_min),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
                jnp.minimum(jnp.maximum(az, bz), best_t),
            )
            lane_hit = (tn <= tf) & live
            return jnp.any(lane_hit), jnp.min(jnp.where(lane_hit, tn, big))

        def leaf_tris(idx, best_t, tri_best, hit_found, live):
            """Intersect one leaf range (<= LEAF_SIZE Morton-contiguous
            tris).  One dynamic-slice fetches the two rows that can contain
            the range; a dynamic lane-roll aligns the first record to lane 0
            so all element reads use static lane indices (Mosaic forbids
            dynamic lane addressing)."""
            packed = ~idx
            start = packed >> 4
            count = packed & 15
            base_row = start // TRIS_PER_ROW
            pair = tri_ref[pl.ds(base_row, 2), :]               # (2, 128)
            base_col = (start % TRIS_PER_ROW) * TRI_SLOTS
            rolled = pltpu.roll(pair, shift=-base_col, axis=1)  # rec k at k*16
            for k in range(LEAF_SIZE):
                in_leaf = k < count
                wrap = (start % TRIS_PER_ROW) + k >= TRIS_PER_ROW

                def tc(j, _k=k, _wrap=wrap):
                    return jnp.where(
                        _wrap, rolled[1, _k * TRI_SLOTS + j],
                        rolled[0, _k * TRI_SLOTS + j],
                    )

                v0x, v0y, v0z = tc(0), tc(1), tc(2)
                e1x, e1y, e1z = tc(3), tc(4), tc(5)
                e2x, e2y, e2z = tc(6), tc(7), tc(8)
                cull_disable = tc(9) > 0.5
                candidate = tc(10) > 0.5

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

                valid = (
                    live & in_leaf & candidate
                    & (jnp.abs(det) > tiny)
                    & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                    & (mt >= t_min) & (mt < best_t)
                )
                if cull_backface:
                    valid &= (det > tiny) | cull_disable

                best_t = jnp.where(valid, mt, best_t)
                tri_best = jnp.where(valid, start + k, tri_best)
                hit_found |= valid
            return best_t, tri_best, hit_found

        def cond(state):
            cursor = state[0]
            iters = state[5]
            return (cursor != -1) & (iters < MAX_ITERS)

        def body(state):
            cursor, sp, best_t, tri_best, hit_i32, iters = state
            hit_found = hit_i32 != 0  # bool vectors can't be while carries
            if any_hit:
                live = live0 & ~hit_found
            else:
                live = live0

            # one dynamic-slice fetch per table, lane-rolled so reads are
            # at static lanes
            nrow = node_ref[pl.ds(cursor // NODES_PER_ROW, 1), :]
            nrow = pltpu.roll(
                nrow, shift=-(cursor % NODES_PER_ROW) * NODE_SLOTS, axis=1
            )
            crow = child_ref[pl.ds(cursor // IDS_PER_ROW, 1), :]
            crow = pltpu.roll(
                crow, shift=-(cursor % IDS_PER_ROW) * 2, axis=1
            )
            idx0 = crow[0, 0]
            idx1 = crow[0, 1]

            def nc(j):
                return nrow[0, j]

            hit0, te0 = slab_child(nc(0), nc(1), nc(2), nc(3), nc(4), nc(5),
                                   best_t, live)
            hit1, te1 = slab_child(nc(6), nc(7), nc(8), nc(9), nc(10), nc(11),
                                   best_t, live)

            leaf0 = idx0 < 0
            leaf1 = idx1 < 0

            bt, tb, hf = leaf_tris(
                jnp.where(leaf0 & hit0, idx0, -1), best_t, tri_best,
                hit_found, live,
            )
            bt, tb, hf = leaf_tris(
                jnp.where(leaf1 & hit1, idx1, -1), bt, tb, hf, live
            )

            d0 = hit0 & ~leaf0
            d1 = hit1 & ~leaf1
            both = d0 & d1
            near_is_0 = te0 <= te1
            near = jnp.where(near_is_0, idx0, idx1)
            far = jnp.where(near_is_0, idx1, idx0)
            next_cursor = jnp.where(both, near, jnp.where(d0, idx0, idx1))

            push = both & (sp < STACK_DEPTH)
            sp_c = jnp.minimum(sp, STACK_DEPTH - 1)
            prev = stack_ref[sp_c]
            stack_ref[sp_c] = jnp.where(push, far, prev)
            sp = jnp.where(push, sp + 1, sp)

            go_down = d0 | d1
            can_pop = sp > 0
            top = stack_ref[jnp.maximum(sp - 1, 0)]
            next_cursor = jnp.where(
                go_down, next_cursor, jnp.where(can_pop, top, -1)
            )
            sp = jnp.where(go_down, sp, jnp.where(can_pop, sp - 1, sp))

            if any_hit:
                all_done = jnp.all(hf | ~live0)
                next_cursor = jnp.where(all_done, -1, next_cursor)

            return (next_cursor, sp, bt, tb, hf.astype(jnp.int32), iters + 1)

        best0 = jnp.where(t_max < big, t_max, big)
        state = (
            jnp.where(jnp.any(live0), 0, -1),
            jnp.int32(0),
            best0,
            jnp.zeros(ox.shape, jnp.int32),
            jnp.zeros(ox.shape, jnp.int32),
            jnp.int32(0),
        )
        _, _, best_t, tri_best, hit_i32, _ = jax.lax.while_loop(
            cond, body, state
        )
        best_ref[...] = best_t
        tri_out_ref[...] = tri_best
        hit_ref[...] = hit_i32

    return kernel


def _pad_to(x: Array, n: int, value) -> Array:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], axis=0
    )


# not @jax.jit — nested jits trip a jax 0.9 executable-resolution bug (see
# traverse_packet.traverse_packets) and compiler_options are top-level-only;
# hot-path callers (render_frame etc.) are jitted with the raised
# scoped-VMEM limit via core.jit_utils.hot_jit
def _traverse_pallas_packed(
    node_tab: Array,
    child_tab: Array,
    tri_tab: Array,
    bvh_tris: Array,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool,
    any_hit: bool,
    interpret: bool = False,
) -> Hit:
    r_orig = o.shape[0]
    raw_pack = -(-r_orig // LANE)
    chunk_packets = min(CHUNK_PACKETS, raw_pack)
    n_chunks = -(-raw_pack // chunk_packets)
    r = n_chunks * chunk_packets * LANE
    rows = LANE_ROWS * chunk_packets

    def comp(a, j, fill):
        return _pad_to(a[:, j], r, fill).reshape(n_chunks, rows, LANE_COLS)

    ox, oy, oz = comp(o, 0, 0.0), comp(o, 1, 0.0), comp(o, 2, 0.0)
    dx, dy, dz = comp(d, 0, 1.0), comp(d, 1, 1.0), comp(d, 2, 1.0)
    tmin2 = _pad_to(t_min, r, 1.0).reshape(n_chunks, rows, LANE_COLS)
    tmax2 = _pad_to(t_max, r, 0.0).reshape(n_chunks, rows, LANE_COLS)

    ray_spec = pl.BlockSpec(
        (LANE_ROWS, LANE_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANE_COLS), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANE_COLS), jnp.int32),
    ]

    call = pl.pallas_call(
        _kernel(cull_backface, any_hit),
        grid=(chunk_packets,),
        in_specs=[full(), full(), full()] + [ray_spec] * 8,
        out_specs=[ray_spec, ray_spec, ray_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run_chunk(args):
        # barrier: XLA must not fuse chunk slices into the kernel call
        args = jax.lax.optimization_barrier(args)
        cox, coy, coz, cdx, cdy, cdz, ctmin, ctmax = args
        return call(
            node_tab, child_tab, tri_tab,
            cox, coy, coz, cdx, cdy, cdz, ctmin, ctmax,
        )

    best, tri, hit_i = jax.lax.map(
        run_chunk, (ox, oy, oz, dx, dy, dz, tmin2, tmax2)
    )

    def flat(x):
        return x.reshape(r)[:r_orig]

    hit_found = flat(hit_i) != 0
    tri_f = flat(tri)

    # recompute (u, v, det) for the winners with one MT test
    tiny = jnp.float32(1e-30)
    rec = bvh_tris[jnp.where(hit_found, tri_f, 0)]
    pvec = jnp.cross(d, rec[:, 6:9])
    fdet = jnp.sum(rec[:, 3:6] * pvec, axis=-1)
    finv = 1.0 / jnp.where(jnp.abs(fdet) < tiny, 1.0, fdet)
    tvec = o - rec[:, 0:3]
    fu = jnp.sum(tvec * pvec, axis=-1) * finv
    fv = jnp.sum(d * jnp.cross(tvec, rec[:, 3:6]), axis=-1) * finv

    t = jnp.where(hit_found, flat(best), _BIG_T)
    return Hit(t=t, u=fu, v=fv, tri=tri_f, backface=hit_found & (fdet < 0.0))


from vulkanraytracing_tpu.core.jit_utils import hot_jit

# top-level jitted twin for standalone (non-traced) calls: it carries the
# raised scoped-VMEM compiler option, which jax only allows on a top-level
# jit; inside an outer jit the raw function is inlined instead
_traverse_pallas_jitted = hot_jit(
    _traverse_pallas_packed,
    static_argnames=("cull_backface", "any_hit", "interpret"),
)


def _dispatch(o):
    import jax.core

    return (
        _traverse_pallas_packed
        if isinstance(o, jax.core.Tracer)
        else _traverse_pallas_jitted
    )


def intersect_closest(
    geom: TraceGeometry,
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool = True,
) -> Hit:
    from vulkanraytracing_tpu.ops.traverse_wide import _canon_rays

    o, d, t_min, t_max = _canon_rays(o, d, t_min, t_max)
    del geom
    if not pallas_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_packet

        return traverse_packet.intersect_closest_packet(
            None, bvh, o, d, t_min, t_max, cull_backface=cull_backface
        )
    node_tab, child_tab, tri_tab = _packed_tables(bvh)
    return _dispatch(o)(
        node_tab, child_tab, tri_tab, bvh.tris,
        o, d, t_min, t_max,
        cull_backface=cull_backface, any_hit=False,
        interpret=_use_interpret(),
    )


def intersect_any(
    geom: TraceGeometry,
    bvh: BVH,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
) -> Array:
    from vulkanraytracing_tpu.ops.traverse_wide import _canon_rays

    o, d, t_min, t_max = _canon_rays(o, d, t_min, t_max)
    del geom
    if not pallas_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_packet

        return traverse_packet.intersect_any_packet(
            None, bvh, o, d, t_min, t_max
        )
    node_tab, child_tab, tri_tab = _packed_tables(bvh)
    hit = _dispatch(o)(
        node_tab, child_tab, tri_tab, bvh.tris,
        o, d, t_min, t_max,
        cull_backface=False, any_hit=True,
        interpret=_use_interpret(),
    )
    return hit.is_hit
