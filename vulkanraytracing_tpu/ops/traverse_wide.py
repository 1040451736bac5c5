"""Wide persistent Pallas traversal — W independent 128-ray sub-packets with
fully vectorized traversal state.

Third-generation production traversal kernel (the reference's `traceRayEXT`
hardware unit, Source/Shaders/PathTracing/RayGen.rgen:337-343).  Measured
lineage on v5e, Sponza-class 262k-tri scene, coherent primaries:

1. ops.traverse_pallas: one shared BVH cursor per 1024-ray packet
   (~0.5 Mrays/s on this scene).
2. ops.traverse_subpacket: 8 row cursors + SMEM scalar stacks, work refill
   (~5.7 Mrays/s; 3.4 us per while-iteration, 428 ns per 128-ray node visit).
3. This kernel.  Microbenchmarks showed the subpacket iteration is bound by
   a ~2 us serial scalar<->vector dependency chain, NOT by vector throughput
   (an empty Pallas while-iteration already costs ~310 ns; 60 extra VPU ops
   cost ~170 ns).  So: make each iteration serve W=64 rows instead of 8, and
   take the scalar unit off the critical path:

   - ONE unified node+tri table: a cursor fetches exactly one 128-lane row
     per visit whether it sits at an interior node or a leaf (the subpacket
     kernel fetched from two tables).  16 i32 slots per record, 8 records
     per row, lane-rolled into place.
   - cursors, stack pointers and stacks live in VMEM as (W, 128) vectors;
     push/pop/descend decisions are lane-iota masked VPU selects.  The only
     scalar work per visit is one VMEM element read (the cursor) feeding the
     row fetch address.
   - interior and leaf math run unmasked over all W rows every iteration
     (each row's fetched record makes exactly one of them meaningful); lane
     masks pick the live results.  At W=64 the slab + Moller-Trumbore vector
     cost amortizes to ~8 ns per visit — iteration overhead, not VPU
     throughput, stays the limiting term.
   - NO dynamic work refill.  A refill block of per-row `pl.when`-gated
     dynamic pool copies measured ~22 us of per-iteration drag even when
     never taken (it defeats Mosaic's scheduling of the whole loop body).
     Instead the pool is processed in static WAVES of W rows: wave w owns
     pool rows [w*W, (w+1)*W), loaded and flushed with single (W, 128)
     block copies, and an inner while-loop traverses until every row of
     the wave retires.  The occupancy loss to intra-wave stragglers
     (rows idle once finished) measured far cheaper than dynamic refill.

Leaf encoding, tri records and builder interface are identical to
ops.traverse_subpacket (both builders accel.lbvh / accel.sah feed this
kernel unchanged).  Off-TPU the kernel runs in interpret mode and CI
validates it against the brute-force oracle (SURVEY.md section 4 item 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkanraytracing_tpu.accel.lbvh import LEAF_SIZE as LEAF_TESTS
from vulkanraytracing_tpu.ops.intersect import Hit
from vulkanraytracing_tpu.scene.types import BVH, TraceGeometry

_BIG_T = jnp.float32(3.0e38)
LANE_COLS = 128
WIDE_ROWS = 64          # resident 128-ray sub-packets per wave (compiled)
INTERPRET_ROWS = 8      # interpret-mode wave width (CI on CPU)
STACK_DEPTH = 64
MAX_ITERS = 1 << 22

NODE_SLOTS = 16
RECS_PER_ROW = LANE_COLS // NODE_SLOTS   # 8 records (nodes or tris) per row

DONE = -(1 << 30)
VMEM_TRI_LIMIT = 400_000


def wide_supported(bvh: BVH) -> bool:
    return bvh.tris.shape[0] <= VMEM_TRI_LIMIT


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unified_table(bvh: BVH) -> tuple[Array, Array]:
    """Pack BVH nodes and triangles into ONE dense (rows, 128) i32 table.

    Layout: rows [0, NR) hold node records (12 f32-bitcast AABB floats for
    the two children + 2 child ids), row NR is an all-zero sentinel (DONE
    rows fetch it harmlessly; its tri candidate flags are 0), rows
    (NR, NR+TR] hold tri records (v0, e1, e2, cull-disable, candidate,
    Morton tri index as f32 — exact to 2^24 — all f32 bitcast to i32).

    Returns (table, nr) with nr = jnp-traceable row count of the node part
    (static int in practice since shapes are static)."""
    nodes = bvh.nodes            # (N, 12) f32
    child = bvh.child_index      # (N, 2) i32
    tris = bvh.tris              # (T, 12) f32 (9 used)
    flags = bvh.tri_flags        # (T,) i32
    n, t = nodes.shape[0], tris.shape[0]

    def pad_rows(x):
        rows = -(-x.shape[0] // RECS_PER_ROW) * RECS_PER_ROW
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))

    node_rec = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(nodes, jnp.int32),
            child.astype(jnp.int32),
            jnp.zeros((n, NODE_SLOTS - 14), jnp.int32),
        ],
        axis=1,
    )
    node_part = pad_rows(node_rec).reshape(-1, LANE_COLS)

    flag_cols = jnp.stack(
        [
            (flags & 1).astype(jnp.float32),              # cull_disable
            ((flags & 6) != 0).astype(jnp.float32),       # candidate
        ],
        axis=1,
    )
    tri_index = jnp.arange(t, dtype=jnp.float32)[:, None]
    tri_rec = jnp.concatenate(
        [
            tris[:, :9],
            flag_cols,
            tri_index,
            jnp.zeros((t, NODE_SLOTS - 12), jnp.float32),
        ],
        axis=1,
    )
    tri_part = jax.lax.bitcast_convert_type(
        pad_rows(tri_rec).reshape(-1, LANE_COLS), jnp.int32
    )
    sentinel = jnp.zeros((1, LANE_COLS), jnp.int32)
    table = jnp.concatenate([node_part, sentinel, tri_part], axis=0)
    return table, node_part.shape[0]


def _kernel(cull_backface: bool, any_hit: bool, nr_rows: int, W: int):
    tiny = 1e-30
    # leaf det epsilon matches the brute oracle (ops.intersect:104);
    # ``tiny`` stays for the slab-test direction reciprocals
    det_eps = 1e-20
    big = 3.0e38

    def kernel(
        uni_ref,          # (UR, 128) i32 VMEM — unified node+tri table
        pox, poy, poz,    # (W, 128) f32 VMEM — this wave's ray slice
        pdx, pdy, pdz,
        ptmin, ptmax,
        obest,            # (W, 128) f32 out — this wave's results
        otri,             # (W, 128) i32 out
        ohit,             # (W, 128) i32 out
        octr,             # (8, 128) i32 out — perf counters (accumulated)
        # working state for the W resident sub-packets, all (W, 128)
        rix, riy, riz,    # reciprocal direction
        wbest,            # running best t
        nscr,             # i32 — fetched records
        wtri,             # i32 — running best tri
        whit,             # i32 — running hit mask
        meta,             # i32 — col 0: cursor, col 1: sp
        stack,            # i32 — per-row traversal stack in lanes
    ):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, LANE_COLS), 1)
        zf = jnp.zeros((W, LANE_COLS), jnp.float32)
        zi = jnp.zeros((W, LANE_COLS), jnp.int32)

        def safe_inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c
            )

        def fetch_addr(c):
            """(table row, lane shift) for cursor c — vector ops on (W, 1).

            Computed at decision time and parked in meta cols 3-4, so the
            per-row scalar fetch loop is just two SMEM-cheap element reads
            plus the load+roll."""
            ii = c >= 0
            isdone = c == DONE
            start = (~c) >> 4
            row = jnp.where(
                ii,
                c >> 3,
                jnp.where(isdone, nr_rows, nr_rows + 1 + (start >> 3)),
            )
            sh = jnp.where(ii, (c & 7) << 4, (start & 7) << 4)
            return row, jnp.where(isdone, 0, sh)

        def body(state):
            it, _, n_int, n_leaf = state

            # --- fetch: one unified-table row per resident packet ---
            for j in range(W):
                nscr[pl.ds(j, 1), :] = pltpu.roll(
                    uni_ref[pl.ds(meta[j, 3], 1), :], shift=-meta[j, 4], axis=1
                )

            c_all = meta[:, 0:1] + zi  # lane-replicated
            ii_m = c_all >= 0
            il_m = (c_all < 0) & (c_all != DONE)
            done_m = c_all == DONE

            # --- interior math (meaningful only for ii rows) ---
            def colf(i):
                return pltpu.bitcast(nscr[:, i : i + 1], jnp.float32)

            ox, oy, oz = pox[...], poy[...], poz[...]
            ix, iy, iz = rix[...], riy[...], riz[...]
            t_min = ptmin[...]
            best = wbest[...]

            def slab(b):
                ax = (colf(b + 0) - ox) * ix
                bx = (colf(b + 3) - ox) * ix
                ay = (colf(b + 1) - oy) * iy
                by = (colf(b + 4) - oy) * iy
                az = (colf(b + 2) - oz) * iz
                bz = (colf(b + 5) - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
                    jnp.maximum(jnp.minimum(az, bz), t_min),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
                    jnp.minimum(jnp.maximum(az, bz), best),
                )
                return tn, tf

            tn0, tf0 = slab(0)
            tn1, tf1 = slab(6)
            # row reductions broadcast back to full (W, 128) lane width:
            # chains of narrow (W, 1) ops measured ~10x slower than
            # lane-replicated full-width ops (per-op layout conversions)
            t0r = jnp.min(jnp.where(tn0 <= tf0, tn0, big), axis=1, keepdims=True) + zf
            t1r = jnp.min(jnp.where(tn1 <= tf1, tn1, big), axis=1, keepdims=True) + zf
            h0r = t0r < big
            h1r = t1r < big
            near0 = t0r <= t1r
            e0col = nscr[:, 12:13] + zi
            e1col = nscr[:, 13:14] + zi
            if any_hit:
                nxt_int = jnp.where(h0r, e0col, e1col)
                far = e1col
            else:
                nxt_int = jnp.where(
                    h0r & h1r,
                    jnp.where(near0, e0col, e1col),
                    jnp.where(h0r, e0col, e1col),
                )
                far = jnp.where(near0, e1col, e0col)
            code = jnp.where(h0r | h1r, 1, 0) + jnp.where(h0r & h1r, 2, 0)

            # --- leaf math (meaningful only for il rows) ---
            lf = pltpu.bitcast(nscr[...], jnp.float32)
            dx, dy, dz = pdx[...], pdy[...], pdz[...]
            tri_best = wtri[...]
            hit_found = whit[...] != 0

            def coll(i):
                return lf[:, i : i + 1]

            # current winner's id as f32 for the lexicographic (t, id)
            # tie-break (see traverse_wide8.leaf_math); no winner => +inf
            cur_tid = jnp.where(
                hit_found, tri_best.astype(jnp.float32), jnp.float32(3.0e38)
            )

            for k in range(LEAF_TESTS):
                b = k * NODE_SLOTS
                v0x, v0y, v0z = coll(b + 0), coll(b + 1), coll(b + 2)
                e1x, e1y, e1z = coll(b + 3), coll(b + 4), coll(b + 5)
                e2x, e2y, e2z = coll(b + 6), coll(b + 7), coll(b + 8)
                cull_disable = coll(b + 9) > 0.5
                candidate = coll(b + 10) > 0.5
                tid = coll(b + 11)

                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < det_eps, 1.0, det)
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
                    il_m
                    & candidate
                    & (jnp.abs(det) > det_eps)
                    & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                    # <= + id tie-break: equal-t ties resolve to the lowest
                    # triangle id, matching the brute oracle's argmin
                    & (mt >= t_min) & (mt <= best)
                )
                if cull_backface:
                    valid &= (det > det_eps) | cull_disable
                if not any_hit:
                    valid &= (mt < best) | (tid < cur_tid)
                    cur_tid = jnp.where(valid, tid, cur_tid)

                best = jnp.where(valid, mt, best)
                tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                hit_found |= valid

            wbest[...] = best
            wtri[...] = tri_best
            whit[...] = hit_found.astype(jnp.int32)

            # --- vectorized traversal decision (lane-replicated) ---
            sp = meta[:, 1:2] + zi
            both = ii_m & (code >= 3)
            any1 = ii_m & (code >= 1)

            lstart = (~c_all) >> 4
            lend = lstart + ((~c_all) & 15) - 1
            row2 = lend >> 3
            extra = il_m & (row2 != (lstart >> 3))
            leaf2 = ~(((row2 << 3) << 4) | 1)

            push_val = jnp.where(ii_m, far, leaf2)
            do_push = (both | extra) & (sp < STACK_DEPTH)
            stack[...] = jnp.where(
                (colw == sp) & do_push, push_val, stack[...]
            )
            sp2 = sp + jnp.where(do_push, 1, 0)

            can_pop = sp2 > 0
            top = jnp.sum(
                jnp.where(colw == sp2 - 1, stack[...], 0),
                axis=1, keepdims=True,
            )
            newc = jnp.where(
                any1, nxt_int, jnp.where(can_pop, top, DONE)
            )
            popped = (~any1) & (~done_m) & can_pop
            sp3 = sp2 - jnp.where(popped, 1, 0)
            newc = jnp.where(done_m, DONE, newc)
            if any_hit:
                lane_done = hit_found | (t_min > wbest[...])
                row_done = il_m & (
                    jnp.min(jnp.where(lane_done, 1, 0), axis=1, keepdims=True)
                    > 0
                )
                newc = jnp.where(row_done, DONE, newc)

            rowv, shv = fetch_addr(newc)
            meta[...] = jnp.where(
                colw == 0, newc,
                jnp.where(
                    colw == 1, sp3,
                    jnp.where(colw == 3, rowv,
                              jnp.where(colw == 4, shv, meta[...])),
                ),
            )

            # newc is lane-replicated: the idle sum counts lanes
            idle_now = jnp.sum(jnp.where(newc == DONE, 1, 0))
            alldone = idle_now >= W * LANE_COLS

            # ii_m/il_m are lane-replicated; divide back at octr write
            n_int += jnp.sum(jnp.where(ii_m, 1, 0))
            n_leaf += jnp.sum(jnp.where(il_m, 1, 0))
            return (it + 1, alldone, n_int, n_leaf)

        def block4(state):
            # check termination every 4 trips: the alldone reduce rides the
            # carry, but the while cond only samples it at block granularity
            # (overshoot <= 3 no-op trips per wave, well under 3%)
            for _ in range(4):
                state = body(state)
            return state

        def cond(state):
            return (~state[1]) & (state[0] < MAX_ITERS)

        # --- init this wave (one grid step = one wave; pool slices are
        # streamed into VMEM by the grid's BlockSpec index maps) ---
        rix[...] = safe_inv(pdx[...])
        riy[...] = safe_inv(pdy[...])
        riz[...] = safe_inv(pdz[...])
        tminr = ptmin[...]
        tmaxr = ptmax[...]
        wbest[...] = jnp.minimum(tmaxr, big)
        wtri[...] = jnp.zeros((W, LANE_COLS), jnp.int32)
        whit[...] = jnp.zeros((W, LANE_COLS), jnp.int32)
        live = jnp.sum(
            jnp.where(tminr <= tmaxr, 1, 0), axis=1, keepdims=True
        )
        cur0 = jnp.where(live > 0, 0, DONE)
        row0, sh0 = fetch_addr(cur0)
        meta[...] = jnp.where(
            colw == 0, cur0,
            jnp.where(colw == 3, row0, jnp.where(colw == 4, sh0, 0)),
        )

        trips, _, n_int, n_leaf = jax.lax.while_loop(
            cond, block4, (jnp.int32(0), False, jnp.int32(0), jnp.int32(0))
        )

        # --- flush this wave ---
        obest[...] = wbest[...]
        otri[...] = wtri[...]
        ohit[...] = whit[...]

        # perf counters accumulate across waves:
        # lane 0 = trips, 1 = interior visits, 2 = leaf visits
        shape = (8, LANE_COLS)
        iters = jnp.zeros(shape, jnp.int32) + trips
        colix = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        iters = jnp.where(colix == 1, n_int // LANE_COLS, iters)
        iters = jnp.where(colix == 2, n_leaf // LANE_COLS, iters)

        @pl.when(pl.program_id(0) == 0)
        def _():
            octr[...] = jnp.zeros(shape, jnp.int32)

        octr[...] = octr[...] + iters

    return kernel


def _pad_to(x: Array, n: int, value) -> Array:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], axis=0
    )


def _canon_rays(o, d, t_min, t_max):
    """Canonicalize ray dtypes (f32, weak_type stripped) at the public
    entries: a weak-typed t_max (e.g. from ``jnp.full((n,), 1e3)``) and a
    computed strong-typed one would otherwise RETRACE the whole kernel —
    and through the TPU relay a retrace is a 5-25 minute recompile."""

    def f(x):
        return jax.lax.convert_element_type(jnp.asarray(x), jnp.float32)

    return f(o), f(d), f(t_min), f(t_max)


# not @jax.jit: nested-jit executable-resolution bug + top-level-only
# compiler options (see core.jit_utils)
def _traverse_wide_packed(
    table: Array,
    nr_rows: int,
    bvh_tris: Array,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool,
    any_hit: bool,
    interpret: bool = False,
    return_counters: bool = False,
):
    r_orig = o.shape[0]
    # interpret mode pays per-row python cost; keep the resident set small
    W = INTERPRET_ROWS if interpret else WIDE_ROWS
    raw_pack = -(-r_orig // LANE_COLS)
    pool_rows = -(-raw_pack // W) * W
    n_waves = pool_rows // W
    r = pool_rows * LANE_COLS

    def comp(a, j, fill):
        return _pad_to(a[:, j], r, fill).reshape(pool_rows, LANE_COLS)

    ox, oy, oz = comp(o, 0, 0.0), comp(o, 1, 0.0), comp(o, 2, 0.0)
    dx, dy, dz = comp(d, 0, 1.0), comp(d, 1, 1.0), comp(d, 2, 1.0)
    tmin2 = _pad_to(t_min, r, 1.0).reshape(pool_rows, LANE_COLS)
    tmax2 = _pad_to(t_max, r, 0.0).reshape(pool_rows, LANE_COLS)

    # the table stays VMEM-resident across waves; the ray pool streams
    # through VMEM one (W, 128) wave slice per grid step
    tab_spec = pl.BlockSpec(
        table.shape, lambda w: (0, 0), memory_space=pltpu.VMEM
    )
    wave_spec = lambda: pl.BlockSpec(  # noqa: E731
        (W, LANE_COLS), lambda w: (w, 0), memory_space=pltpu.VMEM
    )
    ctr_spec = pl.BlockSpec(
        (8, LANE_COLS), lambda w: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.float32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((8, LANE_COLS), jnp.int32),
    ]

    f32scr = lambda: pltpu.VMEM((W, LANE_COLS), jnp.float32)  # noqa: E731
    i32scr = lambda: pltpu.VMEM((W, LANE_COLS), jnp.int32)  # noqa: E731

    call = pl.pallas_call(
        _kernel(cull_backface, any_hit, nr_rows, W),
        grid=(n_waves,),
        in_specs=[tab_spec] + [wave_spec() for _ in range(8)],
        out_specs=[wave_spec(), wave_spec(), wave_spec(), ctr_spec],
        out_shape=out_shape,
        scratch_shapes=[f32scr() for _ in range(4)]
        + [i32scr() for _ in range(5)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    best, tri, hit_i, iters = call(
        table, ox, oy, oz, dx, dy, dz, tmin2, tmax2
    )
    iters = iters[None, 0, :3]  # summed across waves in-kernel

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
    result = Hit(t=t, u=fu, v=fv, tri=tri_f, backface=hit_found & (fdet < 0.0))
    if return_counters:
        return result, iters  # (1, [trips, n_int, n_leaf]) summed over waves
    return result


from vulkanraytracing_tpu.core.jit_utils import hot_jit

_traverse_wide_jitted = hot_jit(
    _traverse_wide_packed,
    static_argnames=(
        "nr_rows", "cull_backface", "any_hit", "interpret", "return_counters"
    ),
)


def _dispatch(o):
    import jax.core

    return (
        _traverse_wide_packed
        if isinstance(o, jax.core.Tracer)
        else _traverse_wide_jitted
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
    del geom
    o, d, t_min, t_max = _canon_rays(o, d, t_min, t_max)
    if not wide_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_packet

        return traverse_packet.intersect_closest_packet(
            None, bvh, o, d, t_min, t_max, cull_backface=cull_backface
        )
    table, nr = _unified_table(bvh)
    return _dispatch(o)(
        table, nr, bvh.tris,
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
    del geom
    o, d, t_min, t_max = _canon_rays(o, d, t_min, t_max)
    if not wide_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_packet

        return traverse_packet.intersect_any_packet(
            None, bvh, o, d, t_min, t_max
        )
    table, nr = _unified_table(bvh)
    hit = _dispatch(o)(
        table, nr, bvh.tris,
        o, d, t_min, t_max,
        cull_backface=False, any_hit=True,
        interpret=_use_interpret(),
    )
    return hit.t < _BIG_T
