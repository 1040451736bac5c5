"""Persistent sub-packet Pallas traversal — 8 independent 128-ray packets
with work refill.

This is the production TPU traversal kernel (the reference's `traceRayEXT`
hardware unit, Source/Shaders/PathTracing/RayGen.rgen:337-343).  Design
lineage, with measured v5e numbers that motivated each step:

1. ops.traverse_pallas marches ONE BVH cursor per 1024-ray packet: every
   while-iteration serves the union of nodes all 1024 rays need (~320 ns
   per node visit, unions of 100-450 interior nodes per packet on
   Sponza-class scenes) -> ~2 Mrays/s.
2. Giving every sublane row its OWN cursor + stack (8 independent 128-ray
   sub-packets in lockstep) retires up to 8 node visits per iteration and
   shrinks each union ~2-4x.  But launching one grid step per 1024-ray
   block costs ~40 us of pipeline overhead per block, and a block only
   finishes when its SLOWEST row does.
3. This kernel therefore runs ONE grid step per ray chunk and REFILLS a
   row with the next 128-ray sub-packet from the chunk pool the moment it
   retires: no per-block launch overhead, no straggler idling.

Per-iteration anatomy (all shapes (8, 128) unless noted):

- interior step: each row dynamic-fetches + lane-rolls its node's 16-slot
  record into `nscr`; a dual slab test runs on bitcast (8,1) column
  broadcasts; the traversal DECISION (next child, far child, hit code) is
  also computed on the VPU and parked in spare lanes of `nscr`, so the
  scalar pass only does stack pushes/pops.
- leaf step: each row fetches + rolls one triangle row and runs LEAF_TESTS
  unrolled Moller-Trumbore tests via column broadcasts.  Surplus slots test
  the leaf's row-mates — real scene triangles, so extra hits are valid and
  only tighten best-t.  A leaf range crossing a row boundary pushes a
  synthetic one-row leaf for the remainder (correct for leaf counts <= 8).
- both steps are `pl.when`-gated: iterations where no row sits at a leaf
  skip the (expensive, ~45 vops/tri) triangle block entirely.

Node records are 16 int32 slots (12 f32-bitcast AABB floats + 2 child ids),
8 per 128-lane row — one fetch per row per iteration.  Triangle records are
16 f32 slots (v0, e1, e2, cull flag, candidate flag, Morton tri index), 8
per row, behind a leading all-zero sentinel row that idle rows fetch
harmlessly.  Both builders (accel.lbvh, accel.sah) feed this kernel
unchanged via their common (nodes, child_index, tris, tri_flags) encoding.
Off-TPU the kernel runs in interpret mode (CI validates it against the
brute-force oracle, SURVEY.md section 4 item 4).
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
LANE_ROWS = 8
LANE_COLS = 128
LANE = LANE_ROWS * LANE_COLS  # 1024 rays per block (8 sub-packets of 128)
STACK_DEPTH = 64
MAX_ITERS = 1 << 22
CHUNK_PACKETS = 256  # 1024-ray packets per pallas_call (pool of 2048 rows)

NODE_SLOTS = 16
NODES_PER_ROW = LANE_COLS // NODE_SLOTS
TRI_SLOTS = 16
TRIS_PER_ROW = LANE_COLS // TRI_SLOTS

# idle/finished rows park here (any leaf code stays > DONE because tri
# starts fit in 24 bits, so leaf codes stay above -(1<<28))
DONE = -(1 << 30)

# VMEM budget: node_tab + tri_tab cost 128 B/tri; ray pool ~12 MB.
VMEM_TRI_LIMIT = 400_000


def subpacket_supported(bvh: BVH) -> bool:
    return bvh.tris.shape[0] <= VMEM_TRI_LIMIT


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _packed_tables(bvh: BVH) -> tuple[Array, Array]:
    """Pack the BVH into the kernel's two dense tables (traceable jnp).

    Returns (node_tab i32 (ceil(N/8)+1, 128), tri_tab f32
    (ceil(T/8)+2, 128)).  Bounds ride as i32 bit patterns (bitcasts are
    pure data movement — the denormal-flush hazard only applies to float
    ARITHMETIC on small-int patterns); child ids stay true int32 in the
    same record, which halves the per-iteration fetch count vs. separate
    node/child tables.  tri_tab gets a leading all-zero sentinel row so
    rows with no pending leaf can fetch row 0 with no effect."""
    nodes = bvh.nodes            # (N, 12) f32
    child = bvh.child_index      # (N, 2) i32
    tris = bvh.tris              # (T, 12) f32 (9 used)
    flags = bvh.tri_flags        # (T,) i32
    n, t = nodes.shape[0], tris.shape[0]

    def pad_rows(x, per):
        rows = (-(-x.shape[0] // per) + 1) * per
        return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

    node_rec = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(nodes, jnp.int32),
            child.astype(jnp.int32),
            jnp.zeros((n, NODE_SLOTS - 14), jnp.int32),
        ],
        axis=1,
    )
    node_tab = pad_rows(node_rec, NODES_PER_ROW).reshape(-1, LANE_COLS)

    flag_cols = jnp.stack(
        [
            (flags & 1).astype(jnp.float32),              # cull_disable
            ((flags & 6) != 0).astype(jnp.float32),       # candidate
        ],
        axis=1,
    )
    tri_index = jnp.arange(t, dtype=jnp.float32)[:, None]  # exact to 2^24
    tri_rec = jnp.concatenate(
        [
            tris[:, :9],
            flag_cols,
            tri_index,
            jnp.zeros((t, TRI_SLOTS - 12), jnp.float32),
        ],
        axis=1,
    )
    tri_tab = pad_rows(tri_rec, TRIS_PER_ROW).reshape(-1, LANE_COLS)
    # leading sentinel row (candidate = 0 everywhere): row 0 commits nothing
    tri_tab = jnp.concatenate(
        [jnp.zeros((1, LANE_COLS), jnp.float32), tri_tab], axis=0
    )
    return node_tab, tri_tab


def _kernel(cull_backface: bool, any_hit: bool, total_rows: int):
    tiny = 1e-30
    big = 3.0e38

    def kernel(
        node_ref,        # (NR, 128) i32 VMEM — packed node records
        tri_ref,         # (TR, 128) f32 VMEM — packed tris (sentinel row 0)
        pox, poy, poz,   # (total_rows, 128) f32 VMEM — ray pool
        pdx, pdy, pdz,
        ptmin, ptmax,
        obest,           # (total_rows, 128) f32 out
        otri,            # (total_rows, 128) i32 out
        ohit,            # (total_rows, 128) i32 out
        octr,            # (8, 128) i32 out — perf counters
        # working ray state for the 8 resident sub-packets
        rox, roy, roz,   # (8, 128) f32
        rdx, rdy, rdz,
        rix, riy, riz,   # reciprocal direction
        rtmin,
        wbest,           # (8, 128) f32 — running best t
        lscr,            # (8, 128) f32 — fetched leaf rows
        rscr,            # (8, 128) f32 — per-row reductions
        nscr,            # (8, 128) i32 — fetched node records + decisions
        wtri,            # (8, 128) i32 — running best tri
        whit,            # (8, 128) i32 — running hit mask
        stack_ref,       # (8, STACK_DEPTH) i32 SMEM
        curs,            # (8,) i32 SMEM
        sp,              # (8,) i32 SMEM
        srcrow,          # (8,) i32 SMEM — pool row each resident packet came from
        nrw,             # (1,) i32 SMEM — next unassigned pool row
    ):
        def safe_inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c
            )

        for j in range(LANE_ROWS):
            curs[j] = DONE
            sp[j] = 0
            srcrow[j] = -1
        nrw[0] = 0

        def flush_row(j, pred):
            """Write row j's working results to its pool row when pred."""
            src = srcrow[j]
            go = pred & (src >= 0)
            dst = jnp.maximum(src, 0)
            obest[pl.ds(dst, 1), :] = jnp.where(
                go, wbest[pl.ds(j, 1), :], obest[pl.ds(dst, 1), :]
            )
            otri[pl.ds(dst, 1), :] = jnp.where(
                go, wtri[pl.ds(j, 1), :], otri[pl.ds(dst, 1), :]
            )
            ohit[pl.ds(dst, 1), :] = jnp.where(
                go, whit[pl.ds(j, 1), :], ohit[pl.ds(dst, 1), :]
            )

        def refill_block():
            for j in range(LANE_ROWS):
                need = (curs[j] == DONE) & (nrw[0] < total_rows)
                flush_row(j, need)
                new = jnp.where(need, nrw[0], jnp.maximum(srcrow[j], 0))
                nrw[0] = nrw[0] + jnp.where(need, 1, 0)
                srcrow[j] = jnp.where(need, new, srcrow[j])
                sp[j] = jnp.where(need, 0, sp[j])

                def pull(dst_ref, src_ref):
                    dst_ref[pl.ds(j, 1), :] = jnp.where(
                        need, src_ref[pl.ds(new, 1), :], dst_ref[pl.ds(j, 1), :]
                    )

                pull(rox, pox)
                pull(roy, poy)
                pull(roz, poz)
                pull(rdx, pdx)
                pull(rdy, pdy)
                pull(rdz, pdz)
                pull(rtmin, ptmin)
                dxr = rdx[pl.ds(j, 1), :]
                dyr = rdy[pl.ds(j, 1), :]
                dzr = rdz[pl.ds(j, 1), :]
                rix[pl.ds(j, 1), :] = jnp.where(
                    need, safe_inv(dxr), rix[pl.ds(j, 1), :]
                )
                riy[pl.ds(j, 1), :] = jnp.where(
                    need, safe_inv(dyr), riy[pl.ds(j, 1), :]
                )
                riz[pl.ds(j, 1), :] = jnp.where(
                    need, safe_inv(dzr), riz[pl.ds(j, 1), :]
                )
                tmaxr = ptmax[pl.ds(new, 1), :]
                tminr = rtmin[pl.ds(j, 1), :]
                wbest[pl.ds(j, 1), :] = jnp.where(
                    need, jnp.minimum(tmaxr, big), wbest[pl.ds(j, 1), :]
                )
                wtri[pl.ds(j, 1), :] = jnp.where(
                    need, 0, wtri[pl.ds(j, 1), :]
                )
                whit[pl.ds(j, 1), :] = jnp.where(
                    need, 0, whit[pl.ds(j, 1), :]
                )
                # per-row liveness of the refilled packet
                live = jnp.sum(
                    jnp.where(tminr <= tmaxr, 1.0, 0.0), axis=1, keepdims=True
                )
                rscr[pl.ds(j, 1), 0:1] = jnp.where(
                    need, live, jnp.full((1, 1), -1.0)
                )
            for j in range(LANE_ROWS):
                refd = rscr[j, 0] >= 0.0
                curs[j] = jnp.where(
                    refd, jnp.where(rscr[j, 0] > 0.0, 0, DONE), curs[j]
                )

        def interior_block():
            for j in range(LANE_ROWS):
                c = curs[j]
                ii = c >= 0
                row = jnp.where(ii, c // NODES_PER_ROW, 0)
                sh = jnp.where(ii, (c % NODES_PER_ROW) * NODE_SLOTS, 0)
                nscr[pl.ds(j, 1), :] = pltpu.roll(
                    node_ref[pl.ds(row, 1), :], shift=-sh, axis=1
                )

            def colf(i):
                return pltpu.bitcast(nscr[:, i : i + 1], jnp.float32)

            ox, oy, oz = rox[...], roy[...], roz[...]
            ix, iy, iz = rix[...], riy[...], riz[...]
            t_min = rtmin[...]
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
            # per-row traversal decision, fully on the VPU: the scalar pass
            # only reads back (next, far, code) from spare lanes of nscr
            # (lanes 16-18 hold rolled-in neighbor records — dead data)
            t0r = jnp.min(jnp.where(tn0 <= tf0, tn0, big), axis=1, keepdims=True)
            t1r = jnp.min(jnp.where(tn1 <= tf1, tn1, big), axis=1, keepdims=True)
            h0r = t0r < big
            h1r = t1r < big
            near0 = t0r <= t1r
            e0col = nscr[:, 12:13]
            e1col = nscr[:, 13:14]
            if any_hit:
                nxt = jnp.where(h0r, e0col, e1col)
                far = e1col
            else:
                nxt = jnp.where(
                    h0r & h1r,
                    jnp.where(near0, e0col, e1col),
                    jnp.where(h0r, e0col, e1col),
                )
                far = jnp.where(near0, e1col, e0col)
            code = jnp.where(h0r | h1r, 1, 0) + jnp.where(h0r & h1r, 2, 0)
            nscr[:, 16:17] = nxt
            nscr[:, 17:18] = far
            nscr[:, 18:19] = code

        def leaf_block():
            for j in range(LANE_ROWS):
                c = curs[j]
                il = (c < 0) & (c != DONE)
                start = jnp.where(il, (~c) >> 4, -1)
                row = jnp.where(il, start // TRIS_PER_ROW + 1, 0)
                sh = jnp.where(il, (start % TRIS_PER_ROW) * TRI_SLOTS, 0)
                lscr[pl.ds(j, 1), :] = pltpu.roll(
                    tri_ref[pl.ds(row, 1), :], shift=-sh, axis=1
                )

            ox, oy, oz = rox[...], roy[...], roz[...]
            dx, dy, dz = rdx[...], rdy[...], rdz[...]
            t_min = rtmin[...]
            best = wbest[...]
            tri_best = wtri[...]
            hit_found = whit[...] != 0

            def col(i):
                return lscr[:, i : i + 1]

            for k in range(LEAF_TESTS):
                b = k * TRI_SLOTS
                v0x, v0y, v0z = col(b + 0), col(b + 1), col(b + 2)
                e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
                e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
                cull_disable = col(b + 9) > 0.5
                candidate = col(b + 10) > 0.5
                tid = col(b + 11)

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
                    candidate
                    & (jnp.abs(det) > tiny)
                    & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                    & (mt >= t_min) & (mt < best)
                )
                if cull_backface:
                    valid &= (det > tiny) | cull_disable

                best = jnp.where(valid, mt, best)
                tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                hit_found |= valid

            wbest[...] = best
            wtri[...] = tri_best
            whit[...] = hit_found.astype(jnp.int32)
            if any_hit:
                # per-row "all lanes occluded or dead" -> early retirement
                lane_done = hit_found | (t_min > wbest[...])
                rscr[:, 4:5] = jnp.min(
                    jnp.where(lane_done, 1.0, 0.0), axis=1, keepdims=True
                )

        def body(state):
            it, _, n_int, n_leaf = state

            idle = (curs[0] == DONE) & (nrw[0] < total_rows)
            for j in range(1, LANE_ROWS):
                idle |= (curs[j] == DONE) & (nrw[0] < total_rows)
            pl.when(idle)(refill_block)

            any_int = curs[0] >= 0
            any_leaf = (curs[0] < 0) & (curs[0] != DONE)
            for j in range(1, LANE_ROWS):
                any_int |= curs[j] >= 0
                any_leaf |= (curs[j] < 0) & (curs[j] != DONE)

            pl.when(any_int)(interior_block)
            pl.when(any_leaf)(leaf_block)
            n_int += jnp.where(any_int, 1, 0)
            n_leaf += jnp.where(any_leaf, 1, 0)

            alldone = nrw[0] >= total_rows
            for j in range(LANE_ROWS):
                c = curs[j]
                is_done = c == DONE
                ii = c >= 0
                il = (~is_done) & (~ii)

                # interior decision precomputed on the VPU (garbage unless ii)
                nxt_int = nscr[j, 16]
                far = nscr[j, 17]
                code = nscr[j, 18]
                both = ii & (code >= 3)
                any1 = ii & (code >= 1)

                # leaf spanning a second triangle row -> synthetic leaf push
                lstart = (~c) >> 4
                lend = lstart + ((~c) & 15) - 1
                row2 = lend // TRIS_PER_ROW
                extra = il & (row2 != lstart // TRIS_PER_ROW)
                leaf2 = ~((row2 * TRIS_PER_ROW) << 4 | 1)

                # at most one push per iteration (ii and il are exclusive)
                do_push = (both | extra) & (sp[j] < STACK_DEPTH)
                spj = sp[j]
                slot = jnp.minimum(spj, STACK_DEPTH - 1)
                prev = stack_ref[j, slot]
                stack_ref[j, slot] = jnp.where(
                    do_push, jnp.where(ii, far, leaf2), prev
                )
                spj = spj + jnp.where(do_push, 1, 0)

                # next cursor: descend, else pop, else DONE
                can_pop = spj > 0
                top = stack_ref[j, jnp.maximum(spj - 1, 0)]
                nxt = jnp.where(
                    any1, nxt_int, jnp.where(can_pop, top, DONE)
                )
                spj = spj - jnp.where(~any1 & ~is_done & can_pop, 1, 0)
                nxt = jnp.where(is_done, DONE, nxt)
                if any_hit:
                    # row done once every live lane is occluded
                    row_done = il & (rscr[j, 4] > 0.5)
                    nxt = jnp.where(row_done, DONE, nxt)
                curs[j] = nxt
                sp[j] = spj
                alldone &= nxt == DONE

            return (it + 1, alldone, n_int, n_leaf)

        def cond(state):
            return (~state[1]) & (state[0] < MAX_ITERS)

        it_end, _, n_int, n_leaf = jax.lax.while_loop(
            cond, body, (jnp.int32(0), False, jnp.int32(0), jnp.int32(0))
        )
        # final flush of the 8 resident packets
        for j in range(LANE_ROWS):
            flush_row(j, srcrow[j] >= 0)

        # perf counters ride the debug output: lane 0 = trips, 1 = interior
        # block executions, 2 = leaf block executions
        shape = (LANE_ROWS, LANE_COLS)
        iters = jnp.zeros(shape, jnp.int32) + it_end
        colix = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        iters = jnp.where(colix == 1, n_int, iters)
        octr[...] = jnp.where(colix == 2, n_leaf, iters)

    return kernel


# perf-counter sink: set _COLLECT_ITERS = True (and call the un-jitted
# wrapper, so values are concrete) to record each call's (trips, interior
# execs, leaf execs) in _DEBUG_ITERS.  Off by default; perf probes only.
_COLLECT_ITERS = False
_DEBUG_ITERS: list = []


def _pad_to(x: Array, n: int, value) -> Array:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], axis=0
    )


# not @jax.jit: see traverse_pallas._traverse_pallas_packed (nested-jit
# executable-resolution bug + top-level-only compiler options)
def _traverse_subpacket_packed(
    node_tab: Array,
    tri_tab: Array,
    bvh_tris: Array,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool,
    any_hit: bool,
    interpret: bool = False,
    return_counters: bool = False,
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

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANE_COLS), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((LANE_ROWS, LANE_COLS), jnp.int32),
    ]

    f32scr = lambda: pltpu.VMEM((LANE_ROWS, LANE_COLS), jnp.float32)  # noqa: E731
    i32scr = lambda: pltpu.VMEM((LANE_ROWS, LANE_COLS), jnp.int32)  # noqa: E731

    call = pl.pallas_call(
        _kernel(cull_backface, any_hit, rows),
        in_specs=[vm()] * 10,
        out_specs=[vm(), vm(), vm(), vm()],
        out_shape=out_shape,
        scratch_shapes=[f32scr() for _ in range(13)]
        + [i32scr() for _ in range(3)]
        + [
            pltpu.SMEM((LANE_ROWS, STACK_DEPTH), jnp.int32),
            pltpu.SMEM((LANE_ROWS,), jnp.int32),
            pltpu.SMEM((LANE_ROWS,), jnp.int32),
            pltpu.SMEM((LANE_ROWS,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run_chunk(args):
        args = jax.lax.optimization_barrier(args)
        cox, coy, coz, cdx, cdy, cdz, ctmin, ctmax = args
        return call(
            node_tab, tri_tab,
            cox, coy, coz, cdx, cdy, cdz, ctmin, ctmax,
        )

    best, tri, hit_i, iters = jax.lax.map(
        run_chunk, (ox, oy, oz, dx, dy, dz, tmin2, tmax2)
    )
    if _COLLECT_ITERS:
        _DEBUG_ITERS.append(iters[:, 0, :3])

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
        return result, iters[:, 0, :3]  # (n_chunks, [trips, n_int, n_leaf])
    return result


from vulkanraytracing_tpu.core.jit_utils import hot_jit

_traverse_subpacket_jitted = hot_jit(
    _traverse_subpacket_packed,
    static_argnames=("cull_backface", "any_hit", "interpret", "return_counters"),
)


def _dispatch(o):
    import jax.core

    return (
        _traverse_subpacket_packed
        if isinstance(o, jax.core.Tracer)
        else _traverse_subpacket_jitted
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
    if not subpacket_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_packet

        return traverse_packet.intersect_closest_packet(
            None, bvh, o, d, t_min, t_max, cull_backface=cull_backface
        )
    node_tab, tri_tab = _packed_tables(bvh)
    return _dispatch(o)(
        node_tab, tri_tab, bvh.tris,
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
    if not subpacket_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_packet

        return traverse_packet.intersect_any_packet(
            None, bvh, o, d, t_min, t_max
        )
    node_tab, tri_tab = _packed_tables(bvh)
    hit = _dispatch(o)(
        node_tab, tri_tab, bvh.tris,
        o, d, t_min, t_max,
        cull_backface=False, any_hit=True,
        interpret=_use_interpret(),
    )
    return hit.is_hit
