"""Wide persistent Pallas traversal over an 8-wide BVH.

Same wave/grid architecture as ops.traverse_wide (W resident 128-ray
sub-packets, pool streamed per grid step, vectorized cursors/stacks), but
interior nodes are the 8-wide collapse from accel.bvh8:

- one node = one full 128-lane table row (48 AABB floats bitcast + 8 child
  ids at lanes 48-55) -> the interior fetch needs NO lane roll;
- each interior visit slab-tests all 8 children, so a visit retires up to
  three BVH2 levels: measured interior-visit counts drop ~2.5-3x on
  Sponza-class scenes, which is the dominant term in traversal time
  (per-trip overhead x trips);
- closest-hit traversal is NEAR-ORDERED per row: the 8 (entry distance,
  child) pairs are sorted farthest-first with a Batcher network on
  lane-replicated (W, 128) values, the nearest hit is descended and the
  rest pushed far-to-near.  Without ordering, leaf visits measured 3x
  higher (far leaves tested before best-t tightens) and the whole BVH8
  win evaporated.  Any-hit (``any_order``) skips the Batcher network: pop
  order cannot affect correctness there, only the FIRST descent matters
  (finding an occluder sooner ends the ray), so it selects the nearest
  hit child directly (~20 tile-ops vs ~95) and pushes the remaining hit
  children in slot order — measured 1.89x on the bounce-1 sun shadow set
  over the fully-ordered variant (tools/ab/ab_anyhit2.py).

Leaf encoding, triangle records and the leaf pipeline are shared unchanged
with the 2-wide kernel.  The reference counterpart is still the
`traceRayEXT` hardware unit (Source/Shaders/PathTracing/RayGen.rgen:337).
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
from vulkanraytracing_tpu.ops.traverse_wide import (
    _pad_to,
    _use_interpret,
)
from vulkanraytracing_tpu.scene.types import BVH, TraceGeometry

_BIG_T = jnp.float32(3.0e38)
LANE_COLS = 128
WIDE_ROWS = 64          # resident sub-packets per wave (compiled)
INTERPRET_ROWS = 8      # interpret-mode wave width (CI on CPU)
STACK_DEPTH = 64
MAX_ITERS = 1 << 22

TRI_SLOTS = 16
TRIS_PER_ROW = LANE_COLS // TRI_SLOTS

DONE = -(1 << 30)

# drain+compact trip-cap schedules (see _kernel drain docstring): run to
# the cap, pack unfinished rows into dense waves, resume; the final
# round is uncapped.  Tuned on the real bounce-2 wavefronts of the 262k
# bench frame (job 051: closest 454->420 ms at (256,1024); sun any-hit
# 98.7->55.4 ms at (16,128); point any-hit 232.7->214.2 ms);
# override for experiments with e.g. VRT_DRAIN_CLOSEST="128,512".
# Round-5 bisect of the former full-frame TPU abort (r05 ladder +
# jobs job_drain_concat/job_sortcap, artifacts/drain/): the caps pass
# standalone at every scale (incl. the frame's 510-grid-step 2R concat
# shape) and the capped frame passes at 512^2, with VRT_DEBUG_NO_SORT,
# or with the SPLIT permute lowering — only the 1080p frame with the
# ~18-operand riding lax.sort AND the packed (bitcast+concat+one wide
# gather) drain permute aborts.  With split-gather permutes (default
# below) the capped 1080p frame runs clean, so BOTH cap sets are now
# DEFAULT ON (measured kernel-side: sun any-hit 1.85x, point 1.20x with
# rekey; closest 1.09x liveness-only — the closest_only ladder rung
# passed the full frame even with the packed permute).  Shipping the
# any-hit caps + the riding-sort restore moved the bench 10.60 -> 11.92
# Mrays/s (artifacts/bench/r05_v1_caps.json).
def _caps_env(name: str, default: tuple) -> tuple:
    import os

    v = os.environ.get(name)
    if not v:
        return default
    if v.strip() in ("0", "off"):
        return ()
    return tuple(int(x) for x in v.split(","))


import os as _os

CLOSEST_DRAIN_CAPS = _caps_env("VRT_DRAIN_CLOSEST", (256, 1024))
ANYHIT_DRAIN_CAPS = _caps_env("VRT_DRAIN_ANYHIT", (16, 128))
DRAIN_REKEY_DEFAULT = _os.environ.get("VRT_DRAIN_REKEY", "1") == "1"
# rekey is a win for the any-hit drains (sun 1.85x vs 1.78x live-only)
# but slightly NEGATIVE for closest (1.05x vs 1.09x — closest survivors
# are already morton-sorted and the cursor key scrambles that, job
# 20_rekey): closest drains default to liveness-only packing.
CLOSEST_REKEY_DEFAULT = _os.environ.get("VRT_DRAIN_REKEY_CLOSEST", "0") == "1"
# caps only pay on scene-scale trees: small trees (the foliage split's
# ~26k tris) drain in one capped round anyway, and every capped call
# site adds fresh+resume Mosaic kernel compiles — the real-workload
# frame (12 subset traversal sites) blew a 55-minute compile budget
# before this gate
DRAIN_MIN_TRIS = int(_os.environ.get("VRT_DRAIN_MIN_TRIS", "100000"))
# Dev knob for the full-frame abort bisect: caps are normally disabled
# under interpret (CPU) because the capped program is strictly slower
# there, but a CPU repro of the drain COMPOSITION (multiple call sites,
# sorts, phase-split any-hit between drain rounds) needs them on.
DRAIN_INTERPRET = _os.environ.get("VRT_DRAIN_INTERPRET", "0") == "1"
# Fetch-latency timing probes (backlog #7, software pipelining): "const"
# fetches per-trip-varying table rows whose ADDRESS does not depend on
# the trip's own decision compute (exposes how much of the 64-row fetch
# cost is dependency stall the compiler could hide), "skip" elides the
# fetch entirely (isolates raw load issue cost).  Both CORRUPT traversal
# results — they are per-visit cost probes (normalize by the returned
# counters), never production paths.  VRT_PROBE_TRIPS caps the while
# loop so garbage traversal cannot spin to MAX_ITERS.
PROBE_FETCH = _os.environ.get("VRT_PROBE_FETCH", "")
PROBE_TRIPS = int(_os.environ.get("VRT_PROBE_TRIPS", "0"))
# Two-wave software-pipelined blocks (backlog #7; see _kernel's pair
# tail): each grid step runs two independent W-row waves so one wave's
# 64 row fetches hide under the other's decision math.  Opt-in until the
# TPU A/B lands; composes with the plain and phase-split kernels only
# (not drain caps / chunked streaming / row-trip diagnostics).
PAIR_DEFAULT = _os.environ.get("VRT_PAIR", "0") == "1"
VMEM_TRI_LIMIT = 400_000

# leaf-test selection: plane-based (_woop_records, ~30% fewer leaf VPU
# ops) vs Moller-Trumbore (bit-matches the brute-force oracle).  Opt-in
# until the TPU A/B confirms the win; applies to the unchunked path only
# (chunked tables are prebuilt at scene-build time with MT records).
WOOP_DEFAULT = _os.environ.get("VRT_WOOP", "0") == "1"


def wide8_supported(bvh: BVH) -> bool:
    if bvh.chunks is not None:
        return True  # HBM-streaming path: no VMEM triangle limit
    if bvh.nodes8 is None:
        return False
    t8 = (
        bvh.tri_perm8.shape[0]
        if bvh.tri_perm8 is not None and bvh.tri_perm8.shape[0] > 0
        else bvh.tris.shape[0]
    )
    return t8 <= VMEM_TRI_LIMIT


def _chunked_args(bvh: BVH) -> tuple[Array, int, int]:
    """(flat table, node rows per chunk, K) for the streaming kernel."""
    ch = bvh.chunks
    k, rows, _ = ch.tables.shape
    return ch.tables.reshape(k * rows, LANE_COLS), ch.node_rows, k


def _woop_records(tris: Array) -> Array:
    """Plane-based precomputed triangle records (12 floats) for the cheaper
    leaf test: geometric normal plane (n, dn) plus barycentric u/v planes,
    so the in-kernel test is  t = -(n.o + dn)/(n.d);  p = o + t d;
    u = up.p + uc;  v = vp.p + vc  — ~35 VPU ops vs Moller-Trumbore's ~50.
    Same idea as Woop's unit-triangle transform, expressed as three planes.

    Sign bridge to MT: MT's det = e1.(d x e2) = -(n.d), so backface and
    cull tests translate exactly (den > 0 <=> det < 0).  Degenerate
    triangles get zero planes: den == 0 rejects every ray, as |det| <= tiny
    does in MT."""
    v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
    n = jnp.cross(e1, e2)
    nn = jnp.sum(n * n, axis=1, keepdims=True)
    inv_nn = jnp.where(nn > 0, 1.0 / nn, 0.0)
    up = jnp.cross(e2, n) * inv_nn
    vp = jnp.cross(n, e1) * inv_nn
    dn = -jnp.sum(n * v0, axis=1, keepdims=True)
    uc = -jnp.sum(up * v0, axis=1, keepdims=True)
    vc = -jnp.sum(vp * v0, axis=1, keepdims=True)
    return jnp.concatenate([n, dn, up, uc, vp, vc], axis=1)


def _unified_table8(
    bvh: BVH, tid_offset: int = 0, woop: bool = False
) -> tuple[Array, Array]:
    """Rows [0, NR): BVH8 node records (48 f32-bitcast AABB floats, child
    ids at lanes 48-55).  Row NR: zero sentinel.  Rows (NR, NR+TR]: tri
    records identical to traverse_wide's (v0, e1, e2) — or, with
    ``woop=True``, the plane records of :func:`_woop_records`.

    ``tid_offset`` shifts the committed triangle ids — used by the chunked
    streaming path (accel.chunks), whose tables are chunk-local but whose
    winners must name global triangles."""
    nodes8 = bvh.nodes8          # (M, 48) f32
    child8 = bvh.child8          # (M, 8) i32
    tris = bvh.tris              # (T, 12) f32
    flags = bvh.tri_flags        # (T,) i32
    if bvh.tri_perm8 is not None and bvh.tri_perm8.shape[0] > 0:
        # row-aligned leaf layout (accel.bvh8._align_leaves): slot i holds
        # sorted-order triangle tri_perm8[i]; padding slots (-1) clear the
        # candidate flag bits so the leaf test rejects them
        perm = bvh.tri_perm8
        idx = jnp.maximum(perm, 0)
        tris = jnp.where((perm >= 0)[:, None], tris[idx], 0.0)
        flags = jnp.where(perm >= 0, flags[idx], 0)
        tri_ids = idx.astype(jnp.float32)
    else:
        tri_ids = None
    m, t = nodes8.shape[0], tris.shape[0]

    node_rec = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(nodes8, jnp.int32),
            child8.astype(jnp.int32),
            jnp.zeros((m, LANE_COLS - 56), jnp.int32),
        ],
        axis=1,
    )

    flag_cols = jnp.stack(
        [
            (flags & 1).astype(jnp.float32),
            ((flags & 6) != 0).astype(jnp.float32),
        ],
        axis=1,
    )
    if tri_ids is None:
        tri_ids = jnp.arange(t, dtype=jnp.float32)
    tri_index = tri_ids[:, None] + jnp.float32(tid_offset)
    geo = _woop_records(tris) if woop else tris[:, :9]
    pad = TRI_SLOTS - geo.shape[1] - 3
    tri_rec = jnp.concatenate(
        [
            geo,
            flag_cols,
            tri_index,
            jnp.zeros((t, pad), jnp.float32),
        ],
        axis=1,
    )
    rows = -(-t // TRIS_PER_ROW) * TRIS_PER_ROW
    tri_rec = jnp.pad(tri_rec, ((0, rows - t), (0, 0)))
    tri_part = jax.lax.bitcast_convert_type(
        tri_rec.reshape(-1, LANE_COLS), jnp.int32
    )
    sentinel = jnp.zeros((1, LANE_COLS), jnp.int32)
    table = jnp.concatenate([node_rec, sentinel, tri_part], axis=0)
    return table, m


class _RV:
    """Static row-offset view of a (2W, 128) block ref: presents wave
    ``off..off+w`` as if it were the whole (w, 128) block, so the per-wave
    kernel code is identical between single and pair modes.  Handles
    exactly the subscript forms the kernel uses: ``[...]``, ``[:, a:b]``,
    ``[pl.ds(j, 1), :]`` and ``[j, col]`` (python ints only — offsets stay
    static)."""

    __slots__ = ("ref", "off", "w")

    def __init__(self, ref, off, w):
        self.ref, self.off, self.w = ref, off, w

    def _map(self, idx):
        if idx is Ellipsis:
            return (pl.ds(self.off, self.w), slice(None))
        r, c = idx
        if isinstance(r, slice):
            assert r == slice(None), "row slices must be full"
            return (pl.ds(self.off, self.w), c)
        if isinstance(r, int):
            return (self.off + r, c)
        return (pl.ds(self.off + r.start, r.size), c)  # pl.Slice

    def __getitem__(self, idx):
        return self.ref[self._map(idx)]

    def __setitem__(self, idx, v):
        self.ref[self._map(idx)] = v


def _kernel(
    cull_backface: bool,
    any_hit: bool,
    nr_rows: int,
    W: int,
    chunked: bool = False,
    woop: bool = False,
    any_order: bool = False,
    phase_split: bool = False,
    leaf_den: int = 1,
    row_trips: bool = False,
    drain: bool = False,
    resume: bool = False,
    pair: bool = False,
):
    """``drain=True`` compiles the drain+compact variant: the while loop
    stops at a DYNAMIC trip cap (SMEM scalar input) and the per-row
    traversal state (meta + stack) is exported, so an orchestrator can
    compact unfinished rows into dense waves and resume
    (``resume=True`` initializes meta/stack/hit state from inputs
    instead of fresh).  Rationale: a wave pays its slowest row's trips;
    measured per-row done-trips put current occupancy at 62.7%/10.8%/
    56.1% (material/sun/point sets) vs 86-92% for capped drain rounds
    (tools/ab jobs 047/049).

    ``chunked=True`` compiles the HBM-streaming variant: the grid is
    (n_waves, K) and grid step (w, k) traverses chunk k's BVH8 table (the
    pallas pipeline streams the next chunk's table HBM->VMEM while this one
    computes).  Hit state (wbest/wtri/...) lives in scratch, which persists
    across grid steps: it is initialized at k == 0 and carried through the
    chunks, so wbest doubles as a cross-chunk tightening t_max.  Cursors
    restart at each chunk's root."""
    assert not (pair and (drain or resume or chunked or row_trips)), (
        "pair mode composes with the plain and phase-split kernels only"
    )
    tiny = 1e-30
    # det epsilon for the leaf triangle tests: matches the brute oracle's
    # (ops.intersect:104) so grazing-incidence accepts/rejects identically;
    # ``tiny`` stays 1e-30 for the slab-test direction reciprocals
    det_eps = 1e-20
    big = 3.0e38

    def kernel(*refs):
        i = 0
        uni_ref = refs[0]
        (pox, poy, poz, pdx, pdy, pdz, ptmin, ptmax) = refs[1:9]
        i = 9
        cap_ref = None
        pbest = ptri = phit = pu = pv = pbf = pmeta = pstack = None
        orow = ometa = ostack = None
        if drain:
            cap_ref = refs[i]
            i += 1
        if resume:
            (pbest, ptri, phit, pu, pv, pbf, pmeta, pstack) = refs[i:i + 8]
            i += 8
        (obest, otri, ohit, ou, ov, obf, octr) = refs[i:i + 7]
        i += 7
        if row_trips:
            orow = refs[i]
            i += 1
        if drain:
            ometa, ostack = refs[i:i + 2]
            i += 2
        (rix, riy, riz, wbest, wu, wv,
         nscr, wtri, whit, wbf, meta, stack) = refs[i:]
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, LANE_COLS), 1)
        zf = jnp.zeros((W, LANE_COLS), jnp.float32)
        zi = jnp.zeros((W, LANE_COLS), jnp.int32)

        # --- per-wave machinery -------------------------------------------
        # make_wave closes every helper/body over ONE wave's refs.  Single
        # mode passes the raw (W, 128) block refs (identical lowering to
        # the pre-factory kernel); pair mode passes _RV row-views into the
        # (2W, 128) block at offsets 0 and W, giving two fully independent
        # traversal chains whose row fetches overlap each other's decision
        # math in the VLIW schedule (fetch addresses depend only on the
        # OWN chain's previous trip).
        def make_wave(pox, poy, poz, pdx, pdy, pdz, ptmin, ptmax,
                      pbest, ptri, phit, pu, pv, pbf, pmeta, pstack,
                      obest, otri, ohit, ou, ov, obf, orow, ometa, ostack,
                      rix, riy, riz, wbest, wu, wv, nscr,
                      wtri, whit, wbf, meta, stack):
            def safe_inv(c):
                return 1.0 / jnp.where(
                    jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c
                )

            def fetch_addr(c):
                """Table row for cursor c — (W, 1) vector ops.

                Leaf cursors fetch the row CONTAINING the leaf start, with no
                lane alignment: the leaf block below tests all 8 slots of the
                row, which is the same triangle set the old lane-roll produced
                (pltpu.roll rotates within one row, so the rolled row held
                exactly these 8 records, rotated) — dropping the roll removed
                ~45% of the per-trip fetch cost at identical semantics."""
                ii = c >= 0
                isdone = c == DONE
                start = (~c) >> 4
                return jnp.where(
                    ii, c, jnp.where(isdone, nr_rows, nr_rows + 1 + (start >> 3))
                )

            def fetch_rows(it=0):
                if PROBE_FETCH == "skip":
                    return
                if PROBE_FETCH == "const":
                    total = uni_ref.shape[0]
                    for j in range(W):
                        nscr[pl.ds(j, 1), :] = uni_ref[
                            pl.ds((it * 13 + j) % total, 1), :
                        ]
                    return
                for j in range(W):
                    nscr[pl.ds(j, 1), :] = uni_ref[pl.ds(meta[j, 3], 1), :]

            def interior_decide(ii_m, ox, oy, oz, ix, iy, iz, t_min, best):
                """8-child slab tests + descent ordering for interior rows.
                Returns (hits, cs, nxt_int, any1, later)."""

                def colf(i):
                    return pltpu.bitcast(nscr[:, i : i + 1], jnp.float32)

                # --- 8-child slab tests; per-child row entry distance (W, 1) ---
                ts, cs = [], []
                for k in range(8):
                    b = k * 6
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
                    tk = jnp.min(
                        jnp.where(tn <= tf, tn, big), axis=1, keepdims=True
                    )
                    # broadcast the row key/child to full lane width: narrow
                    # (W, 1) arithmetic chains measured ~10x slower than full
                    # (W, 128) ops (per-op layout conversions), so the sorting
                    # network below runs on lane-replicated values
                    ts.append(jnp.where(ii_m, tk + zf, big))
                    cs.append(nscr[:, 48 + k : 49 + k] + zi)

                # near-ordered traversal: sort the 8 (distance, child) pairs per
                # row with a Batcher network, FARTHEST first.  Hit children at
                # slots 0-6 are pushed in that order (so nearer pops earlier);
                # slot 7 holds the nearest child, which is descended directly.
                # Without this ordering, leaf visits measured 3x higher on
                # Sponza-class scenes (far leaves tested before best-t tightens).
                if not any_hit:
                    net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                           (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (1, 5),
                           (2, 6), (3, 7), (2, 4), (3, 5), (1, 2), (3, 4),
                           (5, 6)]
                    for a, b2 in net:
                        swap = ts[a] < ts[b2]  # descending by distance
                        ta = jnp.where(swap, ts[b2], ts[a])
                        tb = jnp.where(swap, ts[a], ts[b2])
                        ca = jnp.where(swap, cs[b2], cs[a])
                        cb = jnp.where(swap, cs[a], cs[b2])
                        ts[a], ts[b2], cs[a], cs[b2] = ta, tb, ca, cb

                hits = [t < big for t in ts]
                if any_hit and any_order:
                    # any-hit needs no pop ORDER, only a good first descent:
                    # near-first descent finds occluders sooner (measured
                    # 1.10-1.22x on bounce NEE shadow sets, tools/ab/ab_anyhit.py),
                    # but the full Batcher network is overkill — pick the
                    # nearest hit child directly (~20 tile-ops vs ~95) and
                    # push the rest in slot order.
                    t_near = ts[0]
                    for k in range(1, 8):
                        t_near = jnp.minimum(t_near, ts[k])
                    taken = [(ts[k] == t_near) & hits[k] for k in range(8)]
                    seen = jnp.zeros_like(hits[0])
                    for k in range(8):
                        taken[k] &= ~seen  # first nearest only
                        seen = seen | taken[k]
                    nxt_int = jnp.zeros_like(zi) + DONE
                    for k in range(8):
                        nxt_int = jnp.where(taken[k], cs[k], nxt_int)
                    any1 = seen
                    later = [hits[k] & ~taken[k] for k in range(8)]
                    # slot 7's push is skipped by the loop below; fold a
                    # potential slot-7 non-taken hit into slot 7 descent-swap:
                    # if slot 7 is hit but not taken, swap it with the taken
                    # slot so the pushed set stays complete.
                    push7 = later[7]
                    for k in range(7):
                        # where slot 7 must be pushed, push the taken child's
                        # slot instead (it is descended via nxt_int anyway, and
                        # cs[k] at the taken slot is what nxt_int consumed) —
                        # i.e. redirect slot 7's child into the taken slot.
                        # (logical |, not jnp.where with a python bool: Mosaic
                        # can't lower the i8->i1 trunci the latter produces)
                        later[k] = later[k] | (push7 & taken[k])
                        cs[k] = jnp.where(push7 & taken[k], cs[7], cs[k])
                else:
                    # after the descending sort the nearest hit is the HIGHEST
                    # hit index: descend it, push the rest (k ascending = far to
                    # near, so the nearest alternative pops first)
                    nxt_int = jnp.zeros_like(zi) + DONE
                    for k in range(8):
                        nxt_int = jnp.where(hits[k], cs[k], nxt_int)
                    any1 = hits[0]
                    for k in range(1, 8):
                        any1 = any1 | hits[k]
                    # push child k iff hit AND a nearer (later-index) hit exists
                    later = [None] * 8
                    acc = jnp.zeros_like(hits[0])
                    for k in range(7, -1, -1):
                        later[k] = acc
                        acc = acc | hits[k]
                return hits, cs, nxt_int, any1, later

            def leaf_math(il_m, ox, oy, oz, dx, dy, dz, t_min, best):
                """Leaf math (identical to traverse_wide): tests the 8 leaf
                slots of the fetched rows for leaf rows.  Returns
                (best, hit_found, tri_best, u_best, v_best, bf_best)."""
                lf = pltpu.bitcast(nscr[...], jnp.float32)
                hit_found = whit[...] != 0
                tri_best = u_best = v_best = bf_best = None
                if not any_hit:
                    # any-hit needs only the occlusion boolean: skip triangle-id
                    # and u/v/backface tracking entirely (2 column reads + 4
                    # selects per leaf slot)
                    tri_best = wtri[...]
                    u_best, v_best, bf_best = wu[...], wv[...], wbf[...]

                def coll(i):
                    return lf[:, i : i + 1]

                if not any_hit:
                    # current winner's id as f32 (ids < 2^24 exact) for the
                    # lexicographic (t, id) tie-break below; no winner => +inf
                    # so any equal-t candidate takes the slot
                    cur_tid = jnp.where(
                        hit_found, tri_best.astype(jnp.float32),
                        jnp.float32(3.0e38),
                    )

                for k in range(LEAF_TESTS):
                    b = k * TRI_SLOTS
                    if woop:
                        # plane-based test (_woop_records): den == -MT_det
                        nx_, ny_, nz_ = coll(b + 0), coll(b + 1), coll(b + 2)
                        dn_ = coll(b + 3)
                        if cull_backface:
                            cull_disable = coll(b + 12) > 0.5
                        candidate = coll(b + 13) > 0.5
                        if not any_hit:
                            tid = coll(b + 14)

                        den = nx_ * dx + ny_ * dy + nz_ * dz
                        num = -(nx_ * ox + ny_ * oy + nz_ * oz + dn_)
                        inv = 1.0 / jnp.where(jnp.abs(den) < det_eps, 1.0, den)
                        mt = num * inv
                        px = ox + mt * dx
                        py = oy + mt * dy
                        pz = oz + mt * dz
                        mu = (
                            coll(b + 4) * px + coll(b + 5) * py
                            + coll(b + 6) * pz + coll(b + 7)
                        )
                        mv = (
                            coll(b + 8) * px + coll(b + 9) * py
                            + coll(b + 10) * pz + coll(b + 11)
                        )
                        det_pos = den < -det_eps   # MT det > det_eps
                        backface = den > 0.0       # MT det < 0
                        det_ok = jnp.abs(den) > det_eps
                    else:
                        v0x, v0y, v0z = coll(b + 0), coll(b + 1), coll(b + 2)
                        e1x, e1y, e1z = coll(b + 3), coll(b + 4), coll(b + 5)
                        e2x, e2y, e2z = coll(b + 6), coll(b + 7), coll(b + 8)
                        if cull_backface:
                            cull_disable = coll(b + 9) > 0.5
                        candidate = coll(b + 10) > 0.5
                        if not any_hit:
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
                        det_pos = det > det_eps
                        backface = det < 0.0
                        det_ok = jnp.abs(det) > det_eps

                    valid = (
                        il_m
                        & candidate
                        & det_ok
                        & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                        # <= (not <): the window upper bound is inclusive like
                        # the brute oracle's, and equal-t ties stay candidates
                        # for the deterministic id tie-break below
                        & (mt >= t_min) & (mt <= best)
                    )
                    if cull_backface:
                        valid &= det_pos | cull_disable

                    if not any_hit:
                        # lexicographic (t, id) winner: equal-t ties resolve to
                        # the LOWEST triangle id, bit-matching the brute-force
                        # oracle's argmin on the same (permuted) geometry.
                        # Order-independent, so trips/chunks/drain-resume all
                        # converge to the same winner (tools/ab/nee_tap_probe.py:
                        # cornell wall-corner ties flipped shading normals
                        # between backends, 7.1e-3 RMSE at 512^2/1024 spp).
                        valid &= (mt < best) | (tid < cur_tid)

                    best = jnp.where(valid, mt, best)
                    hit_found |= valid
                    if not any_hit:
                        cur_tid = jnp.where(valid, tid, cur_tid)
                        tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                        # commit u/v/backface with the winning hit so the host
                        # epilogue needs no tri-table gather + re-intersection
                        u_best = jnp.where(valid, mu, u_best)
                        v_best = jnp.where(valid, mv, v_best)
                        bf_best = jnp.where(
                            valid, jnp.where(backface, 1, 0), bf_best
                        )
                return best, hit_found, tri_best, u_best, v_best, bf_best

            def commit_hits(best, hit_found, tri_best, u_best, v_best, bf_best):
                wbest[...] = best
                whit[...] = hit_found.astype(jnp.int32)
                if not any_hit:
                    wtri[...] = tri_best
                    wu[...] = u_best
                    wv[...] = v_best
                    wbf[...] = bf_best

            def write_meta(newc, sp3, it=None):
                rowv = fetch_addr(newc)
                upd = jnp.where(
                    colw == 0, newc,
                    jnp.where(
                        colw == 1, sp3,
                        jnp.where(colw == 3, rowv, meta[...]),
                    ),
                )
                if row_trips and it is not None:
                    # col 4: first trip this row's cursor went DONE
                    cur4 = meta[:, 4:5] + zi
                    new4 = jnp.where((newc == DONE) & (cur4 == 0), it + 1, cur4)
                    upd = jnp.where(colw == 4, new4, upd)
                meta[...] = upd

            def body(state):
                """Combined trip: every row advances one visit (interior OR
                leaf), paying the tile-ops of BOTH blocks (masked)."""
                it, _, n_int, n_leaf = state
                fetch_rows(it)
                c_all = meta[:, 0:1] + zi  # lane-replicated
                ii_m = c_all >= 0
                il_m = (c_all < 0) & (c_all != DONE)
                done_m = c_all == DONE
                ox, oy, oz = pox[...], poy[...], poz[...]
                ix, iy, iz = rix[...], riy[...], riz[...]
                dx, dy, dz = pdx[...], pdy[...], pdz[...]
                t_min = ptmin[...]
                best = wbest[...]

                hits, cs, nxt_int, any1, later = interior_decide(
                    ii_m, ox, oy, oz, ix, iy, iz, t_min, best
                )
                best, hit_found, tri_best, u_best, v_best, bf_best = leaf_math(
                    il_m, ox, oy, oz, dx, dy, dz, t_min, best
                )
                commit_hits(best, hit_found, tri_best, u_best, v_best, bf_best)

                # --- vectorized decision: push all non-taken hit children ---
                sp = meta[:, 1:2] + zi  # lane-replicated

                lstart = (~c_all) >> 4
                lend = lstart + ((~c_all) & 15) - 1
                row2 = lend >> 3
                extra = il_m & (row2 != (lstart >> 3))
                leaf2 = ~(((row2 << 3) << 4) | 1)

                # interior pushes: every hit child except the descended
                # (nearest) one, in ascending slot order = far to near, so the
                # nearest alternative is on top of the stack
                stk = stack[...]
                cnt = jnp.zeros_like(sp)
                for k in range(7):  # slot 7 is never pushed (it is descended)
                    pushk = hits[k] & later[k]
                    pos = sp + cnt
                    stk = jnp.where(
                        (colw == pos) & pushk & (pos < STACK_DEPTH), cs[k], stk
                    )
                    cnt = cnt + jnp.where(pushk & (pos < STACK_DEPTH), 1, 0)

                # leaf continuation push
                pos = sp + cnt
                push_leaf = extra & (pos < STACK_DEPTH)
                stk = jnp.where((colw == pos) & push_leaf, leaf2, stk)
                cnt = cnt + jnp.where(push_leaf, 1, 0)
                stack[...] = stk
                sp2 = sp + cnt

                can_pop = sp2 > 0
                top = jnp.sum(
                    jnp.where(colw == sp2 - 1, stk, 0), axis=1, keepdims=True
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

                write_meta(newc, sp3, it)

                # newc is lane-replicated (W, 128): the idle sum counts lanes
                idle_now = jnp.sum(jnp.where(newc == DONE, 1, 0))
                alldone = idle_now >= W * LANE_COLS

                # ii_m/il_m are lane-replicated; divide back at octr write
                n_int += jnp.sum(jnp.where(ii_m, 1, 0))
                n_leaf += jnp.sum(jnp.where(il_m, 1, 0))
                return (it + 1, alldone, n_int, n_leaf)

            def body_split(state):
                """Phase-split trip (while-while): the trip is EITHER an
                interior step (slab tests + ordering only — leaf rows park)
                OR a leaf step (leaf block only — interior rows park), so a
                visit pays only its own block's tile-ops instead of both.
                Per-row outputs are bitwise identical to the combined body
                (rows are independent; only their relative scheduling
                changes).  A leaf trip fires when parked leaf rows reach
                1/leaf_den of the interior rows (or no interior rows
                remain)."""
                it, _, n_int, n_leaf = state
                fetch_rows(it)
                c_all = meta[:, 0:1] + zi  # lane-replicated
                ii_m = c_all >= 0
                il_m = (c_all < 0) & (c_all != DONE)
                ox, oy, oz = pox[...], poy[...], poz[...]
                t_min = ptmin[...]

                n_int_l = jnp.sum(jnp.where(ii_m, 1, 0))
                n_leaf_l = jnp.sum(jnp.where(il_m, 1, 0))
                do_leaf = (n_leaf_l * leaf_den >= n_int_l) & (n_leaf_l > 0)

                @pl.when(jnp.logical_not(do_leaf))
                def _():
                    ix, iy, iz = rix[...], riy[...], riz[...]
                    best = wbest[...]
                    hits, cs, nxt_int, any1, later = interior_decide(
                        ii_m, ox, oy, oz, ix, iy, iz, t_min, best
                    )
                    sp = meta[:, 1:2] + zi
                    stk = stack[...]
                    cnt = jnp.zeros_like(sp)
                    for k in range(7):  # slot 7 is never pushed (descended)
                        pushk = hits[k] & later[k]
                        pos = sp + cnt
                        stk = jnp.where(
                            (colw == pos) & pushk & (pos < STACK_DEPTH),
                            cs[k], stk,
                        )
                        cnt = cnt + jnp.where(pushk & (pos < STACK_DEPTH), 1, 0)
                    stack[...] = stk
                    sp2 = sp + cnt
                    can_pop = sp2 > 0
                    top = jnp.sum(
                        jnp.where(colw == sp2 - 1, stk, 0), axis=1, keepdims=True
                    )
                    newc = jnp.where(
                        ii_m,
                        jnp.where(any1, nxt_int, jnp.where(can_pop, top, DONE)),
                        c_all,
                    )
                    popped = ii_m & (~any1) & can_pop
                    sp3 = sp2 - jnp.where(popped, 1, 0)
                    write_meta(newc, sp3, it)

                @pl.when(do_leaf)
                def _():
                    dx, dy, dz = pdx[...], pdy[...], pdz[...]
                    best = wbest[...]
                    best, hit_found, tri_best, u_best, v_best, bf_best = (
                        leaf_math(il_m, ox, oy, oz, dx, dy, dz, t_min, best)
                    )
                    commit_hits(best, hit_found, tri_best, u_best, v_best,
                                bf_best)
                    sp = meta[:, 1:2] + zi
                    lstart = (~c_all) >> 4
                    lend = lstart + ((~c_all) & 15) - 1
                    row2 = lend >> 3
                    extra = il_m & (row2 != (lstart >> 3))
                    leaf2 = ~(((row2 << 3) << 4) | 1)
                    stk = stack[...]
                    push_leaf = extra & (sp < STACK_DEPTH)
                    stk = jnp.where((colw == sp) & push_leaf, leaf2, stk)
                    stack[...] = stk
                    sp2 = sp + jnp.where(push_leaf, 1, 0)
                    can_pop = sp2 > 0
                    top = jnp.sum(
                        jnp.where(colw == sp2 - 1, stk, 0), axis=1, keepdims=True
                    )
                    newc = jnp.where(
                        il_m, jnp.where(can_pop, top, DONE), c_all
                    )
                    popped = il_m & can_pop
                    sp3 = sp2 - jnp.where(popped, 1, 0)
                    if any_hit:
                        lane_done = hit_found | (t_min > best)
                        row_done = il_m & (
                            jnp.min(
                                jnp.where(lane_done, 1, 0), axis=1, keepdims=True
                            )
                            > 0
                        )
                        newc = jnp.where(row_done, DONE, newc)
                    write_meta(newc, sp3, it)

                mcur = meta[...]
                ndone = jnp.sum(jnp.where((colw == 0) & (mcur == DONE), 1, 0))
                alldone = ndone >= W
                n_int += jnp.where(do_leaf, 0, n_int_l)
                n_leaf += jnp.where(do_leaf, n_leaf_l, 0)
                return (it + 1, alldone, n_int, n_leaf)

            def setup():
                rix[...] = safe_inv(pdx[...])
                riy[...] = safe_inv(pdy[...])
                riz[...] = safe_inv(pdz[...])
                tminr = ptmin[...]
                tmaxr = ptmax[...]

                def init_state():
                    wbest[...] = jnp.minimum(tmaxr, big)
                    wtri[...] = jnp.zeros((W, LANE_COLS), jnp.int32)
                    whit[...] = jnp.zeros((W, LANE_COLS), jnp.int32)
                    wu[...] = jnp.zeros((W, LANE_COLS), jnp.float32)
                    wv[...] = jnp.zeros((W, LANE_COLS), jnp.float32)
                    wbf[...] = jnp.zeros((W, LANE_COLS), jnp.int32)

                if resume:
                    # continue a capped round: traversal + hit state come in
                    wbest[...] = pbest[...]
                    wtri[...] = ptri[...]
                    whit[...] = phit[...]
                    wu[...] = pu[...]
                    wv[...] = pv[...]
                    wbf[...] = pbf[...]
                    meta[...] = pmeta[...]
                    stack[...] = pstack[...]
                else:
                    if chunked:
                        # hit state persists in scratch across the chunk axis; only
                        # the first chunk of each wave starts fresh
                        pl.when(pl.program_id(1) == 0)(init_state)
                    else:
                        init_state()

                    relevant = tminr <= tmaxr
                    if any_hit and chunked:
                        # rows whose every live lane already found an occluder in an
                        # earlier chunk skip this chunk entirely
                        relevant &= whit[...] == 0
                    live = jnp.sum(jnp.where(relevant, 1, 0), axis=1, keepdims=True)
                    cur0 = jnp.where(live > 0, 0, DONE)
                    row0 = fetch_addr(cur0)
                    meta[...] = jnp.where(
                        colw == 0, cur0, jnp.where(colw == 3, row0, 0)
                    )


            def export(trips):
                obest[...] = wbest[...]
                otri[...] = wtri[...]
                ohit[...] = whit[...]
                ou[...] = wu[...]
                ov[...] = wv[...]
                obf[...] = wbf[...]
                if drain:
                    ometa[...] = meta[...]
                    ostack[...] = stack[...]
                if row_trips:
                    # rows still live at MAX_ITERS report the full trip count
                    m4 = meta[:, 4:5] + jnp.zeros((W, LANE_COLS), jnp.int32)
                    orow[...] = jnp.where(m4 == 0, trips, m4)


            return fetch_rows, body, body_split, setup, export

        if not pair:
            (fetch_rows, body, body_split, setup, export) = make_wave(
                pox, poy, poz, pdx, pdy, pdz, ptmin, ptmax,
                pbest, ptri, phit, pu, pv, pbf, pmeta, pstack,
                obest, otri, ohit, ou, ov, obf, orow, ometa, ostack,
                rix, riy, riz, wbest, wu, wv, nscr,
                wtri, whit, wbf, meta, stack)
            step = body_split if phase_split else body

            def block4(state):
                for _ in range(4):
                    state = step(state)
                return state

            cap = cap_ref[0, 0] if drain else (
                min(MAX_ITERS, PROBE_TRIPS) if PROBE_TRIPS else MAX_ITERS
            )

            def cond(state):
                return (~state[1]) & (state[0] < cap)

            setup()
            trips, _, n_int, n_leaf = jax.lax.while_loop(
                cond, block4, (jnp.int32(0), False, jnp.int32(0),
                               jnp.int32(0))
            )
            export(trips)
        else:
            # pair mode: two W-row waves side by side in one (2W, 128)
            # block.  Each trip runs wave A's fetch+compute then wave B's;
            # B's 64 row loads have no dependency on A's math (and A's next
            # loads none on B's), so the scheduler can hide each wave's
            # fetch latency under the other's decision block — software
            # pipelining with no speculative state.  A finished wave's body
            # is a masked no-op (cursor DONE fetches the sentinel row), so
            # the pair pays max(tripsA, tripsB); the frame-level wave
            # balancer already groups similar-cost rows.
            waves = []
            for off in (0, W):
                v = [None if r is None else _RV(r, off, W)
                     for r in (pox, poy, poz, pdx, pdy, pdz, ptmin, ptmax,
                               pbest, ptri, phit, pu, pv, pbf, pmeta,
                               pstack, obest, otri, ohit, ou, ov, obf,
                               orow, ometa, ostack,
                               rix, riy, riz, wbest, wu, wv, nscr,
                               wtri, whit, wbf, meta, stack)]
                waves.append(make_wave(*v))
            stepA = waves[0][2] if phase_split else waves[0][1]
            stepB = waves[1][2] if phase_split else waves[1][1]

            cap = min(MAX_ITERS, PROBE_TRIPS) if PROBE_TRIPS else MAX_ITERS

            def pbody(state):
                it, dA, dB, n_int, n_leaf = state
                _, aA, n_int, n_leaf = stepA((it, dA, n_int, n_leaf))
                _, aB, n_int, n_leaf = stepB((it, dB, n_int, n_leaf))
                return (it + 1, aA, aB, n_int, n_leaf)

            def block2(state):
                for _ in range(2):
                    state = pbody(state)
                return state

            def cond(state):
                return (~(state[1] & state[2])) & (state[0] < cap)

            for wv_ in waves:
                wv_[3]()  # setup
            trips, _, _, n_int, n_leaf = jax.lax.while_loop(
                cond, block2, (jnp.int32(0), False, False, jnp.int32(0),
                               jnp.int32(0))
            )
            for wv_ in waves:
                wv_[4](trips)  # export

        shape = (8, LANE_COLS)
        iters = jnp.zeros(shape, jnp.int32) + trips
        colix = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        iters = jnp.where(colix == 1, n_int // LANE_COLS, iters)
        iters = jnp.where(colix == 2, n_leaf // LANE_COLS, iters)

        first_step = pl.program_id(0) == 0
        if chunked:
            first_step &= pl.program_id(1) == 0

        @pl.when(first_step)
        def _():
            octr[...] = jnp.zeros(shape, jnp.int32)

        octr[...] = octr[...] + iters

    return kernel


# not @jax.jit: nested-jit executable-resolution bug + top-level-only
# compiler options (see core.jit_utils)
def _traverse_wide8_packed(
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
    n_chunks: int = 1,
    woop: bool = False,
    any_order: bool = False,
    phase_split: bool = False,
    leaf_den: int = 1,
    row_trips: bool = False,
    drain_caps: tuple = (),
    drain_rekey: bool = True,
    pair: bool = False,
):
    r_orig = o.shape[0]
    # interpret mode pays per-row python cost; keep the resident set small
    W = INTERPRET_ROWS if interpret else WIDE_ROWS
    # pair mode: each block holds TWO independent W-row waves (see
    # _kernel's pair tail); the pool rounds to the 2W block size
    Wb = 2 * W if pair else W
    raw_pack = -(-r_orig // LANE_COLS)
    pool_rows = -(-raw_pack // Wb) * Wb
    n_waves = pool_rows // Wb
    r = pool_rows * LANE_COLS

    def comp(a, j, fill):
        return _pad_to(a[:, j], r, fill).reshape(pool_rows, LANE_COLS)

    ox, oy, oz = comp(o, 0, 0.0), comp(o, 1, 0.0), comp(o, 2, 0.0)
    dx, dy, dz = comp(d, 0, 1.0), comp(d, 1, 1.0), comp(d, 2, 1.0)
    tmin2 = _pad_to(t_min, r, 1.0).reshape(pool_rows, LANE_COLS)
    tmax2 = _pad_to(t_max, r, 0.0).reshape(pool_rows, LANE_COLS)

    chunked = n_chunks > 1
    if chunked:
        # table rows are K stacked per-chunk tables; grid step (w, k)
        # traverses chunk k — the pipeline streams chunk k+1's table from
        # HBM while k computes, so only ONE chunk table is VMEM-resident
        grid = (n_waves, n_chunks)
        chunk_rows = table.shape[0] // n_chunks
        tab_spec = pl.BlockSpec(
            (chunk_rows, LANE_COLS), lambda w, k: (k, 0),
            memory_space=pltpu.VMEM,
        )
        wave_spec = lambda: pl.BlockSpec(  # noqa: E731
            (Wb, LANE_COLS), lambda w, k: (w, 0), memory_space=pltpu.VMEM
        )
        ctr_spec = pl.BlockSpec(
            (8, LANE_COLS), lambda w, k: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (n_waves,)
        tab_spec = pl.BlockSpec(
            table.shape, lambda w: (0, 0), memory_space=pltpu.VMEM
        )
        wave_spec = lambda: pl.BlockSpec(  # noqa: E731
            (Wb, LANE_COLS), lambda w: (w, 0), memory_space=pltpu.VMEM
        )
        ctr_spec = pl.BlockSpec(
            (8, LANE_COLS), lambda w: (0, 0), memory_space=pltpu.VMEM
        )
    out_shape = [
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.float32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.float32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.float32),
        jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
        jax.ShapeDtypeStruct((8, LANE_COLS), jnp.int32),
    ]
    if row_trips:
        out_shape.append(
            jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32)
        )

    f32scr = lambda: pltpu.VMEM((Wb, LANE_COLS), jnp.float32)  # noqa: E731
    i32scr = lambda: pltpu.VMEM((Wb, LANE_COLS), jnp.int32)  # noqa: E731

    def mk_call(drain: bool, resume: bool):
        cap_spec = pl.BlockSpec(
            (1, 1), (lambda w: (0, 0)) if not chunked else
            (lambda w, k: (0, 0)), memory_space=pltpu.SMEM,
        )
        ins = [tab_spec] + [wave_spec() for _ in range(8)]
        outs_spec = [wave_spec()] * 6 + [ctr_spec]
        shapes = list(out_shape)
        if drain:
            ins.append(cap_spec)
        if resume:
            ins += [wave_spec() for _ in range(8)]
        if row_trips:
            outs_spec.append(wave_spec())
        if drain:
            outs_spec += [wave_spec(), wave_spec()]
            shapes += [
                jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
                jax.ShapeDtypeStruct((pool_rows, LANE_COLS), jnp.int32),
            ]
        return pl.pallas_call(
            _kernel(
                cull_backface, any_hit, nr_rows, W, chunked=chunked,
                woop=woop, any_order=any_order, phase_split=phase_split,
                leaf_den=leaf_den, row_trips=row_trips,
                drain=drain, resume=resume, pair=pair,
            ),
            grid=grid,
            in_specs=ins,
            out_specs=outs_spec,
            out_shape=shapes,
            scratch_shapes=[f32scr() for _ in range(6)]
            + [i32scr() for _ in range(6)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    if drain_caps:
        # drain+compact rounds: run to a trip cap, pack the unfinished
        # rows into dense waves (a wave pays its slowest row), resume.
        # Measured ceilings in tools/ab jobs 047/049.
        assert not chunked, "drain+compact is single-table only"
        assert not row_trips, "diagnostics and drain are exclusive"
        assert not pair, "drain caps and pair mode are exclusive"
        i32 = jnp.int32

        split_gather = _os.environ.get("VRT_DRAIN_SPLITGATHER", "1") == "1"

        def permute_rows(perm, arrs):
            if split_gather:
                # DEFAULT (round 5): one gather per array instead of
                # bitcast+concat+one wide gather.  Identical semantics;
                # the packed lowering is what aborted the capped 1080p
                # frame when composed with the riding variadic sort
                # (r05 ladder splitgather rung: PASS; packed: ABORT).
                # Costs ~16 gathers x pool_rows x ~30 ns vs 1 — a few ms
                # per drain round against the caps' ~60 ms/bounce win.
                return [a[perm] for a in arrs]
            cols = [
                a if a.dtype == jnp.int32
                else jax.lax.bitcast_convert_type(a, jnp.int32)
                for a in arrs
            ]
            packed = jnp.concatenate(cols, axis=1)
            out = packed[perm]
            res = []
            for k, a in enumerate(arrs):
                x = out[:, k * LANE_COLS : (k + 1) * LANE_COLS]
                if a.dtype != jnp.int32:
                    x = jax.lax.bitcast_convert_type(x, a.dtype)
                res.append(x)
            return res

        fresh = mk_call(True, False)
        resume_call = mk_call(True, True)
        blocks = [ox, oy, oz, dx, dy, dz, tmin2, tmax2]
        cap0 = jnp.full((1, 1), i32(drain_caps[0]))
        outs = fresh(table, *blocks, cap0)
        best, tri, hit_i, u_k, v_k, bf_k, iters, meta_s, stack_s = outs
        acc = jnp.arange(pool_rows, dtype=i32)
        # coherence re-key: sort survivors by their CURRENT cursor, not
        # just liveness — resumed waves then share a BVH region (leaf
        # cursors are negative, interiors ascend by node id), shrinking
        # the union visit set each wave pays.  Any permutation is
        # correctness-neutral (inverted below); this one rides the
        # argsort the compaction already pays.  KERNEL_NOTES round 3
        # measured subtree-major re-keys at 1.72x kernel-side but the
        # standalone sort ate it; here the sort is free.
        rekey = drain_rekey
        for cap in (*drain_caps[1:], MAX_ITERS):
            # Each resume round is gated by a runtime lax.cond on "any row
            # still live": when the previous round drained everything (the
            # common case for coherent primaries, small trees like the
            # foliage split, and generous caps) the permute + full-grid
            # resume launch are SKIPPED on device.  Bit-identical — a
            # resume over zero live rows is an identity round — and it
            # makes the caps free where they don't engage (r05: capped
            # primaries measured ~870 ms vs ~70 uncapped because the
            # resume rounds paid full grid + permute cost for nothing).
            capr_v = i32(min(cap, MAX_ITERS))
            carried = (*blocks, best, tri, hit_i, u_k, v_k, bf_k,
                       meta_s, stack_s, acc, iters)

            def _round(args, _capr=capr_v):
                (ox_, oy_, oz_, dx_, dy_, dz_, ta_, tb_,
                 best, tri, hit_i, u_k, v_k, bf_k,
                 meta_s, stack_s, acc, iters) = args
                blocks_ = [ox_, oy_, oz_, dx_, dy_, dz_, ta_, tb_]
                live_m = meta_s[:, 0] != DONE
                if rekey:
                    key = jnp.where(
                        live_m, meta_s[:, 0], jnp.int32(2**31 - 1)
                    )
                    perm = jnp.argsort(key, stable=True).astype(i32)
                else:
                    perm = jnp.argsort(
                        -live_m.astype(i32), stable=True
                    ).astype(i32)
                state = permute_rows(
                    perm,
                    blocks_
                    + [best, tri, hit_i, u_k, v_k, bf_k, meta_s, stack_s],
                )
                blocks_ = state[:8]
                (best, tri, hit_i, u_k, v_k, bf_k, meta_s, stack_s) = \
                    state[8:]
                acc = acc[perm]
                capr = jnp.full((1, 1), _capr)
                outs = resume_call(
                    table, *blocks_, capr,
                    best, tri, hit_i, u_k, v_k, bf_k, meta_s, stack_s,
                )
                (best, tri, hit_i, u_k, v_k, bf_k, iters_r,
                 meta_s, stack_s) = outs
                return (*blocks_, best, tri, hit_i, u_k, v_k, bf_k,
                        meta_s, stack_s, acc, iters + iters_r)

            carried = jax.lax.cond(
                jnp.any(meta_s[:, 0] != DONE), _round, lambda a: a, carried
            )
            blocks = list(carried[:8])
            (best, tri, hit_i, u_k, v_k, bf_k,
             meta_s, stack_s, acc, iters) = carried[8:]
        inv = jnp.zeros((pool_rows,), i32).at[acc].set(
            jnp.arange(pool_rows, dtype=i32), unique_indices=True
        )
        best, tri, hit_i, u_k, v_k, bf_k = permute_rows(
            inv, [best, tri, hit_i, u_k, v_k, bf_k]
        )
        rtrips = None
    else:
        call = mk_call(False, False)
        outs = call(table, ox, oy, oz, dx, dy, dz, tmin2, tmax2)
        best, tri, hit_i, u_k, v_k, bf_k, iters = outs[:7]
        rtrips = outs[7][:, 0] if row_trips else None
    del bvh_tris  # u/v/backface committed in-kernel; no tri-table epilogue
    iters = iters[None, 0, :3]

    def flat(x):
        return x.reshape(r)[:r_orig]

    hit_found = flat(hit_i) != 0
    tri_f = flat(tri)
    t = jnp.where(hit_found, flat(best), _BIG_T)
    result = Hit(
        t=t,
        u=flat(u_k),
        v=flat(v_k),
        tri=tri_f,
        backface=hit_found & (flat(bf_k) != 0),
    )
    if return_counters and row_trips:
        return result, iters, rtrips
    if return_counters:
        return result, iters
    if row_trips:
        return result, rtrips
    return result


from vulkanraytracing_tpu.core.jit_utils import hot_jit

_traverse_wide8_jitted = hot_jit(
    _traverse_wide8_packed,
    static_argnames=(
        "nr_rows", "cull_backface", "any_hit", "interpret",
        "return_counters", "n_chunks", "woop", "any_order",
        "phase_split", "leaf_den", "row_trips", "drain_caps",
        "drain_rekey", "pair",
    ),
)


def _dispatch(o):
    import jax.core

    return (
        _traverse_wide8_packed
        if isinstance(o, jax.core.Tracer)
        else _traverse_wide8_jitted
    )


def _with_bvh8(bvh: BVH) -> BVH:
    if bvh.nodes8 is not None or bvh.chunks is not None:
        return bvh
    from vulkanraytracing_tpu.accel.bvh8 import collapse_bvh8

    return collapse_bvh8(bvh)


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
    bvh = _with_bvh8(bvh)
    if not wide8_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_wide

        return traverse_wide.intersect_closest(
            geom, bvh, o, d, t_min, t_max, cull_backface=cull_backface
        )
    del geom
    if bvh.chunks is not None:
        table, nr, k = _chunked_args(bvh)
        woop = False
    else:
        woop = WOOP_DEFAULT
        table, nr = _unified_table8(bvh, woop=woop)
        k = 1
    interpret = _use_interpret()
    caps_ok = ((not interpret) or DRAIN_INTERPRET) and (
        bvh.tris.shape[0] >= DRAIN_MIN_TRIS
    )
    caps = CLOSEST_DRAIN_CAPS if (k == 1 and caps_ok) else ()
    return _dispatch(o)(
        table, nr, bvh.tris,
        o, d, t_min, t_max,
        cull_backface=cull_backface, any_hit=False,
        interpret=interpret, n_chunks=k, woop=woop,
        drain_caps=caps, drain_rekey=CLOSEST_REKEY_DEFAULT,
        pair=PAIR_DEFAULT and k == 1 and not caps,
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
    bvh = _with_bvh8(bvh)
    if not wide8_supported(bvh):
        from vulkanraytracing_tpu.ops import traverse_wide

        return traverse_wide.intersect_any(geom, bvh, o, d, t_min, t_max)
    del geom
    if bvh.chunks is not None:
        table, nr, k = _chunked_args(bvh)
        woop = False
    else:
        woop = WOOP_DEFAULT
        table, nr = _unified_table8(bvh, woop=woop)
        k = 1
    interpret = _use_interpret()
    caps_ok = ((not interpret) or DRAIN_INTERPRET) and (
        bvh.tris.shape[0] >= DRAIN_MIN_TRIS
    )
    caps = ANYHIT_DRAIN_CAPS if (k == 1 and caps_ok) else ()
    hit = _dispatch(o)(
        table, nr, bvh.tris,
        o, d, t_min, t_max,
        cull_backface=False, any_hit=True,
        interpret=interpret, n_chunks=k, woop=woop,
        any_order=True, phase_split=True,
        drain_caps=caps, drain_rekey=DRAIN_REKEY_DEFAULT,
        pair=PAIR_DEFAULT and k == 1 and not caps,
    )
    return hit.t < _BIG_T
