"""Ray reordering — wavefront coherence + dead-lane compaction, gather-free.

Secondary (bounce) rays from a pixel tile scatter over the hemisphere, so a
pixel-coherent packet would traverse the union of 128 unrelated paths.
Sorting the wavefront by (alive, direction octant, origin Morton code)
before tracing re-forms packets of rays that walk the same part of the BVH
— the classic wavefront ray-reordering transform (see PAPERS.md: "On Ray
Reordering Techniques for Faster GPU Ray Tracing"), which on TPU doubles as
*compaction*: dead rays sort to the segment tail, so their 128-lane rows
exit the traversal loop immediately.

TPU formulation (third design): ONE global argsort + ONE packed row-gather.

- An XLA:TPU gather costs ~16 ms per SEPARATE (R,) column at 2M rays,
  which made the naive global sort (~330 ms/bounce) unaffordable and
  motivated the round-2 segment-local one-hot machinery (seg_ranks +
  one-hot MXU matmuls, kept below as the odd-size fallback).
- But a row-gather of a packed (R, C) table costs ~55-85 ms for ANY C
  up to ~25 (cost is per index; columns are nearly free — the same
  gather economy ops.intersect uses for attribute fetch).  So the TRUE
  global sort is argsort (43 ms) + one packed gather, which is both
  CHEAPER than the segment machinery and much better for traversal:
  on bounce-2 wavefronts the segment order had degraded to near-useless
  (within a 2048-ray window of an already-sorted-by-previous-bounce
  order there is nothing left to regroup) — counter-measured 4.7M node
  visits / 488 ms vs the global order's 2.8M / 328 ms
  (tools/ab/ab_sortqual.py).

On top of the element sort sits a row-granular WAVE-BALANCING pass:
whole 128-ray rows are regrouped by PREDICTED traversal cost (union
breadth over an upper-tree probe cut, probe_row_cost) so each wave
holds rows of similar cost — a wave's trip count is the max over its
rows.  Measured 1.24x / occupancy 41% -> 51% (tools/ab/ab_rowcost.py).

The POSITION-MAJOR + DIRECTION-BIN key below beat every alternative
tried (direction-major keys lose wave occupancy, pure octant keys
leave 3x visits on the table; tools/ab/ab_counters.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.accel.lbvh import morton_codes

_U32 = jnp.uint32

SEG = 2048          # rays per sort segment (= 16 traversal rows)
_APPLY_CHUNK = 64   # max segments per one-hot matmul block


class SegOrder(NamedTuple):
    """Within-segment destination slots + global row regrouping for a
    wavefront of R rays."""

    ranks: Array  # (R,) i32 — destination slot of ray i inside its segment
    seg: int
    # (R/128,) i32 — new row r is old row row_perm[r] (post segment sort);
    # None when R is not a whole number of 128-ray rows
    row_perm: Array | None = None

    @property
    def n(self) -> int:
        return self.ranks.shape[0]


class GlobalOrder(NamedTuple):
    """TRUE global sort order, applied with one packed row-gather.

    The round-2 segment machinery existed because separate per-column
    gathers cost ~16 ms each — but an XLA:TPU row-gather of a packed
    (R, C) table costs ~55-85 ms for ANY column count (cost is per
    index; the same economy ops.intersect uses for attribute fetch).
    One argsort (43 ms) + one packed gather therefore beats the
    segment-local sort on BOTH cost and quality: counter-measured on
    bounce-2 rays the global order traverses 2.8M visits / 328 ms vs
    the segment order's 4.7M / 488 ms (tools/ab/ab_sortqual.py)."""

    fwd: Array  # (R,) i32 — output slot i takes input element fwd[i]
    inv: Array  # (R,) i32 — the inverse permutation

    @property
    def n(self) -> int:
        return self.fwd.shape[0]


def ray_sort_keys(
    o: Array, d: Array, t_min: Array, t_max: Array, root_lo: Array, root_hi: Array
) -> Array:
    """32-bit coherence key: dead(1) | morton_hi(12) | theta(5) | phi(5) |
    morton_mid(9).

    Position-MAJOR with direction bins below it: rays sort into coarse
    spatial cells (4096 of them), within a cell into one of 1024 direction
    bins, with finer position bits as the tiebreak.  Direction-major keys
    measured worse (wave occupancy collapses: a wave's rows then span the
    whole scene); pure octant(3) direction bits leave ~3x node visits on
    the table vs these 10 direction bits (tools/ab/ab_counters.py)."""
    dead = (t_min > t_max).astype(_U32)
    morton = morton_codes(o, root_lo, root_hi) >> _U32(2)  # 28 bits
    m_hi = morton >> _U32(16)                              # 12 bits
    m_mid = (morton >> _U32(7)) & _U32(0x1FF)              # next 9 bits
    # theta bin: equal-z slices; phi bin: atan2 — both 5 bits
    tb = jnp.clip(((d[:, 2] + 1.0) * 16.0).astype(jnp.int32), 0, 31).astype(_U32)
    phi = jnp.arctan2(d[:, 1], d[:, 0])  # [-pi, pi]
    pb = jnp.clip(
        ((phi * (16.0 / jnp.pi)) + 16.0).astype(jnp.int32), 0, 31
    ).astype(_U32)
    return (
        (dead << _U32(31))
        | (m_hi << _U32(19))
        | (tb << _U32(14))
        | (pb << _U32(9))
        | m_mid
    )


def _chunk_of(s: int) -> int:
    """Largest divisor of s not exceeding _APPLY_CHUNK."""
    best = 1
    for c in range(2, min(s, _APPLY_CHUNK) + 1):
        if s % c == 0:
            best = c
    return best


def seg_ranks(keys: Array, seg: int = SEG) -> Array:
    """Destination slot of each element under a stable ascending sort of its
    seg-sized segment: rank[i] = #{j in segment : key_j < key_i or
    (key_j == key_i and j < i)}.  All-pairs compare — dense VPU work, no
    sort primitive, no gather."""
    n = keys.shape[0]
    assert n % seg == 0, (n, seg)
    k = keys.reshape(-1, seg)
    idx = jnp.arange(seg, dtype=jnp.int32)
    tie = idx[None, :] < idx[:, None]  # (seg, seg): j strictly before i

    def body(krow: Array) -> Array:
        a, b = krow[:, None], krow[None, :]
        less = (b < a) | ((b == a) & tie)
        return jnp.sum(less.astype(jnp.int32), axis=1)

    return jax.vmap(body)(k).reshape(-1)


def probe_ray_mask(
    probe: Array, o: Array, d: Array, t_min: Array, t_max: Array
) -> list[Array]:
    """Per-ray entered-bit mask over the probe cut, packed into u32
    columns (32 boxes each).  Computed BEFORE the sort so the bits can
    ride the multi-operand ``lax.sort`` — no post-sort ray pregather."""
    n_boxes = probe.shape[0]
    tiny = 1e-30
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
    tn = t_min[:, None]
    tf = t_max[:, None]
    for a in range(3):
        lo = (probe[None, :, a] - o[:, a, None]) * inv[:, a, None]
        hi = (probe[None, :, a + 3] - o[:, a, None]) * inv[:, a, None]
        tn = jnp.maximum(tn, jnp.minimum(lo, hi))
        tf = jnp.minimum(tf, jnp.maximum(lo, hi))
    ent = (tn <= tf).astype(_U32)                    # (R, N)
    masks = []
    for s in range(0, n_boxes, 32):
        k = min(32, n_boxes - s)
        bits = _U32(1) << jnp.arange(k, dtype=_U32)
        masks.append(
            jnp.sum(ent[:, s : s + k] * bits[None, :], axis=1, dtype=_U32)
        )
    return masks


def probe_row_cost(
    probe: Array, o: Array, d: Array, t_min: Array, t_max: Array
) -> Array:
    """Per-row traversal-cost prediction: how many probe boxes (an
    upper-tree cut, accel.lbvh.probe_cut) ANY of the row's 128 lanes
    enters — the union breadth the traversal row will pay.  Counter-
    measured on the 262k bench scene: regrouping waves by this count
    took sorted-bounce traversal 485 -> 392 ms (occupancy 41% -> 51%)
    with identical visit totals (tools/ab/ab_rowcost.py)."""
    tiny = 1e-30
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
    tn = t_min[:, None]
    tf = t_max[:, None]
    for a in range(3):
        lo = (probe[None, :, a] - o[:, a, None]) * inv[:, a, None]
        hi = (probe[None, :, a + 3] - o[:, a, None]) * inv[:, a, None]
        tn = jnp.maximum(tn, jnp.minimum(lo, hi))
        tf = jnp.minimum(tf, jnp.maximum(lo, hi))
    ent = tn <= tf                                   # (R, N)
    rows = ent.reshape(-1, 128, ent.shape[1]).any(axis=1)
    return jnp.sum(rows.astype(jnp.int32), axis=1)   # (R/128,)


def make_order(
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    root_lo: Array,
    root_hi: Array,
    seg: int = SEG,
    probe: Array | None = None,
) -> "GlobalOrder | SegOrder":
    """Coherence order for a wavefront: a TRUE global sort (GlobalOrder)
    when the wavefront is whole 128-ray rows, else the segment-local
    fallback (SegOrder, odd sizes only)."""
    n = o.shape[0]
    keys = ray_sort_keys(o, d, t_min, t_max, root_lo, root_hi)
    if n % 128 == 0 and n > 128:
        i32 = jnp.int32
        iota = jnp.arange(n, dtype=i32)
        if probe is not None:
            # wave balancing: regroup whole rows by PREDICTED traversal
            # cost (union breadth over the probe cut) — a wave's trip
            # count is the max over its rows, so waves must hold rows of
            # similar cost.  The per-ray entered bits are computed
            # pre-sort and ride the multi-operand sort, so no post-sort
            # ray pregather is needed; the row pass composes into the
            # same final gather.
            masks = probe_ray_mask(probe, o, d, t_min, t_max)
            out = jax.lax.sort(
                (keys, *masks, iota), num_keys=1, is_stable=True
            )
            perm = out[-1]
            cost = jnp.zeros((n // 128,), jnp.int32)
            for sm in out[1:-1]:
                union = jax.lax.reduce(
                    sm.reshape(-1, 128), _U32(0), jax.lax.bitwise_or, (1,)
                )
                cost = cost + jax.lax.population_count(union).astype(
                    jnp.int32
                )
            row_perm = jnp.argsort(cost).astype(i32)
            fwd = perm[
                (row_perm[:, None] * 128
                 + jnp.arange(128, dtype=i32)[None, :]).reshape(-1)
            ]
        else:
            # the sorted order is already globally key-grouped row-wise
            fwd = jnp.argsort(keys).astype(i32)  # stable
        inv = jnp.zeros((n,), i32).at[fwd].set(iota, unique_indices=True)
        return GlobalOrder(fwd=fwd, inv=inv)

    seg = min(seg, n)
    while n % seg:
        seg //= 2
    ranks = seg_ranks(keys, seg)
    return SegOrder(ranks=ranks, seg=seg, row_perm=None)


def _apply_columns(
    order: SegOrder, cols: list[Array], transpose: bool = False
) -> list[Array]:
    """Permute f32 columns into segment-sorted positions with batched
    one-hot matmuls: out[s, p, c] = cols[c][s, i] where ranks[s, i] == p.
    ``transpose=True`` applies the inverse permutation (contract the other
    one-hot axis).  HIGHEST precision keeps f32 payloads bit-exact (one
    nonzero term per output; validated in tests/test_reorder.py)."""
    n, seg = order.n, order.seg
    s = n // seg
    c = len(cols)
    r3 = order.ranks.reshape(s, seg)
    p3 = jnp.stack([x.reshape(s, seg) for x in cols], axis=-1)  # (s, seg, c)
    idx = jnp.arange(seg, dtype=jnp.int32)

    def block(args):
        rc, pc = args  # (B, seg), (B, seg, c)
        if transpose:
            onehot = (rc[:, :, None] == idx[None, None, :]).astype(jnp.float32)
        else:
            onehot = (rc[:, None, :] == idx[None, :, None]).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, pc, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )

    chunk = _chunk_of(s)
    nb = s // chunk
    out = jax.lax.map(
        block, (r3.reshape(nb, chunk, seg), p3.reshape(nb, chunk, seg, c))
    )
    out = out.reshape(n, c)
    return [out[:, i] for i in range(c)]


def _permute(order: SegOrder, arrays, transpose: bool) -> tuple[Array, ...]:
    cols: list[Array] = []
    specs: list[tuple] = []  # (kind, dtype, ncomp)
    for a in arrays:
        if a.ndim == 2 or a.dtype not in (jnp.bool_, jnp.uint32, jnp.int32):
            # one-hot matmul hazard: 0 * inf = NaN would poison a whole
            # segment column, so non-finite payload entries (dead lanes'
            # p = o + d*BIG_T overflows) are zeroed — a dead lane's state
            # is never read, and a live lane's state is finite by
            # construction (tone map, pdf guards)
            k = a.shape[1] if a.ndim == 2 else 1
            comps = (a[:, j] for j in range(k)) if a.ndim == 2 else (a,)
            for x in comps:
                x = x.astype(jnp.float32)
                cols.append(jnp.where(jnp.isfinite(x), x, 0.0))
            specs.append(("f", a.dtype, k))
        elif a.dtype == jnp.bool_:
            cols.append(a.astype(jnp.float32))
            specs.append(("b", a.dtype, 1))
        else:  # uint32 / int32: exact transport via 16-bit halves
            u = a.astype(_U32)
            cols.append((u >> _U32(16)).astype(jnp.float32))
            cols.append((u & _U32(0xFFFF)).astype(jnp.float32))
            specs.append(("i", a.dtype, 2))

    if transpose and order.row_perm is not None:
        # undo the row regrouping first (apply composed seg-then-row, so the
        # inverse is row-then-seg): one row-level scatter moves all columns
        n = order.n
        x3 = jnp.stack([c.reshape(n // 128, 128) for c in cols], axis=-1)
        x3 = jnp.zeros_like(x3).at[order.row_perm].set(x3)
        cols = [x3[..., i].reshape(n) for i in range(len(cols))]

    out = _apply_columns(order, cols, transpose=transpose)

    if not transpose and order.row_perm is not None:
        # regroup whole rows globally: ONE gather of (rows, 128*C) moves all
        # columns near HBM bandwidth (~35 ms at 2M rays x 25 cols)
        n = order.n
        out3 = jnp.stack([c.reshape(n // 128, 128) for c in out], axis=-1)
        out3 = out3[order.row_perm]
        out = [out3[..., i].reshape(n) for i in range(len(out))]

    res: list[Array] = []
    pos = 0
    for kind, dtype, k in specs:
        if kind == "f" and k > 1:
            res.append(jnp.stack(out[pos : pos + k], axis=-1).astype(dtype))
        elif kind == "f":
            res.append(out[pos].astype(dtype))
        elif kind == "b":
            res.append(out[pos] != 0.0)
        else:  # 32-bit int from 16-bit halves
            hi = out[pos].astype(_U32)
            lo = out[pos + 1].astype(_U32)
            res.append(((hi << _U32(16)) | lo).astype(dtype))
        pos += k
    return tuple(res)


def _gather_permute(idx: Array, arrays) -> tuple[Array, ...]:
    """Move every column of every array with ONE packed row-gather:
    bit-exact for f32/i32/u32 (bitcast transport) and bool (0/1 f32)."""
    cols: list[Array] = []
    specs: list[tuple] = []  # (dtype, ncomp)
    for a in arrays:
        k = a.shape[1] if a.ndim == 2 else 1
        x = a if a.ndim == 2 else a[:, None]
        if a.dtype == jnp.bool_:
            x = x.astype(jnp.float32)
        elif a.dtype != jnp.float32:
            x = jax.lax.bitcast_convert_type(x, jnp.float32)
        cols.append(x)
        specs.append((a.dtype, k, a.ndim))
    table = jnp.concatenate(cols, axis=1)
    out = table[idx]  # the one gather
    res: list[Array] = []
    pos = 0
    for dtype, k, ndim in specs:
        x = out[:, pos : pos + k]
        if dtype == jnp.bool_:
            x = x != 0.0
        elif dtype != jnp.float32:
            x = jax.lax.bitcast_convert_type(x, dtype)
        res.append(x[:, 0] if ndim == 1 else x)
        pos += k
    return tuple(res)


def apply_order(order, *arrays: Array) -> tuple[Array, ...]:
    """Permute arrays into coherence order.

    GlobalOrder: one packed row-gather (bit-exact for all dtypes).
    SegOrder fallback: one-hot MXU transport (ints ride as two f32
    halves), see _permute."""
    if isinstance(order, GlobalOrder):
        return _gather_permute(order.fwd, arrays)
    return _permute(order, arrays, transpose=False)


def unapply_order(order, *arrays: Array) -> tuple[Array, ...]:
    """Permute coherence-ordered arrays back to original order."""
    if isinstance(order, GlobalOrder):
        return _gather_permute(order.inv, arrays)
    return _permute(order, arrays, transpose=True)


def sort_wavefront(
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    root_lo: Array,
    root_hi: Array,
    arrays,
    probe: Array | None = None,
):
    """Coherence-sort a wavefront with the payload RIDING the sort.

    One multi-operand ``lax.sort`` moves the key plus every state column
    in a single pass — measured ~2x cheaper than argsort + packed
    row-gather at 2M rays (tools/ab job 041: ride-8 28 ms vs 61 ms).
    The probe-predicted wave balance (same as :func:`make_order`)
    composes as per-array ROW gathers, which are ~index-count-bound and
    effectively free at R/128 rows.

    ``arrays`` are (R,) or (R, k) of f32/i32/u32/bool.  Returns the
    sorted arrays in input order.  Falls back to
    make_order + apply_order when R is not whole 128-lane rows."""
    n = o.shape[0]
    if n % 128 != 0 or n <= 128:
        order = make_order(o, d, t_min, t_max, root_lo, root_hi, probe=probe)
        return apply_order(order, *arrays)

    keys = ray_sort_keys(o, d, t_min, t_max, root_lo, root_hi)
    masks = (
        probe_ray_mask(probe, o, d, t_min, t_max) if probe is not None else []
    )

    cols: list[Array] = []
    specs: list[tuple] = []  # (dtype, ncomp, ndim)
    for a in arrays:
        k = a.shape[1] if a.ndim == 2 else 1
        x = a if a.ndim == 2 else a[:, None]
        for j in range(k):
            cols.append(x[:, j])
        specs.append((a.dtype, k, a.ndim))

    # XLA's TPU sort lowering degrades pathologically past ~24 operands
    # (a 33-operand sort sat >25 min in compile; <=20 operands compile in
    # ~20 s and run ~30 ms at 2M rays — tools/ab job 048b).  Split the
    # payload into groups of <=16 and re-sort the same keys per group:
    # the sort is stable with identical keys, so every group rides the
    # identical permutation and the result is bitwise unchanged.
    group = 16
    allc = [*masks, *cols]
    riding: list[Array] = []
    for g in range(0, len(allc), group):
        outg = jax.lax.sort(
            (keys, *allc[g : g + group]), num_keys=1, is_stable=True
        )
        riding.extend(outg[1:])
    nm = len(masks)
    out = (keys, *riding)
    sorted_cols = list(out[1 + nm:])

    if probe is not None:
        # wave balance: regroup whole rows by predicted cost (union
        # breadth over the probe cut) — the bits rode the sort
        cost = jnp.zeros((n // 128,), jnp.int32)
        for sm in out[1 : 1 + nm]:
            union = jax.lax.reduce(
                sm.reshape(-1, 128), _U32(0), jax.lax.bitwise_or, (1,)
            )
            cost = cost + jax.lax.population_count(union).astype(jnp.int32)
        row_perm = jnp.argsort(cost).astype(jnp.int32)
        sorted_cols = [
            c.reshape(-1, 128)[row_perm].reshape(-1) for c in sorted_cols
        ]

    res: list[Array] = []
    pos = 0
    for dtype, k, ndim in specs:
        if ndim == 1:
            res.append(sorted_cols[pos])
        else:
            res.append(jnp.stack(sorted_cols[pos : pos + k], axis=1))
        pos += k
    return tuple(res)
