"""ops.reorder: gather-free segment-local wavefront reordering.

The permutation machinery must be BIT-EXACT (RNG seeds and pixel indices
ride it), stable, and agree with a plain numpy per-segment argsort.
"""

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.ops import reorder


def _np_segment_order(keys, seg):
    """Reference: stable argsort within each segment."""
    order = np.empty_like(keys, dtype=np.int64)
    for s in range(0, keys.shape[0], seg):
        order[s : s + seg] = s + np.argsort(keys[s : s + seg], kind="stable")
    return order


def test_seg_ranks_match_stable_argsort():
    rng = np.random.default_rng(0)
    seg, n = 256, 1024
    keys = rng.integers(0, 1 << 10, size=n, dtype=np.uint32)  # ties likely
    ranks = np.asarray(reorder.seg_ranks(jnp.asarray(keys), seg))
    order = _np_segment_order(keys, seg)
    # element at original position order[p] lands at slot p
    for s in range(0, n, seg):
        np.testing.assert_array_equal(
            ranks[order[s : s + seg]] + s, np.arange(s, s + seg)
        )


def test_apply_order_matches_gather_all_dtypes():
    rng = np.random.default_rng(1)
    seg, n = 512, 2048
    keys = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    order_np = _np_segment_order(keys, seg)
    order = reorder.SegOrder(
        ranks=reorder.seg_ranks(jnp.asarray(keys), seg), seg=seg
    )

    f1 = rng.random(n).astype(np.float32) * 1e6 - 5e5
    f3 = rng.random((n, 3)).astype(np.float32)
    u32 = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)  # full range
    i32 = rng.integers(0, 1 << 21, size=n, dtype=np.int32)
    bl = rng.random(n) < 0.5

    of1, of3, ou, oi, ob = reorder.apply_order(
        order, jnp.asarray(f1), jnp.asarray(f3), jnp.asarray(u32),
        jnp.asarray(i32), jnp.asarray(bl),
    )
    np.testing.assert_array_equal(np.asarray(of1), f1[order_np])
    np.testing.assert_array_equal(np.asarray(of3), f3[order_np])
    np.testing.assert_array_equal(np.asarray(ou), u32[order_np])
    np.testing.assert_array_equal(np.asarray(oi), i32[order_np])
    np.testing.assert_array_equal(np.asarray(ob), bl[order_np])
    assert ou.dtype == jnp.uint32 and oi.dtype == jnp.int32
    assert ob.dtype == jnp.bool_


def test_unapply_roundtrip():
    rng = np.random.default_rng(2)
    seg, n = 256, 1536
    keys = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    order = reorder.SegOrder(
        ranks=reorder.seg_ranks(jnp.asarray(keys), seg), seg=seg
    )
    x = rng.random((n, 3)).astype(np.float32)
    u = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    xs, us = reorder.apply_order(order, jnp.asarray(x), jnp.asarray(u))
    xb, ub = reorder.unapply_order(order, xs, us)
    np.testing.assert_array_equal(np.asarray(xb), x)
    np.testing.assert_array_equal(np.asarray(ub), u)


def test_make_order_compacts_dead_and_orders_rows():
    rng = np.random.default_rng(3)
    n = 8192  # > SEG so the row-global pass is active
    o = rng.random((n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    t_min = np.full(n, 1e-3, np.float32)
    t_max = np.where(rng.random(n) < 0.3, 0.0, 1e3).astype(np.float32)
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    order = reorder.make_order(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
        jnp.asarray(t_max), lo, hi,
    )
    # whole-row wavefronts get the TRUE global sort
    assert isinstance(order, reorder.GlobalOrder)
    keys = np.asarray(
        reorder.ray_sort_keys(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
            jnp.asarray(t_max), lo, hi,
        )
    )
    (keys_s,) = reorder.apply_order(order, jnp.asarray(keys))
    (tmax_s,) = reorder.apply_order(order, jnp.asarray(t_max))
    keys_s = np.asarray(keys_s)
    tmax_s = np.asarray(tmax_s)
    # keys ascend globally (no probe given => pure key order)
    assert (np.diff(keys_s.astype(np.int64)) >= 0).all()
    # dead rays (dead bit = key MSB) form a contiguous global tail
    dead = tmax_s == 0.0
    if dead.any():
        first = int(np.argmax(dead))
        assert dead[first:].all()
        assert dead.sum() >= 1


def test_make_order_odd_sizes():
    # n not a whole number of 128-ray rows: SegOrder fallback
    n = 832  # 6.5 rows
    rng = np.random.default_rng(4)
    o = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    t = jnp.full((n,), 1e-3)
    tm = jnp.full((n,), 1e3)
    order = reorder.make_order(o, d, t, tm, jnp.zeros(3), jnp.ones(3))
    assert isinstance(order, reorder.SegOrder)
    assert n % order.seg == 0
    (o2,) = reorder.apply_order(order, o)
    (o3,) = reorder.unapply_order(order, o2)
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(o))


def test_make_order_probe_row_cost():
    """Probe-costed GlobalOrder: rows regroup by ascending predicted cost
    (union breadth over the probe cut), rays stay key-sorted within rows,
    and all dtypes round-trip bit-exactly through the permutation."""
    rng = np.random.default_rng(7)
    n = 4096
    o = jnp.asarray((rng.random((n, 3)) * 2 - 1).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    t = jnp.full((n,), 1e-3, jnp.float32)
    tm = jnp.full((n,), 1e3, jnp.float32)
    lo, hi = jnp.full(3, -1.0), jnp.full(3, 1.0)
    # a probe cut of 40 boxes scattered inside the root bounds
    centers = (rng.random((40, 3)) * 1.6 - 0.8).astype(np.float32)
    probe = jnp.asarray(
        np.concatenate([centers - 0.15, centers + 0.15], axis=1)
    )
    order = reorder.make_order(o, d, t, tm, lo, hi, probe=probe)
    assert isinstance(order, reorder.GlobalOrder)

    o2, d2, t2, tm2 = reorder.apply_order(order, o, d, t, tm)
    cost = np.asarray(reorder.probe_row_cost(probe, o2, d2, t2, tm2))
    assert (np.diff(cost) >= 0).all(), "rows must ascend by predicted cost"

    # round-trip exactness across dtypes
    u = jnp.asarray(rng.integers(0, 2**32, size=(n,), dtype=np.uint32))
    b = jnp.asarray(rng.random(n) > 0.5)
    out = reorder.apply_order(order, o, u, b)
    back = reorder.unapply_order(order, *out)
    for x, y in zip((o, u, b), back):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sort_wavefront_matches_make_order_apply():
    """sort_wavefront (payload rides one multi-operand lax.sort) produces
    EXACTLY make_order + apply_order's output — same stable key sort,
    same probe row regroup — for every dtype, with and without a probe."""
    rng = np.random.default_rng(11)
    n = 4096
    o = jnp.asarray((rng.random((n, 3)) * 2 - 1).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    t = jnp.full((n,), 1e-3, jnp.float32)
    tm = jnp.full((n,), 1e3, jnp.float32)
    lo, hi = jnp.full(3, -1.0), jnp.full(3, 1.0)
    u = jnp.asarray(rng.integers(0, 2**32, size=(n,), dtype=np.uint32))
    b = jnp.asarray(rng.random(n) > 0.5)
    i = jnp.arange(n, dtype=jnp.int32)
    arrays = (o, d, t, tm, u, b, i)

    centers = (rng.random((40, 3)) * 1.6 - 0.8).astype(np.float32)
    probe = jnp.asarray(
        np.concatenate([centers - 0.15, centers + 0.15], axis=1)
    )
    for pr in (None, probe):
        order = reorder.make_order(o, d, t, tm, lo, hi, probe=pr)
        want = reorder.apply_order(order, *arrays)
        got = reorder.sort_wavefront(o, d, t, tm, lo, hi, arrays, probe=pr)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
