"""On-device LBVH builder — the acceleration-structure component.

This replaces VK_KHR_acceleration_structure BLAS/TLAS builds
(Source/Engine/Render/Vulkan/Private/AccelerationStructureManager.cpp:74-192:
size query -> scratch buffers -> driver buildAccelerationStructuresKHR with
ePreferFastTrace).  On TPU the driver doesn't exist, so the builder is the
classic GPU-friendly LBVH pipeline (Karras 2012, "Maximizing Parallelism in
the Construction of BVHs, Octrees, and k-d Trees"), expressed entirely in
XLA-friendly vectorized ops:

1. triangle AABBs + centroids                        (dense VPU map)
2. 30-bit Morton codes of quantized centroids        (bit interleave)
3. stable sort                                       (XLA sort)
4. Karras binary-radix hierarchy                     (vectorized binary
   searches over common-prefix lengths, index-tiebroken so duplicate codes
   are fine)
5. bottom-up AABB refit                              (while_loop until all
   internal nodes have absorbed their children)
6. leaf collapse: subtrees spanning <= LEAF_SIZE morton-contiguous
   triangles are re-encoded as leaf ranges, shrinking traversal depth.

The output layout is traversal-oriented: each internal node packs both
children's AABBs + ids into one 64-byte record (ONE gather per traversal
step), and triangles are packed into 48-byte records (v0, e1, e2, flags) in
Morton order.  Because the builder is pure jit-able JAX it runs on-device at
scene load and can re-run per frame for animated geometry (the refit path of
the reference's instance TLAS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.scene.types import BVH, Scene, TraceGeometry

_I32 = jnp.int32
_U32 = jnp.uint32

# Max triangles per collapsed leaf; 4 bits of the leaf encoding hold the
# count, so this must stay <= 15.  The traversal kernels unroll exactly
# this many Moller-Trumbore tests per leaf visit.  For the gen-2 subpacket
# kernel 4 measured faster than 8 (leaf vector work dominated); for the
# production wide8 kernel the scarce resource is loop TRIPS, and 8 measured
# ~6% faster on Sponza-class scenes (fewer leaf+interior visits, and half
# the leaf nodes feeding the BVH8 collapse).
LEAF_SIZE = 8


def encode_leaf(start: Array, count: Array) -> Array:
    """Leaf child id: negative int packing (start, count)."""
    return ~((start << 4) | count)


def decode_leaf(idx: Array) -> tuple[Array, Array]:
    packed = ~idx
    return packed >> 4, packed & 15


def _expand_bits_10(v: Array) -> Array:
    """Spread 10 bits to every third bit position (Morton interleave)."""
    v = v.astype(_U32)
    v = (v | (v << _U32(16))) & _U32(0x030000FF)
    v = (v | (v << _U32(8))) & _U32(0x0300F00F)
    v = (v | (v << _U32(4))) & _U32(0x030C30C3)
    v = (v | (v << _U32(2))) & _U32(0x09249249)
    return v


def morton_codes(centroids: Array, lo: Array, hi: Array) -> Array:
    """30-bit Morton codes of points quantized into [lo, hi] (1024^3 grid)."""
    extent = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((centroids - lo) / extent, 0.0, 0.99999994)
    cells = jnp.minimum((q * 1024.0).astype(_U32), _U32(1023))
    return (
        (_expand_bits_10(cells[:, 0]) << _U32(2))
        | (_expand_bits_10(cells[:, 1]) << _U32(1))
        | _expand_bits_10(cells[:, 2])
    )


def _delta_codes(codes: Array, i: Array, j: Array, n: int) -> Array:
    """Common-prefix length delta(i, j) over the conceptual 64-bit key
    (code << 32 | index) — the standard duplicate-code tiebreak — computed
    as two chained 32-bit clz's (uint64 is unavailable without x64).
    Out-of-range j yields -1."""
    j_in = (j >= 0) & (j < n)
    j_safe = jnp.clip(j, 0, n - 1)
    x = codes[i] ^ codes[j_safe]
    ix = (i.astype(_U32)) ^ (j_safe.astype(_U32))
    clz_code = jax.lax.clz(x).astype(_I32)
    clz_idx = jax.lax.clz(ix).astype(_I32)
    delta = jnp.where(x != 0, clz_code, 32 + clz_idx)
    return jnp.where(j_in, delta, -1)


def karras_hierarchy(codes: Array) -> tuple[Array, Array, Array, Array]:
    """Build the binary radix tree over sorted Morton codes.

    Returns (child_left, child_right, range_lo, range_hi) for the n-1
    internal nodes; child >= 0 is an internal node id, child < 0 is a
    single-triangle leaf: tri = ~child (collapse re-encodes these).
    range_lo/hi is the contiguous sorted-triangle span each node covers.
    Node 0 is the root."""
    n = codes.shape[0]
    i = jnp.arange(n - 1, dtype=_I32)

    delta = functools.partial(_delta_codes, codes, n=n)

    # static iteration bound: ranges are at most n long
    k_iters = max(int(n - 1).bit_length() + 1, 2)

    # direction of the range containing i
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(_I32)
    d = jnp.where(d == 0, 1, d)

    # upper bound for range length via exponential search (fixed trip count —
    # the search is monotone, so extra iterations are no-ops)
    delta_min = delta(i, i - d)
    lmax = jnp.full_like(i, 2)
    for _ in range(k_iters):
        lmax = jnp.where(delta(i, i + lmax * d) > delta_min, lmax * 2, lmax)

    # binary search the exact range end
    l = jnp.zeros_like(i)
    t = lmax // 2
    for _ in range(k_iters):
        cond = (t > 0) & (delta(i, i + (l + t) * d) > delta_min)
        l = jnp.where(cond, l + t, l)
        t = t // 2
    j = i + l * d  # other end of the range

    # binary search the split position (highest differing bit inside range)
    delta_node = delta(i, j)
    s = jnp.zeros_like(i)
    t = -(-l // 2)  # ceil(l/2)
    for _ in range(k_iters):
        cond = (t > 0) & (delta(i, i + (s + t) * d) > delta_node)
        s = jnp.where(cond, s + t, s)
        t = jnp.where(t > 1, -(-t // 2), 0)
    gamma = i + s * d + jnp.minimum(d, 0)

    range_lo = jnp.minimum(i, j)
    range_hi = jnp.maximum(i, j)
    left_is_leaf = range_lo == gamma
    right_is_leaf = range_hi == gamma + 1
    child_left = jnp.where(left_is_leaf, ~gamma, gamma)
    child_right = jnp.where(right_is_leaf, ~(gamma + 1), gamma + 1)
    return (
        child_left.astype(_I32),
        child_right.astype(_I32),
        range_lo.astype(_I32),
        range_hi.astype(_I32),
    )


def refit_aabbs(
    child_left: Array,
    child_right: Array,
    leaf_lo: Array,
    leaf_hi: Array,
) -> tuple[Array, Array]:
    """Bottom-up AABB propagation.

    Iterates parent <- union(children) until every internal node is ready
    (height-of-tree iterations; a while_loop on the aliveness of unready
    nodes).  Returns per-internal-node AABBs (N-1, 3) lo/hi."""
    n_int = child_left.shape[0]

    def child_box(child, lo, hi, ready):
        is_leaf = child < 0
        tri = jnp.where(is_leaf, ~child, 0)
        node = jnp.where(is_leaf, 0, child)
        c_lo = jnp.where(is_leaf[:, None], leaf_lo[tri], lo[node])
        c_hi = jnp.where(is_leaf[:, None], leaf_hi[tri], hi[node])
        c_ready = is_leaf | ready[node]
        return c_lo, c_hi, c_ready

    def body(state):
        lo, hi, ready = state
        l_lo, l_hi, l_ready = child_box(child_left, lo, hi, ready)
        r_lo, r_hi, r_ready = child_box(child_right, lo, hi, ready)
        now = l_ready & r_ready
        new_lo = jnp.where(now[:, None], jnp.minimum(l_lo, r_lo), lo)
        new_hi = jnp.where(now[:, None], jnp.maximum(l_hi, r_hi), hi)
        return new_lo, new_hi, ready | now

    def cond(state):
        return ~jnp.all(state[2])

    init = (
        jnp.full((n_int, 3), jnp.inf, jnp.float32),
        jnp.full((n_int, 3), -jnp.inf, jnp.float32),
        jnp.zeros((n_int,), bool),
    )
    lo, hi, _ = jax.lax.while_loop(cond, body, init)
    return lo, hi


def _pack_tris(geometry: TraceGeometry) -> tuple[Array, Array]:
    """(T, 12) packed float triangle records (v0, e1, e2, 3 pads) plus a
    separate (T,) int32 flags array: bit0 cull_disable, bit1 opaque
    (commits), bit2 alpha_test (candidate needing a texture alpha test).
    Flags stay integer — bitcasting small ints into float slots produces
    denormals that XLA flushes to zero outside jit."""
    flags = (
        geometry.cull_disable.astype(_I32)
        | (geometry.opaque.astype(_I32) << 1)
        | (geometry.alpha_test.astype(_I32) << 2)
    )
    t = geometry.v0.shape[0]
    pad = jnp.zeros((t, 3), jnp.float32)
    tris = jnp.concatenate(
        [geometry.v0, geometry.e1, geometry.e2, pad], axis=1
    )
    return tris, flags


@functools.partial(jax.jit, static_argnames=("leaf_size",))
def build_bvh(
    geometry: TraceGeometry, leaf_size: int = LEAF_SIZE
) -> tuple[TraceGeometry, BVH]:
    """Build the LBVH and return (morton-permuted geometry, BVH).

    The triangle arrays are permuted into Morton order so that leaves are
    contiguous ranges of triangle ids — one indirection less per traversal
    step, and leaf gathers read adjacent HBM rows."""
    # traversal kernels unroll LEAF_SIZE triangle tests per leaf visit
    assert 1 <= leaf_size <= LEAF_SIZE
    v0, e1, e2 = geometry.v0, geometry.e1, geometry.e2
    p1 = v0 + e1
    p2 = v0 + e2
    tri_lo = jnp.minimum(jnp.minimum(v0, p1), p2)
    tri_hi = jnp.maximum(jnp.maximum(v0, p1), p2)
    centroid = (tri_lo + tri_hi) * 0.5

    scene_lo = jnp.min(tri_lo, axis=0)
    scene_hi = jnp.max(tri_hi, axis=0)

    codes = morton_codes(centroid, scene_lo, scene_hi)
    order = jnp.argsort(codes, stable=True).astype(_I32)
    codes = codes[order]

    geometry = jax.tree.map(lambda a: a[order], geometry)
    tri_lo = tri_lo[order]
    tri_hi = tri_hi[order]

    n = codes.shape[0]
    if n == 1:
        leaf = encode_leaf(jnp.zeros((1,), _I32), jnp.ones((1,), _I32))
        child_index = jnp.stack([leaf, leaf], axis=1)
        child_lo = jnp.stack([tri_lo, tri_lo], axis=1)
        child_hi = jnp.stack([tri_hi, tri_hi], axis=1)
    else:
        child_left, child_right, range_lo, range_hi = karras_hierarchy(codes)
        node_lo, node_hi = refit_aabbs(child_left, child_right, tri_lo, tri_hi)

        def collapse(child):
            """Re-encode children whose subtree fits in one leaf."""
            is_leaf = child < 0
            node = jnp.where(is_leaf, 0, child)
            start = range_lo[node]
            count = range_hi[node] - start + 1
            small = ~is_leaf & (count <= leaf_size)
            single = encode_leaf(jnp.where(is_leaf, ~child, 0), jnp.ones_like(child))
            ranged = encode_leaf(start, count)
            return jnp.where(is_leaf, single, jnp.where(small, ranged, child))

        def child_aabb(child):
            is_leaf = child < 0
            node = jnp.where(is_leaf, 0, child)
            tri = jnp.where(is_leaf, ~child, 0)
            lo = jnp.where(is_leaf[:, None], tri_lo[tri], node_lo[node])
            hi = jnp.where(is_leaf[:, None], tri_hi[tri], node_hi[node])
            return lo, hi

        l_lo, l_hi = child_aabb(child_left)
        r_lo, r_hi = child_aabb(child_right)
        child_index = jnp.stack([collapse(child_left), collapse(child_right)], axis=1)
        child_lo = jnp.stack([l_lo, r_lo], axis=1)
        child_hi = jnp.stack([l_hi, r_hi], axis=1)

    nodes = jnp.concatenate(
        [
            child_lo[:, 0], child_hi[:, 0],
            child_lo[:, 1], child_hi[:, 1],
        ],
        axis=1,
    )
    nodes, child_index = pad_nodes(nodes, child_index, n)

    tris, tri_flags = _pack_tris(geometry)
    bvh = BVH(
        nodes=nodes,
        child_index=child_index,
        tris=tris,
        tri_flags=tri_flags,
        tri_order=order,
    )
    return geometry, bvh


def pad_nodes(nodes: Array, child_index: Array, num_tris: int):
    """Pad node arrays to exactly ``num_tris`` rows.

    Every builder (LBVH: num_tris-1 nodes; SAH: fewer, thanks to multi-tri
    leaves) emits the same node-array shape for a given triangle count, so
    switching builders or refitting never changes jit signatures — which
    both avoids recompiles and sidesteps a jax 0.9 executable-resolution
    bug observed when re-tracing with a different node count
    ("Execution supplied N buffers but compiled program expected M").
    Padding rows are unreachable (the root never links to them)."""
    pad = num_tris - nodes.shape[0]
    if pad <= 0:
        return nodes, child_index
    nodes = jnp.concatenate(
        [nodes, jnp.zeros((pad, nodes.shape[1]), nodes.dtype)], axis=0
    )
    child_index = jnp.concatenate(
        [child_index, jnp.full((pad, 2), _DONE_PAD, child_index.dtype)], axis=0
    )
    return nodes, child_index


_DONE_PAD = -1  # leaf code decoding to (start 0, count 0): never matches


def probe_cut(nodes, child_index, cap: int = 128):
    """Adaptive upper-tree cut of ~``cap`` child AABBs (host-side numpy).

    Greedy largest-area-first expansion (same rule as the BVH8 collapse):
    the resulting box set approximates the tree's top levels with detail
    where the tree is spatially large.  ops.reorder counts, per 128-ray
    traversal row, how many of these boxes any lane enters — a cheap
    predictor of the row's union traversal cost, used to fill waves with
    similar-cost rows (stragglers gate each wave's trip count)."""
    import numpy as np

    nodes = np.asarray(nodes)
    child_index = np.asarray(child_index)

    def area(b):
        d = np.maximum(b[3:6] - b[0:3], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    # entries: (area, box(6), child_code)
    entries = [
        (area(nodes[0, 6 * i : 6 * i + 6]), nodes[0, 6 * i : 6 * i + 6],
         int(child_index[0, i]))
        for i in range(2)
    ]
    while len(entries) < cap:
        best, best_a = -1, -1.0
        for i, (a, _b, c) in enumerate(entries):
            if c >= 0 and a > best_a:
                best, best_a = i, a
        if best < 0:
            break
        _a, _b, n = entries.pop(best)
        for i in range(2):
            box = nodes[n, 6 * i : 6 * i + 6]
            entries.append((area(box), box, int(child_index[n, i])))
    return jnp.asarray(np.stack([b for _a, b, _c in entries]))


def build_scene_bvh(
    scene: Scene,
    leaf_size: int = LEAF_SIZE,
    builder: str = "lbvh",
    chunk_tris: int | None = None,
) -> Scene:
    """Permute the scene geometry and attach its BVH.

    builder: "lbvh" (on-device, fast build/refit) or "sah" (native C++
    binned SAH, higher-quality trees for static scenes — the
    ePreferFastTrace analog).

    Scenes past the wide8 kernel's VMEM triangle limit are built CHUNKED
    (accel.chunks): per-chunk BVH8 streaming tables plus a merged global
    BVH2, so the production Pallas path keeps running instead of silently
    degrading to the packet fallback.  ``chunk_tris`` forces a chunk size
    (used by tests); None auto-chunks only past the VMEM limit."""
    host_built = not isinstance(scene.geometry.v0, jax.core.Tracer)
    if chunk_tris is None and host_built:
        from vulkanraytracing_tpu.ops.traverse_wide8 import VMEM_TRI_LIMIT

        if scene.geometry.num_triangles > VMEM_TRI_LIMIT:
            from vulkanraytracing_tpu.accel.chunks import DEFAULT_CHUNK_TRIS

            chunk_tris = DEFAULT_CHUNK_TRIS
    if chunk_tris is not None and scene.geometry.num_triangles > chunk_tris:
        from vulkanraytracing_tpu.accel.chunks import build_scene_bvh_chunked

        out = build_scene_bvh_chunked(
            scene, chunk_tris, leaf_size=leaf_size,
            builder="sah" if builder == "sah" else "lbvh",
        )
        if out is not None:
            return out
    if builder == "sah":
        from vulkanraytracing_tpu.accel.sah import build_bvh_sah

        geometry, bvh = build_bvh_sah(scene.geometry, leaf_size)
    else:
        geometry, bvh = build_bvh(scene.geometry, leaf_size)
    from vulkanraytracing_tpu.accel.bvh8 import collapse_bvh8

    bvh = collapse_bvh8(bvh)  # host-side; no-op under trace
    if host_built and bvh.probe is None:
        bvh = bvh._replace(probe=probe_cut(bvh.nodes, bvh.child_index))
    scene = scene._replace(geometry=geometry, bvh=bvh)
    if host_built:
        scene = _attach_alpha_set(scene, leaf_size, builder)
    return scene


def _attach_alpha_set(scene: Scene, leaf_size: int, builder: str) -> Scene:
    """Build the foliage-only tree (scene.types.AlphaScene) when the scene
    carries alpha-tested triangles: ops.trace then splits every traversal
    into an opaque phase over the main BVH (cutouts non-candidates) plus a
    cheap alpha phase over this subset — the wavefront replacement for the
    driver's inline any-hit shader (AnyHit.rahit:33-60)."""
    import numpy as np

    from vulkanraytracing_tpu.scene.types import AlphaScene

    at = np.asarray(scene.geometry.alpha_test)
    if not at.any():
        return scene
    alpha_idx = jnp.asarray(np.nonzero(at)[0].astype(np.int32))
    sub_geom = jax.tree.map(lambda a: a[alpha_idx], scene.geometry)
    if builder == "sah":
        from vulkanraytracing_tpu.accel.sah import build_bvh_sah

        sub_geom, sub_bvh = build_bvh_sah(sub_geom, leaf_size)
    else:
        sub_geom, sub_bvh = build_bvh(sub_geom, leaf_size)
    from vulkanraytracing_tpu.accel.bvh8 import collapse_bvh8

    sub_bvh = collapse_bvh8(sub_bvh)
    if sub_bvh.probe is None:
        sub_bvh = sub_bvh._replace(
            probe=probe_cut(sub_bvh.nodes, sub_bvh.child_index)
        )
    tri_map = alpha_idx[sub_bvh.tri_order]
    return scene._replace(
        alpha=AlphaScene(geometry=sub_geom, bvh=sub_bvh, tri_map=tri_map)
    )
