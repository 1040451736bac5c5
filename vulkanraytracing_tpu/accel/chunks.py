"""Out-of-core chunked BVH build — HBM streaming past the VMEM limit.

The reference's driver BVH has no scene-size ceiling (the hardware walks
HBM-resident nodes, AccelerationStructureManager.cpp:74-111).  The wide8
Pallas kernel, by contrast, keeps its whole unified table VMEM-resident,
which caps it at ``traverse_wide8.VMEM_TRI_LIMIT`` triangles.  This module
removes the cliff the TPU way: the triangle soup is split into K
spatially-local chunks (contiguous ranges of the global Morton order), a
BVH8 is built per chunk, and the per-chunk tables are stacked so the
traversal grid ``(n_waves, K)`` streams ONE chunk table at a time
HBM->VMEM — the pallas pipeline overlaps chunk k+1's table DMA with chunk
k's compute, and the kernel's best-t scratch carries across chunks as a
tightening t_max (see ``traverse_wide8._kernel`` ``chunked=True``).

The same build also emits a MERGED global BVH2 — a small top-level tree
over the K chunk roots, with each chunk's node ids and leaf codes offset
into a concatenated node/triangle space — so every non-streaming backend
(per-ray oracle, packet, 2-wide) and ``trace._root_bounds`` keep working
on the exact same scene object.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.accel import lbvh
from vulkanraytracing_tpu.accel.bvh8 import collapse_bvh8
from vulkanraytracing_tpu.scene.types import BVH, ChunkSet, Scene
from vulkanraytracing_tpu.utils import ScopeTime, log_d

# per-chunk triangle budget: table block = tris/8 rows * 512 B + node rows;
# 256k tris ~ 17 MB, x2 pipeline buffers stays far under the VMEM budget
DEFAULT_CHUNK_TRIS = 262_144


def _leaf_offset(child: np.ndarray, tri_start: int, node_off: int):
    """Offset one chunk's child codes into the merged space: interior ids
    shift by ``node_off``; leaf codes (~(start<<4|count)) shift their
    triangle start by ``tri_start``.  Padding rows (count 0, lbvh._DONE_PAD)
    pass through unchanged."""
    out = child.copy()
    interior = child >= 0
    out[interior] += node_off
    leaf = ~interior
    packed = ~child[leaf]
    count = packed & 15
    start = packed >> 4
    out[leaf] = np.where(
        count > 0, ~(((start + tri_start) << 4) | count), child[leaf]
    )
    return out


def _top_tree(root_lo: np.ndarray, root_hi: np.ndarray, root_ids: list[int]):
    """Balanced binary tree over the K chunk roots (already Morton-ordered).

    Returns (nodes (K-1, 12), child (K-1, 2)) with the tree root at row 0
    (the traversal entry invariant) — preorder allocation guarantees it."""
    k = len(root_ids)
    nodes = np.zeros((k - 1, 12), np.float32)
    child = np.zeros((k - 1, 2), np.int32)
    slot = [0]

    def build(lo: int, hi: int):
        if hi - lo == 1:
            return root_ids[lo], root_lo[lo], root_hi[lo]
        idx = slot[0]
        slot[0] += 1
        mid = (lo + hi) // 2
        lc, llo, lhi = build(lo, mid)
        rc, rlo, rhi = build(mid, hi)
        nodes[idx, 0:3], nodes[idx, 3:6] = llo, lhi
        nodes[idx, 6:9], nodes[idx, 9:12] = rlo, rhi
        child[idx] = (lc, rc)
        return idx, np.minimum(llo, rlo), np.maximum(lhi, rhi)

    build(0, k)
    return nodes, child


def build_scene_bvh_chunked(
    scene: Scene,
    chunk_tris: int = DEFAULT_CHUNK_TRIS,
    leaf_size: int = lbvh.LEAF_SIZE,
    builder: str = "sah",
) -> Scene | None:
    """Chunked build; returns None when it cannot run (traced inputs, or a
    chunk's BVH8 collapse was rejected) so the caller can fall back."""
    from vulkanraytracing_tpu.ops.traverse_wide8 import _unified_table8

    geometry = scene.geometry
    try:
        v0 = np.asarray(geometry.v0)
        e1 = np.asarray(geometry.e1)
        e2 = np.asarray(geometry.e2)
    except Exception:
        return None  # traced values — chunking is a host-side build
    t = v0.shape[0]
    k = -(-t // chunk_tris)
    if k <= 1:
        return None

    with ScopeTime(f"chunked BVH build ({t} tris, {k} chunks)"):
        # 1. global Morton order => chunks are spatially local ranges
        p1, p2 = v0 + e1, v0 + e2
        tri_lo = np.minimum(np.minimum(v0, p1), p2)
        tri_hi = np.maximum(np.maximum(v0, p1), p2)
        centroid = (tri_lo + tri_hi) * 0.5
        codes = np.asarray(
            lbvh.morton_codes(
                jnp.asarray(centroid),
                jnp.asarray(centroid.min(0)),
                jnp.asarray(centroid.max(0)),
            )
        )
        order = np.argsort(codes, kind="stable").astype(np.int32)
        geometry = jax.tree.map(lambda a: a[jnp.asarray(order)], geometry)

        # 2. per-chunk builds (existing builders + BVH8 collapse)
        starts = [min(i * chunk_tris, t) for i in range(k + 1)]
        sub_geoms, sub_bvhs = [], []
        for i in range(k):
            g_i = jax.tree.map(
                lambda a: a[starts[i] : starts[i + 1]], geometry
            )
            if builder == "sah":
                from vulkanraytracing_tpu.accel.sah import build_bvh_sah

                g_i, b_i = build_bvh_sah(g_i, leaf_size)
            else:
                g_i, b_i = lbvh.build_bvh(g_i, leaf_size)
            b_i = collapse_bvh8(b_i)
            if b_i.nodes8 is None:
                log_d(
                    f"chunked build: chunk {i} BVH8 collapse rejected; "
                    "falling back to the unchunked path"
                )
                return None
            sub_geoms.append(g_i)
            sub_bvhs.append(b_i)

        # 3. merged geometry / triangle tables (global order = morton order
        #    composed with each chunk's internal build order)
        merged_geom = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *sub_geoms
        )
        tris = jnp.concatenate([b.tris for b in sub_bvhs], axis=0)
        tri_flags = jnp.concatenate([b.tri_flags for b in sub_bvhs], axis=0)
        tri_order = jnp.asarray(
            np.concatenate(
                [
                    order[starts[i] + np.asarray(sub_bvhs[i].tri_order)]
                    for i in range(k)
                ]
            )
        )

        # 4. merged global BVH2: [top tree (K-1 rows) | chunk nodes...]
        top_rows = k - 1
        chunk_nodes = [np.asarray(b.nodes) for b in sub_bvhs]
        chunk_child = [np.asarray(b.child_index) for b in sub_bvhs]
        node_offs = np.cumsum([top_rows] + [n.shape[0] for n in chunk_nodes])
        root_lo = np.stack(
            [np.minimum(n[0, 0:3], n[0, 6:9]) for n in chunk_nodes]
        )
        root_hi = np.stack(
            [np.maximum(n[0, 3:6], n[0, 9:12]) for n in chunk_nodes]
        )
        top_nodes, top_child = _top_tree(
            root_lo, root_hi, [int(node_offs[i]) for i in range(k)]
        )
        nodes = jnp.asarray(
            np.concatenate([top_nodes] + chunk_nodes, axis=0)
        )
        child_index = jnp.asarray(
            np.concatenate(
                [top_child]
                + [
                    _leaf_offset(chunk_child[i], starts[i], int(node_offs[i]))
                    for i in range(k)
                ],
                axis=0,
            )
        )

        # 5. stacked streaming tables, one per chunk, padded to a common
        #    [nr_max nodes | sentinel | tr_max tris] layout
        raw = []
        for i in range(k):
            table, m = _unified_table8(sub_bvhs[i], tid_offset=starts[i])
            raw.append((np.asarray(table), int(m)))
        nr_max = max(m for _, m in raw)
        tr_max = max(tab.shape[0] - m - 1 for tab, m in raw)
        lanes = raw[0][0].shape[1]
        # Mosaic requires VMEM block rows divisible by 8: the kernel's chunk
        # BlockSpec is (rows_per_chunk, 128), so pad the common layout up
        # (trailing zero rows are never addressed)
        rows = -(-(nr_max + 1 + tr_max) // 8) * 8
        stacked = np.zeros((k, rows, lanes), np.int32)
        for i, (tab, m) in enumerate(raw):
            stacked[i, :m] = tab[:m]                      # node records
            stacked[i, nr_max] = tab[m]                   # sentinel row
            stacked[i, nr_max + 1 : nr_max + 1 + tab.shape[0] - m - 1] = (
                tab[m + 1 :]
            )
        chunks = ChunkSet(jnp.asarray(stacked), nr_max)
        log_d(
            f"chunked BVH: {k} chunks, table {stacked.shape} "
            f"({stacked.nbytes / 1e6:.1f} MB), node rows {nr_max}"
        )

    from vulkanraytracing_tpu.accel.lbvh import probe_cut

    bvh = BVH(
        nodes=nodes,
        child_index=child_index,
        tris=tris,
        tri_flags=tri_flags,
        tri_order=tri_order,
        chunks=chunks,
        probe=probe_cut(nodes, child_index),
    )
    return scene._replace(geometry=merged_geom, bvh=bvh)
