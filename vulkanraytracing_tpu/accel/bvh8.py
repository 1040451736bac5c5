"""Host-side BVH2 -> BVH8 collapse.

The reference leans on the driver's hardware BVH (ePreferFastTrace,
Source/Engine/Render/Vulkan/Private/AccelerationStructureManager.cpp:15).
On TPU the traversal kernel's cost is per *node visit* (one table-row fetch
+ one while-trip slot), so wider nodes buy a near-linear cut in visits: an
8-wide node retires up to 3 BVH2 levels per fetch, and its record fills one
full 128-lane row (48 AABB floats + 8 child ids), which also removes the
lane roll the 2-wide path needs.

Collapse rule (classic SAH-greedy): start from a BVH2 interior node's two
children and repeatedly expand the interior slot with the largest surface
area until 8 slots are filled or all slots are leaves.  Slots are emitted
largest-area first so the traversal's static child priority visits likely
hits early.  Empty slots get a degenerate far box (lo = hi = +big):
under the kernel's min/max slab form the per-axis entry/exit collapse to
the same +-3e38 value, so the test rejects every ray.  (An *inverted* box
lo > hi would be WRONG there — min/max slabs accept inverted boxes for
all rays.)

Leaf codes pass through unchanged (accel.lbvh encoding: ~(start<<4|count)
over Morton-ordered triangles), so the 8-wide kernel shares the triangle
table and leaf pipeline with the 2-wide one.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from vulkanraytracing_tpu.scene.types import BVH
from vulkanraytracing_tpu.utils import ScopeTime, log_d

_BIG = np.float32(3.0e38)

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB: ctypes.CDLL | None = None


def _load_library() -> ctypes.CDLL | None:
    """Compile-on-demand ctypes bridge (same pattern as accel/sah.py)."""
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        src = _NATIVE_DIR / "bvh8_collapse.cpp"
        so = _NATIVE_DIR / "build" / "libbvh8_collapse.so"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            so.parent.mkdir(exist_ok=True)
            with ScopeTime("compile bvh8_collapse"):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(so), str(src)],
                    check=True,
                )
        lib = ctypes.CDLL(str(so))
        lib.collapse_bvh8.restype = ctypes.c_int
        lib.collapse_bvh8.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # nodes (n, 12)
            ctypes.POINTER(ctypes.c_int),    # child (n, 2)
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),  # nodes8 out (n, 48)
            ctypes.POINTER(ctypes.c_int),    # child8 out (n, 8)
        ]
        _LIB = lib
    except Exception as e:  # no toolchain — Python fallback
        log_d(f"bvh8 native collapse unavailable ({e}); using Python")
        _LIB = None
    return _LIB


def _collapse_native(nodes: np.ndarray, child: np.ndarray):
    lib = _load_library()
    if lib is None:
        return None
    n = nodes.shape[0]
    nodes = np.ascontiguousarray(nodes, np.float32)
    child = np.ascontiguousarray(child, np.int32)
    nodes8 = np.empty((n, 48), np.float32)
    child8 = np.empty((n, 8), np.int32)
    m = lib.collapse_bvh8(
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        child.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        nodes8.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        child8.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return nodes8[:m].copy(), child8[:m].copy()


def _worst_case_stack(child8: np.ndarray) -> int:
    """Worst-case traversal stack need for this BVH8.

    An interior visit at depth d can leave up to 7 sibling entries per
    ancestor level on the stack, plus one leaf row-continuation — so the
    bound is 7*(max_depth+1) + 1.  Both collapse paths emit nodes in BFS
    order (parent id < child id), so one forward pass computes depth.
    Entries == 0 are empty slots (the root is never a child); entries < 0
    are leaf codes."""
    m = child8.shape[0]
    depth = np.zeros(m, np.int32)
    for i in range(m):
        for c in child8[i]:
            if c > 0:
                depth[c] = depth[i] + 1
    return int(7 * (depth.max() + 1) + 1) if m else 1


def _align_leaves(child8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row-aligned leaf triangle layout for the 8-wide unified table.

    The builders pack leaf ranges back-to-back over the sorted triangle
    order, so a leaf's 8 slots usually straddle TWO table rows — the
    kernel's leaf block tests all 8 slots of every row it touches, which
    measured 1.72 rows/leaf and 48.8% slot utilization on the 262k bench
    scene (tools/ab job 044).  Aligning every leaf to its own row makes a
    leaf visit exactly one row at ~84% utilization.

    Returns (child8 with rewritten leaf codes, tri_perm8) where
    tri_perm8[i] is the sorted-order triangle for aligned slot i
    (-1 = padding)."""
    from vulkanraytracing_tpu.ops.traverse_wide8 import TRIS_PER_ROW

    leaf_m = child8 < 0
    if not leaf_m.any():
        return child8, np.zeros((0,), np.int32)
    enc = ~child8[leaf_m]
    starts = enc >> 4
    counts = enc & 15
    # Leaf alignment requires leaves of <= TRIS_PER_ROW (8) tris; the
    # previous layout handled up to 16 via row continuation.  A builder
    # configured with leaf_size > 8 must not crash deep in the collapse —
    # refuse alignment and let the caller keep the unaligned layout.
    if counts.max() > TRIS_PER_ROW:
        raise ValueError(
            f"leaf alignment requires leaf_size <= {TRIS_PER_ROW} "
            f"(got a {counts.max()}-tri leaf); build with a smaller "
            f"leaf_size or skip the bvh8 collapse"
        )
    uniq, inv = np.unique(starts, return_inverse=True)
    # identical start must imply identical count, or last-write-wins
    # below would silently mis-size a leaf
    npairs = np.unique(np.stack([starts, counts], axis=1), axis=0).shape[0]
    assert npairs == uniq.shape[0], "leaf ranges share a start with differing counts"
    ucounts = np.zeros_like(uniq)
    ucounts[inv] = counts
    n = uniq.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), TRIS_PER_ROW)
    slots = np.tile(np.arange(TRIS_PER_ROW, dtype=np.int64), n)
    valid = slots < ucounts[rows]
    perm = np.full(n * TRIS_PER_ROW, -1, np.int32)
    perm[valid] = (uniq[rows] + slots)[valid].astype(np.int32)

    new_start = (np.arange(n, dtype=np.int64) * TRIS_PER_ROW)[inv]
    new_enc = ~((new_start << 4) | counts).astype(np.int64)
    out = child8.copy()
    out[leaf_m] = new_enc.astype(np.int32)
    return out, perm


def _attach(bvh: BVH, nodes8: np.ndarray, child8: np.ndarray) -> BVH:
    from vulkanraytracing_tpu.ops.traverse_wide8 import STACK_DEPTH

    need = _worst_case_stack(child8)
    if need > STACK_DEPTH:
        # The wide8 kernel's push guard silently DROPS overflowing entries
        # (missed intersections).  Refuse the collapse; trace dispatch then
        # falls back to the 2-wide kernel, whose bound (2/level) fits.
        log_d(
            f"bvh8 collapse rejected: worst-case stack {need} > "
            f"{STACK_DEPTH}; falling back to the 2-wide kernel"
        )
        return bvh

    import jax.numpy as jnp

    try:
        child8, perm8 = _align_leaves(child8)
    except ValueError as e:
        # leaf_size > TRIS_PER_ROW: the 8-wide table can't row-align these
        # leaves — fall back to the 2-wide kernel instead of crashing
        log_d(f"bvh8 collapse rejected: {e}")
        return bvh
    return bvh._replace(
        nodes8=jnp.asarray(nodes8),
        child8=jnp.asarray(child8),
        tri_perm8=jnp.asarray(perm8),
    )


def collapse_bvh8(bvh: BVH, force_python: bool = False) -> BVH:
    """Attach (nodes8, child8) to a host-concrete BVH; no-op under trace."""
    try:
        nodes = np.asarray(bvh.nodes)
        child = np.asarray(bvh.child_index)
    except Exception:
        return bvh  # traced values — leave nodes8 unset

    if not force_python:
        native = _collapse_native(nodes, child)
        if native is not None:
            return _attach(bvh, *native)

    n = nodes.shape[0]
    # surface area of each child slot of every BVH2 node
    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                      + d[..., 2] * d[..., 0])

    c0_lo, c0_hi = nodes[:, 0:3], nodes[:, 3:6]
    c1_lo, c1_hi = nodes[:, 6:9], nodes[:, 9:12]
    a0 = area(c0_lo, c0_hi)
    a1 = area(c1_lo, c1_hi)

    bvh8_id = {}          # bvh2 interior id -> bvh8 id
    order = []            # bvh8 id -> bvh2 id
    queue = [0]
    bvh8_id[0] = 0
    order.append(0)
    slots_out = []

    while queue:
        next_queue = []
        for n2 in queue:
            # slots: (area, child_code, lo, hi); child_code >= 0 is a BVH2
            # interior id until remapped at the end
            slots = [
                (a0[n2], child[n2, 0], c0_lo[n2], c0_hi[n2]),
                (a1[n2], child[n2, 1], c1_lo[n2], c1_hi[n2]),
            ]
            while len(slots) < 8:
                # expand the largest interior slot
                best_i, best_a = -1, -1.0
                for i, (a, c, _, _) in enumerate(slots):
                    if c >= 0 and a > best_a:
                        best_i, best_a = i, a
                if best_i < 0:
                    break
                _, c, _, _ = slots.pop(best_i)
                slots.append((a0[c], child[c, 0], c0_lo[c], c0_hi[c]))
                slots.append((a1[c], child[c, 1], c1_lo[c], c1_hi[c]))
            slots.sort(key=lambda s: -s[0])
            for _, c, _, _ in slots:
                if c >= 0 and c not in bvh8_id:
                    bvh8_id[c] = len(order)
                    order.append(c)
                    next_queue.append(c)
            slots_out.append(slots)
        queue = next_queue

    m = len(slots_out)
    nodes8 = np.empty((m, 48), np.float32)
    child8 = np.zeros((m, 8), np.int32)
    for i, slots in enumerate(slots_out):
        for k, (_, c, lo, hi) in enumerate(slots):
            nodes8[i, k * 6 : k * 6 + 3] = lo
            nodes8[i, k * 6 + 3 : k * 6 + 6] = hi
            child8[i, k] = bvh8_id[c] if c >= 0 else c
        for k in range(len(slots), 8):
            nodes8[i, k * 6 : k * 6 + 6] = _BIG

    return _attach(bvh, nodes8, child8)
