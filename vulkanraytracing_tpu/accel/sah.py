"""ctypes bridge to the native binned-SAH BVH builder.

The C++ builder (native/sah_builder.cpp) plays the role of the Vulkan
driver's ePreferFastTrace build: a slower, higher-quality tree for static
geometry.  It emits the exact node/leaf encoding the JAX traversal kernels
consume, so the two builders are drop-in interchangeable
(``build_scene_bvh(scene, builder="sah"|"lbvh")``).

The shared library is compiled on demand with g++ -O3 and cached next to
the source; no external packaging needed.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.accel.lbvh import LEAF_SIZE, _pack_tris
from vulkanraytracing_tpu.scene.types import BVH, Scene, TraceGeometry
from vulkanraytracing_tpu.utils import ScopeTime, log_d

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB: ctypes.CDLL | None = None


def _load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = _NATIVE_DIR / "sah_builder.cpp"
    so = _NATIVE_DIR / "build" / "libsah_builder.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        so.parent.mkdir(exist_ok=True)
        with ScopeTime("compile sah_builder"):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(so), str(src)],
                check=True,
            )
    lib = ctypes.CDLL(str(so))
    lib.build_sah_bvh.restype = ctypes.c_int
    lib.build_sah_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # tri_lo
        ctypes.POINTER(ctypes.c_float),  # tri_hi
        ctypes.POINTER(ctypes.c_float),  # centroids
        ctypes.c_int,                    # num_tris
        ctypes.c_int,                    # leaf_size
        ctypes.POINTER(ctypes.c_int),    # child_index out
        ctypes.POINTER(ctypes.c_float),  # child_box out
        ctypes.POINTER(ctypes.c_int),    # tri_order out
    ]
    _LIB = lib
    return lib


def build_bvh_sah(
    geometry: TraceGeometry, leaf_size: int = LEAF_SIZE
) -> tuple[TraceGeometry, BVH]:
    """Build a binned-SAH BVH; returns (reordered geometry, BVH) — the same
    contract as accel.lbvh.build_bvh."""
    lib = _load_library()

    v0 = np.asarray(geometry.v0, np.float32)
    p1 = v0 + np.asarray(geometry.e1, np.float32)
    p2 = v0 + np.asarray(geometry.e2, np.float32)
    tri_lo = np.minimum(np.minimum(v0, p1), p2)
    tri_hi = np.maximum(np.maximum(v0, p1), p2)
    centroids = ((tri_lo + tri_hi) * 0.5).astype(np.float32)
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    centroids = np.ascontiguousarray(centroids)

    t = v0.shape[0]
    max_nodes = max(t, 1)
    child_index = np.zeros((max_nodes, 2), np.int32)
    child_box = np.zeros((max_nodes, 12), np.float32)
    tri_order = np.zeros((t,), np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n_nodes = lib.build_sah_bvh(
        tri_lo.ctypes.data_as(fp),
        tri_hi.ctypes.data_as(fp),
        centroids.ctypes.data_as(fp),
        t, leaf_size,
        child_index.ctypes.data_as(ip),
        child_box.ctypes.data_as(fp),
        tri_order.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        raise RuntimeError(f"SAH build failed ({n_nodes}) for {t} tris")
    log_d(f"SAH build: {t} tris -> {n_nodes} nodes")

    child_index = child_index[:n_nodes]
    child_box = child_box[:n_nodes]

    order = jnp.asarray(tri_order)
    geometry = jax.tree.map(lambda a: a[order], geometry)

    from vulkanraytracing_tpu.accel.lbvh import pad_nodes

    nodes, child_index = pad_nodes(
        jnp.asarray(child_box), jnp.asarray(child_index), t
    )
    tris, tri_flags = _pack_tris(geometry)
    bvh = BVH(
        nodes=nodes,
        child_index=child_index,
        tris=tris,
        tri_flags=tri_flags,
        tri_order=order,
    )
    return geometry, bvh


def build_scene_bvh_sah(scene: Scene, leaf_size: int = LEAF_SIZE) -> Scene:
    geometry, bvh = build_bvh_sah(scene.geometry, leaf_size)
    return scene._replace(geometry=geometry, bvh=bvh)
