"""Ray-triangle intersection (Moller-Trumbore) and ray-scene queries.

This module replaces the fixed-function BVH traversal hardware the reference
leans on (``traceRayEXT`` in RayGen.rgen:337-343 / ``rayQueryProceedEXT`` in
RayGen.rgen:133-184).  Two query kinds, matching the reference's two ray
flavors:

- ``intersect_closest`` = traceRayEXT with gl_RayFlagsCullBackFacingTrianglesEXT
  (material rays; per-triangle cull_disable mirrors the
  eTriangleFacingCullDisable instance flag for doubleSided materials,
  SceneModel.cpp:791-805);
- ``intersect_any`` = the alpha-aware visibility ray query with
  gl_RayFlagsTerminateOnFirstHitEXT and *no* backface culling
  (RayGen.rgen:133-184).

The brute-force variants here scan all triangles in tiles — O(R*T) but purely
dense VPU work, exact, and fast enough for test scenes; they are also the
ground truth the BVH traversal (ops.traverse) is validated against.

Vulkan winding convention: front face = counter-clockwise from the ray
origin, i.e. det = dot(e1, cross(d, e2)) > 0.  Backface culling drops
det <= 0; a committed hit with det < 0 is a back-face hit, which flips the
shading normal (ClosestHit.rchit:77-81).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.scene.types import TraceGeometry

_BIG_T = jnp.float32(3.0e38)


class Hit(NamedTuple):
    """Closest-hit record (the MaterialPayload before attribute fetch,
    PathTracing.glsl:12-19)."""

    t: Array        # (R,) f32 — hit distance; >= BIG => miss
    u: Array        # (R,) f32 — barycentric u
    v: Array        # (R,) f32 — barycentric v
    tri: Array      # (R,) i32 — triangle id (undefined on miss)
    backface: Array  # (R,) bool — hit the back side (det < 0)

    @property
    def is_hit(self) -> Array:
        return self.t < _BIG_T

    @property
    def is_miss(self) -> Array:
        return self.t >= _BIG_T


def moller_trumbore(
    o: Array,          # (..., 3) ray origins
    d: Array,          # (..., 3) ray directions
    v0: Array,         # (..., 3) triangle data (broadcast-compatible)
    e1: Array,
    e2: Array,
) -> tuple[Array, Array, Array, Array]:
    """Raw Moller-Trumbore. Returns (t, u, v, det); caller applies windows,
    culling and validity tests."""
    pvec = jnp.cross(d, e2)
    det = math3d.dot(e1, pvec)
    # Safe reciprocal; invalid dets are masked out by the caller via |det|.
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    tvec = o - v0
    u = math3d.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = math3d.dot(d, qvec) * inv_det
    t = math3d.dot(e2, qvec) * inv_det
    return t, u, v, det


def _tile_hits(
    geom: TraceGeometry,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool,
    start: Array,
    tile: int,
) -> tuple[Array, Array, Array, Array, Array]:
    """Test one tile of triangles against all rays.

    Returns per-ray best (t, u, v, tri, det) within the tile."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, tile, axis=0)  # noqa: E731
    v0, e1, e2 = sl(geom.v0), sl(geom.e1), sl(geom.e2)
    cull_disable = sl(geom.cull_disable)
    opaque = sl(geom.opaque)

    # (R, 1, 3) x (1, T, 3)
    t, u, v, det = moller_trumbore(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None]
    )

    eps = jnp.float32(1e-20)
    valid = jnp.abs(det) > eps
    if cull_backface:
        valid &= (det > eps) | cull_disable[None, :]
    # hit candidates: opaque (commits) or alpha-tested (resolved by the
    # trace.py alpha loop); statically-transparent tris never hit
    alpha_test = sl(geom.alpha_test)
    valid &= (opaque | alpha_test)[None, :]
    valid &= (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    valid &= (t >= t_min[:, None]) & (t <= t_max[:, None])

    t = jnp.where(valid, t, _BIG_T)
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    return (
        t[r, best],
        u[r, best],
        v[r, best],
        (best + start).astype(jnp.int32),
        det[r, best],
    )


# not @jax.jit — see traverse_packet.traverse_packets for the rationale
def intersect_closest_brute(
    geom: TraceGeometry,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool = True,
    tile: int = 512,
) -> Hit:
    """Closest hit over all triangles, tiled to bound memory."""
    num_tris = geom.num_triangles
    tile = min(tile, num_tris)
    num_tiles = -(-num_tris // tile)

    # Pad geometry to a tile multiple with degenerate triangles.
    pad = num_tiles * tile - num_tris
    if pad:
        geom = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            ),
            geom,
        )

    def body(carry, tile_idx):
        bt, bu, bv, btri, bdet = carry
        t, u, v, tri, det = _tile_hits(
            geom, o, d, t_min, t_max, cull_backface, tile_idx * tile, tile
        )
        closer = t < bt
        carry = (
            jnp.where(closer, t, bt),
            jnp.where(closer, u, bu),
            jnp.where(closer, v, bv),
            jnp.where(closer, tri, btri),
            jnp.where(closer, det, bdet),
        )
        return carry, None

    r = o.shape[0]
    init = (
        jnp.full((r,), _BIG_T),
        jnp.zeros((r,)),
        jnp.zeros((r,)),
        jnp.zeros((r,), jnp.int32),
        jnp.ones((r,)),
    )
    (t, u, v, tri, det), _ = jax.lax.scan(
        body, init, jnp.arange(num_tiles), unroll=False
    )
    return Hit(t=t, u=u, v=v, tri=tri, backface=det < 0.0)


def intersect_any_brute(
    geom: TraceGeometry,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    tile: int = 512,
) -> Array:
    """Visibility query: does any opaque triangle block [t_min, t_max]?

    Matches TraceVisibilityRay (RayGen.rgen:133-184): no backface culling,
    alpha handled via the static per-triangle ``opaque`` flag."""
    hit = intersect_closest_brute(
        geom, o, d, t_min, t_max, cull_backface=False, tile=tile
    )
    return hit.is_hit


class SurfaceAttributes(NamedTuple):
    """Interpolated hit attributes — the ClosestHit.rchit output payload."""

    normal: Array    # (R, 3) world-space shading normal (backface-flipped)
    tangent: Array   # (R, 3) world-space tangent
    uv: Array        # (R, 2)
    material_id: Array  # (R,) i32


def fetch_surface_attributes(geom: TraceGeometry, hit: Hit) -> SurfaceAttributes:
    """Barycentric attribute interpolation + back-face normal flip.

    Ref: ClosestHit.rchit:48-81 — fetch per-corner normals/tangents/uvs,
    BaryLerp with (1-u-v, u, v), normalize, flip normal on back-face hits.
    Attributes are already world-space here (flattened at scene build).

    Gather economy (measured, tools/ab (perf_gather, pruned round 3) at R=2M, T=262k): an
    XLA:TPU gather costs ~17 ms per SEPARATE (R,)-indexed column, but a
    row-gather of a (T, C) table costs ~55 ms for ANY C up to 25+ — cost is
    per index, columns are free.  So all 25 attribute columns ride ONE
    packed-table row-gather (was: 25 separate gathers, ~150 ms/bounce).
    The (T, 25) concat is triangle-count-sized, ~1% of the gather cost."""
    tri = hit.tri
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)

    table = jnp.concatenate(
        [
            geom.n0, geom.n1, geom.n2,
            geom.t0, geom.t1, geom.t2,
            geom.uv0, geom.uv1, geom.uv2,
            geom.material_id[:, None].astype(jnp.float32),  # exact < 2^24
        ],
        axis=1,
    )
    rec = table[tri]  # ONE row-gather

    n = math3d.bary_lerp(rec[:, 0:3], rec[:, 3:6], rec[:, 6:9], bary)
    t = math3d.bary_lerp(rec[:, 9:12], rec[:, 12:15], rec[:, 15:18], bary)
    uv = math3d.bary_lerp(rec[:, 18:20], rec[:, 20:22], rec[:, 22:24], bary)

    n = math3d.normalize(n)
    n = jnp.where(hit.backface[..., None], -n, n)
    t = math3d.normalize(t)
    return SurfaceAttributes(
        normal=n, tangent=t, uv=uv, material_id=rec[:, 24].astype(jnp.int32)
    )
