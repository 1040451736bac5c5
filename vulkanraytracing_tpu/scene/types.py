"""Device-side scene representation (SOA pytrees).

This is the TPU counterpart of the reference's GPU scene objects:

- ``ScenePT`` (ref: Source/Engine/Scene/ScenePT.hpp:9-45) — TLAS + material
  UBO + bindless texture/geometry SSBOs bound as descriptor set 3
  (SceneModel.cpp:1167-1243).  Here the same data is a pytree of flat device
  arrays; "bindless SSBO arrays indexed by instanceId" become pre-flattened
  world-space triangle attribute arrays indexed by a global triangle id,
  which is what a gather-based TPU kernel wants.
- materials mirror ``MaterialRT`` (ref: Source/Shaders/Common/RayTracing.h:10-25),
- point lights mirror ``PointLight`` (ref: Source/Shaders/Common/Common.h:9-19)
  with color pre-multiplied by intensity (SceneModel.cpp:581-585),
- the TLAS instance flags ForceOpaque / TriangleFacingCullDisable
  (SceneModel.cpp:791-805) become per-triangle booleans.

Everything is a NamedTuple so the whole scene is a jit-able pytree that
``jax.device_put`` can shard or replicate over a mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.core import math3d


class TraceGeometry(NamedTuple):
    """World-space triangle soup with per-corner shading attributes.

    The TLAS/BLAS instancing of the reference (SceneModel.cpp:870-909) is
    resolved ("flattened") at build time for static scenes: every instance's
    triangles are pre-transformed to world space.  ``accel.tlas`` keeps the
    two-level path for animated instances.
    """

    v0: jnp.ndarray  # (T, 3) f32 — first vertex
    e1: jnp.ndarray  # (T, 3) f32 — v1 - v0
    e2: jnp.ndarray  # (T, 3) f32 — v2 - v0
    n0: jnp.ndarray  # (T, 3) f32 — per-corner shading normals (world space)
    n1: jnp.ndarray
    n2: jnp.ndarray
    t0: jnp.ndarray  # (T, 3) f32 — per-corner tangents (world space)
    t1: jnp.ndarray
    t2: jnp.ndarray
    uv0: jnp.ndarray  # (T, 2) f32
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    material_id: jnp.ndarray     # (T,) i32
    cull_disable: jnp.ndarray    # (T,) bool — doubleSided material => no backface cull
    # Static visibility-blocker flag: True if a hit commits without an
    # alpha test (the ForceOpaque instance flag, SceneModel.cpp:791-805;
    # for untextured materials the alpha test resolves statically:
    # alpha = baseColorFactor.a vs alphaCutoff, RayGen.rgen:163-174).
    opaque: jnp.ndarray          # (T,) bool
    # True for textured cutout/blend triangles whose hits need a dynamic
    # texture alpha test (the AnyHit.rahit / TraceVisibilityRay path);
    # tris with neither flag never hit (statically transparent).
    alpha_test: jnp.ndarray      # (T,) bool

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]

    def geometric_normal(self) -> jnp.ndarray:
        return math3d.normalize(jnp.cross(self.e1, self.e2))


class Materials(NamedTuple):
    """SOA MaterialRT (ref: Common/RayTracing.h:10-25)."""

    base_color_factor: jnp.ndarray          # (M, 4) f32
    emission_factor: jnp.ndarray            # (M, 4) f32
    roughness_factor: jnp.ndarray           # (M,) f32
    metallic_factor: jnp.ndarray            # (M,) f32
    normal_scale: jnp.ndarray               # (M,) f32
    alpha_cutoff: jnp.ndarray               # (M,) f32
    base_color_texture: jnp.ndarray         # (M,) i32, -1 = none
    roughness_metallic_texture: jnp.ndarray  # (M,) i32
    normal_texture: jnp.ndarray             # (M,) i32
    emission_texture: jnp.ndarray           # (M,) i32
    # used by the hybrid mode's G-buffer only (the raster Material of
    # Hybrid/Hybrid.h has an occlusion slot; MaterialRT does not)
    occlusion_texture: jnp.ndarray          # (M,) i32

    @property
    def count(self) -> int:
        return self.base_color_factor.shape[0]


class PointLights(NamedTuple):
    """Ref: Common/Common.h PointLight{vec4 position, vec4 color}; color rgb
    is pre-multiplied by intensity (SceneModel.cpp:581-585)."""

    position: jnp.ndarray  # (L, 4) f32
    color: jnp.ndarray     # (L, 4) f32

    @property
    def count(self) -> int:
        return self.position.shape[0]


class DirectLight(NamedTuple):
    """Ref: Common/Common.h DirectLight{vec4 direction, vec4 color} — the
    analytic sun extracted from the environment panorama."""

    direction: jnp.ndarray  # (4,) f32
    color: jnp.ndarray      # (4,) f32


class Environment(NamedTuple):
    """HDR environment.  The reference converts the panorama to a <=1024^2
    cubemap (Environment.cpp:11-25) and samples that; we sample the
    equirect panorama directly (same mapping as PanoramaToCube.comp:25-30)
    which avoids the cube resample entirely.

    The IBL fields mirror the reference's precomputed textures
    (ImageBasedLighting.cpp:335-503): irradiance cube, GGX-prefiltered
    reflection mip chain (mip = roughness level), and the split-sum BRDF
    LUT; they are None until env.ibl.bake_ibl runs (only the hybrid render
    mode consumes them)."""

    panorama: jnp.ndarray  # (H, W, 3) f32 linear radiance
    irradiance: Optional[jnp.ndarray] = None   # (6, S, S, 3)
    reflection: Optional[tuple] = None         # tuple of (6, s, s, 3) mips
    brdf_lut: Optional[jnp.ndarray] = None     # (S, S, 2) scale/offset
    # precomputed 2x2 bilinear footprint [c00|c10|c01|c11] per texel
    # (env.panorama.build_quad_table): the per-bounce miss lookup then
    # costs ONE row-gather instead of four (XLA:TPU gather cost is per
    # index; columns are nearly free — see ops.intersect gather economy)
    quad: Optional[jnp.ndarray] = None         # (H, W, 12) f32


@jax.tree_util.register_pytree_node_class
class ChunkSet:
    """Stacked per-chunk wide8 traversal tables for the HBM-streaming
    kernel (accel.chunks / ops.traverse_wide8 ``chunked=True``).

    ``tables`` is (K, R, 128) int32 — K chunk tables, each laid out as
    [node_rows BVH8 node records | 1 sentinel row | tri rows].  The
    traversal grid streams one chunk table at a time HBM->VMEM, removing
    the single-table VMEM triangle limit.  ``node_rows`` is a *static*
    Python int (pytree aux data, not a leaf) so the kernel's row-decode
    stays compile-time constant under jit."""

    def __init__(self, tables: jnp.ndarray, node_rows: int):
        self.tables = tables
        self.node_rows = node_rows

    def tree_flatten(self):
        return (self.tables,), self.node_rows

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"ChunkSet(tables={getattr(self.tables, 'shape', None)}, "
            f"node_rows={self.node_rows})"
        )


class BVH(NamedTuple):
    """Flattened 2-wide BVH with collapsed multi-triangle leaves
    (see accel.lbvh).

    Child encoding: idx >= 0 is an internal node id; idx < 0 is a leaf over
    the morton-sorted triangle order with ``packed = ~idx``,
    ``start = packed >> 4``, ``count = packed & 15``.
    """

    # NOTE: integer data (child ids, flags) lives in separate int32 arrays,
    # never bitcast into the float records: small ints are denormal f32 bit
    # patterns and XLA flushes denormals to zero in eager elementwise ops.
    nodes: jnp.ndarray        # (N, 12) f32 packed: c0.lo(3) c0.hi(3)
    #                           c1.lo(3) c1.hi(3)
    child_index: jnp.ndarray  # (N, 2) i32 — child ids (>=0 node, <0 leaf)
    tris: jnp.ndarray         # (T, 12) f32 packed: v0(3) e1(3) e2(3) pad(3)
    tri_flags: jnp.ndarray    # (T,) i32: bit0 cull_disable, bit1 opaque,
    #                           bit2 alpha_test
    tri_order: jnp.ndarray    # (T,) i32 — sorted-order -> original tri ids
    # optional 8-wide collapse (accel.bvh8, host-built after the device
    # build; None when the BVH was built inside a trace).  Same leaf codes;
    # empty slots carry degenerate far boxes (lo = hi = +3e38) so they
    # never hit — NOT inverted boxes, which the kernel's min/max slab test
    # would accept for every ray (see accel/bvh8.py module docstring).
    nodes8: Optional[jnp.ndarray] = None  # (M, 48) f32 — 8x (lo3, hi3)
    child8: Optional[jnp.ndarray] = None  # (M, 8) i32
    # adaptive upper-tree box cut (accel.lbvh.probe_cut) used by
    # ops.reorder to PREDICT per-row traversal cost (union breadth over
    # these boxes) and fill traversal waves with similar-cost rows —
    # measured 1.24x on sorted bounce traversal (occupancy 41% -> 51%).
    # Perf-only: a stale probe (e.g. after refit) costs speed, never
    # correctness.
    probe: Optional[jnp.ndarray] = None   # (N, 6) f32 lo/hi
    # optional HBM-streaming chunk tables (accel.chunks) for scenes past
    # the single-table VMEM limit; when set, nodes/child_index above hold
    # the MERGED global BVH2 (top-level tree over chunk roots) so every
    # non-streaming backend keeps working on the same scene
    chunks: Optional[ChunkSet] = None
    # row-aligned leaf layout for the 8-wide traversal table (host-built
    # with the collapse, accel.bvh8._align_leaves): slot i of the aligned
    # triangle table holds sorted-order triangle tri_perm8[i] (-1 =
    # padding).  Each leaf starts at a multiple of TRIS_PER_ROW, so a leaf
    # visit is exactly ONE table row — unaligned leaves averaged 1.72 rows
    # (48.8% slot utilization) on the 262k bench scene.  child8 leaf codes
    # are rewritten against this layout; the BVH2 arrays (nodes/
    # child_index/tris) keep the unaligned order for every other backend.
    tri_perm8: Optional[jnp.ndarray] = None  # (T8,) i32


class AlphaScene(NamedTuple):
    """Dedicated acceleration structure over the alpha-tested (cutout)
    triangles only — the TPU-native replacement for per-hit any-hit shader
    invocations (AnyHit.rahit:33-60).

    The driver runs the any-hit shader inline during traversal; a wavefront
    TPU kernel cannot call back into texture sampling mid-traversal, so
    alpha-tested geometry is split out: the main BVH treats cutout tris as
    non-candidates (tri_flags bit2 cleared — same mechanism that rejects
    leaf padding slots), and this small foliage-only tree resolves the
    alpha layers with the bounded re-trace loop (ops.trace._resolve_alpha)
    at the subset's cost instead of the whole scene's.  Attached by
    accel.build_scene_bvh when the scene has alpha-test triangles."""

    geometry: TraceGeometry  # cutout subset, in its own BVH order
    bvh: BVH                 # tree over the subset
    tri_map: jnp.ndarray     # (Ta,) i32 — subset tri id -> main-scene tri id


class Scene(NamedTuple):
    """The full renderable scene — analog of ScenePT + Environment +
    DirectLight bound together (Engine.cpp:106-136 ownership)."""

    geometry: TraceGeometry
    materials: Materials
    environment: Environment
    direct_light: DirectLight
    point_lights: Optional[PointLights]
    bvh: Optional[BVH]
    # bindless texture pool (ops.texture.TexturePool); None = untextured
    textures: Optional[tuple] = None
    # alpha-tested (cutout) triangle subset with its own BVH; None when the
    # scene has no alpha-test geometry (then no alpha machinery runs at all)
    alpha: Optional[AlphaScene] = None

    @property
    def has_point_lights(self) -> bool:
        return self.point_lights is not None and self.point_lights.count > 0


def make_trace_geometry(
    positions: np.ndarray,      # (V, 3)
    indices: np.ndarray,        # (T, 3) int
    normals: np.ndarray | None = None,
    tangents: np.ndarray | None = None,
    uvs: np.ndarray | None = None,
    material_id: np.ndarray | int = 0,
    cull_disable: np.ndarray | bool = False,
    opaque: np.ndarray | bool = True,
    alpha_test: np.ndarray | bool = False,
    dtype=jnp.float32,
    device: bool = True,
) -> TraceGeometry:
    """Assemble SOA trace geometry from indexed vertex data.

    Generates flat normals / arbitrary tangents / zero uvs when attributes
    are missing, mirroring SceneModel.cpp:223-302 (attribute generation).

    ``device=False`` keeps every field a numpy array — builders that
    assemble a scene from MANY parts (procedural foliage: thousands of
    quads) must stay host-side until ONE final transfer, because each
    device conversion is a relay round trip on tunneled TPUs
    (concat_geometry converts the concatenated whole)."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int64).reshape(-1, 3)
    t = indices.shape[0]

    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0

    if normals is None:
        gn = np.cross(e1, e2)
        gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        n0 = n1 = n2 = gn
    else:
        normals = np.asarray(normals, np.float32)
        n0, n1, n2 = (normals[indices[:, k]] for k in range(3))

    if tangents is None:
        # arbitrary frame; matches GetTBN(N)-style fallback
        ref_axis = np.where(
            np.abs(n0[:, 1:2]) < 0.99,
            np.array([[0.0, 1.0, 0.0]], np.float32),
            np.array([[1.0, 0.0, 0.0]], np.float32),
        )
        t0_ = np.cross(n0, ref_axis)
        t0_ /= np.maximum(np.linalg.norm(t0_, axis=-1, keepdims=True), 1e-20)
        t0 = t1 = t2 = t0_
    else:
        tangents = np.asarray(tangents, np.float32)[..., :3]
        t0, t1, t2 = (tangents[indices[:, k]] for k in range(3))

    if uvs is None:
        uv0 = uv1 = uv2 = np.zeros((t, 2), np.float32)
    else:
        uvs = np.asarray(uvs, np.float32)
        uv0, uv1, uv2 = (uvs[indices[:, k]] for k in range(3))

    material_id = np.broadcast_to(np.asarray(material_id, np.int32), (t,))
    cull_disable = np.broadcast_to(np.asarray(cull_disable, bool), (t,))
    opaque = np.broadcast_to(np.asarray(opaque, bool), (t,))
    alpha_test = np.broadcast_to(np.asarray(alpha_test, bool), (t,))

    if device:
        as_f = lambda a: jnp.asarray(a, dtype)  # noqa: E731
        as_i = jnp.asarray
    else:
        as_f = lambda a: np.asarray(a, np.float32)  # noqa: E731
        as_i = np.ascontiguousarray
    return TraceGeometry(
        v0=as_f(p0), e1=as_f(e1), e2=as_f(e2),
        n0=as_f(n0), n1=as_f(n1), n2=as_f(n2),
        t0=as_f(t0), t1=as_f(t1), t2=as_f(t2),
        uv0=as_f(uv0), uv1=as_f(uv1), uv2=as_f(uv2),
        material_id=as_i(material_id),
        cull_disable=as_i(cull_disable),
        opaque=as_i(opaque),
        alpha_test=as_i(alpha_test),
    )


def concat_geometry(parts: list[TraceGeometry]) -> TraceGeometry:
    """Concatenate triangle soups (instance flattening).

    Host-built (numpy) parts are concatenated in numpy and transferred
    once per field — 17 device transfers total instead of
    17 x len(parts) relay round trips (see make_trace_geometry
    ``device=False``)."""
    if any(isinstance(p.v0, np.ndarray) for p in parts):
        cat = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *parts,
        )
        return jax.tree.map(jnp.asarray, cat)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)


def default_materials(
    base_color=(1.0, 1.0, 1.0, 1.0),
    emission=(0.0, 0.0, 0.0, 1.0),
    roughness=1.0,
    metallic=0.0,
) -> Materials:
    """Single-material helper with glTF defaults."""
    return make_materials(
        base_color_factors=[base_color],
        emission_factors=[emission],
        roughness_factors=[roughness],
        metallic_factors=[metallic],
    )


def make_materials(
    base_color_factors,
    emission_factors=None,
    roughness_factors=None,
    metallic_factors=None,
    normal_scales=None,
    alpha_cutoffs=None,
    base_color_textures=None,
    roughness_metallic_textures=None,
    normal_textures=None,
    emission_textures=None,
    occlusion_textures=None,
) -> Materials:
    base = np.asarray(base_color_factors, np.float32).reshape(-1, 4)
    m = base.shape[0]

    def _f(x, default):
        if x is None:
            return np.full((m,), default, np.float32)
        return np.asarray(x, np.float32).reshape(m)

    def _i(x):
        if x is None:
            return np.full((m,), -1, np.int32)
        return np.asarray(x, np.int32).reshape(m)

    emission = (
        np.zeros((m, 4), np.float32)
        if emission_factors is None
        else np.asarray(emission_factors, np.float32).reshape(-1, 4)
    )
    return Materials(
        base_color_factor=jnp.asarray(base),
        emission_factor=jnp.asarray(emission),
        roughness_factor=jnp.asarray(_f(roughness_factors, 1.0)),
        metallic_factor=jnp.asarray(_f(metallic_factors, 1.0)),
        normal_scale=jnp.asarray(_f(normal_scales, 1.0)),
        alpha_cutoff=jnp.asarray(_f(alpha_cutoffs, 0.5)),
        base_color_texture=jnp.asarray(_i(base_color_textures)),
        roughness_metallic_texture=jnp.asarray(_i(roughness_metallic_textures)),
        normal_texture=jnp.asarray(_i(normal_textures)),
        emission_texture=jnp.asarray(_i(emission_textures)),
        occlusion_texture=jnp.asarray(_i(occlusion_textures)),
    )


def build_quad_table(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 12) table of each texel's 2x2 bilinear footprint
    [c00 | c10 | c01 | c11] with the sampler's address modes baked in
    (wrap in u, clamp in v) — lets env.panorama.sample_environment fetch
    the whole footprint with ONE row-gather instead of four."""
    right = jnp.roll(image, -1, axis=1)                       # wrap u
    down = jnp.concatenate([image[1:], image[-1:]], axis=0)   # clamp v
    diag = jnp.roll(down, -1, axis=1)
    return jnp.concatenate([image, right, down, diag], axis=-1)


def make_environment(panorama: jnp.ndarray) -> Environment:
    """Environment with the bilinear quad table precomputed."""
    return Environment(panorama=panorama, quad=build_quad_table(panorama))


def black_environment(size: int = 8) -> Environment:
    return make_environment(jnp.zeros((size, size * 2, 3), jnp.float32))


def constant_environment(color, size: int = 8) -> Environment:
    pano = jnp.broadcast_to(
        jnp.asarray(color, jnp.float32), (size, size * 2, 3)
    ).astype(jnp.float32)
    return make_environment(pano)


def no_direct_light() -> DirectLight:
    return DirectLight(
        direction=jnp.array([0.0, -1.0, 0.0, 0.0], jnp.float32),
        color=jnp.zeros((4,), jnp.float32),
    )
