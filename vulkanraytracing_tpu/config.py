"""Typed runtime configuration.

The reference keeps all knobs as compile-time ``constexpr`` in two headers
(``Source/Engine/Config.hpp:8-67`` and
``Source/Engine/Render/Vulkan/VulkanConfig.hpp:5-45``) plus ``#define``
injection into shaders (``ShaderManager.cpp:11-42``).  Here the same knob set
is a frozen dataclass: frozen so a ``Config`` can parameterize jitted
functions as a static argument.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class RenderMode(enum.Enum):
    """Ref: Source/Engine/EngineHelpers.hpp:32-38 (RenderMode::{eHybrid, ePathTracing})."""

    PATH_TRACING = "path_tracing"
    HYBRID = "hybrid"


class TraversalMode(enum.Enum):
    """Which trace backend to use — the analog of the reference's compile-time
    PathTracingMode::{eRayTracing, eRayQueries} backend switch
    (Source/Engine/Config.hpp:10-14,33): interchangeable implementations of
    the same trace semantics."""

    BRUTE_FORCE = "brute_force"    # O(R*T) tiled Moller-Trumbore, tiny scenes/tests
    BVH = "bvh"                    # BVH + XLA packet traversal
    BVH_PER_RAY = "bvh_per_ray"    # BVH + per-ray lockstep traversal (oracle)
    BVH_PALLAS = "bvh_pallas"      # BVH + wide persistent Pallas kernel
    #                                (production: 64 independent 128-ray
    #                                sub-packets with fully vectorized
    #                                traversal state, pool streamed through
    #                                VMEM wave-by-wave; falls back to the
    #                                XLA packet path for huge scenes)
    BVH_PALLAS_SUBPACKET = "bvh_pallas_subpacket"  # second-gen kernel: 8 row
    #                                cursors + SMEM scalar stacks + refill
    BVH_PALLAS_SHARED = "bvh_pallas_shared"  # first-gen Pallas kernel: one
    #                                shared cursor per 1024-ray packet (kept
    #                                as a consistency oracle / comparison)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Ref: Config.hpp:39-50 (DefaultCamera) — position -5 on +Z looking at
    origin, up +Y, xFov 90deg, 16:9, 0.01..1000 z-range. Note the reference
    treats ``xFov / aspect`` as the *vertical* fov (Camera.cpp:59)."""

    position: tuple[float, float, float] = (0.0, 0.0, 5.0)  # kBackward * 5 (kForward = -Z)
    target: tuple[float, float, float] = (0.0, 0.0, 0.0)
    up: tuple[float, float, float] = (0.0, 1.0, 0.0)
    x_fov: float = math.radians(90.0)
    aspect_ratio: float = 16.0 / 9.0
    z_near: float = 0.01
    z_far: float = 1000.0


@dataclasses.dataclass(frozen=True)
class Config:
    # --- window / framebuffer (ref: Config.hpp:18) ---
    width: int = 1280
    height: int = 720

    # --- render mode (ref: EngineHelpers.hpp:32-38, toggled Engine.cpp:237-244) ---
    render_mode: RenderMode = RenderMode.PATH_TRACING
    traversal: TraversalMode = TraversalMode.BVH_PALLAS

    # --- path tracing (ref: RayGen.rgen:18-23) ---
    min_bounce_count: int = 2   # RR starts after this many bounces
    max_bounce_count: int = 4
    rr_min_threshold: float = 0.05

    # --- accumulation parity ---
    # The reference accumulates *tone-mapped* radiance into an RGBA8 image
    # (RenderSystemPT.cpp:291-300, RayGen.rgen:314-323).  parity_quantization
    # reproduces that 8-bit round trip; disable for a higher-quality
    # float32 accumulator (a conscious divergence, see SURVEY.md section 7).
    parity_quantization: bool = True
    # Tone-map each sample BEFORE accumulation (RayGen.rgen:412-413) — the
    # reference behavior, which biases the converged image (Jensen gap of the
    # concave filmic curve).  False = accumulate linear HDR radiance and
    # tone-map only at display (the flagged quality mode from SURVEY.md s7).
    tone_map_before_accumulation: bool = True

    # --- lights ---
    point_light_radius: float = 0.05  # ref: Config.hpp:35 kPointLightRadius

    # --- camera (ref: Config.hpp:37-50) ---
    reverse_depth: bool = True
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)

    # --- environment preprocessing (ref: Environment.cpp:11-25, ImageBasedLighting.cpp) ---
    env_cube_size: int = 1024       # max env cubemap face size
    irradiance_size: int = 128      # max irradiance cube face size
    reflection_size: int = 512      # max prefiltered reflection face size
    brdf_lut_size: int = 256        # split-sum BRDF LUT
    direct_light_max_luminance: float = 25.0  # ref: DirectLighting.cpp:283-298 clamp

    # --- execution shape ---
    # Rays per traversal wavefront.  The default covers a whole 1080p
    # frame: the global coherence sort works best over the full
    # wavefront, and per-chunk dispatch overhead is paid once.  Lower it
    # only to bound host memory on very large framebuffers (the renderer
    # clamps to the frame size, so small frames are unaffected).
    ray_chunk_size: int = 1 << 22
    # (triangles-per-leaf is NOT a config knob: the wide kernels' leaf path
    # handles at most one row continuation, so the bound is structural —
    # accel.lbvh.LEAF_SIZE; builders take an explicit leaf_size argument.)
    # Alpha-tested (cutout) visibility needs up to 4 re-traversals per trace
    # (ops.trace MAX_ALPHA_ITERS, the reference's unbounded any-hit loop,
    # AnyHit.rahit).  Scene loaders clear this when no triangle carries the
    # alpha-test flag so fully-opaque textured scenes skip that cost; it is
    # static (part of the jit key), not data-dependent.
    alpha_visibility: bool = True
    # Anisotropic filtering taps for the hybrid G-buffer texture fetch
    # (footprint-assembly approximation of the reference's hardware
    # maxAnisotropy 16, VulkanConfig.hpp:44).  1 = plain trilinear.
    # Default 16 matches the reference sampler; on the adversarial grazing
    # scene 4 taps measures 0.0124 RMSE vs 16 — 12x over the 1e-3 parity
    # gate (artifacts/aniso/report.json) — so fewer taps is a perf OPTION,
    # not the parity default.  Measured: tools/measure_aniso.py +
    # PARITY.md.  Path tracing is unaffected (implicit-LOD base level,
    # RayGen.rgen:94).
    hybrid_aniso_taps: int = 16

    @property
    def resolution(self) -> tuple[int, int]:
        return (self.height, self.width)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
