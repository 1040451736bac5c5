"""vulkanraytracing_tpu — a TPU-native rendering framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of
ExtinctionHD/VulkanRayTracing ("SteelEngine"): progressive Monte-Carlo path
tracing of glTF scenes with PBR metallic-roughness materials, HDR environment
lighting with analytic-sun extraction, next-event estimation for sun + point
lights, Russian roulette, and per-frame accumulation — plus a deferred
("hybrid") lighting mode with image-based lighting.

The compute path is pure JAX (jit/Pallas) designed for TPU hardware:

- acceleration structures are an on-device LBVH (Morton radix sort + Karras
  hierarchy + AABB refit) instead of VK_KHR_acceleration_structure;
- the GLSL raygen/closest-hit/any-hit/miss pipeline becomes vectorized
  SOA wavefront kernels over ray batches (8x128 VPU lanes as the "warp");
- multi-chip scaling is `shard_map` over a `jax.sharding.Mesh` (pixels /
  samples sharded over ICI) instead of multi-queue Vulkan.

Layer map (mirrors SURVEY.md section 1 of the reference):

- ``utils``     — logging / timing          (ref: Source/Utils)
- ``core``      — RNG, math, framebuffer    (ref: Source/Shaders/Common)
- ``scene``     — glTF loader, camera, materials, lights (ref: Source/Engine/Scene)
- ``accel``     — LBVH/TLAS builders        (ref: AccelerationStructureManager)
- ``ops``       — intersection/traversal/texture kernels (ref: hardware traceRayEXT)
- ``pt``        — path-tracing integrator   (ref: Source/Shaders/PathTracing)
- ``env``       — environment preprocessing (ref: DirectLighting, ImageBasedLighting)
- ``hybrid``    — deferred lighting mode    (ref: Source/Shaders/Hybrid, Render/Stages)
- ``parallel``  — device mesh / sharding    (no reference counterpart; TPU-native)
- ``app``       — engine loop, CLI, IO      (ref: Source/Engine/Engine.cpp)
"""

__version__ = "0.1.0"

from vulkanraytracing_tpu.core.jit_utils import enable_compile_cache

# Persistent XLA executable cache: on the tunneled TPU relay a full-frame
# compile costs 5-25 minutes of wall clock, so every re-run of an
# identical program (bench re-runs, parity resumes, A/B harness restarts
# after a relay outage) should pay it once.  The reference's analog is
# runtime-compiled GLSL cached by the Vulkan driver's pipeline cache
# (ShaderManager.cpp compiles per run; the driver caches ISA).
enable_compile_cache()

from vulkanraytracing_tpu.config import Config, RenderMode  # noqa: F401
