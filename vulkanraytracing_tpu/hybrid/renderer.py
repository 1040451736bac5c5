"""The hybrid (deferred) render mode.

Ref: the reference's second RenderMode (EngineHelpers.hpp:32-38): a raster
G-buffer pass (GBufferStage), a ray-queried deferred lighting compute pass
(LightingStage driving Hybrid/Lighting.comp), and a forward pass compositing
the environment skybox and point-light gizmo spheres (ForwardStage).

TPU redesign: rasterization is replaced by a primary-visibility ray cast
into the same G-buffer layout (GBufferStage.hpp:12-18 — world normal,
emission, albedo+occlusion, roughness+metallic, depth), then Lighting.comp's
math (:71-190) runs as one fused per-pixel function:

- per point light: GGX direct lighting with a ray-queried shadow
  (TraceShadowRay -> Hybrid/RayQuery.glsl, alpha-aware, no backface cull);
- sun direct lighting with a shadow ray;
- IBL ambient: irradiance-cube diffuse + prefiltered-reflection specular
  with the split-sum BRDF LUT, scaled by occlusion;
- miss pixels show the environment (ForwardStage skybox), and point-light
  gizmo spheres composite over when closer than scene depth.

Output is a tone-mapped display image — the hybrid mode is not progressive
(no accumulation), exactly like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.config import Config
from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.core.math3d import BIAS, EPSILON, RAY_MAX_T, RAY_MIN_T
from vulkanraytracing_tpu.env.panorama import sample_cube, sample_cube_mips, sample_environment
from vulkanraytracing_tpu.ops import trace
from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
from vulkanraytracing_tpu.ops.texture import AnisoFootprint
from vulkanraytracing_tpu.pt import bsdf as B
from vulkanraytracing_tpu.pt.integrator import intersect_point_light_spheres
from vulkanraytracing_tpu.pt.surface import unpack_material
from vulkanraytracing_tpu.pt.render import tile_pixel_coords, untile_image
from vulkanraytracing_tpu.scene.camera import CameraPT
from vulkanraytracing_tpu.scene.types import Scene


def _direct_term(surface, n, v, l, nov, f0, metallic, albedo):
    """The shared GGX direct-lighting term of Lighting.comp:102-176."""
    h = math3d.normalize(l + v)
    nol = jnp.maximum(math3d.dot(n, l), 0.0)
    noh = jnp.maximum(math3d.dot(n, h), 0.0)
    voh = jnp.maximum(math3d.dot(v, h), 0.0)
    d = B.d_ggx(surface.a2, noh)
    f = B.f_schlick(f0, voh)
    vis = B.vis_schlick(surface.a, nov, nol)
    kd = (1.0 - f) * (1.0 - metallic[:, None])
    diffuse = kd * albedo * math3d.INVERSE_PI
    specular = (d * vis)[:, None] * f
    return diffuse + specular, nol


from vulkanraytracing_tpu.core.jit_utils import hot_jit

# AOT-compiled executable per exact (scene signature, config).  jax 0.9's
# global pjit dispatch fastpath can mis-resolve executables when scenes of
# different pytree structure alternate through one jit in a long-lived
# process ("Execution supplied 40 buffers but compiled program expected 64"
# — minimized repro: tools/ab/repro_bufbug.py, lights scene -> lightless
# scene -> lights scene again fails on the third call; to report upstream
# against jax 0.9.0 once this box has network egress).  lower().compile()
# objects bypass that cache entirely; we key them by full avals ourselves.
# LRU-bounded: a long-lived viewer cycling scenes must not grow this
# without bound (each entry pins a compiled executable's device buffers).
from collections import OrderedDict

_render_hybrid_jits: OrderedDict = OrderedDict()
_RENDER_HYBRID_CACHE_CAP = 16


def render_hybrid(scene: Scene, cfg: Config, camera: CameraPT) -> Array:
    leaves, treedef = jax.tree.flatten((scene, camera))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return _render_hybrid_impl(scene, cfg, camera)  # under an outer jit
    # ONE jit instance per exact call signature (treedef + every leaf's
    # shape/dtype + config), each holding exactly one compiled executable.
    # With multiple signatures under a single jit, jax 0.9's C++ dispatch
    # fastpath can resolve a call to the WRONG signature's executable once
    # enough other compilations happen in the process ("Execution supplied
    # 40 buffers but compiled program expected 64"); deterministic repro in
    # tools/ab/repro_bufbug.py (cornell -> single-triangle -> cornell renders —
    # the scenes share a treedef but differ in shapes).
    key = (treedef, tuple((x.shape, str(x.dtype)) for x in leaves), cfg)

    def _fresh():
        def _impl(scene, camera, cfg=cfg):
            return _render_hybrid_impl(scene, cfg, camera)

        fn = hot_jit(_impl)
        _render_hybrid_jits[key] = fn
        while len(_render_hybrid_jits) > _RENDER_HYBRID_CACHE_CAP:
            _render_hybrid_jits.popitem(last=False)  # evict least-recent
        return fn

    fn = _render_hybrid_jits.get(key) or _fresh()
    _render_hybrid_jits.move_to_end(key)
    try:
        return fn(scene, camera)
    except ValueError as e:  # self-heal the jax 0.9 mis-dispatch (above)
        if "buffers but compiled program expected" not in str(e):
            raise
        return _fresh()(scene, camera)


def _render_hybrid_impl(scene: Scene, cfg: Config, camera: CameraPT) -> Array:
    """One hybrid-mode frame -> (H, W, 3) display image."""
    h, w = cfg.height, cfg.width
    px, py, valid, ty, tx = tile_pixel_coords(w, h)
    r = px.shape[0]
    f32 = jnp.float32

    # --- G-buffer pass: primary visibility at pixel centers (no jitter —
    # rasterization samples pixel centers) ---
    o, d = _center_rays(camera, px, py, w, h)
    t_min = jnp.full((r,), camera.z_near, f32)
    t_max = jnp.where(valid, camera.z_far, 0.0)
    hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max, cull_backface=True)

    attrs = fetch_surface_attributes(scene.geometry, hit)
    # Screen-space uv derivatives -> texture footprint, the analog of the
    # raster pipeline's implicit derivatives feeding trilinear mip
    # selection (TextureManager's defaultSampler; mips from
    # ImageHelpers.cpp:377-417).  The tiled wavefront is untiled to an
    # image, differenced against the neighboring pixel, and retiled —
    # pure reshape/transpose, no gathers.
    footprint = None
    if scene.textures is not None:
        uv3 = jnp.concatenate([attrs.uv, jnp.zeros((r, 1), f32)], axis=1)
        uv_img = untile_image(uv3, w, h, ty, tx)[..., :2]
        ddx = uv_img - jnp.roll(uv_img, 1, axis=1)
        ddy = uv_img - jnp.roll(uv_img, 1, axis=0)

        def retile(img):  # (h, w, 2) -> (r, 2) wavefront order
            img = jnp.pad(img, ((0, ty * 16 - h), (0, tx * 16 - w), (0, 0)))
            return img.reshape(ty, 16, tx, 16, 2).transpose(
                0, 2, 1, 3, 4).reshape(-1, 2)

        taps = int(getattr(cfg, "hybrid_aniso_taps", 1))
        if taps > 1:
            # N-tap anisotropic footprint (ref maxAnisotropy 16,
            # VulkanConfig.hpp:44; see ops.texture.AnisoFootprint)
            footprint = AnisoFootprint(
                duvdx=retile(ddx), duvdy=retile(ddy), taps=taps
            )
        else:
            fp = jnp.maximum(
                jnp.abs(ddx).max(axis=-1), jnp.abs(ddy).max(axis=-1)
            )  # (h, w)
            fp = jnp.pad(fp, ((0, ty * 16 - h), (0, tx * 16 - w)))
            footprint = (
                fp.reshape(ty, 16, tx, 16).transpose(0, 2, 1, 3).reshape(-1)
            )
    unpacked = unpack_material(
        scene, attrs, with_occlusion=True, footprint=footprint
    )
    surface = unpacked.surface
    n = unpacked.tbn[..., 2]
    albedo = surface.base_color
    metallic = surface.metallic
    occlusion = unpacked.occlusion
    f0 = surface.f0
    emission = surface.emission

    position = o + d * hit.t[:, None]
    v = math3d.normalize(camera.inverse_view[:3, 3] - position)
    nov = jnp.maximum(math3d.dot(n, v), 0.0)
    shadow_origin = position + n * BIAS

    # --- shadow rays: ALL sets (sun + L point lights) ride ONE any-hit
    # traversal, the same concatenation the integrator uses for its NEE
    # sets — program size and traversal count stay flat in light count
    # instead of unrolling one trace per light (Lighting.comp dispatches
    # per pixel and loops lights on the GPU; one batched trace is the
    # wavefront equivalent) ---
    sun_l = math3d.normalize(-scene.direct_light.direction[:3])
    sun_l_b = jnp.broadcast_to(sun_l, (r, 3))
    shadow_dirs = [sun_l_b]
    shadow_tmax = [jnp.where(hit.is_hit, f32(RAY_MAX_T), f32(0.0))]

    per_light = []  # (l, attenuation, lcol, irr) for the shading loop
    if scene.has_point_lights:
        lights = scene.point_lights
        for i in range(lights.count):
            lpos = lights.position[i, :3]
            lcol = lights.color[i, :3]
            delta = lpos - position
            dist_sq = math3d.dot(delta, delta)
            attenuation = math3d.rcp(dist_sq)
            l = math3d.normalize(delta)
            irr = attenuation * jnp.maximum(math3d.dot(n, l), 0.0) * math3d.luminance(
                jnp.broadcast_to(lcol, (r, 3))
            )
            per_light.append((l, attenuation, lcol, irr))
            shadow_dirs.append(l)
            shadow_tmax.append(
                jnp.where(hit.is_hit & (irr > EPSILON), jnp.sqrt(dist_sq), 0.0)
            )

    sets = len(shadow_dirs)
    occ = trace.trace_any(
        scene, cfg,
        jnp.tile(shadow_origin, (sets, 1)),
        jnp.concatenate(shadow_dirs, axis=0),
        jnp.full((sets * r,), RAY_MIN_T, f32),
        jnp.concatenate(shadow_tmax, axis=0),
    ).reshape(sets, r)

    # --- point lights (Lighting.comp:100-140) ---
    point_lighting = jnp.zeros((r, 3), f32)
    for i, (l, attenuation, lcol, irr) in enumerate(per_light):
        occluded = occ[1 + i]
        brdf, nol = _direct_term(surface, n, v, l, nov, f0, metallic, albedo)
        lighting = (
            nol[:, None] * lcol * (~occluded)[:, None] * attenuation[:, None]
        )
        point_lighting += jnp.where(
            (irr > EPSILON)[:, None], brdf * lighting, 0.0
        )

    # --- sun (Lighting.comp:142-176) ---
    sun_occluded = occ[0]
    brdf, nol = _direct_term(surface, n, v, sun_l_b, nov, f0, metallic, albedo)
    direct_lighting = (
        brdf
        * nol[:, None]
        * scene.direct_light.color[:3]
        * (~sun_occluded)[:, None]
    )

    # --- IBL ambient (Lighting.comp:178-196) ---
    env = scene.environment
    if env.irradiance is not None and env.reflection is not None and env.brdf_lut is not None:
        irradiance = sample_cube(env.irradiance, n)
        ks = B.f_schlick_roughness(f0, nov, surface.roughness)
        kd = (1.0 - ks) * (1.0 - metallic[:, None])
        refl_dir = 2.0 * math3d.dot(v, n)[:, None] * n - v  # -reflect(V, N)
        lod = surface.roughness * (len(env.reflection) - 1)
        reflection = sample_cube_mips(env.reflection, refl_dir, lod)
        lut_size = env.brdf_lut.shape[0]
        lx = jnp.clip((nov * lut_size).astype(jnp.int32), 0, lut_size - 1)
        ly = jnp.clip(
            (surface.roughness * lut_size).astype(jnp.int32), 0, lut_size - 1
        )
        scale_offset = env.brdf_lut[ly, lx]
        diffuse = kd * irradiance * albedo
        specular = (
            f0 * scale_offset[:, 0:1] + scale_offset[:, 1:2]
        ) * reflection
        ambient = (diffuse + specular) * occlusion[:, None]
    else:
        # IBL not baked (env.ibl.bake_ibl not run): no ambient term
        ambient = jnp.zeros((r, 3), f32)

    shaded = math3d.tone_mapping(
        ambient + direct_lighting + point_lighting + emission
    )

    # --- forward pass: skybox on miss + light gizmos (ForwardStage) ---
    sky = math3d.tone_mapping(sample_environment(env, d))
    color = jnp.where(hit.is_hit[:, None], shaded, sky)

    if scene.has_point_lights:
        pl_t, pl_color = intersect_point_light_spheres(
            scene.point_lights, cfg.point_light_radius, o, d, t_min,
            jnp.where(valid, camera.z_far, 0.0),
        )
        gizmo = (pl_t >= 0.0) & (hit.is_miss | (pl_t < hit.t))
        color = jnp.where(gizmo[:, None], math3d.tone_mapping(pl_color), color)

    return untile_image(color, w, h, ty, tx)


def _center_rays(camera: CameraPT, px, py, width, height):
    """Primary rays through pixel centers (raster-equivalent sampling)."""
    size = jnp.array([width, height], jnp.float32)
    pix = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    uv = (pix + 0.5) / size
    xy = uv * 2.0 - 1.0
    target = jnp.einsum(
        "ij,...j->...i",
        camera.inverse_proj,
        jnp.concatenate([xy, jnp.ones_like(xy)], axis=-1),
    )
    t3 = math3d.normalize(target[..., :3])
    direction = jnp.einsum(
        "ij,...j->...i",
        camera.inverse_view,
        jnp.concatenate([t3, jnp.zeros_like(t3[..., :1])], axis=-1),
    )
    d = math3d.normalize(direction[..., :3])
    o = jnp.broadcast_to(camera.inverse_view[:3, 3], d.shape)
    return o, d
