"""Material unpacking at hit points — shared by the path tracer and the
hybrid deferred pass.

Ref: UnpackMaterial (RayGen.rgen:84-119): factor * texture for base color
(sRGB->linear after filtering), roughness/metallic from the .gb channels,
emission (sRGB->linear), and tangent-space normal mapping scaled by
normalScale with a rebuilt TBN.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.ops.intersect import SurfaceAttributes
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.scene.types import Scene


class UnpackedSurface(NamedTuple):
    surface: bsdf_mod.Surface
    tbn: Array        # (R, 3, 3)
    occlusion: Array  # (R,) — hybrid mode only (1.0 without a texture)


def unpack_material(scene: Scene, attrs: SurfaceAttributes) -> UnpackedSurface:
    mats = scene.materials
    mid = attrs.material_id
    base_color = mats.base_color_factor[mid, :3]
    roughness = mats.roughness_factor[mid]
    metallic = mats.metallic_factor[mid]
    emission = mats.emission_factor[mid, :3]
    tbn = math3d.get_tbn_from_nt(attrs.normal, attrs.tangent)
    occlusion = jnp.ones_like(roughness)

    if scene.textures is not None:
        from vulkanraytracing_tpu.ops.texture import TexturePool, sample_pool

        pool = TexturePool(*scene.textures)
        uv = attrs.uv

        # base color *= ToLinear(tex.rgb) (RayGen.rgen:94-98)
        bc_tex = mats.base_color_texture[mid]
        bc = sample_pool(pool, bc_tex, uv)
        base_color = base_color * jnp.where(
            (bc_tex >= 0)[:, None], math3d.to_linear(bc[:, :3]), 1.0
        )
        # roughness *= tex.g, metallic *= tex.b (:100-107)
        rm_tex = mats.roughness_metallic_texture[mid]
        rm = sample_pool(pool, rm_tex, uv)
        has_rm = rm_tex >= 0
        roughness = roughness * jnp.where(has_rm, rm[:, 1], 1.0)
        metallic = metallic * jnp.where(has_rm, rm[:, 2], 1.0)
        # emission *= ToLinear(tex.rgb) (:109-113)
        em_tex = mats.emission_texture[mid]
        em = sample_pool(pool, em_tex, uv)
        emission = emission * jnp.where(
            (em_tex >= 0)[:, None], math3d.to_linear(em[:, :3]), 1.0
        )
        # occlusion (hybrid G-buffer slot)
        oc_tex = mats.occlusion_texture[mid]
        oc = sample_pool(pool, oc_tex, uv)
        occlusion = jnp.where(oc_tex >= 0, oc[:, 0], 1.0)
        # normal mapping (:86-92)
        n_tex = mats.normal_texture[mid]
        ns = sample_pool(pool, n_tex, uv)[:, :3] * 2.0 - 1.0
        scale = mats.normal_scale[mid]
        ns = math3d.normalize(
            ns * jnp.stack([scale, scale, jnp.ones_like(scale)], axis=-1)
        )
        n_mapped = math3d.tangent_to_world(ns, tbn)
        tbn_mapped = math3d.get_tbn_from_n(n_mapped)
        tbn = jnp.where((n_tex >= 0)[:, None, None], tbn_mapped, tbn)

    surface = bsdf_mod.make_surface(base_color, roughness, metallic, emission)
    return UnpackedSurface(surface=surface, tbn=tbn, occlusion=occlusion)
