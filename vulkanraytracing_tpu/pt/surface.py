"""Material unpacking at hit points — shared by the path tracer and the
hybrid deferred pass.

Ref: UnpackMaterial (RayGen.rgen:84-119): factor * texture for base color
(sRGB->linear after filtering), roughness/metallic from the .gb channels,
emission (sRGB->linear), and tangent-space normal mapping scaled by
normalScale with a rebuilt TBN.

Gather economy: all per-material factors ride ONE one-hot MXU select
(ops.select) — the naive formulation was ~12 small-table gathers costing
~120 ms/bounce at 2M rays.  Texture taps stay real gathers (the pool is
too large for one-hot); PT mode skips the occlusion texture entirely
(MaterialRT has no occlusion slot — it is a hybrid G-buffer quantity,
Hybrid/Hybrid.h:8-16)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.ops.intersect import SurfaceAttributes
from vulkanraytracing_tpu.ops.select import onehot_select
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.scene.types import Scene


class UnpackedSurface(NamedTuple):
    surface: bsdf_mod.Surface
    tbn: Array        # (R, 3, 3)
    occlusion: Array  # (R,) — hybrid mode only (1.0 without a texture)


def unpack_material(
    scene: Scene,
    attrs: SurfaceAttributes,
    with_occlusion: bool = False,
    footprint: Array | None = None,
) -> UnpackedSurface:
    mats = scene.materials
    mid = attrs.material_id

    # one fused select over every per-material column this function needs:
    # [base_color(3), emission(3), roughness, metallic, normal_scale,
    #  bc_tex, rm_tex, em_tex, n_tex, oc_tex]
    table = jnp.concatenate(
        [
            mats.base_color_factor[:, :3],
            mats.emission_factor[:, :3],
            mats.roughness_factor[:, None],
            mats.metallic_factor[:, None],
            mats.normal_scale[:, None],
            mats.base_color_texture[:, None].astype(jnp.float32),
            mats.roughness_metallic_texture[:, None].astype(jnp.float32),
            mats.emission_texture[:, None].astype(jnp.float32),
            mats.normal_texture[:, None].astype(jnp.float32),
            mats.occlusion_texture[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    rec = onehot_select(mid, table)
    base_color = rec[:, 0:3]
    emission = rec[:, 3:6]
    roughness = rec[:, 6]
    metallic = rec[:, 7]
    scale = rec[:, 8]
    bc_tex = rec[:, 9].astype(jnp.int32)
    rm_tex = rec[:, 10].astype(jnp.int32)
    em_tex = rec[:, 11].astype(jnp.int32)
    n_tex = rec[:, 12].astype(jnp.int32)
    oc_tex = rec[:, 13].astype(jnp.int32)

    tbn = math3d.get_tbn_from_nt(attrs.normal, attrs.tangent)
    occlusion = jnp.ones_like(roughness)

    if scene.textures is not None:
        from vulkanraytracing_tpu.ops.texture import TexturePool, sample_pool

        pool = TexturePool(*scene.textures)
        uv = attrs.uv

        # base color *= ToLinear(tex.rgb) (RayGen.rgen:94-98)
        bc = sample_pool(pool, bc_tex, uv, footprint)
        base_color = base_color * jnp.where(
            (bc_tex >= 0)[:, None], math3d.to_linear(bc[:, :3]), 1.0
        )
        # roughness *= tex.g, metallic *= tex.b (:100-107)
        rm = sample_pool(pool, rm_tex, uv, footprint)
        has_rm = rm_tex >= 0
        roughness = roughness * jnp.where(has_rm, rm[:, 1], 1.0)
        metallic = metallic * jnp.where(has_rm, rm[:, 2], 1.0)
        # emission *= ToLinear(tex.rgb) (:109-113)
        em = sample_pool(pool, em_tex, uv, footprint)
        emission = emission * jnp.where(
            (em_tex >= 0)[:, None], math3d.to_linear(em[:, :3]), 1.0
        )
        # occlusion (hybrid G-buffer slot only; PT skips the 4 taps)
        if with_occlusion:
            oc = sample_pool(pool, oc_tex, uv, footprint)
            occlusion = jnp.where(oc_tex >= 0, oc[:, 0], 1.0)
        # normal mapping (:86-92)
        ns = sample_pool(pool, n_tex, uv, footprint)[:, :3] * 2.0 - 1.0
        ns = math3d.normalize(
            ns * jnp.stack([scale, scale, jnp.ones_like(scale)], axis=-1)
        )
        n_mapped = math3d.tangent_to_world(ns, tbn)
        tbn_mapped = math3d.get_tbn_from_n(n_mapped)
        tbn = jnp.where((n_tex >= 0)[:, None, None], tbn_mapped, tbn)

    surface = bsdf_mod.make_surface(base_color, roughness, metallic, emission)
    return UnpackedSurface(surface=surface, tbn=tbn, occlusion=occlusion)
