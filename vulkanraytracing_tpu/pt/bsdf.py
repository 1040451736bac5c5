"""PBR metallic-roughness BSDF — exact parity with the reference shaders.

Ref: Source/Shaders/Common/PBR.glsl (D_GGX :25-29, F_Schlick :31-35,
Vis_Schlick with k = a/2 :43-51, ImportanceSampleGGX :53-65, SpecularPdf
:67-75) and Source/Shaders/PathTracing/PathTracing.glsl (Surface :27-38,
GetSpecularWeight :40-45, EvaluateBSDF :47-64, PdfBSDF :66-72, SampleBSDF
:74-93).  All quirks are preserved deliberately (SURVEY.md section 7):
Vis_Schlick's k = a/2, and the lobe-selection weight ``sw`` mixing the two
pdfs linearly.

All directions here are in *tangent space* (+Z = shading normal), matching
the wo/wi/wh convention of the reference's bounce loop.  Vectorized over
leading axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core import math3d, rng
from vulkanraytracing_tpu.core.math3d import EPSILON, PI

DIELECTRIC_F0 = 0.04  # PBR.glsl:15


class Surface(NamedTuple):
    """Shading point (PathTracing.glsl:27-38). The TBN lives outside —
    integrator keeps it as a separate (R, 3, 3) array."""

    base_color: Array  # (..., 3)
    roughness: Array   # (...)
    metallic: Array    # (...)
    emission: Array    # (..., 3)
    f0: Array          # (..., 3)
    a: Array           # (...)  roughness^2
    a2: Array          # (...)  max(a^2, EPSILON)
    sw: Array          # (...)  specular lobe selection weight


def make_surface(base_color: Array, roughness: Array, metallic: Array, emission: Array) -> Surface:
    """Derived surface terms (UnpackMaterial tail, RayGen.rgen:115-118)."""
    f0 = math3d.mix(
        jnp.full_like(base_color, DIELECTRIC_F0), base_color, metallic[..., None]
    )
    a = roughness * roughness
    a2 = jnp.maximum(a * a, EPSILON)
    sw = get_specular_weight(base_color, f0, metallic)
    return Surface(
        base_color=base_color, roughness=roughness, metallic=metallic,
        emission=emission, f0=f0, a=a, a2=a2, sw=sw,
    )


def get_specular_weight(base_color: Array, f0: Array, metallic: Array) -> Array:
    """Ref: PathTracing.glsl:40-45."""
    diffuse_lum = math3d.luminance(base_color) * (1.0 - metallic)
    specular_lum = math3d.luminance(f0)
    return jnp.minimum(1.0, specular_lum / (specular_lum + diffuse_lum))


def d_ggx(a2: Array, noh: Array) -> Array:
    """Ref: PBR.glsl:25-29."""
    d = (noh * a2 - noh) * noh + 1.0
    return a2 / (PI * d * d)


def f_schlick(f0: Array, voh: Array) -> Array:
    """Ref: PBR.glsl:31-35."""
    fc = (1.0 - voh) ** 5
    return f0 + (1.0 - f0) * fc[..., None]


def f_schlick_roughness(f0: Array, voh: Array, roughness: Array) -> Array:
    """Ref: PBR.glsl:37-41 (used by the hybrid IBL path)."""
    fc = (1.0 - voh) ** 5
    return f0 + (jnp.maximum(1.0 - roughness[..., None], f0) - f0) * fc[..., None]


def vis_schlick(a: Array, nov: Array, nol: Array) -> Array:
    """Schlick visibility with k = a/2 (PBR.glsl:43-51; a reference quirk to
    preserve — UE4 uses k = a/2 only for analytic lights)."""
    k = a * 0.5
    vis_v = nov * (1.0 - k) + k
    vis_l = nol * (1.0 - k) + k
    return 0.25 * math3d.rcp(vis_v * vis_l)


def importance_sample_ggx(e: Array, a2: Array) -> Array:
    """GGX half-vector sample in tangent space (PBR.glsl:53-65)."""
    phi = 2.0 * PI * e[..., 0]
    cos_theta = jnp.sqrt(
        jnp.maximum((1.0 - e[..., 1]) / (1.0 + (a2 - 1.0) * e[..., 1]), 0.0)
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def importance_pdf_ggx(cos_theta: Array, a2: Array) -> Array:
    """Ref: PBR.glsl:67-70."""
    return cos_theta * d_ggx(a2, cos_theta)


def specular_pdf(noh: Array, a2: Array, voh: Array) -> Array:
    """Ref: PBR.glsl:72-75."""
    return importance_pdf_ggx(noh, a2) / jnp.maximum(4.0 * voh, EPSILON)


def evaluate_bsdf(surface: Surface, wo: Array, wi: Array, wh: Array) -> Array:
    """kD * Lambert + D*F*Vis (PathTracing.glsl:47-64)."""
    nov = math3d.cos_theta_tangent(wo)
    nol = math3d.cos_theta_tangent(wi)
    noh = math3d.cos_theta_tangent(wh)
    voh = jnp.maximum(math3d.dot(wo, wh), 0.0)

    d = d_ggx(surface.a2, noh)
    f = f_schlick(surface.f0, voh)
    vis = vis_schlick(surface.a, nov, nol)

    kd = (1.0 - f) * (1.0 - surface.metallic[..., None])
    diffuse = kd * surface.base_color * math3d.INVERSE_PI
    specular = (d * vis)[..., None] * f
    return diffuse + specular


def pdf_bsdf(surface: Surface, wo: Array, wi: Array, wh: Array) -> Array:
    """mix(cosinePdf, specularPdf, sw) (PathTracing.glsl:66-72).

    Note the reference feeds dot(wi, wh) — not clamped — into SpecularPdf."""
    diffuse_pdf = math3d.cosine_pdf_hemisphere(math3d.cos_theta_tangent(wi))
    spec_pdf = specular_pdf(
        math3d.cos_theta_tangent(wh), surface.a2, math3d.dot(wi, wh)
    )
    return math3d.mix(diffuse_pdf, spec_pdf, surface.sw)


def sample_bsdf(
    surface: Surface, wo: Array, s0: Array, s1: Array
) -> tuple[Array, Array, Array, Array, Array]:
    """Draw wi, returning (bsdf, wi, pdf, s0', s1').

    Ref: PathTracing.glsl:74-93 — draws NextVec3: E.xy for the lobe sample,
    E.z for lobe selection (specular if E.z < sw).  Both lobes are evaluated
    and selected with where() — the TPU way to express the branch."""
    e, s0, s1 = rng.next_vec3(s0, s1)
    exy = e[..., :2]

    # Specular branch: wh ~ GGX, wi = -reflect(wo, wh) = reflect(-wo, wh)... GLSL
    # reflect(I, N) = I - 2 dot(N, I) N, and -reflect(wo, wh) with I=wo gives
    # 2 dot(wh, wo) wh - wo, the mirror of wo about wh.
    wh_spec = importance_sample_ggx(exy, surface.a2)
    wi_spec = 2.0 * math3d.dot(wh_spec, wo)[..., None] * wh_spec - wo

    # Diffuse branch: wi ~ cosine hemisphere, wh = normalize(wo + wi).
    wi_diff = math3d.cosine_sample_hemisphere(exy)
    wh_diff = math3d.normalize(wo + wi_diff)

    use_spec = (e[..., 2] < surface.sw)[..., None]
    wi = jnp.where(use_spec, wi_spec, wi_diff)
    wh = jnp.where(use_spec, wh_spec, wh_diff)

    pdf = pdf_bsdf(surface, wo, wi, wh)
    bsdf = evaluate_bsdf(surface, wo, wi, wh)
    return bsdf, wi, pdf, s0, s1
