"""Image-based-lighting precomputation (split-sum IBL).

Ref: Source/Engine/Scene/Private/ImageBasedLighting.cpp:335-503 and the
three compute shaders it drives:

- Irradiance.comp — per-texel hemisphere Riemann sum (delta 0.025);
- Reflection.comp — per-texel 2048-sample GGX prefilter, mip = roughness;
- SpecularBRDF.comp — 4096-sample split-sum scale/offset LUT.

TPU-native redesign: the irradiance and reflection convolutions become
dense weighted matmuls on the MXU — for every output direction, the
integral over the environment is

    out[o] = sum_t W(dot(N_o, d_t)) * L_t * omega_t / norm

which is (OUT, T) = relu/kernel((OUT, 3) @ (3, T)) followed by
(OUT, T) @ (T, 3).  This evaluates the same integrals as the reference's
per-texel sampling loops but deterministically (no MC noise) and at MXU
rates instead of thousands of serial texture taps per texel.  The BRDF LUT
keeps the reference's exact estimator (Hammersley + GGX + Vis_Schlick
k=a/2) since it needs no texture access.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.core.math3d import EPSILON, PI
from vulkanraytracing_tpu.env.panorama import cube_direction
from vulkanraytracing_tpu.pt.bsdf import (
    importance_sample_ggx,
    specular_pdf,
    vis_schlick,
)
from vulkanraytracing_tpu.scene.types import Environment


def _equirect_samples(
    panorama: Array, height: int
) -> tuple[Array, Array, Array]:
    """Downsample the panorama to ~(height, 2*height) and return per-texel
    (directions (T, 3), radiance (T, 3), solid_angle (T,))."""
    h, w = height, height * 2
    ph, pw = panorama.shape[0], panorama.shape[1]
    fy = max(ph // h, 1)
    fx = max(pw // w, 1)
    crop = panorama[: (ph // fy) * fy, : (pw // fx) * fx]
    small = crop.reshape(ph // fy, fy, pw // fx, fx, 3).mean(axis=(1, 3))
    sh, sw = small.shape[0], small.shape[1]

    v = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / sh
    u = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / sw
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    # invert panorama_uv (panorama.py): u = atan2(z,x)*0.1591+0.5,
    # v = asin(-y)*0.3183+0.5
    theta = (uu - 0.5) / 0.1591
    lat = (vv - 0.5) / 0.3183  # asin(-y)
    y = -jnp.sin(lat)
    c = jnp.cos(lat)
    x = c * jnp.cos(theta)
    z = c * jnp.sin(theta)
    dirs = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)

    # equirect texel solid angle: (2pi/W)(pi/H) cos(latitude)
    omega = (2.0 * PI / sw) * (PI / sh) * jnp.maximum(c, 0.0)
    return dirs, small.reshape(-1, 3), omega.reshape(-1)


def _cube_dirs(size: int) -> Array:
    ji = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    v, u = jnp.meshgrid(ji, ji, indexing="ij")
    uv = jnp.stack([u, v], axis=-1)
    return jnp.stack(
        [cube_direction(f, uv) for f in range(6)], axis=0
    )  # (6, S, S, 3)


@functools.partial(jax.jit, static_argnames=("size", "env_height"))
def compute_irradiance_cube(
    panorama: Array, size: int = 128, env_height: int = 64
) -> Array:
    """Cosine-convolved irradiance cube (6, size, size, 3).

    Evaluates irradiance(N) = (1/pi) * integral L(d) max(N.d, 0) domega —
    the same quantity Irradiance.comp:41-58 Riemann-sums (its mean * pi over
    a (theta, phi) grid equals the integral / pi) — as one MXU matmul
    pair."""
    dirs_out = _cube_dirs(size).reshape(-1, 3)
    dirs_in, radiance, omega = _equirect_samples(panorama, env_height)
    cos = jnp.maximum(dirs_out @ dirs_in.T, 0.0)  # (OUT, T) on the MXU
    irr = (cos @ (radiance * omega[:, None])) / PI  # (OUT, 3)
    return irr.reshape(6, size, size, 3)


def _ggx_reflected_kernel(cos_rl: Array, a2: Array) -> Array:
    """Weight for radiance arriving from angle acos(c) off the reflection
    direction, for the GGX prefilter: D_GGX evaluated at the half-angle
    (the N=V=R assumption of Reflection.comp:41-43) times NoL."""
    cos_h = jnp.sqrt(jnp.maximum((1.0 + cos_rl) * 0.5, 0.0))
    nol = jnp.maximum(cos_rl, 0.0)
    d = (cos_h * a2 - cos_h) * cos_h + 1.0
    return (a2 / (PI * d * d)) * nol


@functools.partial(jax.jit, static_argnames=("size", "mip_count", "env_height"))
def compute_reflection_cube(
    panorama: Array, size: int = 512, mip_count: int = 10, env_height: int = 64
) -> tuple[Array, ...]:
    """GGX-prefiltered reflection mips (mip m at roughness m/(mips-1),
    ImageBasedLighting.cpp:434-435), via MXU convolution against the same
    GGX lobe Reflection.comp importance-samples (normalized by the summed
    kernel, matching its result /= totalWeight)."""
    from vulkanraytracing_tpu.env.panorama import panorama_uv, sample_bilinear_wrap

    dirs_in, radiance, omega = _equirect_samples(panorama, env_height)
    weighted = radiance * omega[:, None]
    mips = []
    for m in range(mip_count):
        s = max(size >> m, 1)
        roughness = m / max(mip_count - 1, 1)
        a = roughness * roughness
        a2 = jnp.maximum(a * a, EPSILON)
        dirs_out = _cube_dirs(s).reshape(-1, 3)
        if m == 0:
            # roughness 0: mirror lookup (Reflection.comp lod-0 delta lobe)
            out = sample_bilinear_wrap(panorama, panorama_uv(dirs_out))
        else:
            cos = dirs_out @ dirs_in.T  # (OUT, T) MXU
            w = _ggx_reflected_kernel(cos, a2)
            norm = w @ omega  # (OUT,)
            out = (w @ weighted) / jnp.maximum(norm, 1e-20)[:, None]
        mips.append(out.reshape(6, s, s, 3))
    return tuple(mips)


@functools.partial(jax.jit, static_argnames=("size", "sample_count"))
def compute_brdf_lut(size: int = 256, sample_count: int = 4096) -> Array:
    """Split-sum specular BRDF LUT (size, size, 2) — exact SpecularBRDF.comp
    math (:25-66): x = NoV, y = roughness; 4096 Hammersley-GGX samples with
    Vis_Schlick k=a/2."""
    uv = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    nov, roughness = jnp.meshgrid(uv, uv, indexing="xy")
    nov = nov.reshape(-1)          # (P,)
    roughness = roughness.reshape(-1)
    v = jnp.stack(
        [jnp.sqrt(jnp.maximum(1.0 - nov * nov, 0.0)), jnp.zeros_like(nov), nov],
        axis=-1,
    )
    a = roughness * roughness
    a2 = jnp.maximum(a * a, 0.0)

    def body(carry, i):
        scale, offset = carry
        xi = math3d.hammersley(jnp.full(nov.shape, i, jnp.uint32), sample_count)
        h = importance_sample_ggx(xi, a2)
        l = 2.0 * math3d.dot(v, h)[..., None] * h - v
        nol = jnp.maximum(l[..., 2], 0.0)
        noh = jnp.maximum(h[..., 2], 0.0)
        voh = jnp.maximum(math3d.dot(v, h), 0.0)
        vis = vis_schlick(a, nov, nol)
        vis_nol_pdf = vis * nol * (4.0 * voh / jnp.maximum(noh, 1e-20))
        fc = (1.0 - voh) ** 5
        ok = nol > 0.0
        scale = scale + jnp.where(ok, (1.0 - fc) * vis_nol_pdf, 0.0)
        offset = offset + jnp.where(ok, fc * vis_nol_pdf, 0.0)
        return (scale, offset), None

    (scale, offset), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(nov), jnp.zeros_like(nov)),
        jnp.arange(sample_count, dtype=jnp.uint32),
    )
    lut = jnp.stack([scale, offset], axis=-1) / sample_count
    return lut.reshape(size, size, 2)


def bake_ibl(
    env: Environment,
    irradiance_size: int = 128,
    reflection_size: int = 512,
    brdf_size: int = 256,
) -> Environment:
    """Populate the environment's IBL fields (Environment ctor analog,
    Environment.cpp:38-47 -> ImageBasedLighting::GenerateTextures)."""
    import math

    mip_count = int(math.log2(reflection_size)) + 1
    return env._replace(
        irradiance=compute_irradiance_cube(env.panorama, irradiance_size),
        reflection=compute_reflection_cube(
            env.panorama, reflection_size, mip_count
        ),
        brdf_lut=compute_brdf_lut(brdf_size),
    )
