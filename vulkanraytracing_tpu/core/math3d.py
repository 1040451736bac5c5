"""Vectorized shading math shared by every render path.

These are the jnp counterparts of the reference's GLSL common library —
Source/Shaders/Common/{Constants,Common,MonteCarlo}.glsl — with the same
constants and formulas so converged images match.  Everything operates on
SOA arrays whose last axis is the vector component (``(..., 3)``), which XLA
lays out on VPU lanes.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp
from jax import Array

# Ref: Constants.glsl:10-15
EPSILON = 1e-6
BIAS = 5e-3
PI = 3.141592654
INVERSE_PI = 0.31830988618

# Ref: RayTracing.glsl:10-11
RAY_MIN_T = 1e-3
RAY_MAX_T = 1e3


# ----------------------------------------------------------------------------
# small vector helpers


def dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1)


def length(v: Array) -> Array:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: Array) -> Array:
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), 1e-30))[..., None]


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def reflect(i: Array, n: Array) -> Array:
    """GLSL reflect: i - 2*dot(n, i)*n."""
    return i - 2.0 * dot(n, i)[..., None] * n


def mix(a: Array, b: Array, t: Array) -> Array:
    return a + (b - a) * t


def rcp(x: Array) -> Array:
    """Ref: Common.glsl:149-152 — reciprocal with 1e10 at zero."""
    return jnp.where(x == 0.0, 1e10, 1.0 / jnp.where(x == 0.0, 1.0, x))


def max_component(v: Array) -> Array:
    return jnp.max(v, axis=-1)


def bary_lerp(a: Array, b: Array, c: Array, bary: Array) -> Array:
    """Ref: Common.glsl:12-25 — bary = (1-u-v, u, v)."""
    return (
        a * bary[..., 0:1] + b * bary[..., 1:2] + c * bary[..., 2:3]
    )


# ----------------------------------------------------------------------------
# tangent frames.  TBN is stored as (..., 3, 3) with COLUMNS (T, B, N) to
# match the GLSL mat3 constructor mat3(T, B, N): TBN[..., :, 0] = T.


def get_tbn_from_nt(n: Array, t: Array) -> Array:
    """Gram-Schmidt frame from shading normal + tangent (Common.glsl:27-33)."""
    t = normalize(t - dot(t, n)[..., None] * n)
    b = cross(n, t)
    return jnp.stack([t, b, n], axis=-1)


def get_tbn_from_n(n: Array) -> Array:
    """Frame from normal only (Common.glsl:35-46): T = N x Y, falling back to
    N x X when degenerate."""
    unit_x = jnp.array([1.0, 0.0, 0.0], n.dtype)
    unit_y = jnp.array([0.0, 1.0, 0.0], n.dtype)
    t = cross(n, jnp.broadcast_to(unit_y, n.shape))
    fallback = cross(n, jnp.broadcast_to(unit_x, n.shape))
    degenerate = dot(t, t) < EPSILON
    t = normalize(jnp.where(degenerate[..., None], fallback, t))
    b = normalize(cross(n, t))
    return jnp.stack([t, b, n], axis=-1)


def tangent_to_world(v: Array, tbn: Array) -> Array:
    """TBN * v (Common.glsl:62-65)."""
    return jnp.einsum("...ij,...j->...i", tbn, v)


def world_to_tangent(v: Array, tbn: Array) -> Array:
    """v * TBN = TBN^T v (Common.glsl:67-70)."""
    return jnp.einsum("...ij,...i->...j", tbn, v)


def cos_theta_tangent(v: Array) -> Array:
    """max(v.z, 0) (Common.glsl:77-80)."""
    return jnp.maximum(v[..., 2], 0.0)


# ----------------------------------------------------------------------------
# color


def luminance(color: Array) -> Array:
    """Rec.709 luma (Common.glsl:98-101)."""
    w = jnp.array([0.2126, 0.7152, 0.0722], color.dtype)
    return dot(color, jnp.broadcast_to(w, color.shape))


def to_srgb(linear: Array) -> Array:
    """Ref: Common.glsl:82-88."""
    higher = 1.055 * jnp.power(jnp.maximum(linear, 1e-10), 1.0 / 2.4) - 0.055
    lower = linear * 12.92
    return jnp.where(linear < 0.0031308, lower, higher)


def to_linear(srgb: Array) -> Array:
    """Ref: Common.glsl:90-96."""
    higher = jnp.power((srgb + 0.055) / 1.055, 2.4)
    lower = srgb / 12.92
    return jnp.where(srgb < 0.04045, lower, higher)


def tone_mapping(linear: Array) -> Array:
    """Hejl/Burgess-Dawson filmic curve with built-in sRGB
    (Common.glsl:113-118).  Output is display-ready."""
    x = jnp.maximum(0.0, linear - 0.004)
    return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)


def uncharted_tone_mapping(linear: Array) -> Array:
    """Ref: Common.glsl:120-132 (unused by the reference renderer but part of
    its shader library; kept for capability parity)."""
    a, b, c, d, e, f, wp = 0.22, 0.30, 0.10, 0.20, 0.01, 0.30, 11.2

    def curve(x):
        return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f

    return curve(linear) / curve(jnp.asarray(wp, linear.dtype))


# ----------------------------------------------------------------------------
# Monte-Carlo sampling (MonteCarlo.glsl)


def reverse_bits32(bits: Array) -> Array:
    """Ref: MonteCarlo.glsl:12-20."""
    u = jnp.uint32
    bits = bits.astype(u)
    bits = (bits << u(16)) | (bits >> u(16))
    bits = ((bits & u(0x55555555)) << u(1)) | ((bits & u(0xAAAAAAAA)) >> u(1))
    bits = ((bits & u(0x33333333)) << u(2)) | ((bits & u(0xCCCCCCCC)) >> u(2))
    bits = ((bits & u(0x0F0F0F0F)) << u(4)) | ((bits & u(0xF0F0F0F0)) >> u(4))
    bits = ((bits & u(0x00FF00FF)) << u(8)) | ((bits & u(0xFF00FF00)) >> u(8))
    return bits


def hammersley(i: Array, n: int) -> Array:
    """Ref: MonteCarlo.glsl:22-27. Returns (..., 2)."""
    e1 = jnp.mod(i.astype(jnp.float32) / n, 1.0)
    e2 = reverse_bits32(i).astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    return jnp.stack([e1, e2], axis=-1)


def cosine_sample_hemisphere(e: Array) -> Array:
    """Ref: MonteCarlo.glsl:29-41. e is (..., 2); returns (..., 3) in tangent
    space (+Z up)."""
    phi = 2.0 * PI * e[..., 0]
    cos_theta = jnp.sqrt(e[..., 1])
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def cosine_pdf_hemisphere(cos_theta: Array) -> Array:
    """Ref: MonteCarlo.glsl:43-46."""
    return cos_theta * INVERSE_PI


def power_heuristic(pdf_a: Array, pdf_b: Array) -> Array:
    """Ref: MonteCarlo.glsl:48-53 (present-but-unused in the reference)."""
    f = pdf_a * pdf_a
    g = pdf_b * pdf_b
    return f / (f + g)
