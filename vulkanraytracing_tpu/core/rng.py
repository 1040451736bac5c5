"""Counter-style vectorized xoroshiro64** RNG, bit-compatible with the
reference's GLSL sampler.

Ref: Source/Shaders/Common/Random.glsl:16-25 (xoroshiro64** step), :27-31
(mantissa-trick uniform float in [0, 1)), :49-57 (Thomas Wang 32-bit hash),
and RayGen.rgen:57-66 (per-pixel seeding: s0 = hash((x<<16)|y),
s1 = hash(frame), then one warm-up draw).

State is a pair of uint32 arrays of any shape, so one logical RNG stream per
ray lives in two SOA lanes — exactly the GLSL ``uvec2 seed`` but vectorized.
All ops are uint32 adds/mults/shifts/xors on the VPU; there is no
cross-lane interaction, so this shards freely over a device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_U = jnp.uint32


def _rotl(x: Array, k: int) -> Array:
    return (x << _U(k)) | (x >> _U(32 - k))


def wang_hash(x: Array) -> Array:
    """Thomas Wang 32-bit integer hash (Random.glsl:49-57)."""
    x = x.astype(_U)
    x = (x ^ _U(61)) ^ (x >> _U(16))
    x = x + (x << _U(3))
    x = x ^ (x >> _U(4))
    x = x * _U(0x27D4EB2D)
    x = x ^ (x >> _U(15))
    return x


def rand_uint(s0: Array, s1: Array) -> tuple[Array, Array, Array]:
    """One xoroshiro64** draw (Random.glsl:16-25). Returns (bits, s0', s1')."""
    result = _rotl(s0 * _U(0x9E3779BB), 5) * _U(5)
    s1 = s1 ^ s0
    s0 = _rotl(s0, 26) ^ s1 ^ (s1 << _U(9))
    s1 = _rotl(s1, 13)
    return result, s0, s1


def next_float(s0: Array, s1: Array) -> tuple[Array, Array, Array]:
    """Uniform float32 in [0, 1) via the 0x3F800000 mantissa trick
    (Random.glsl:27-31)."""
    bits, s0, s1 = rand_uint(s0, s1)
    u = _U(0x3F800000) | (bits >> _U(9))
    f = jax.lax.bitcast_convert_type(u, jnp.float32) - jnp.float32(1.0)
    return f, s0, s1


def next_vec2(s0: Array, s1: Array) -> tuple[Array, Array, Array]:
    a, s0, s1 = next_float(s0, s1)
    b, s0, s1 = next_float(s0, s1)
    return jnp.stack([a, b], axis=-1), s0, s1


def next_vec3(s0: Array, s1: Array) -> tuple[Array, Array, Array]:
    a, s0, s1 = next_float(s0, s1)
    b, s0, s1 = next_float(s0, s1)
    c, s0, s1 = next_float(s0, s1)
    return jnp.stack([a, b, c], axis=-1), s0, s1


def pixel_seed(x: Array, y: Array, frame_index: Array | int) -> tuple[Array, Array]:
    """Per-pixel per-frame stream seeding (RayGen.rgen:57-66).

    ``x`` is the column (gl_LaunchIDEXT.x), ``y`` the row.  The reference packs
    s0 = (x << 16) | y, s1 = frame, Wang-hashes both and discards one draw.
    """
    x = x.astype(_U)
    y = y.astype(_U)
    frame = jnp.asarray(frame_index, _U)
    s0 = wang_hash((x << _U(16)) | y)
    s1 = wang_hash(jnp.broadcast_to(frame, s0.shape))
    _, s0, s1 = rand_uint(s0, s1)
    return s0, s1
