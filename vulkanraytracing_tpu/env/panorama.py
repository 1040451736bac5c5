"""Equirectangular environment sampling and panorama->cube conversion.

The reference converts the HDR panorama into a cubemap once
(TextureHelpers.cpp:103-157 driving Compute/PanoramaToCube.comp) and samples
the cube per ray.  On TPU we sample the equirect panorama directly with the
*same* direction->uv mapping (PanoramaToCube.comp:25-30, including the Y
negation at :37), so the radiance field is identical up to the cube
resampling error — a conscious quality improvement, with the cubemap path
kept for the IBL pipeline (env.ibl).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core.math3d import PI
from vulkanraytracing_tpu.scene.types import Environment


def panorama_uv(direction: Array) -> Array:
    """Direction -> equirect uv, matching CalculatePanoramaTexCoord applied to
    direction * (1, -1, 1) (PanoramaToCube.comp:25-30, 37)."""
    x = direction[..., 0]
    y = -direction[..., 1]
    z = direction[..., 2]
    u = jnp.arctan2(z, x) * jnp.float32(0.1591) + 0.5
    v = jnp.arcsin(jnp.clip(y, -1.0, 1.0)) * jnp.float32(0.3183) + 0.5
    return jnp.stack([u, v], axis=-1)


def sample_bilinear_wrap(image: Array, uv: Array) -> Array:
    """Bilinear sample of an (H, W, C) image; wrap in u (the sampler's repeat
    address mode), clamp in v. uv layout is (..., 2) with Vulkan convention:
    v=0 is the top row."""
    h, w = image.shape[0], image.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    c00 = image[y0i, x0i]
    c10 = image[y0i, x1i]
    c01 = image[y1i, x0i]
    c11 = image[y1i, x1i]
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_environment(env: Environment, direction: Array) -> Array:
    """Radiance arriving from ``direction`` (the RayGen.rgen:364 miss lookup)."""
    return sample_bilinear_wrap(env.panorama, panorama_uv(direction))


# --- cube-face direction tables (Constants.glsl:23-48, Compute.glsl:17-26) ---

_FACES_N = jnp.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    jnp.float32,
)
_FACES_T = jnp.array(
    [[0, 0, -1], [0, 0, 1], [1, 0, 0], [1, 0, 0], [1, 0, 0], [-1, 0, 0]],
    jnp.float32,
)
_FACES_B = jnp.array(
    [[0, -1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1], [0, -1, 0], [0, -1, 0]],
    jnp.float32,
)


def cube_direction(face: int, uv: Array) -> Array:
    """uv in [0,1]^2 on a cube face -> unnormalized direction
    (Compute.glsl:17-26: N + (2u-1)*T + (2v-1)*B, then normalize)."""
    st = uv * 2.0 - 1.0
    d = (
        _FACES_N[face]
        + st[..., 0:1] * _FACES_T[face]
        + st[..., 1:2] * _FACES_B[face]
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def panorama_to_cube(env: Environment, size: int) -> Array:
    """Render the panorama into a (6, size, size, 3) cubemap — the
    PanoramaToCube.comp compute pass as one jnp map."""
    ji = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    v, u = jnp.meshgrid(ji, ji, indexing="ij")
    uv = jnp.stack([u, v], axis=-1)
    faces = []
    for face in range(6):
        d = cube_direction(face, uv)
        faces.append(sample_bilinear_wrap(env.panorama, panorama_uv(d)))
    return jnp.stack(faces, axis=0)
