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
    """Radiance arriving from ``direction`` (the RayGen.rgen:364 miss lookup).

    Identical math to :func:`sample_bilinear_wrap`; when ``env.quad`` is
    present the four footprint texels ride one gather."""
    if env.quad is None:
        return sample_bilinear_wrap(env.panorama, panorama_uv(direction))
    h, w = env.panorama.shape[0], env.panorama.shape[1]
    uv = panorama_uv(direction)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    rec = env.quad.reshape(h * w, 12)[y0i * w + x0i]
    c00, c10, c01, c11 = (rec[..., 0:3], rec[..., 3:6],
                          rec[..., 6:9], rec[..., 9:12])
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


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


def cube_face_uv(direction: Array) -> tuple[Array, Array]:
    """Direction -> (face, uv) for cubemap sampling, inverting
    cube_direction's face frames.  Vectorized over leading axes."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face selection: major axis + sign (order matches _FACES_N)
    face = jnp.where(
        (ax >= ay) & (ax >= az),
        jnp.where(x >= 0, 0, 1),
        jnp.where(ay >= az, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    )
    major = jnp.where(
        (ax >= ay) & (ax >= az), ax, jnp.where(ay >= az, ay, az)
    )
    inv = 1.0 / jnp.maximum(major, 1e-20)
    dn = direction * inv[..., None]
    # project onto the face's T/B axes: s = dot(d/major, T), t = dot(..., B)
    t_axis = _FACES_T[face]
    b_axis = _FACES_B[face]
    s = jnp.sum(dn * t_axis, axis=-1)
    t = jnp.sum(dn * b_axis, axis=-1)
    uv = jnp.stack([(s + 1.0) * 0.5, (t + 1.0) * 0.5], axis=-1)
    return face, uv


def sample_cube(cube: Array, direction: Array) -> Array:
    """Bilinear cubemap sample; cube is (6, S, S, C).  Clamp-at-edges per
    face (no seam filtering — matches a non-seamless sampler closely
    enough for the prefiltered IBL lookups)."""
    face, uv = cube_face_uv(direction)
    s = cube.shape[1]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    x1i = jnp.clip(x0i + 1, 0, s - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    y1i = jnp.clip(y0i + 1, 0, s - 1)

    flat = cube.reshape(-1, cube.shape[-1])
    base = face * (s * s)

    def fetch(yy, xx):
        return flat[base + yy * s + xx]

    c00 = fetch(y0i, x0i)
    c10 = fetch(y0i, x1i)
    c01 = fetch(y1i, x0i)
    c11 = fetch(y1i, x1i)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_cube_mips(mips: tuple, direction: Array, lod: Array) -> Array:
    """Trilinear sample across a prefiltered mip chain (tuple of
    (6, s, s, C) cubes): the textureLod of the hybrid IBL reflection
    lookup (Lighting.comp)."""
    n = len(mips)
    lod = jnp.clip(lod, 0.0, n - 1)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo.astype(jnp.float32))[..., None]
    samples = jnp.stack(
        [sample_cube(m, direction) for m in mips], axis=0
    )  # (n, ..., C)
    take = lambda idx: jnp.take_along_axis(  # noqa: E731
        samples, idx[None, ..., None], axis=0
    )[0]
    s_lo = take(lo)
    s_hi = take(jnp.minimum(lo + 1, n - 1))
    return s_lo * (1.0 - frac) + s_hi * frac


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
