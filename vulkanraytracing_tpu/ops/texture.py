"""Texture pool + sampling — the bindless-sampler replacement.

The reference binds an unbounded descriptor array of combined image samplers
(``layout(set=3, binding=2) uniform sampler2D textures[]`` in RayGen.rgen:40,
populated by TextureManager.cpp:113-176) and samples RGBA8-UNORM images with
hardware bilinear filtering; color textures are converted sRGB->linear *after
filtering* in the shader (ToLinear, RayGen.rgen:97).

TPUs have no samplers, so the pool is one dense (K, S, S, 4) uint8 array —
every texture resampled to S x S at load time (uv space is normalized, so
aspect is irrelevant; S defaults to 512).  A fetch is 4 flat gathers + lerp,
vectorized over all rays.  Filtering happens in storage (sRGB) space and
``to_linear`` is applied by the shader afterwards — matching the reference's
UNORM-format + shader-conversion pipeline exactly.

Ray-traced lookups in the reference use implicit-LOD ``texture()`` from the
raygen stage, which samples the base level — so no mip chain is needed for
path-trace parity (the hybrid raster path owns mips).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from jax import Array

# address modes (subset of vk::SamplerAddressMode, SceneModel.cpp:30-109)
WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2


class TexturePool(NamedTuple):
    """All scene textures, resampled to one resolution."""

    data: Array       # (K, S, S, 4) uint8 — storage (sRGB for color) space
    wrap_s: Array     # (K,) i32 address mode
    wrap_t: Array     # (K,) i32

    @property
    def count(self) -> int:
        return self.data.shape[0]

    @property
    def size(self) -> int:
        return self.data.shape[1]


def build_texture_pool(
    images: Sequence[np.ndarray],
    wrap_modes: Sequence[tuple[int, int]] | None = None,
    size: int = 512,
) -> Optional[TexturePool]:
    """Resample images (H, W, C) uint8 to (size, size, 4) and stack.

    Uses PIL bilinear when available, else numpy nearest."""
    if not images:
        return None
    resized = []
    for img in images:
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1
            )
        if img.shape[0] != size or img.shape[1] != size:
            try:
                from PIL import Image

                img = np.asarray(
                    Image.fromarray(img, "RGBA").resize(
                        (size, size), Image.BILINEAR
                    )
                )
            except Exception:
                yi = (np.arange(size) * img.shape[0] // size).clip(0, img.shape[0] - 1)
                xi = (np.arange(size) * img.shape[1] // size).clip(0, img.shape[1] - 1)
                img = img[yi][:, xi]
        resized.append(img)
    data = jnp.asarray(np.stack(resized, axis=0))
    k = data.shape[0]
    if wrap_modes is None:
        wrap = np.zeros((k, 2), np.int32)
    else:
        wrap = np.asarray(wrap_modes, np.int32).reshape(k, 2)
    return TexturePool(
        data=data,
        wrap_s=jnp.asarray(wrap[:, 0]),
        wrap_t=jnp.asarray(wrap[:, 1]),
    )


def _apply_wrap(x: Array, n: int, mode: Array) -> Array:
    """Texel-index wrapping per address mode. x: (..., ) int32 texel coords."""
    rep = jnp.mod(x, n)
    clamp = jnp.clip(x, 0, n - 1)
    period = jnp.mod(x, 2 * n)
    mirror = jnp.where(period < n, period, 2 * n - 1 - period)
    return jnp.where(mode == WRAP_REPEAT, rep,
                     jnp.where(mode == WRAP_CLAMP, clamp, mirror))


def sample_pool(pool: TexturePool, tex_id: Array, uv: Array) -> Array:
    """Bilinear fetch: (R,) texture ids + (R, 2) uv -> (R, 4) float in [0,1].

    tex_id < 0 is allowed (callers mask the result); it samples texture 0."""
    s = pool.size
    tid = jnp.maximum(tex_id, 0)
    ws = pool.wrap_s[tid]
    wt = pool.wrap_t[tid]

    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = _apply_wrap(x0f.astype(jnp.int32), s, ws)
    x1 = _apply_wrap(x0f.astype(jnp.int32) + 1, s, ws)
    y0 = _apply_wrap(y0f.astype(jnp.int32), s, wt)
    y1 = _apply_wrap(y0f.astype(jnp.int32) + 1, s, wt)

    flat = pool.data.reshape(-1, 4)
    base = tid * (s * s)

    def fetch(yy, xx):
        return flat[base + yy * s + xx].astype(jnp.float32) * (1.0 / 255.0)

    c00 = fetch(y0, x0)
    c10 = fetch(y0, x1)
    c01 = fetch(y1, x0)
    c11 = fetch(y1, x1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
