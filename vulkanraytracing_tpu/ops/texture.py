"""Texture pool + sampling — the bindless-sampler replacement.

The reference binds an unbounded descriptor array of combined image samplers
(``layout(set=3, binding=2) uniform sampler2D textures[]`` in RayGen.rgen:40,
populated by TextureManager.cpp:113-176) and samples RGBA8-UNORM images with
hardware bilinear filtering; color textures are converted sRGB->linear *after
filtering* in the shader (ToLinear, RayGen.rgen:97).

TPUs have no samplers, so the pool is one flat (N, 4) uint8 texel array
holding every texture at its NATIVE resolution (capped at ``max_size``)
with a full mip chain per texture (TextureManager.cpp:113-176 +
ImageHelpers.cpp:377-417 GenerateMipLevels), addressed through small
per-(texture, level) offset/size tables.  A bilinear fetch is 4 row-gathers
+ lerp, vectorized over all rays; trilinear adds the second mip level and a
lerp (the reference's trilinear ``defaultSampler``, Renderer.cpp:20-28 —
anisotropy is dropped, documented divergence).  Filtering happens in
storage (sRGB) space and ``to_linear`` is applied by the shader afterwards
— matching the reference's UNORM-format + shader-conversion pipeline.

Ray-traced lookups in the reference use implicit-LOD ``texture()`` from the
raygen stage, which samples the base level — so the path tracer passes
``lod=None`` (base level) for parity; the hybrid raster-analog path derives
a per-pixel LOD from screen-space uv derivatives (hybrid/renderer.py).
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
    """All scene textures + mip chains in one flat texel array."""

    texels: Array     # (N, 4) uint8 — storage (sRGB for color) space
    offset: Array     # (K, L) i32 — base texel index of (texture, level);
    #                   levels past a texture's chain repeat its last level
    width: Array      # (K, L) i32 — per-level widths (>= 1)
    height: Array     # (K, L) i32
    wrap_s: Array     # (K,) i32 address mode
    wrap_t: Array     # (K,) i32
    # precomputed 2x2 bilinear footprint per texel [c00|c10|c01|c11] with
    # each texture's wrap modes baked in (same trick as
    # scene.types.build_quad_table for the environment): a bilinear tap
    # is then ONE row-gather instead of four — XLA:TPU gather cost is per
    # INDEX, the 16 channels are free.  4x pool memory; None on pools
    # built before the quad table landed (samplers fall back to 4 taps).
    quad: Optional[Array] = None  # (N, 16) uint8

    @property
    def count(self) -> int:
        return self.offset.shape[0]

    @property
    def max_levels(self) -> int:
        return self.offset.shape[1]


def _resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """RGBA u8 resize (PIL bilinear when available, numpy nearest else)."""
    if img.shape[0] == h and img.shape[1] == w:
        return img
    try:
        from PIL import Image

        return np.asarray(Image.fromarray(img, "RGBA").resize((w, h), Image.BILINEAR))
    except Exception:
        yi = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
        xi = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
        return img[yi][:, xi]


def _to_rgba8(img: np.ndarray) -> np.ndarray:
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
    return img


def build_texture_pool(
    images: Sequence[np.ndarray],
    wrap_modes: Sequence[tuple[int, int]] | None = None,
    max_size: int = 2048,
    size: int | None = None,  # legacy alias for max_size
) -> Optional[TexturePool]:
    """Build the flat mipped pool from (H, W, C) images at native sizes.

    Each texture keeps its own resolution (downsampled only when a side
    exceeds ``max_size``) and gets a full mip chain down to 1x1 — the
    TextureManager.cpp:113-176 pipeline."""
    if not images:
        return None
    if size is not None:
        max_size = size
    k = len(images)
    chains: list[list[np.ndarray]] = []
    for img in images:
        img = _to_rgba8(img)
        h, w = img.shape[:2]
        if max(h, w) > max_size:
            s = max_size / max(h, w)
            w, h = max(1, int(round(w * s))), max(1, int(round(h * s)))
            img = _resize(img, w, h)
        chain = [img]
        while w > 1 or h > 1:
            w, h = max(1, w // 2), max(1, h // 2)
            chain.append(_resize(chain[-1], w, h))
        chains.append(chain)

    lmax = max(len(c) for c in chains)
    offset = np.zeros((k, lmax), np.int32)
    width = np.ones((k, lmax), np.int32)
    height = np.ones((k, lmax), np.int32)
    flat_parts = []
    base = 0
    for i, chain in enumerate(chains):
        for lv in range(lmax):
            mip = chain[min(lv, len(chain) - 1)]
            if lv < len(chain):
                flat_parts.append(mip.reshape(-1, 4))
                off = base
                base += mip.shape[0] * mip.shape[1]
            else:  # clamp: repeat the last level's storage
                off = offset[i, lv - 1]
            offset[i, lv] = off
            height[i, lv], width[i, lv] = mip.shape[0], mip.shape[1]

    flat = np.concatenate(flat_parts, axis=0)
    if wrap_modes is None:
        wrap = np.zeros((k, 2), np.int32)
    else:
        wrap = np.asarray(wrap_modes, np.int32).reshape(k, 2)

    # per-texel 2x2 footprint table (see TexturePool.quad): for texel
    # (y, x) of each (texture, level) store [c(y,x) | c(y,x+1) | c(y+1,x)
    # | c(y+1,x+1)].  Built only when EVERY texture is REPEAT/REPEAT
    # (the glTF default and all procedural pools): under repeat,
    # wrap(x0+1) == wrap(wrap(x0)+1) so the single-gather tap is EXACT;
    # clamp/mirror differ in the outer half-texel band, so such pools
    # keep the 4-tap path.
    quad_j = None
    if (wrap == WRAP_REPEAT).all():
        def _shift(img: np.ndarray) -> np.ndarray:
            right = np.roll(img, -1, axis=1)
            down = np.roll(img, -1, axis=0)
            diag = np.roll(down, -1, axis=1)
            return np.concatenate([img, right, down, diag], axis=-1)

        quad = np.empty((flat.shape[0], 16), np.uint8)
        for i, chain in enumerate(chains):
            for lv in range(min(lmax, len(chain))):
                mip = chain[lv]
                off = offset[i, lv]
                n = mip.shape[0] * mip.shape[1]
                quad[off : off + n] = _shift(mip).reshape(-1, 16)
        quad_j = jnp.asarray(quad)

    return TexturePool(
        texels=jnp.asarray(flat),
        offset=jnp.asarray(offset),
        width=jnp.asarray(width),
        height=jnp.asarray(height),
        wrap_s=jnp.asarray(wrap[:, 0]),
        wrap_t=jnp.asarray(wrap[:, 1]),
        quad=quad_j,
    )


def _apply_wrap(x: Array, n: Array, mode: Array) -> Array:
    """Texel-index wrapping per address mode.  x, n: broadcastable i32."""
    rep = jnp.mod(x, n)
    clamp = jnp.clip(x, 0, n - 1)
    period = jnp.mod(x, 2 * n)
    mirror = jnp.where(period < n, period, 2 * n - 1 - period)
    return jnp.where(mode == WRAP_REPEAT, rep,
                     jnp.where(mode == WRAP_CLAMP, clamp, mirror))


def _bilinear(
    pool: TexturePool, base: Array, w: Array, h: Array,
    ws: Array, wt: Array, uv: Array,
) -> Array:
    """One bilinear tap at a given mip (base offset + w/h per ray)."""
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = _apply_wrap(x0f.astype(jnp.int32), w, ws)
    x1 = _apply_wrap(x0f.astype(jnp.int32) + 1, w, ws)
    y0 = _apply_wrap(y0f.astype(jnp.int32), h, wt)
    y1 = _apply_wrap(y0f.astype(jnp.int32) + 1, h, wt)

    if pool.quad is not None:
        # ONE row-gather for the whole 2x2 footprint (TexturePool.quad):
        # the repeat-wrapped neighbor texels ride the same row, so a
        # bilinear tap costs one gather instead of four — gather cost is
        # per index, channels are free (tools/ab perf_gather)
        rec = pool.quad[base + y0 * w + x0].astype(jnp.float32) * (1.0 / 255.0)
        c00, c10 = rec[..., 0:4], rec[..., 4:8]
        c01, c11 = rec[..., 8:12], rec[..., 12:16]
    else:
        def fetch(yy, xx):
            # one row-gather of (N, 4) per tap (clamp/mirror pools)
            return pool.texels[base + yy * w + xx].astype(jnp.float32) * (
                1.0 / 255.0
            )

        c00 = fetch(y0, x0)
        c10 = fetch(y0, x1)
        c01 = fetch(y1, x0)
        c11 = fetch(y1, x1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def _level_meta(pool: TexturePool, tid: Array, level: Array):
    """(base, w, h) for per-ray (texture, level) — small-table row-gathers
    plus a one-hot select over the level axis (L <= ~13)."""
    lsel = (
        jnp.arange(pool.max_levels, dtype=jnp.int32)[None, :] == level[:, None]
    )
    base = jnp.sum(jnp.where(lsel, pool.offset[tid], 0), axis=1)
    w = jnp.sum(jnp.where(lsel, pool.width[tid], 0), axis=1)
    h = jnp.sum(jnp.where(lsel, pool.height[tid], 0), axis=1)
    return base, w, h


class AnisoFootprint(NamedTuple):
    """Per-ray uv-space pixel footprint as the two screen-axis derivative
    vectors, for N-tap anisotropic filtering (the reference samples with
    ``maxAnisotropy = 16``, VulkanConfig.hpp:44 + Renderer.cpp:20-28;
    trilinear-only was the documented divergence this closes)."""

    duvdx: Array  # (R, 2) uv change per pixel step in x
    duvdy: Array  # (R, 2) uv change per pixel step in y
    taps: int     # static tap count (1 = plain trilinear)


def _trilinear(pool, tid, ws, wt, uv, lod):
    """Two-level bilinear lerp at a per-ray float lod."""
    lmax = pool.max_levels - 1
    lod = jnp.clip(lod, 0.0, float(lmax))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, lmax)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    b0, mw0, mh0 = _level_meta(pool, tid, l0)
    b1, mw1, mh1 = _level_meta(pool, tid, l1)
    c0 = _bilinear(pool, b0, mw0, mh0, ws, wt, uv)
    c1 = _bilinear(pool, b1, mw1, mh1, ws, wt, uv)
    return c0 * (1.0 - frac) + c1 * frac


def sample_pool(
    pool: TexturePool,
    tex_id: Array,
    uv: Array,
    footprint: "Array | AnisoFootprint | None" = None,
) -> Array:
    """Filtered fetch: (R,) texture ids + (R, 2) uv -> (R, 4) float [0,1].

    ``footprint=None`` samples the base level bilinearly (the ray-tracing
    implicit-LOD path, RayGen.rgen:94).  An (R,) float ``footprint`` — the
    uv-space extent covered by one pixel (max |duv/dxy|) — gives trilinear
    filtering at lod = log2(footprint * texture_size), the hybrid path's
    ``defaultSampler`` minus anisotropy.  An :class:`AnisoFootprint` gives
    N-tap anisotropic filtering: lod from the MINOR footprint axis
    (clamped so the anisotropy ratio <= taps) and ``taps`` trilinear taps
    spaced along the major axis — the standard footprint-assembly
    approximation of the reference's hardware anisotropy 16.  tex_id < 0
    is allowed (callers mask the result); it samples texture 0."""
    tid = jnp.maximum(tex_id, 0)
    ws = pool.wrap_s[tid]
    wt = pool.wrap_t[tid]

    if footprint is None:
        base = pool.offset[tid, 0]
        w = pool.width[tid, 0]
        h = pool.height[tid, 0]
        return _bilinear(pool, base, w, h, ws, wt, uv)

    w0 = pool.width[tid, 0]
    h0 = pool.height[tid, 0]

    if isinstance(footprint, AnisoFootprint):
        sz = jnp.stack(
            [w0.astype(jnp.float32), h0.astype(jnp.float32)], axis=1
        )
        ex = footprint.duvdx * sz  # texel-space footprint axes
        ey = footprint.duvdy * sz
        lx = jnp.sqrt(jnp.maximum(jnp.sum(ex * ex, axis=1), 1e-16))
        ly = jnp.sqrt(jnp.maximum(jnp.sum(ey * ey, axis=1), 1e-16))
        maj_len = jnp.maximum(lx, ly)
        min_len = jnp.minimum(lx, ly)
        taps = max(int(footprint.taps), 1)
        # clamp the ratio to the tap budget (hardware clamps to maxAniso)
        min_eff = jnp.maximum(min_len, maj_len / float(taps))
        lod = jnp.log2(jnp.maximum(min_eff, 1e-8))
        major_uv = jnp.where(
            (lx >= ly)[:, None], footprint.duvdx, footprint.duvdy
        )
        acc = None
        for i in range(taps):
            off = (i + 0.5) / taps - 0.5
            c = _trilinear(pool, tid, ws, wt, uv + major_uv * off, lod)
            acc = c if acc is None else acc + c
        return acc * (1.0 / taps)

    texels = footprint * jnp.maximum(w0, h0).astype(jnp.float32)
    lod = jnp.log2(jnp.maximum(texels, 1e-8))
    return _trilinear(pool, tid, ws, wt, uv, lod)
