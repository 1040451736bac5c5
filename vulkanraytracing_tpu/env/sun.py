"""Analytic-sun extraction from the HDR panorama.

Ref: Source/Engine/Scene/Private/DirectLighting.cpp — a 3-kernel GPU
reduction: Luminance.comp (8x8 block luminance sums in 24-bit fixed point),
Location.comp (argmax block), Parameters.comp (block center -> spherical
direction + LOD-filtered color), then a host-side luminance clamp to 25
(DirectLighting.cpp:283-298).  On TPU the whole cascade collapses into a
reshape-sum + argmax + gather — one fused jit.

Parity notes: the fixed-point quantization (value/10000 * 0xFFFFFF,
Luminance.comp:26-29) is reproduced so ties resolve like the reference;
the color is the 8x8 block mean (the reference samples the panorama at
LOD log2(8), Parameters.comp:44-47 — the same box average up to the
sampler's mip filter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.core.math3d import PI
from vulkanraytracing_tpu.scene.types import DirectLight

BLOCK = 8
MAX_FLOAT = 10000.0
MAX_UINT = float(0x00FFFFFF)
K_MAX_LUMINANCE = 25.0  # DirectLighting.cpp kMaxLuminance


@jax.jit
def extract_direct_light(panorama: Array) -> DirectLight:
    """(H, W, 3) linear panorama -> DirectLight{direction, color}."""
    h, w = panorama.shape[0], panorama.shape[1]
    bh, bw = h // BLOCK, w // BLOCK
    crop = panorama[: bh * BLOCK, : bw * BLOCK]
    blocks = crop.reshape(bh, BLOCK, bw, BLOCK, 3).transpose(0, 2, 1, 3, 4)

    lum = math3d.luminance(blocks)  # (bh, bw, 8, 8)
    q = (jnp.clip(lum / MAX_FLOAT, 0.0, 1.0) * MAX_UINT).astype(jnp.uint32)
    block_sum = jnp.sum(q, axis=(2, 3))  # (bh, bw)

    flat_idx = jnp.argmax(block_sum)
    by = flat_idx // bw
    bx = flat_idx % bw

    # Parameters.comp:28-47 — block center -> uv -> spherical direction
    px = bx.astype(jnp.float32) * BLOCK + BLOCK / 2.0
    py = by.astype(jnp.float32) * BLOCK + BLOCK / 2.0
    u = px / w
    v = py / h
    x = u * 2.0 - 1.0
    y = (1.0 - v) * 2.0 - 1.0
    theta = x * PI
    phi = y * PI * 0.5
    direction = jnp.stack(
        [
            jnp.cos(phi) * jnp.cos(theta),
            jnp.sin(phi),
            jnp.cos(phi) * jnp.sin(theta),
        ]
    )
    direction = -direction / jnp.linalg.norm(direction)

    color = jnp.mean(blocks[by, bx], axis=(0, 1))  # 8x8 box = LOD-3 sample

    # host clamp (DirectLighting.cpp:293-296): color /= max(lum/25, 1)
    lum_c = math3d.luminance(color)
    color = color / jnp.maximum(lum_c / K_MAX_LUMINANCE, 1.0)

    return DirectLight(
        direction=jnp.concatenate([direction, jnp.zeros((1,), jnp.float32)]),
        color=jnp.concatenate([color, jnp.ones((1,), jnp.float32)]),
    )
