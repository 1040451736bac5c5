"""Progressive frame rendering and accumulation state.

Ref: RenderSystemPT (Source/Engine/Systems/Private/RenderSystemPT.cpp) —
owns the accumulation image + accumulationCount pushed as ``accumIndex``
(:234-237), resets on camera move / resize (:403-417, :443-446); and the
accumulate-and-store math in RayGen.rgen:314-323:
``result = (vec4(value, 1) + accumIndex * last) / (accumIndex + 1)`` written
to an RGBA8 image (the 8-bit quantization feeds back into the next frame —
reproduced when ``cfg.parity_quantization``).

Unlike the reference, the (framebuffer, accumulation index) pair is an
explicit, serializable ``RenderState`` pytree — this is the checkpoint /
resume surface (SURVEY.md section 5) and what a multi-chip mesh shards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from vulkanraytracing_tpu.config import Config
from vulkanraytracing_tpu.pt.integrator import TraceStats, pathtrace
from vulkanraytracing_tpu.scene.camera import CameraPT
from vulkanraytracing_tpu.scene.types import Scene


class RenderState(NamedTuple):
    """Progressive accumulation state — serializable and shardable."""

    accumulation: Array  # (H, W, 3) f32 tone-mapped running average
    accum_index: Array   # () uint32 — frames accumulated so far

    @property
    def spp(self) -> Array:
        return self.accum_index


def create_render_state(cfg: Config) -> RenderState:
    return RenderState(
        accumulation=jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
        accum_index=jnp.uint32(0),
    )


def reset_accumulation(state: RenderState) -> RenderState:
    """RenderSystemPT::ResetAccumulation (:443-446) — fired on eCameraUpdate,
    resize, and shader reload."""
    return RenderState(
        accumulation=jnp.zeros_like(state.accumulation),
        accum_index=jnp.uint32(0),
    )


def _quantize_rgb8(x: Array) -> Array:
    """RGBA8 storage round-trip (UNORM: round(clamp(x)*255)/255)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_frame(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    state: RenderState,
) -> tuple[RenderState, TraceStats]:
    """Trace one progressive sample per pixel and fold it into the
    accumulator.  Returns the new state (whose ``accumulation`` is the
    display image — the reference writes the same value to both the
    accumulation image and the swapchain, RayGen.rgen:321-322)."""
    h, w = cfg.height, cfg.width
    total = h * w
    chunk = min(cfg.ray_chunk_size, total)
    num_chunks = -(-total // chunk)
    padded = num_chunks * chunk

    pix = jnp.arange(padded, dtype=jnp.uint32)
    px = (pix % w).reshape(num_chunks, chunk)
    py = (pix // w).reshape(num_chunks, chunk)

    def body(args):
        cx, cy = args
        color, stats = pathtrace(
            scene, cfg, camera, cx, cy, w, h, state.accum_index
        )
        return color, stats.rays

    colors, rays = jax.lax.map(body, (px, py))
    value = colors.reshape(padded, 3)[:total].reshape(h, w, 3)

    n = state.accum_index.astype(jnp.float32)
    result = (value + n * state.accumulation) / (n + 1.0)
    if cfg.parity_quantization:
        result = _quantize_rgb8(result)

    new_state = RenderState(
        accumulation=result, accum_index=state.accum_index + jnp.uint32(1)
    )
    return new_state, TraceStats(rays=jnp.sum(rays))


def render_progressive(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    spp: int,
    state: RenderState | None = None,
) -> tuple[RenderState, float]:
    """Accumulate ``spp`` progressive frames; returns (state, total_rays)."""
    if state is None:
        state = create_render_state(cfg)
    total_rays = 0.0
    for _ in range(spp):
        state, stats = render_frame(scene, cfg, camera, state)
        total_rays += float(stats.rays)
    return state, total_rays


def to_display(state: RenderState) -> np.ndarray:
    """Accumulated image -> uint8 HxWx3 (already tone-mapped + sRGB by the
    filmic curve, Common.glsl:113-118)."""
    img = np.asarray(state.accumulation)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
