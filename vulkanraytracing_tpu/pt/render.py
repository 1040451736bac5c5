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
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from vulkanraytracing_tpu.config import Config
from vulkanraytracing_tpu.pt.integrator import TraceStats, pathtrace
from vulkanraytracing_tpu.scene.camera import CameraPT
from vulkanraytracing_tpu.scene.types import Scene


TILE = 16  # pixels per tile side; TILE*TILE == packet lane count


def tile_pixel_coords(width: int, rows: int, row0: int = 0):
    """Pixel coordinates in 16x16-tile order (the TPU analog of the
    reference's thread-group swizzle, Compute/ThreadGroupTiling.glsl:18-69):
    packets of 256 consecutive rays form one square screen tile, which is
    what makes packet traversal coherent.

    Returns (px, py, valid, tiles_y, tiles_x) covering rows
    [row0, row0+rows) padded up to whole tiles."""
    tx = -(-width // TILE)
    ty = -(-rows // TILE)
    n = tx * ty * TILE * TILE
    t = jnp.arange(n, dtype=jnp.uint32)
    tile = t >> jnp.uint32(8)
    lane = t & jnp.uint32(255)
    tile_x = tile % tx
    tile_y = tile // tx
    px = tile_x * TILE + (lane & jnp.uint32(15))
    py = jnp.uint32(row0) + tile_y * TILE + (lane >> jnp.uint32(4))
    valid = (px < width) & (py < row0 + rows)
    return px, py, valid, ty, tx


def untile_image(colors: Array, width: int, rows: int, ty: int, tx: int) -> Array:
    """(N, 3) tile-ordered colors -> (rows, width, 3) image crop."""
    img = colors.reshape(ty, tx, TILE, TILE, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(ty * TILE, tx * TILE, 3)
    return img[:rows, :width]


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


from vulkanraytracing_tpu.core.jit_utils import hot_jit


def render_frame_impl(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    state: RenderState,
) -> tuple[RenderState, TraceStats]:
    """Trace one progressive sample per pixel and fold it into the
    accumulator.  Returns the new state (whose ``accumulation`` is the
    display image — the reference writes the same value to both the
    accumulation image and the swapchain, RayGen.rgen:321-322).

    This is the UNJITTED implementation: call it when composing inside
    your own ``jax.jit`` (``render_frame`` carries per-compile TPU options,
    which jax forbids on nested jits)."""
    h, w = cfg.height, cfg.width
    px, py, valid, ty, tx = tile_pixel_coords(w, h)
    total = px.shape[0]

    chunk = min(max(cfg.ray_chunk_size, TILE * TILE), total)
    chunk -= chunk % (TILE * TILE)  # whole packets per chunk
    num_chunks = -(-total // chunk)
    pad = num_chunks * chunk - total
    if pad:
        px = jnp.concatenate([px, jnp.zeros((pad,), px.dtype)])
        py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])

    def body(args):
        cx, cy, cv = args
        color, stats = pathtrace(
            scene, cfg, camera, cx, cy, w, h, state.accum_index, valid=cv
        )
        return color, stats.rays

    colors, rays = jax.lax.map(
        body,
        (
            px.reshape(num_chunks, chunk),
            py.reshape(num_chunks, chunk),
            valid.reshape(num_chunks, chunk),
        ),
    )
    value = untile_image(colors.reshape(-1, 3)[:total], w, h, ty, tx)

    n = state.accum_index.astype(jnp.float32)
    result = (value + n * state.accumulation) / (n + 1.0)
    if cfg.parity_quantization:
        result = _quantize_rgb8(result)

    new_state = RenderState(
        accumulation=result, accum_index=state.accum_index + jnp.uint32(1)
    )
    return new_state, TraceStats(rays=jnp.sum(rays))


render_frame = hot_jit(render_frame_impl, static_argnames=("cfg",))


def _render_span_impl(scene, cfg, camera, state, n: int):
    """``n`` progressive frames under ONE jit dispatch (lax.scan over the
    unjitted frame impl).  On the tunneled TPU relay each dispatch pays a
    round trip, so 1024-spp convergence runs (the parity artifact, long
    CLI renders) dispatch spans instead of frames: same math, same RNG
    stream (accum_index rides the carried state), 1/n the dispatches."""

    def step(st, _):
        st2, stats = render_frame_impl(scene, cfg, camera, st)
        return st2, stats.rays

    st, rays = jax.lax.scan(step, state, None, length=n)
    return st, TraceStats(rays=jnp.sum(rays))


render_span = hot_jit(_render_span_impl, static_argnames=("cfg", "n"))

# span length for render_progressive: long enough to amortize the relay
# round trip, short enough to keep compile time and per-dispatch wall
# time (watchdog) bounded
# Frames per scanned span (one relay round trip each).  VRT_SPAN=1
# falls back to per-frame dispatch: the 16-frame scan of a 262k-tri
# packet-backend frame crashed the TPU worker 4/4 times in r05 (the
# sponza262k parity oracle) while single frames of the same program run.
_SPAN = int(os.environ.get("VRT_SPAN", "16"))


def render_progressive(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    spp: int,
    state: RenderState | None = None,
) -> tuple[RenderState, float]:
    """Accumulate ``spp`` progressive frames; returns (state, total_rays).

    The per-frame ray count is summed ON DEVICE and read back once at the
    end: a ``float(stats.rays)`` per frame forces a host sync through the
    axon relay (~1.4 s/frame at 512x512 measured — the readback round
    trip, not the render, dominated), serializing what is otherwise an
    async dispatch chain the relay can pipeline."""
    if state is None:
        state = create_render_state(cfg)
    total_rays = jnp.zeros((), jnp.float32)
    spans, rest = divmod(spp, _SPAN)
    for _ in range(spans):
        state, stats = render_span(scene, cfg, camera, state, _SPAN)
        total_rays = total_rays + stats.rays
    for _ in range(rest):
        state, stats = render_frame(scene, cfg, camera, state)
        total_rays = total_rays + stats.rays
    return state, float(total_rays)


def to_display(state: RenderState, cfg: Config | None = None) -> np.ndarray:
    """Accumulated image -> uint8 HxWx3.

    In parity mode the accumulator is already display-ready (tone-mapped +
    sRGB by the filmic curve, Common.glsl:113-118); in linear-HDR mode the
    curve is applied here."""
    img = state.accumulation
    if cfg is not None and not cfg.tone_map_before_accumulation:
        from vulkanraytracing_tpu.core.math3d import tone_mapping

        img = tone_mapping(img)
    img = np.asarray(img)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
