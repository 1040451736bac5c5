"""Device mesh + sharded rendering — the distributed backend.

The reference is single-GPU/single-queue (SURVEY.md section 2.7): its only
"communication" is PCIe staging uploads.  The TPU framework scales the one
parallelism axis a path tracer has — pixels/samples — across chips:

- geometry/BVH/materials/environment are *replicated* per chip (Sponza-class
  scenes are far below HBM capacity);
- the pixel dimension is sharded over a 1-D ``jax.sharding.Mesh`` axis
  ("pixels"), so each chip traces H/n rows and accumulates its slice;
- no collective is needed per frame — accumulation is local to the pixel
  shard; only display/readback gathers (an all_gather XLA inserts when the
  host pulls the image).  Sample-parallel mode (same pixels, different
  sample streams per chip, psum-averaged) is the alternative axis and uses
  one psum per frame.

Multi-host (DCN) scaling is the same code with a larger mesh — XLA routes
ICI vs DCN transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vulkanraytracing_tpu.config import Config
from vulkanraytracing_tpu.pt.render import RenderState, render_frame
from vulkanraytracing_tpu.pt.integrator import TraceStats, pathtrace
from vulkanraytracing_tpu.scene.camera import CameraPT
from vulkanraytracing_tpu.scene.types import Scene


def make_render_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices; axis "pixels"."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("pixels",))


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Replicate every scene array on every chip."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(scene, sharding)


def shard_render_frame(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    state: RenderState,
    mesh: Mesh,
) -> tuple[RenderState, TraceStats]:
    """One progressive frame with rows sharded over the mesh.

    Each device traces its H/n-row slice with the SAME per-pixel RNG streams
    as the single-device renderer (seeds derive from absolute pixel
    coordinates), so sharded output == single-device output exactly — the
    distributed-correctness oracle from SURVEY.md section 4.
    """
    n = mesh.devices.size
    h, w = cfg.height, cfg.width
    assert h % n == 0, f"height {h} must divide over {n} devices"
    rows_per = h // n

    from vulkanraytracing_tpu.pt.render import tile_pixel_coords, untile_image

    # Commit every operand to this mesh explicitly: mixing uncommitted /
    # single-device / mesh-sharded operands across calls can resolve to a
    # stale cached executable with a different device assignment.
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("pixels", None, None))
    scene = jax.device_put(scene, repl)
    camera = jax.device_put(camera, repl)
    accum = jax.device_put(state.accumulation, rows)
    accum_index = jax.device_put(state.accum_index, repl)

    def per_device(accum_slice, accum_index, camera_dev, scene_dev):
        dev = jax.lax.axis_index("pixels")
        row0 = dev * rows_per
        # tile coords relative to row 0, shifted by this device's slice start
        px, py, valid, ty, tx = tile_pixel_coords(w, rows_per, 0)
        py = py + row0.astype(jnp.uint32)
        valid &= py < h

        color, stats = pathtrace(
            scene_dev, cfg, camera_dev, px, py, w, h, accum_index, valid=valid
        )
        value = untile_image(color, w, rows_per, ty, tx)
        rays = stats.rays

        count = accum_index.astype(jnp.float32)
        result = (value + count * accum_slice) / (count + 1.0)
        if cfg.parity_quantization:
            result = jnp.round(jnp.clip(result, 0.0, 1.0) * 255.0) / 255.0
        return result, jnp.reshape(jax.lax.psum(jnp.sum(rays), "pixels"), ())

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("pixels", None, None), P(), P(), P()),
        out_specs=(P("pixels", None, None), P()),
        check_vma=False,
    )

    from vulkanraytracing_tpu.core.jit_utils import hot_jit

    new_accum, rays = hot_jit(sharded)(accum, accum_index, camera, scene)
    new_state = RenderState(
        accumulation=new_accum, accum_index=state.accum_index + jnp.uint32(1)
    )
    return new_state, TraceStats(rays=jnp.sum(rays))


def shard_render_frame_samples(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    state: RenderState,
    mesh: Mesh,
) -> tuple[RenderState, TraceStats]:
    """One step of SAMPLE-parallel progressive rendering: every device
    renders the FULL image with its own accumulation-index stream (device k
    of n contributes samples accum_index*n + k), and the n per-device
    samples are psum-averaged into the accumulator — n spp of progress per
    call.  This is the alternative parallel axis to pixel sharding: same
    estimator, different RNG schedule (equivalent to n sequential frames
    reordered), so images match single-chip rendering statistically but not
    bit-for-bit.
    """
    n = mesh.devices.size
    h, w = cfg.height, cfg.width
    axis = mesh.axis_names[0]

    from vulkanraytracing_tpu.core.jit_utils import hot_jit
    from vulkanraytracing_tpu.pt.render import tile_pixel_coords, untile_image

    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    camera = jax.device_put(camera, repl)
    accum = jax.device_put(state.accumulation, repl)
    accum_index = jax.device_put(state.accum_index, repl)
    # precompute the tile coordinates on the host and pass them as
    # replicated args: large constants captured inside a shard_map body
    # trip a jax 0.9 const-lifting bug ("supplied N buffers but compiled
    # program expected M")
    px, py, valid, ty, tx = tile_pixel_coords(w, h)
    px = jax.device_put(px, repl)
    py = jax.device_put(py, repl)
    valid = jax.device_put(valid, repl)

    def per_device(accum_full, accum_index, camera_dev, scene_dev, px, py, valid):
        dev = jax.lax.axis_index(axis).astype(jnp.uint32)
        sample_index = accum_index * jnp.uint32(n) + dev
        color, stats = pathtrace(
            scene_dev, cfg, camera_dev, px, py, w, h, sample_index,
            valid=valid,
        )
        value = untile_image(color, w, h, ty, tx)
        mean_value = jax.lax.psum(value, axis) / n
        rays = jax.lax.psum(jnp.sum(stats.rays), axis)

        count = accum_index.astype(jnp.float32) * n
        result = (mean_value * n + count * accum_full) / (count + n)
        if cfg.parity_quantization:
            result = jnp.round(jnp.clip(result, 0.0, 1.0) * 255.0) / 255.0
        return result, jnp.reshape(rays, ())

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    new_accum, rays = hot_jit(sharded)(
        accum, accum_index, camera, scene, px, py, valid
    )
    new_state = RenderState(
        accumulation=new_accum, accum_index=state.accum_index + jnp.uint32(1)
    )
    return new_state, TraceStats(rays=jnp.sum(rays))
