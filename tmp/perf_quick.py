"""Quick chip-state + frame check: primary closest (known-stable ref
number ~70 ms in fast state), then one full frame."""
import sys, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.ops import trace
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import (
    create_render_state, render_frame_impl, tile_pixel_coords)
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
print("probe:", None if scene.bvh.probe is None else scene.bvh.probe.shape,
      flush=True)
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
R = px.shape[0]
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)
timed("primary closest (chip-state ref)",
      lambda *a: trace.trace_closest(scene, cfg, *a), o, d, tmin, tmax)

state = create_render_state(cfg)
timed("FULL FRAME", lambda st: render_frame_impl(
    scene, cfg, camera, st)[0].accumulation, state, n=3)
