"""In-frame decomposition by max_bounce_count: frame(b) - frame(b-1)
isolates the marginal cost of each bounce inside the REAL jit."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame_impl
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1920, 1080, 262144
base = Config(width=W, height=H, ray_chunk_size=1 << 22,
              traversal=TraversalMode.BVH_PALLAS,
              camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                  target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS),
                        builder="sah")
camera = Camera(base.camera).to_device()

prev = 0.0
for b in range(1, 5):
    cfg = base.replace(max_bounce_count=b)
    state = create_render_state(cfg)
    t = timed(f"frame max_bounce={b}",
              lambda st: render_frame_impl(scene, cfg, camera, st)[0]
              .accumulation, state, n=3)
    print(f"   marginal bounce {b}: {(t - prev) * 1e3:7.0f} ms", flush=True)
    prev = t
