import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
if "--simplified" in sys.argv:
    jax.config.update("jax_use_simplified_jaxpr_constants", True)

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.parallel import (
    make_render_mesh,
    replicate_scene,
    shard_render_frame,
    shard_render_frame_samples,
)
from vulkanraytracing_tpu.pt.render import RenderState, create_render_state, render_frame
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

W = H = 32
cfg = Config(
    width=W, height=H, ray_chunk_size=W * H, traversal=TraversalMode.BVH,
    camera=CameraConfig(position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
                        x_fov=float(np.radians(60.0))),
    parity_quantization=False,
)
scene = build_scene_bvh(cornell_box_scene())
scene = jax.device_put(scene, jax.devices()[0])
camera = jax.device_put(Camera(cfg.camera).to_device(), jax.devices()[0])

# --- prefix mirroring tests 1-2: pixel-sharded over 8 devices, parity=True
cfgT = cfg.replace(parity_quantization=True)
mesh8 = make_render_mesh(jax.devices()[:8])
scene8 = replicate_scene(scene, mesh8)
stT = create_render_state(cfgT)
stT, _ = render_frame(scene, cfgT, camera, stT)
shT = create_render_state(cfgT)
shT, _ = shard_render_frame(scene8, cfgT, camera, shT, mesh8)
# test 2: 3 more frames of each
st2 = create_render_state(cfgT)
sh2 = create_render_state(cfgT)
for _ in range(3):
    st2, _ = render_frame(scene, cfgT, camera, st2)
    sh2, _ = shard_render_frame(scene8, cfgT, camera, sh2, mesh8)
print("prefix ok", float(st2.accumulation.sum()), float(sh2.accumulation.sum()))

n = 4
mesh = make_render_mesh(jax.devices()[:n])
sharded_scene = replicate_scene(scene, mesh)

state = create_render_state(cfg)
state, stats = shard_render_frame_samples(sharded_scene, cfg, camera, state, mesh)
print("sharded ok, rays:", float(stats.rays))

st0 = jax.device_put(
    RenderState(accumulation=jnp.zeros((H, W, 3)), accum_index=jnp.uint32(0)),
    jax.devices()[0],
)
st, s = render_frame(scene, cfg, camera, st0)
print("single ok, rays:", float(s.rays))
