"""Standalone repro of the 'supplied N buffers / expected M' bug."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_log_compiles", True)
import numpy as np
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.env.ibl import bake_ibl
from vulkanraytracing_tpu.hybrid import render_hybrid
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import cornell_box_scene, single_triangle_scene

cam_cfg = CameraConfig(position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
                       x_fov=float(np.radians(60.0)))

def _cfg(**kw):
    base = dict(width=16, height=16, max_bounce_count=2, camera=cam_cfg)
    base.update(kw)
    return Config(**base)

# phase 1: integrator renders (as in test_backends_render_identically)
scene = cornell_box_scene()
cfg_b = _cfg(traversal=TraversalMode.BRUTE_FORCE)
cam = Camera(cam_cfg).to_device()
st, _ = render_frame(scene, cfg_b, cam, create_render_state(cfg_b))
st.accumulation.block_until_ready()
scene_bvh = build_scene_bvh(scene)
for mode in (TraversalMode.BVH, TraversalMode.BVH_PALLAS):
    cfg_v = _cfg(traversal=mode)
    st2, _ = render_frame(scene_bvh, cfg_v, cam, create_render_state(cfg_v))
    st2.accumulation.block_until_ready()
print("== phase 1 done ==", flush=True)

# phase 2: hybrid structure (lights) -> skybox (no lights) -> lights again
cfg_h = Config(width=64, height=64, traversal=TraversalMode.BVH, camera=cam_cfg)
sc1 = build_scene_bvh(cornell_box_scene())
sc1 = sc1._replace(environment=bake_ibl(sc1.environment, irradiance_size=8,
                                        reflection_size=16, brdf_size=16))
img = np.asarray(render_hybrid(sc1, cfg_h, cam)); print("hybrid lights #1 ok", img.shape, flush=True)

sc2 = build_scene_bvh(single_triangle_scene())
sc2 = sc2._replace(environment=bake_ibl(sc2.environment, irradiance_size=8,
                                        reflection_size=16, brdf_size=16))
img = np.asarray(render_hybrid(sc2, cfg_h, cam)); print("hybrid nolights ok", flush=True)

sc3 = build_scene_bvh(cornell_box_scene())
sc3 = sc3._replace(environment=bake_ibl(sc3.environment, irradiance_size=8,
                                        reflection_size=16, brdf_size=16))
img = np.asarray(render_hybrid(sc3, cfg_h, cam)); print("hybrid lights #2 ok", flush=True)
