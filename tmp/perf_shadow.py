"""Measure the bounce-1 NEE shadow any-hit cost on realistic rays:
origins = bounce-1 hit points in the production sorted order,
directions = point-light dir + fixed sun (concatenated 2R set)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import math3d, rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.core.math3d import RAY_MAX_T, RAY_MIN_T
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.pt.integrator import primary_rays, sample_point_light
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
R = px.shape[0]
f32 = jnp.float32
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
t_min = jnp.full((R,), camera.z_near, f32)
t_max = jnp.where(valid, camera.z_far, 0.0)
lo, hi = trace._root_bounds(scene.bvh)
sun_dir = math3d.normalize(-scene.direct_light.direction[:3])


@hot_jit
def bounce1_state(o, d, t_min, t_max, s0, s1):
    hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max)
    alive = (t_max > 0) & (hit.t < 1e30)
    p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
    # cosine-ish bounce dir around the (unknown) normal: use a random
    # hemisphere dir — statistically like a diffuse bounce
    key = jax.random.PRNGKey(1)
    rd = jax.random.normal(key, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    o2 = p + 1e-3 * rd
    a2 = jnp.full((R,), RAY_MIN_T, f32)
    b2 = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))
    order = reorder.make_order(o2, rd, a2, b2, lo, hi)
    o2, rd, a2, b2, p2, al2 = reorder.apply_order(
        order, o2, rd, a2, b2, p, alive)
    hit2 = trace.trace_closest(scene, cfg, o2, rd, a2, b2)
    alive2 = al2 & (hit2.t < 1e30)
    p3 = o2 + rd * jnp.where(alive2, hit2.t, 1.0)[:, None]
    return p3, alive2, s0, s1


p3, alive2, s0, s1 = bounce1_state(o, d, t_min, t_max, s0, s1)
jax.block_until_ready(p3)
n2 = int(jnp.sum(alive2))
print(f"alive at bounce1: {n2} ({n2 / R:.1%})", flush=True)

lights = scene.point_lights
onehot, _i, lpdf, s0b, s1b = hot_jit(
    lambda p, s0, s1: sample_point_light(
        lights, jnp.zeros_like(p).at[:, 1].set(1.0), p, s0, s1)
)(p3, s0, s1)
lpos = jnp.einsum("rl,lc->rc", onehot, lights.position[:, :3])
delta = lpos - p3
dist = jnp.sqrt(jnp.maximum(math3d.dot(delta, delta), 1e-20))
ldir = delta / dist[:, None]
sh_o = jnp.concatenate([p3, p3])
sh_d = jnp.concatenate([ldir, jnp.broadcast_to(sun_dir, (R, 3))])
sh_a = jnp.full((2 * R,), RAY_MIN_T, f32)
sh_b = jnp.concatenate([jnp.where(alive2, dist, 0.0),
                        jnp.where(alive2, f32(RAY_MAX_T), f32(0.0))])

anyh = lambda o2, d2, a2, b2: trace.trace_any(  # noqa: E731
    scene, cfg, o2, d2, a2, b2)
t = timed("bounce1 NEE shadow anyhit 2R", anyh, sh_o, sh_d, sh_a, sh_b)
print(f"-> {2 * R / t / 1e6:.1f} Mrays/s (counting dead lanes)", flush=True)

# also: the two halves separately (coherence differs: point vs sun)
t1 = timed("  point-light half", anyh, p3, ldir, sh_a[:R],
           jnp.where(alive2, dist, 0.0))
t2 = timed("  sun half", anyh, p3, jnp.broadcast_to(sun_dir, (R, 3)),
           sh_a[:R], jnp.where(alive2, f32(RAY_MAX_T), f32(0.0)))
print(f"halves: point {t1*1e3:.0f} ms, sun {t2*1e3:.0f} ms", flush=True)
