"""Shading-side frame decomposition: everything that is NOT traversal/sort.

Times each integrator stage at wavefront scale on the bench scene to account
for the frame-floor gap (frame - traversals - sorts).
"""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import tile_pixel_coords, untile_image
from vulkanraytracing_tpu.pt.integrator import (
    primary_rays, intersect_point_light_spheres, sample_point_light)
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm, math3d
from vulkanraytracing_tpu.ops import trace
from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.pt.surface import unpack_material
from vulkanraytracing_tpu.env.panorama import sample_environment
from vulkanraytracing_tpu.core.jit_utils import hot_jit

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                                 aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
print("R =", R, "textures:", scene.textures is not None,
      "lights:", scene.has_point_lights, flush=True)
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)

def timed(label, fn, n=4):
    r = fn(); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); jax.tree.map(np.asarray, r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<42s} {best*1e3:7.1f} ms", flush=True)
    return r

closest = hot_jit(lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b))
hit = closest(o, d, tmin, tmax)
jax.tree.map(np.asarray, hit)

geom, mats = scene.geometry, scene.materials

timed("pixel_seed + primary_rays", hot_jit(
    lambda: primary_rays(camera, px, py, W, H, *rngm.pixel_seed(px, py, jnp.uint32(0)))))
timed("sample_environment (R dirs)", hot_jit(lambda: sample_environment(scene.environment, d)))
attrs = timed("fetch_surface_attributes", hot_jit(lambda: fetch_surface_attributes(geom, hit)))
unp = timed("unpack_material", hot_jit(lambda: unpack_material(scene, attrs)))
surface, tbn = unp.surface, unp.tbn
wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
p = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:, None]
n_sh = tbn[..., 2]

timed("evaluate_bsdf", hot_jit(lambda: bsdf_mod.evaluate_bsdf(surface, wo, wo, wo)))
timed("sample_bsdf", hot_jit(lambda: bsdf_mod.sample_bsdf(surface, wo, s0, s1)))
if scene.has_point_lights:
    timed("sample_point_light CDF", hot_jit(
        lambda: sample_point_light(scene.point_lights, n_sh, p, s0, s1)))
    timed("intersect_point_light_spheres", hot_jit(
        lambda: intersect_point_light_spheres(
            scene.point_lights, cfg.point_light_radius, o, d, tmin, tmax)))

col = jnp.abs(d)
def accum(c):
    img = untile_image(c, W, H, ty, tx)
    return img / 2.0
timed("untile + accum blend", hot_jit(accum), n=6)

# one full shading bounce body minus traces (approximate composition cost)
def bounce_body():
    envc = sample_environment(scene.environment, d)
    a = fetch_surface_attributes(geom, hit)
    u = unpack_material(scene, a)
    wo2 = math3d.normalize(math3d.world_to_tangent(-d, u.tbn))
    b, wi, pdf, t0_, t1_ = bsdf_mod.sample_bsdf(u.surface, wo2, s0, s1)
    sun = bsdf_mod.evaluate_bsdf(u.surface, wo2, wi, wi)
    return envc, b, wi, pdf, sun
timed("FULL shading body (1 bounce, no trace)", hot_jit(bounce_body))
