"""Frame decomposition v3 — scalar-readback timing (true device costs)."""
import sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tmp")
from tutil import timed
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import (
    create_render_state, render_frame_impl, tile_pixel_coords, untile_image)
from vulkanraytracing_tpu.pt.integrator import (
    primary_rays, intersect_point_light_spheres, sample_point_light)
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm, math3d
from vulkanraytracing_tpu.ops import trace, reorder
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
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)
print(f"R={R}", flush=True)

closest = lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b)
anyh = lambda o, d, a, b: trace.trace_any(scene, cfg, o, d, a, b)

t_p = timed("primary closest (prod)", closest, o, d, tmin, tmax)

hit = hot_jit(closest)(o, d, tmin, tmax)
jax.block_until_ready(hit)
p = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:, None]
alive = hit.t < 1e30
at = jnp.where(alive, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
t_sh = timed("sun shadow anyhit (prod)", anyh, p + 1e-3 * sd, sd, e3, at)

key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
lo, hi = trace._root_bounds(scene.bvh)
def sorted_bounce(p, rd, e3, at):
    order = reorder.make_order(p, rd, e3, at, lo, hi)
    o2, d2, a2, b2 = reorder.apply_order(order, p + 1e-3 * rd, rd, e3, at)
    return trace.trace_closest(scene, cfg, o2, d2, a2, b2)
t_b = timed("sorted bounce closest (prod)", sorted_bounce, p, rd, e3, at)
t_bu = timed("UNSORTED bounce closest (prod)", closest, p + 1e-3 * rd, rd, e3, at)
t_s = timed("make_order alone", lambda p, rd: reorder.make_order(p, rd, e3, at, lo, hi), p, rd)
t_ap = timed("apply_order 9 arrays",
             lambda p, rd: reorder.apply_order(
                 reorder.make_order(p, rd, e3, at, lo, hi),
                 p, rd, e3, at, p, rd, e3, s0, s1), p, rd)

# shading stages (device-only cost)
geom, mats = scene.geometry, scene.materials
timed("pixel_seed+primary_rays", lambda px, py: primary_rays(
    camera, px, py, W, H, *rngm.pixel_seed(px, py, jnp.uint32(0))), px, py)
timed("sample_environment", lambda d: sample_environment(scene.environment, d), d)
attrs = hot_jit(lambda h: fetch_surface_attributes(geom, h))(hit)
jax.block_until_ready(attrs)
timed("fetch_surface_attributes", lambda h: fetch_surface_attributes(geom, h), hit)
unp = hot_jit(lambda a: unpack_material(scene, a))(attrs)
jax.block_until_ready(unp)
timed("unpack_material", lambda a: unpack_material(scene, a), attrs)
surface, tbn = unp.surface, unp.tbn
wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
n_sh = tbn[..., 2]
timed("evaluate_bsdf", lambda s, w: bsdf_mod.evaluate_bsdf(s, w, w, w), surface, wo)
timed("sample_bsdf", lambda s, w: bsdf_mod.sample_bsdf(s, w, s0, s1), surface, wo)
if scene.has_point_lights:
    timed("sample_point_light CDF", lambda n, p: sample_point_light(
        scene.point_lights, n, p, s0, s1), n_sh, p)
    timed("intersect_point_light_spheres", lambda o, d: intersect_point_light_spheres(
        scene.point_lights, cfg.point_light_radius, o, d, tmin, tmax), o, d)

state = create_render_state(cfg)
t_f = timed("FULL FRAME", lambda st: render_frame_impl(scene, cfg, camera, st)[0].accumulation,
            state, n=3)
est = t_p + 3 * t_b + 4 * t_sh
print(f"estimate 1p+3sb+4sh = {est*1e3:.0f} ms vs frame {t_f*1e3:.0f} ms", flush=True)
