"""Shared builder: the REAL bounce-1 shadow-set state (sorted production
order), for kernel A/Bs."""
import jax
import jax.numpy as jnp

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import math3d, rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.core.math3d import BIAS, RAY_MAX_T, RAY_MIN_T
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.pt.integrator import primary_rays, sample_point_light
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.surface import unpack_material
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene


def build_state(W=1920, H=1080, TRIS=262144, bounces=2,
                with_material=False):
    cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
                 traversal=TraversalMode.BVH_PALLAS,
                 camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                     target=(0.0, 3.0, 0.0),
                                     aspect_ratio=W / H))
    scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS),
                            builder="sah")
    camera = Camera(cfg.camera).to_device()
    px, py, valid, ty, tx = tile_pixel_coords(W, H)
    R = px.shape[0]
    f32 = jnp.float32
    lo, hi = trace._root_bounds(scene.bvh)
    lights = scene.point_lights

    @hot_jit
    def step(o, d, t_min, t_max, s0, s1, alive, valid):
        hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max)
        alive = alive & (hit.t < 1e30)
        attrs = fetch_surface_attributes(scene.geometry, hit)
        unp = unpack_material(scene, attrs)
        surface, tbn = unp.surface, unp.tbn
        n_sh = tbn[..., 2]
        p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
        wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
        shadow_origin = p + n_sh * BIAS
        sh_tmax_sun = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))
        onehot, _i, _lp, s0, s1 = sample_point_light(lights, n_sh, p, s0, s1)
        lpos = jnp.einsum("rl,lc->rc", onehot, lights.position[:, :3])
        delta = lpos - p
        dist = jnp.sqrt(jnp.maximum(math3d.dot(delta, delta), 1e-20))
        ldir = delta / dist[:, None]
        sh_tmax_pl = jnp.where(alive, dist, 0.0)
        b, wi, pdf, s0, s1 = bsdf_mod.sample_bsdf(surface, wo, s0, s1)
        alive = alive & (pdf >= 1e-6)
        o2 = p
        d2 = math3d.tangent_to_world(wi, tbn)
        a2 = jnp.full((R,), RAY_MIN_T, f32)
        b2 = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))
        order = reorder.make_order(o2, d2, a2, b2, lo, hi,
                                   probe=scene.bvh.probe)
        (o2, d2, a2, b2, alive, valid, shadow_origin, sh_tmax_sun, ldir,
         sh_tmax_pl, lpos) = reorder.apply_order(
            order, o2, d2, a2, b2, alive, valid, shadow_origin,
            sh_tmax_sun, ldir, sh_tmax_pl, lpos)
        return (o2, d2, a2, b2, alive, valid, shadow_origin, sh_tmax_sun,
                ldir, sh_tmax_pl, lpos, s0, s1)

    s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
    o, d = primary_rays(camera, px, py, W, H, s0, s1)
    t_min = jnp.full((R,), camera.z_near, f32)
    t_max = jnp.where(valid, camera.z_far, 0.0)
    alive = valid
    for _ in range(bounces):
        out = jax.block_until_ready(
            step(o, d, t_min, t_max, s0, s1, alive, valid))
        (o, d, t_min, t_max, alive, valid, sh_o, sh_ts, ldir, sh_tp,
         lpos, s0, s1) = out
    if with_material:
        # the sorted bounce-N MATERIAL rays (the next closest-trace set)
        return (scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos, R,
                o, d, t_min, t_max)
    return scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos, R
