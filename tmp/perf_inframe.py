"""Replay the NEW integrator structure bounce by bounce, timing the two
traces per bounce on the exact production state (sorted orders, probe,
real BSDF-sampled directions).  Intermediates are deleted aggressively
to stay under HBM."""
import gc
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
from vulkanraytracing_tpu.core.math3d import BIAS, RAY_MAX_T, RAY_MIN_T
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.pt.integrator import primary_rays, sample_point_light
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.surface import unpack_material
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
lo, hi = trace._root_bounds(scene.bvh)
sun_dir = math3d.normalize(-scene.direct_light.direction[:3])
lights = scene.point_lights


@hot_jit
def bounce_state(o, d, t_min, t_max, s0, s1, alive, valid):
    """One bounce of the production integrator minus the traces we time:
    returns the sorted next-segment rays AND the sorted shadow set."""
    hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max)
    alive = alive & (hit.t < 1e30)
    attrs = fetch_surface_attributes(scene.geometry, hit)
    unp = unpack_material(scene, attrs)
    surface, tbn = unp.surface, unp.tbn
    n_sh = tbn[..., 2]
    p = o + d * hit.t[:, None]
    wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
    shadow_origin = p + n_sh * BIAS
    sh_tmax_sun = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))
    onehot, _i, lpdf, s0, s1 = sample_point_light(lights, n_sh, p, s0, s1)
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
    order = reorder.make_order(o2, d2, a2, b2, lo, hi, probe=scene.bvh.probe)
    (o2, d2, a2, b2, alive, valid, shadow_origin, sh_tmax_sun, ldir,
     sh_tmax_pl) = reorder.apply_order(
        order, o2, d2, a2, b2, alive, valid, shadow_origin, sh_tmax_sun,
        ldir, sh_tmax_pl)
    return (o2, d2, a2, b2, alive, valid, shadow_origin, sh_tmax_sun,
            ldir, sh_tmax_pl, s0, s1)


s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
t_min = jnp.full((R,), camera.z_near, f32)
t_max = jnp.where(valid, camera.z_far, 0.0)
alive = valid

closest = lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b)  # noqa: E731
anyh = lambda o, d, a, b: trace.trace_any(scene, cfg, o, d, a, b)  # noqa: E731

for bounce in range(3):
    st = bounce_state(o, d, t_min, t_max, s0, s1, alive, valid)
    st = jax.block_until_ready(st)
    (o2, d2, a2, b2, alive2, valid2, sh_o, sh_ts, ldir, sh_tp,
     s0, s1) = st
    n_alive = int(jnp.sum(alive2))
    print(f"--- bounce {bounce}: alive {n_alive/R:.1%}", flush=True)
    # time the sorted shadow set (exact production shape: 2R concat)
    sun_d = jnp.broadcast_to(sun_dir, (R, 3))
    timed(f"b{bounce} shadow 2R (sorted)", anyh,
          jnp.concatenate([sh_o, sh_o]),
          jnp.concatenate([ldir, sun_d]),
          jnp.full((2 * R,), RAY_MIN_T, f32),
          jnp.concatenate([sh_tp, sh_ts]))
    timed(f"b{bounce}   point half", anyh, sh_o, ldir,
          jnp.full((R,), RAY_MIN_T, f32), sh_tp)
    timed(f"b{bounce}   sun half", anyh, sh_o, sun_d,
          jnp.full((R,), RAY_MIN_T, f32), sh_ts)
    # time the next closest (sorted)
    timed(f"b{bounce} next closest (sorted)", closest, o2, d2, a2, b2)
    o, d, t_min, t_max, alive, valid = o2, d2, a2, b2, alive2, valid2
    del st, o2, d2, a2, b2, alive2, valid2, sh_o, sh_ts, ldir, sh_tp
    gc.collect()
