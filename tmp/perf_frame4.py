"""Frame decomposition v4 — replay the integrator's ACTUAL per-bounce
stages (post-sort shadow sets, real alive masks) to account for the full
frame time.  Every stage timed with scalar readback (tutil.timed)."""
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
from vulkanraytracing_tpu.pt.integrator import (
    primary_rays, sample_point_light)
from vulkanraytracing_tpu.pt.render import (
    create_render_state, render_frame_impl, tile_pixel_coords)
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
print(f"R={R} lights={scene.has_point_lights}", flush=True)

s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
t_min = jnp.full((R,), camera.z_near, f32)
t_max = jnp.where(valid, camera.z_far, 0.0)

closest = lambda o, d, a, b: trace.trace_closest(  # noqa: E731
    scene, cfg, o, d, a, b, cull_backface=True)
anyh = lambda o, d, a, b: trace.trace_any(scene, cfg, o, d, a, b)  # noqa: E731

total = 0.0


def stage(label, fn, *args):
    global total
    t = timed(label, fn, *args, n=4)
    total += t
    out = hot_jit(fn)(*args)
    jax.block_until_ready(out)
    return out


lo, hi = trace._root_bounds(scene.bvh)
sun_dir = math3d.normalize(-scene.direct_light.direction[:3])

hit = stage("b0 primary closest", closest, o, d, t_min, t_max)
alive = valid & (hit.t < 1e30)

for bounce in range(cfg.max_bounce_count):
    tag = f"b{bounce}"
    # shading stages (on current wavefront order)
    attrs = stage(f"{tag} fetch_attrs",
                  lambda h: fetch_surface_attributes(scene.geometry, h), hit)
    unp = stage(f"{tag} unpack_material",
                lambda a: unpack_material(scene, a), attrs)
    surface, tbn = unp.surface, unp.tbn
    n_sh = tbn[..., 2]
    p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
    wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
    shadow_origin = p + n_sh * BIAS

    # NEE shadow set: point light + sun concatenated (the real shape)
    lights = scene.point_lights
    onehot, _i, lpdf, s0, s1 = sample_point_light(lights, n_sh, p, s0, s1)
    lpos = jnp.einsum("rl,lc->rc", onehot, lights.position[:, :3])
    delta = lpos - p
    dist = jnp.sqrt(jnp.maximum(math3d.dot(delta, delta), 1e-20))
    ldir = delta / dist[:, None]
    sh_o = jnp.concatenate([shadow_origin, shadow_origin])
    sh_d = jnp.concatenate([ldir, jnp.broadcast_to(sun_dir, (R, 3))])
    sh_a = jnp.full((2 * R,), RAY_MIN_T, f32)
    sh_b = jnp.concatenate([jnp.where(alive, dist, 0.0),
                            jnp.where(alive, f32(RAY_MAX_T), f32(0.0))])
    stage(f"{tag} NEE shadow anyhit 2R", anyh, sh_o, sh_d, sh_a, sh_b)

    b, wi, pdf, s0, s1 = bsdf_mod.sample_bsdf(surface, wo, s0, s1)
    stage(f"{tag} sample_bsdf", lambda s, w: bsdf_mod.sample_bsdf(
        s, w, s0, s1), surface, wo)

    if bounce + 1 >= cfg.max_bounce_count:
        break
    o = p
    d = math3d.tangent_to_world(wi, tbn)
    t_min = jnp.full((R,), RAY_MIN_T, f32)
    t_max = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))

    stage(f"{tag} make_order",
          lambda o2, d2, a2, b2: reorder.make_order(
              o2, d2, a2, b2, lo, hi), o, d, t_min, t_max)
    order = reorder.make_order(o, d, t_min, t_max, lo, hi)
    order = jax.tree.map(
        lambda x: x if isinstance(x, int) else jax.block_until_ready(x), order)
    out = stage(f"{tag} apply_order x11",
                lambda *a: reorder.apply_order(order, *a),
                o, d, t_min, t_max, p, wo[:, :2], s0, s1, alive, valid)
    o, d, t_min, t_max = out[0], out[1], out[2], out[3]
    alive, valid = out[-2], out[-1]

    hit = stage(f"{tag} bounce closest", closest, o, d, t_min, t_max)
    alive = alive & (hit.t < 1e30)
    n_alive = int(jnp.sum(alive))
    print(f"   alive after bounce {bounce + 1}: {n_alive} "
          f"({n_alive / R:.1%})", flush=True)

print(f"SUM of stages = {total * 1e3:.0f} ms", flush=True)

state = create_render_state(cfg)
t_f = timed("FULL FRAME", lambda st: render_frame_impl(
    scene, cfg, camera, st)[0].accumulation, state, n=3)
print(f"frame {t_f * 1e3:.0f} ms vs staged {total * 1e3:.0f} ms "
      f"(unaccounted {(t_f - total) * 1e3:.0f} ms: env/NEE-shade/"
      f"accum/unapply/misc)", flush=True)
