"""Production make_order (segment-local sort + probe row regroup) vs the
TRUE global element sort, same rays, same kernel — how much coherence
does the 2048-ray segment scope leave on the table?"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
from tutil import timed  # noqa: F401

from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import reorder, trace
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import Config, TraversalMode
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1280, 720, 262144
from vulkanraytracing_tpu.config import CameraConfig as _CC

cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=_CC(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                        aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS),
                        builder="sah")
R = 2088960

bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)

kc = hot_jit(lambda o2, d2, a2, b2: tw8._traverse_wide8_packed(
    table8, nr8, bvh.tris, o2, d2, a2, b2,
    cull_backface=True, any_hit=False, return_counters=True))


def run(name, o2, d2, a2, b2):
    hit, ctr = kc(o2, d2, a2, b2)
    jax.block_until_ready(ctr)
    best = (1e9, 0, 0, 0)
    for _ in range(3):
        t0 = time.perf_counter()
        hit, ctr = kc(o2, d2, a2, b2)
        c = np.asarray(ctr)
        dt = time.perf_counter() - t0
        if dt < best[0]:
            best = (dt, int(c[0, 0]), int(c[0, 1]), int(c[0, 2]))
    dt, trips, n_int, n_leaf = best
    occ = (n_int + n_leaf) / max(trips * tw8.WIDE_ROWS, 1)
    print(f"{name:22s} {dt*1e3:7.1f} ms  trips={trips:7d} int={n_int:8d} "
          f"leaf={n_leaf:8d} occ={occ:5.1%}", flush=True)


# build_state already applied the production order to (o, d, a, b) — but it
# returned only shadow arrays.  Recreate bounce-2 closest rays instead:
import vulkanraytracing_tpu.core.rng as rngm
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.config import CameraConfig

camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(cfg.width, cfg.height)
R = px.shape[0]
f32 = jnp.float32


@hot_jit
def two_bounces(px, py, valid):
    from vulkanraytracing_tpu.core import math3d
    from vulkanraytracing_tpu.core.math3d import RAY_MAX_T, RAY_MIN_T
    from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
    from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
    from vulkanraytracing_tpu.pt.surface import unpack_material

    s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
    o, d = primary_rays(camera, px, py, cfg.width, cfg.height, s0, s1)
    t_min = jnp.full((R,), camera.z_near, f32)
    t_max = jnp.where(valid, camera.z_far, 0.0)
    alive = valid
    for _ in range(2):
        hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max)
        alive = alive & (hit.t < 1e30)
        attrs = fetch_surface_attributes(scene.geometry, hit)
        unp = unpack_material(scene, attrs)
        tbn = unp.tbn
        p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
        wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
        b, wi, pdf, s0, s1 = bsdf_mod.sample_bsdf(unp.surface, wo, s0, s1)
        alive = alive & (pdf >= 1e-6)
        o = p
        d = math3d.tangent_to_world(wi, tbn)
        t_min = jnp.full((R,), RAY_MIN_T, f32)
        t_max = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))
    return o, d, t_min, t_max


o, d, a, b = jax.block_until_ready(two_bounces(px, py, valid))
lo, hi = trace._root_bounds(scene.bvh)

run("unsorted", o, d, a, b)

# production order (segment sort + probe rows)
order = reorder.make_order(o, d, a, b, lo, hi, probe=scene.bvh.probe)
o_p, d_p, a_p, b_p = reorder.apply_order(order, o, d, a, b)
run("production", o_p, d_p, a_p, b_p)

# TWO production passes: pass 1 (row regroup by key) then pass 2 (probe)
order1 = reorder.make_order(o, d, a, b, lo, hi)
o2p, d2p, a2p, b2p = reorder.apply_order(order1, o, d, a, b)
order2 = reorder.make_order(o2p, d2p, a2p, b2p, lo, hi,
                            probe=scene.bvh.probe)
o2p, d2p, a2p, b2p = reorder.apply_order(order2, o2p, d2p, a2p, b2p)
run("production x2", o2p, d2p, a2p, b2p)

# THREE passes (diminishing returns check)
order3 = reorder.make_order(o2p, d2p, a2p, b2p, lo, hi,
                            probe=scene.bvh.probe)
o3p, d3p, a3p, b3p = reorder.apply_order(order3, o2p, d2p, a2p, b2p)
run("production x3", o3p, d3p, a3p, b3p)

# true global element sort by the same key, then probe row regroup
keys = np.asarray(hot_jit(reorder.ray_sort_keys)(o, d, a, b, lo, hi))
perm = np.argsort(keys, kind="stable")
on, dn, an, bn = (np.asarray(x)[perm] for x in (o, d, a, b))
run("global", jnp.asarray(on), jnp.asarray(dn), jnp.asarray(an),
    jnp.asarray(bn))

# global + probe row regroup
cost = np.asarray(reorder.probe_row_cost(
    scene.bvh.probe, jnp.asarray(on), jnp.asarray(dn), jnp.asarray(an),
    jnp.asarray(bn)))
rperm = np.argsort(cost, kind="stable")
og, dg, ag, bg = (x.reshape(R // 128, 128, -1)[rperm].reshape(x.shape)
                  for x in (on.reshape(R, 3), dn.reshape(R, 3),
                            an.reshape(R, 1), bn.reshape(R, 1)))
run("global+rowcost", jnp.asarray(og), jnp.asarray(dg),
    jnp.asarray(ag.reshape(R)), jnp.asarray(bg.reshape(R)))
