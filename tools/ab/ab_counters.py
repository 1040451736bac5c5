"""Trips / interior / leaf visit counters for primary vs bounce orderings.

occupancy = (int_visits + leaf_visits) / (trips * W): the fraction of
row-slots per trip doing real work.  per-visit cost = time / (int+leaf).
"""
import sys, time, numpy as np, jax, jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
from tutil import timed
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import reorder, trace
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8

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

bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)

def kc(o, d, a, b):
    return tw8._traverse_wide8_packed(table8, nr8, bvh.tris, o, d, a, b,
                                      cull_backface=True, any_hit=False,
                                      return_counters=True)
jitted = hot_jit(kc)

def run(name, o2, d2, a2, b2):
    hit, ctr = jitted(o2, d2, a2, b2)
    jax.block_until_ready(ctr)
    t0 = time.perf_counter(); hit, ctr = jitted(o2, d2, a2, b2)
    c = np.asarray(ctr); dt = time.perf_counter() - t0
    # octr accumulates per wave: lane0=trips summed, lane1=int/128, lane2=leaf/128
    trips, n_int, n_leaf = int(c[0, 0]), int(c[0, 1]), int(c[0, 2])
    WID = tw8.WIDE_ROWS
    occ = (n_int + n_leaf) / max(trips * WID, 1)
    print(f"{name:14s} {dt*1e3:7.1f} ms  trips={trips:7d} int={n_int:8d} "
          f"leaf={n_leaf:8d} occ={occ:5.1%} "
          f"visit_cost={dt/max(n_int+n_leaf,1)*1e9:6.0f} ns "
          f"trip_cost={dt/max(trips,1)*1e6:6.1f} us", flush=True)

run("primary", o, d, tmin, tmax)

hit = hot_jit(lambda *a: tw8._traverse_wide8_packed(
    table8, nr8, bvh.tris, *a, cull_backface=True, any_hit=False))(o, d, tmin, tmax)
jax.block_until_ready(hit.t)
alive = hit.t < 1e30
p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
at = jnp.where(alive, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
rd = jax.random.normal(jax.random.PRNGKey(0), (R, 3))
rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
ob = p + 1e-3 * rd
lo, hi = trace._root_bounds(scene.bvh)
keys = np.asarray(hot_jit(reorder.ray_sort_keys)(ob, rd, e3, at, lo, hi))
obn, rdn, e3n, atn = (np.asarray(x) for x in (ob, rd, e3, at))

def case(name, perm):
    arrs = [jnp.asarray(a[perm]) for a in (obn, rdn, e3n, atn)]
    run(name, *arrs)

case("bounce_none", np.arange(R))
perm_g = np.argsort(keys, kind="stable")
case("bounce_global", perm_g)
# direction-heavy key: octant + 12 bits of direction + morton(origin)
dn = rdn / np.linalg.norm(rdn, axis=1, keepdims=True)
oct_ = ((dn[:, 0] < 0).astype(np.uint64) << 2) | ((dn[:, 1] < 0).astype(np.uint64) << 1) | (dn[:, 2] < 0).astype(np.uint64)
theta = np.arccos(np.clip(dn[:, 2], -1, 1)); phi = np.arctan2(dn[:, 1], dn[:, 0])
tb = np.minimum((theta / np.pi * 64).astype(np.uint64), 63)
pb = np.minimum(((phi + np.pi) / (2 * np.pi) * 64).astype(np.uint64), 63)
m28 = (keys & ((1 << 28) - 1)).astype(np.uint64)
dead = (keys >> 31).astype(np.uint64)
key_dir = (dead << 52) | (tb << 46) | (pb << 40) | m28
case("bounce_dirkey", np.argsort(key_dir, kind="stable"))
# dir-major, origin coarse (morton high 12 bits only)
key_dir2 = (dead << 52) | ((m28 >> 16) << 40) | (tb << 34) | (pb << 28) | m28
case("bounce_posdir", np.argsort(key_dir2, kind="stable"))
