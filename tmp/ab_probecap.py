"""A/B: probe-cut size (wave-balancing cost predictor) 64 vs 128 vs 256.

Deeper cuts predict row union cost better (occupancy up) but make the
reorder pay more: (R, N) slab tests in probe_ray_mask + N/32 mask
columns riding the multi-operand sort."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed  # noqa: F401

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.accel.lbvh import probe_cut
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]

bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)

kc = hot_jit(lambda o2, d2, a2, b2: tw8._traverse_wide8_packed(
    table8, nr8, bvh.tris, o2, d2, a2, b2,
    cull_backface=True, any_hit=False, return_counters=True))

# bounce-like rays from primary hits
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)
hit = hot_jit(lambda *a: tw8._traverse_wide8_packed(
    table8, nr8, bvh.tris, *a, cull_backface=True, any_hit=False))(
        o, d, tmin, tmax)
jax.block_until_ready(hit.t)
alive = hit.t < 1e30
p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
at = jnp.where(alive, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
rd = jax.random.normal(jax.random.PRNGKey(0), (R, 3))
rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
ob = p + 1e-3 * rd
lo, hi = trace._root_bounds(scene.bvh)


def run_traversal(name, o2, d2, a2, b2):
    hit2, ctr = kc(o2, d2, a2, b2)
    jax.block_until_ready(ctr)
    best = (1e9, 0, 0, 0)
    for _ in range(3):
        t0 = time.perf_counter()
        hit2, ctr = kc(o2, d2, a2, b2)
        c = np.asarray(ctr)
        dt = time.perf_counter() - t0
        if dt < best[0]:
            best = (dt, int(c[0, 0]), int(c[0, 1]), int(c[0, 2]))
    dt, trips, n_int, n_leaf = best
    occ = (n_int + n_leaf) / max(trips * tw8.WIDE_ROWS, 1)
    print(f"{name:12s} trav {dt*1e3:7.1f} ms  trips={trips:7d} "
          f"occ={occ:5.1%}", flush=True)
    return dt


for cap in (64, 128, 256):
    pr = probe_cut(scene.bvh.nodes, scene.bvh.child_index, cap=cap)
    mk = hot_jit(lambda o2, d2, a2, b2, pr=pr: reorder.make_order(
        o2, d2, a2, b2, lo, hi, probe=pr))
    ap = hot_jit(lambda od, o2, d2, a2, b2: reorder.apply_order(
        od, o2, d2, a2, b2))
    order = mk(ob, rd, e3, at)
    jax.block_until_ready(order.fwd)
    t_mk = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        order = mk(ob, rd, e3, at)
        jax.block_until_ready(order.fwd)
        t_mk = min(t_mk, time.perf_counter() - t0)
    out = ap(order, ob, rd, e3, at)
    jax.block_until_ready(out[0])
    print(f"cap={cap:4d}  make_order {t_mk*1e3:6.1f} ms", flush=True)
    run_traversal(f"cap={cap}", *out)
