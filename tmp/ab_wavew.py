"""A/B: wave width W (resident rows per grid step) on globally-sorted
bounce rays.  Trip cost scales ~linearly with W, but a wave's trip count
is the MAX over its W rows — smaller waves quantize stragglers finer now
that rows are cost-sorted.  Also sweeps the probe-cut size."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed  # noqa: F401

import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.accel.lbvh import probe_cut
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS),
                        builder="sah")
bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)
lo, hi = trace._root_bounds(scene.bvh)

# bounce-2-like rays: random directions from primary hit points
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera

camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
R = px.shape[0]
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o0, d0 = primary_rays(camera, px, py, W, H, s0, s1)
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)
hit = hot_jit(lambda *a: tw8._traverse_wide8_packed(
    table8, nr8, bvh.tris, *a, cull_backface=True, any_hit=False))(
        o0, d0, tmin, tmax)
jax.block_until_ready(hit.t)
alive = hit.t < 1e30
p = o0 + d0 * jnp.where(alive, hit.t, 1.0)[:, None]
rd = jax.random.normal(jax.random.PRNGKey(0), (R, 3))
rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
ob = p + 1e-3 * rd
e3 = jnp.full((R,), 1e-3, jnp.float32)
at = jnp.where(alive, 1000.0, 0.0)


def sort_by(probe):
    order = reorder.make_order(ob, rd, e3, at, lo, hi, probe=probe)
    return reorder.apply_order(order, ob, rd, e3, at)


def run(name, ww, rays):
    tw8.WIDE_ROWS = ww
    kc = hot_jit(
        lambda o2, d2, a2, b2: tw8._traverse_wide8_packed(
            table8, nr8, bvh.tris, o2, d2, a2, b2,
            cull_backface=True, any_hit=False, return_counters=True),
    )
    hitc, ctr = kc(*rays)
    jax.block_until_ready(ctr)
    best = (1e9, 0, 0, 0)
    for _ in range(3):
        t0 = time.perf_counter()
        hitc, ctr = kc(*rays)
        c = np.asarray(ctr)
        dt = time.perf_counter() - t0
        if dt < best[0]:
            best = (dt, int(c[0, 0]), int(c[0, 1]), int(c[0, 2]))
    dt, trips, n_int, n_leaf = best
    occ = (n_int + n_leaf) / max(trips * ww, 1)
    print(f"{name:24s} {dt*1e3:7.1f} ms  trips={trips:7d} "
          f"int+leaf={n_int + n_leaf:8d} occ={occ:5.1%}", flush=True)


rays64 = jax.block_until_ready(sort_by(scene.bvh.probe))
for ww in (64, 32, 16):
    run(f"W={ww} probe64", ww, rays64)

probe128 = probe_cut(scene.bvh.nodes, scene.bvh.child_index, cap=128)
# NOTE: probe_ray_mask packs <=64 bits; call probe_row_cost directly here
order = reorder.make_order(ob, rd, e3, at, lo, hi)  # key-only global
ob2, rd2, e32, at2 = reorder.apply_order(order, ob, rd, e3, at)
cost = reorder.probe_row_cost(probe128, ob2, rd2, e32, at2)
rp = jnp.argsort(cost)
lane = jnp.arange(128, dtype=jnp.int32)[None, :]
comp = (rp[:, None].astype(jnp.int32) * 128 + lane).reshape(-1)
rays128 = tuple(x.reshape(-1)[comp].reshape(x.shape) if x.ndim == 1 else
                x.reshape(-1, 128, x.shape[1])[rp].reshape(x.shape)
                for x in (ob2, rd2, e32, at2))
for ww in (64, 32):
    run(f"W={ww} probe128", ww, rays128)
