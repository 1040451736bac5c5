"""A/B: wave occupancy via cost-ordered rows.

Hypothesis: trips(wave) = max over its 64 rows' visit counts, so waves
should be filled with rows of SIMILAR COST, not similar first-key.  The
cost proxy is the row's union breadth at BVH8 depth<=2: how many of the
~72 top nodes any lane of the row enters (the union is what the row will
traverse).  Cases:

  bounce_global   — production ordering (segment sort + row regroup by key)
  rowcost         — same element order, rows regrouped by probe cost
  rowcost_key     — rows regrouped by (cost bucket, first key)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed  # noqa: F401  (hot_jit import side effect)

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
import time

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
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)

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
    print(f"{name:16s} {dt*1e3:7.1f} ms  trips={trips:7d} "
          f"int={n_int:8d} leaf={n_leaf:8d} occ={occ:5.1%}", flush=True)


# bounce-like rays from primary hits
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

keys = np.asarray(hot_jit(reorder.ray_sort_keys)(ob, rd, e3, at, lo, hi))
obn, rdn, e3n, atn = (np.asarray(x) for x in (ob, rd, e3, at))
perm_g = np.argsort(keys, kind="stable")
arrs_g = [a[perm_g] for a in (obn, rdn, e3n, atn)]
run("bounce_global", *(jnp.asarray(a) for a in arrs_g))

# --- probe: union breadth over BVH8 levels 0..2 (1 + 8 + 64 nodes) ---
nodes8 = np.asarray(bvh.nodes8)      # (M, 48)
child8 = np.asarray(bvh.child8)      # (M, 8)
rows_l1 = child8[0]                  # 8 child ids (interior >= 0)
node_list = []                       # (lo3, hi3) of probed nodes
for k in range(8):
    node_list.append(nodes8[0, k*6:k*6+6])
for c in rows_l1:
    if c >= 0:
        for k in range(8):
            node_list.append(nodes8[c, k*6:k*6+6])
boxes = np.stack(node_list)          # (N, 6) lo/hi
N = boxes.shape[0]
print(f"probe nodes: {N}", flush=True)

o_g, d_g, e_g, a_g = arrs_g
invd = 1.0 / np.where(np.abs(d_g) < 1e-30, 1e-30, d_g)


def entered(ob_, invd_, tmin_, tmax_):
    # (R, N) slab test
    t0 = (boxes[None, :, 0:3] - ob_[:, None, :]) * invd_[:, None, :]
    t1 = (boxes[None, :, 3:6] - ob_[:, None, :]) * invd_[:, None, :]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    tn = np.maximum(tn, tmin_[:, None])
    tf = np.minimum(tf, tmax_[:, None])
    return tn <= tf


ent = np.zeros((R, N), bool)
CH = 1 << 18
for i in range(0, R, CH):
    ent[i:i+CH] = entered(o_g[i:i+CH], invd[i:i+CH], e_g[i:i+CH], a_g[i:i+CH])
rowmask = ent.reshape(R // 128, 128, N).any(axis=1)
cost = rowmask.sum(axis=1)           # (rows,) union breadth
print(f"row cost: min {cost.min()} median {np.median(cost):.0f} "
      f"max {cost.max()}", flush=True)

rowkey = keys[perm_g].reshape(-1, 128)[:, 0]
ks = keys[perm_g].reshape(-1, 128)
spread = (ks.max(axis=1) - ks.min(axis=1)) >> 9  # free proxy: key range
print(f"spread/cost corr: "
      f"{np.corrcoef(spread.astype(np.float64), cost)[0, 1]:.3f}",
      flush=True)

for name, rk in (("rowcost", cost.astype(np.uint64)),
                 ("rowcost_key", (cost.astype(np.uint64) << 40)
                  | (rowkey >> 19).astype(np.uint64)),
                 ("rowspread", spread.astype(np.uint64)),
                 ("rowspread_key", (spread.astype(np.uint64) << 40)
                  | (rowkey >> 19).astype(np.uint64))):
    rperm = np.argsort(rk, kind="stable")

    def rp(a):
        shp = a.shape
        rows = a.reshape(R // 128, 128, -1)[rperm]
        return rows.reshape(shp)

    run(name, *(jnp.asarray(rp(a)) for a in arrs_g))
