"""Measure kernel iteration counters on the bench scene -> ns/iteration."""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
import vulkanraytracing_tpu.ops.traverse_subpacket as sp

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                                 aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
bvh = scene.bvh
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
t_min = jnp.full((R,), 0.01, jnp.float32)
t_max = jnp.where(valid, 1000.0, 0.0)
node_tab, tri_tab = sp._packed_tables(bvh)

t0 = time.perf_counter()
hit, iters = sp._traverse_subpacket_jitted(node_tab, tri_tab, bvh.tris, o, d, t_min, t_max,
                                           cull_backface=True, any_hit=False,
                                           return_counters=True)
float(np.asarray(hit.t)[0])
wall = time.perf_counter() - t0
c = np.asarray(iters).astype(np.int64)  # (n_chunks, 3)
trips, n_int, n_leaf = c[:, 0], c[:, 1], c[:, 2]
print(f"chunks={len(c)} wall={wall*1e3:.0f}ms (incl compile)")
print(f"trips: total={trips.sum()} mean/chunk={trips.mean():.0f}")
print(f"interior execs: {n_int.sum()} ({100*n_int.sum()/trips.sum():.0f}% of trips)")
print(f"leaf execs:     {n_leaf.sum()} ({100*n_leaf.sum()/trips.sum():.0f}% of trips)")
# timed pass (compiled)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    h = sp._traverse_subpacket_jitted(node_tab, tri_tab, bvh.tris, o, d, t_min, t_max,
                                      cull_backface=True, any_hit=False, interpret=False)
    float(np.asarray(h.t)[0]); best = min(best, time.perf_counter() - t0)
comp = best - 0.035
print(f"timed: {best*1e3:.0f} ms -> {comp*1e9/trips.sum():.0f} ns/iter")
rows = R // 128
print(f"rows={rows}: {8*trips.sum()/rows:.0f} row-slots/row, {8*n_int.sum()/rows:.0f} int-slots "
      f"{8*n_leaf.sum()/rows:.0f} leaf-slots")
