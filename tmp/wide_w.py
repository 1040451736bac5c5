import time, os, numpy as np, jax, jax.numpy as jnp
import vulkanraytracing_tpu.ops.traverse_wide as tw
tw.WIDE_ROWS = int(os.environ.get("WROWS", "64"))
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
s2 = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
bvh2 = s2.bvh
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o2, d2 = primary_rays(camera, px, py, W, H, s0, s1)
R = o2.shape[0]
t_min = jnp.full((R,), 0.01, jnp.float32)
t_max = jnp.where(valid, 1000.0, 0.0)
table, nr = tw._unified_table(bvh2)

def timed(label, fn):
    h = fn(); jax.tree.map(np.asarray, h)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); h = fn(); jax.tree.map(np.asarray, h)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms -> {R/(best-0.035)/1e6:.1f} Mrays/s")
    return h

hit, iters = tw._traverse_wide_jitted(table, nr, bvh2.tris, o2, d2, t_min, t_max,
                                      cull_backface=True, any_hit=False, return_counters=True)
c = np.asarray(iters).astype(np.int64)
print(f"chunks={len(c)} trips={c[:,0].sum()} int={c[:,1].sum()} leaf={c[:,2].sum()}")

hw = timed("wide primary closest", lambda: tw._traverse_wide_jitted(
    table, nr, bvh2.tris, o2, d2, t_min, t_max,
    cull_backface=True, any_hit=False))
c2 = np.asarray(iters).astype(np.int64)
tt = c[:,0].sum()
print(f"per-trip: see timing / {tt}")

