"""A/B: LEAF_SIZE 4 vs 8 for the wide8 kernel on the bench scene."""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from vulkanraytracing_tpu.accel.sah import build_bvh_sah
from vulkanraytracing_tpu.accel.bvh8 import collapse_bvh8
from vulkanraytracing_tpu.config import CameraConfig, Config
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import tpu_compiler_options
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
import vulkanraytracing_tpu.accel.lbvh as lbvh_mod

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                                 aspect_ratio=W / H))
scene = sponza_like_scene(target_triangles=TRIS)
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)

variants = {}
for ls in (4, 8):
    lbvh_mod.LEAF_SIZE = ls  # sah builder reads it as its default ceiling
    geom, bvh = build_bvh_sah(scene.geometry, leaf_size=ls)
    bvh = collapse_bvh8(bvh)
    table, nr = tw8._unified_table8(bvh)
    tw8.LEAF_TESTS = ls
    fn = jax.jit(partial(tw8._traverse_wide8_packed,
                         cull_backface=True, any_hit=False),
                 static_argnames=("nr_rows",),
                 compiler_options=tpu_compiler_options())
    variants[ls] = (fn, table, nr, bvh.tris)
    hit, iters = jax.jit(partial(tw8._traverse_wide8_packed,
                                 cull_backface=True, any_hit=False,
                                 return_counters=True),
                         static_argnames=("nr_rows",),
                         compiler_options=tpu_compiler_options())(
        table, nr, bvh.tris, o, d, tmin, tmax)
    c = np.asarray(iters)[0]
    print(f"leaf{ls}: table_rows={table.shape[0]} bvh8_nodes={bvh.nodes8.shape[0]} "
          f"trips={c[0]} int={c[1]} leaf={c[2]} hits={int(np.sum(np.asarray(hit.t)<1e30))}")

best = {ls: 1e9 for ls in variants}
for rep in range(6):
    for ls, (fn, table, nr, tris) in variants.items():
        t0 = time.perf_counter()
        h = fn(table, nr, tris, o, d, tmin, tmax)
        float(np.asarray(h.t)[0])
        best[ls] = min(best[ls], time.perf_counter() - t0)
for ls in variants:
    print(f"leaf{ls}: {best[ls]*1e3:.0f} ms -> {R/(best[ls]-0.035)/1e6:.1f} Mrays/s")
print(f"leaf8 is {best[4]/best[8]:.2f}x vs leaf4")
