"""Clean kernel A/B harness (scalar readback): production wide8 on the
bench scene, primary / bounce / shadow cases.  Usage:
    python tmp/ab_kernel2.py            # time current kernel
Interleaved best-of-N per case; prints Mrays/s per case.
"""
import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tmp")
from tutil import _scalarize
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
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

def k_closest(o, d, a, b):
    return tw8._traverse_wide8_packed(table8, nr8, bvh.tris, o, d, a, b,
                                      cull_backface=True, any_hit=False)
def k_any(o, d, a, b):
    return tw8._traverse_wide8_packed(table8, nr8, bvh.tris, o, d, a, b,
                                      cull_backface=False, any_hit=True)

jc = hot_jit(lambda *a: _scalarize(k_closest(*a)))
ja = hot_jit(lambda *a: _scalarize(k_any(*a)))

hit = hot_jit(k_closest)(o, d, tmin, tmax)
jax.block_until_ready(hit)
m = hit.t < 1e30
pp = o + d * jnp.where(m, hit.t, 1.0)[:, None]
at = jnp.where(m, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)

# sorted bounce (what production sees after the segment reorder)
from vulkanraytracing_tpu.ops import reorder, trace
lo_r, hi_r = trace._root_bounds(scene.bvh)
order = reorder.make_order(pp, rd, e3, at, lo_r, hi_r)
ob, db, ab_, bb = (jax.device_put(x) for x in
                   reorder.apply_order(order, pp + 1e-3 * rd, rd, e3, at))

cases = {
    "primary": (jc, (o, d, tmin, tmax)),
    "shadow": (ja, (pp + 1e-3 * sd, sd, e3, at)),
    "bounce_sorted": (jc, (ob, db, ab_, bb)),
    "bounce_raw": (jc, (pp + 1e-3 * rd, rd, e3, at)),
}
for name, (f, a) in cases.items():
    float(f(*a))
best = {k: 1e9 for k in cases}
for rep in range(6):
    for name, (f, a) in cases.items():
        t0 = time.perf_counter(); float(f(*a))
        best[name] = min(best[name], time.perf_counter() - t0)
for name, t in best.items():
    print(f"{name:16s} {t*1e3:7.1f} ms  {R/t/1e6:6.1f} Mrays/s", flush=True)
