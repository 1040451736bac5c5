"""How much traversal speed does ray ordering buy, and at what cost?

Same-window A/B on the bench scene bounce wavefront (2.07M diffuse rays):
  traversal alone on rays ordered by: nothing / seg-local (2048, 8192) /
  global argsort (alive,octant,morton) / and the reorder costs themselves.
"""
import sys, time, numpy as np, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, "/root/repo/tmp")
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

closest = lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b)
hit = hot_jit(closest)(o, d, tmin, tmax)
jax.block_until_ready(hit)
alive = hit.t < 1e30
p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
at = jnp.where(alive, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
key = jax.random.PRNGKey(0)
# cosine-ish bounce dirs around the hit normal would be ideal; random sphere
# dirs are the worst case the integrator sees
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
ob = p + 1e-3 * rd
lo, hi = trace._root_bounds(scene.bvh)

keys = reorder.ray_sort_keys(ob, rd, e3, at, lo, hi)

def prep(order_kind):
    if order_kind == "none":
        return ob, rd, e3, at
    if order_kind == "global":
        perm = np.asarray(jax.jit(jnp.argsort)(keys))
        take = lambda a: jnp.asarray(np.asarray(a)[perm])
        return take(ob), take(rd), take(e3), take(at)
    seg = int(order_kind)
    ranks = hot_jit(partial(reorder.seg_ranks, seg=seg))(keys)
    order = reorder.SegOrder(ranks=ranks, seg=seg)
    f = hot_jit(lambda *a: reorder.apply_order(order, *a))
    out = f(ob, rd, e3, at)
    jax.block_until_ready(out)
    return out

print(f"R={R}, alive={int(jnp.sum(alive))}", flush=True)
for kind in ("none", "2048", "8192", "32768", "global"):
    o2, d2, a2, b2 = prep(kind)
    t = timed(f"bounce traversal, order={kind:7s}", closest, o2, d2, a2, b2)
    print(f"    -> {R/t/1e6:6.2f} Mrays/s", flush=True)

# reorder costs (full state transport, 25 cols incl. uint32)
cols25 = [p[:, 0]] * 12 + [s0, s1] + [p[:, 1]] * 11
timed("seg make_order 2048", lambda: reorder.make_order(ob, rd, e3, at, lo, hi, seg=2048))
for seg in (2048, 8192, 32768):
    ranks = hot_jit(partial(reorder.seg_ranks, seg=seg))(keys)
    order = reorder.SegOrder(ranks=ranks, seg=seg)
    timed(f"seg_ranks {seg}", partial(reorder.seg_ranks, seg=seg), keys)
    timed(f"apply 25col seg={seg}", lambda *a, order=order: reorder.apply_order(order, *a), *cols25)
timed("global argsort", jnp.argsort, keys)
perm = jax.jit(jnp.argsort)(keys); jax.block_until_ready(perm)
timed("global gather 8col", lambda pm: [x[pm] for x in (ob[:, 0], ob[:, 1], ob[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], e3, at)], perm)
timed("global gather 25col", lambda pm: [x[pm] for x in cols25], perm)
