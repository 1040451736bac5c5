"""Decompose bench-scene frame time: primary/shadow/bounce traversal vs full frame."""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame, tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
import vulkanraytracing_tpu.ops.traverse_subpacket as sp

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                                 aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
bvh = scene.bvh
camera = Camera(cfg.camera).to_device()

px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
print("R =", R, "nodes =", bvh.nodes.shape[0], "tris =", bvh.tris.shape[0])
t_min = jnp.full((R,), 0.01, jnp.float32)
t_max = jnp.where(valid, 1000.0, 0.0)
node_tab, tri_tab = sp._packed_tables(bvh)

def timed(label, fn, n=3):
    r = fn(); jax.tree.map(lambda x: np.asarray(x), r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(); jax.tree.map(lambda x: np.asarray(x), r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms")
    return r, best

hit, t_prim = timed("primary closest (2.07M rays)", lambda: sp._traverse_subpacket_jitted(
    node_tab, tri_tab, bvh.tris, o, d, t_min, t_max,
    cull_backface=True, any_hit=False, interpret=False))
print(f"  -> {R/ t_prim/1e6:.1f} Mrays/s (incl. relay overhead)")

p = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:, None]
alive = hit.t < 1e30
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
_, t_sh = timed("sun shadow anyhit", lambda: sp._traverse_subpacket_jitted(
    node_tab, tri_tab, bvh.tris, p + 1e-3 * sd, sd,
    jnp.full((R,), 1e-3, jnp.float32), jnp.where(alive, 1000.0, 0.0),
    cull_backface=False, any_hit=True, interpret=False))

key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
_, t_b = timed("random bounce closest", lambda: sp._traverse_subpacket_jitted(
    node_tab, tri_tab, bvh.tris, p + 1e-3 * rd, rd,
    jnp.full((R,), 1e-3, jnp.float32), jnp.where(alive, 1000.0, 0.0),
    cull_backface=True, any_hit=False, interpret=False))

state = create_render_state(cfg)
def frame():
    st, stats = render_frame(scene, cfg, camera, state)
    return st.accumulation
_, t_f = timed("full frame (render_frame)", lambda: frame(), n=2)
est = t_prim + 3 * t_b + 4 * t_sh
print(f"traversal estimate (1 prim + 3 bounce + 4 shadow): {est*1e3:.0f} ms of {t_f*1e3:.0f} ms frame")
