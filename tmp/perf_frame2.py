"""Frame decomposition v2: uses the PRODUCTION trace path (wide8) + sorts."""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame, tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.ops import trace, reorder
from vulkanraytracing_tpu.core.jit_utils import hot_jit

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

def timed(label, fn, n=4):
    r = fn(); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); jax.tree.map(np.asarray, r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<38s} {best*1e3:6.0f} ms")
    return r, best

closest = hot_jit(lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b))
anyh = hot_jit(lambda o, d, a, b: trace.trace_any(scene, cfg, o, d, a, b))
hit, t_p = timed("primary closest (prod path)", lambda: closest(o, d, tmin, tmax))

p = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:, None]
alive = hit.t < 1e30
at = jnp.where(alive, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
_, t_sh = timed("sun shadow anyhit (prod)", lambda: anyh(p + 1e-3 * sd, sd, e3, at))

key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
# bounce WITH pre-sort (what the integrator now does): sort then trace
lo, hi = trace._root_bounds(scene.bvh)
def sorted_bounce():
    order = reorder.make_order(p, rd, e3, at, lo, hi)
    o2, d2, a2, b2 = reorder.apply_order(order, p + 1e-3 * rd, rd, e3, at)
    return trace.trace_closest(scene, cfg, o2, d2, a2, b2)
sb = hot_jit(sorted_bounce)
_, t_b = timed("sorted bounce closest (prod)", lambda: sb())
_, t_bu = timed("UNsorted bounce closest (prod)", lambda: closest(p + 1e-3*rd, rd, e3, at))

mk = hot_jit(lambda: reorder.make_order(p, rd, e3, at, lo, hi))
_, t_s = timed("make_order alone (2.07M)", lambda: mk())

state = create_render_state(cfg)
def frame():
    st, stats = render_frame(scene, cfg, camera, state)
    return st.accumulation
_, t_f = timed("FULL FRAME", lambda: frame(), n=3)
est = t_p + 3 * t_b + 4 * t_sh
print(f"estimate 1p+3sb+4sh = {est*1e3:.0f} ms vs frame {t_f*1e3:.0f} ms")
