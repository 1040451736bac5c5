"""Cost of the GlobalOrder machinery at production scale."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.ops import reorder, trace
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

R = 2088960
rng = np.random.default_rng(0)
scene = build_scene_bvh(sponza_like_scene(target_triangles=65536),
                        builder="sah")
lo, hi = trace._root_bounds(scene.bvh)
o = jnp.asarray(rng.random((R, 3)).astype(np.float32) * 30 - 15)
d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
tmin = jnp.full((R,), 1e-3, jnp.float32)
tmax = jnp.full((R,), 1e3, jnp.float32)
cols17 = [jnp.asarray(rng.random((R, 3)).astype(np.float32))
          for _ in range(5)] + [tmin, tmax]

timed("keys", reorder.ray_sort_keys, o, d, tmin, tmax, lo, hi)
timed("make_order (no probe)",
      lambda *a: reorder.make_order(*a, lo, hi), o, d, tmin, tmax)
timed("make_order (probe)",
      lambda *a: reorder.make_order(*a, lo, hi, probe=scene.bvh.probe),
      o, d, tmin, tmax)
order = reorder.make_order(o, d, tmin, tmax, lo, hi, probe=scene.bvh.probe)
order = jax.block_until_ready(order)
timed("apply 17 f32 cols", lambda *a: reorder.apply_order(order, *a),
      *cols17)
timed("unapply 3 cols", lambda a: reorder.unapply_order(order, a), cols17[0])
