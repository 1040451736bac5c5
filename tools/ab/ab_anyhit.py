"""A/B on the REAL bounce-1 shadow set: unordered vs near-ordered any-hit
descent, and point-light rays flipped to start from the light (shared
origin per light => camera-like coherence)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
from tutil import timed

from perf_inframe_state import build_state  # noqa: E402

(scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos_sel, R) = build_state()
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8

f32 = jnp.float32
bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)


def anyh(order_flag):
    def f(o, d, a, b):
        hit = tw8._traverse_wide8_packed(
            table8, nr8, bvh.tris, o, d, a, b,
            cull_backface=False, any_hit=True, any_order=order_flag)
        return hit.t < 3.0e38
    return f


tmin = jnp.full((R,), 1e-3, f32)
sun_dir = jnp.broadcast_to(
    -scene.direct_light.direction[:3]
    / jnp.linalg.norm(scene.direct_light.direction[:3]), (R, 3))

o1 = timed("sun   unordered", anyh(False), sh_o, sun_dir, tmin, sh_ts)
o2 = timed("sun   ordered  ", anyh(True), sh_o, sun_dir, tmin, sh_ts)
p1 = timed("point unordered", anyh(False), sh_o, ldir, tmin, sh_tp)
p2 = timed("point ordered  ", anyh(True), sh_o, ldir, tmin, sh_tp)

# flipped point rays: from the light toward the surface, same segment
fo = lpos_sel
fd = -ldir
f1 = timed("point FLIP unordered", anyh(False), fo, fd, tmin, sh_tp)
f2 = timed("point FLIP ordered  ", anyh(True), fo, fd, tmin, sh_tp)
print(f"sun: {o1/o2:.2f}x ordered; point: {p1/p2:.2f}x ordered, "
      f"{p1/f1:.2f}x flip, {p1/f2:.2f}x flip+ordered", flush=True)
