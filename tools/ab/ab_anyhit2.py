"""A/B: unordered any-hit descent (any_order=False: slot-order descent,
no near-first select) vs the production cheap near-first select
(any_order=True), on the real bounce-1 shadow sets.  Historical note: the
round-2 version of this script compared against a snapshot of the
pre-specialization kernel (full Batcher order + tri-id/u/v tracking) and
measured the specialization at 1.89x on the sun set; that snapshot
(tmp/tw8_old.py) was pruned in round 3."""
import sys

import jax
import jax.numpy as jnp


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
from tutil import timed  # noqa: E402

from perf_inframe_state import build_state  # noqa: E402

(scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos_sel, R) = build_state()
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8  # noqa: E402

f32 = jnp.float32
bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)


def anyh(mod, order_flag):
    def f(o, d, a, b):
        hit = mod._traverse_wide8_packed(
            table8, nr8, bvh.tris, o, d, a, b,
            cull_backface=False, any_hit=True, any_order=order_flag)
        return hit.t < 3.0e38
    return f


tmin = jnp.full((R,), 1e-3, f32)
sun_dir = jnp.broadcast_to(
    -scene.direct_light.direction[:3]
    / jnp.linalg.norm(scene.direct_light.direction[:3]), (R, 3))

res = {}
for name, flag in (("old", False), ("new", True)):
    res[name + "_sun"] = timed(f"sun   order={flag} {name}", anyh(tw8, flag),
                               sh_o, sun_dir, tmin, sh_ts)
    res[name + "_pt"] = timed(f"point order={flag} {name}", anyh(tw8, flag),
                              sh_o, ldir, tmin, sh_tp)
# identity check
hs_old = anyh(tw8, False)(sh_o, sun_dir, tmin, sh_ts)
hs_new = anyh(tw8, True)(sh_o, sun_dir, tmin, sh_ts)
same = bool(jnp.all(hs_old == hs_new))
print(f"sun: {res['old_sun']/res['new_sun']:.2f}x new; "
      f"point: {res['old_pt']/res['new_pt']:.2f}x new; identical={same}",
      flush=True)
