"""A/B: drain+compact trip caps with the coherence RE-KEY (survivors
sorted by current cursor) vs liveness-only packing vs no caps, on the
real bounce-2 wavefronts (sorted production order, 262k-tri bench
scene).  The re-key rides the argsort the compaction already pays, so
any win is free; outputs are bitwise identical by construction (the
permutation is inverted), asserted here anyway.

  python tools/ab/ab_drain_rekey.py [closest_caps] [anyhit_caps]
  (defaults: 256,1024 and 16,128 — the job-051 schedules)
"""
import sys

import jax
import jax.numpy as jnp

import os as _os
_sys_path = _os.path.dirname(_os.path.abspath(__file__))
sys.path.insert(0, _sys_path)
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_sys_path)))
from tutil import timed  # noqa: E402

from perf_inframe_state import build_state  # noqa: E402

closest_caps = tuple(
    int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "256,1024").split(",")
)
anyhit_caps = tuple(
    int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "16,128").split(",")
)

(scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos_sel, R,
 mo, md, mtmin, mtmax) = build_state(with_material=True)
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8  # noqa: E402

f32 = jnp.float32
bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)


def closest(caps, rekey, split=False):
    def f(o, d, a, b):
        return tw8._traverse_wide8_packed(
            table8, nr8, bvh.tris, o, d, a, b,
            cull_backface=True, any_hit=False, phase_split=split,
            drain_caps=caps, drain_rekey=rekey)
    return f


def anyh(caps, rekey):
    def f(o, d, a, b):
        hit = tw8._traverse_wide8_packed(
            table8, nr8, bvh.tris, o, d, a, b,
            cull_backface=False, any_hit=True,
            any_order=True, phase_split=True,
            drain_caps=caps, drain_rekey=rekey)
        return hit.t < 3.0e38
    return f


tmin = jnp.full((R,), 1e-3, f32)
sun_dir = jnp.broadcast_to(
    -scene.direct_light.direction[:3]
    / jnp.linalg.norm(scene.direct_light.direction[:3]), (R, 3))

res = {}
variants = (("nocap", (), True, False), ("live", closest_caps, False, False),
            ("rekey", closest_caps, True, False),
            # round-3 measured phase-split closest as a wash because waves
            # mix phases nearly every trip; after the rekey compaction the
            # resumed waves are phase-grouped, so re-test the combination
            ("rekeysplit", closest_caps, True, True))
for name, caps, rk, sp in variants:
    res[f"{name}_mat"] = timed(
        f"closest mat {name}", closest(caps, rk, sp), mo, md, mtmin, mtmax)
variants_a = (("nocap", (), True), ("live", anyhit_caps, False),
              ("rekey", anyhit_caps, True))
for name, caps, rk in variants_a:
    res[f"{name}_sun"] = timed(
        f"anyhit sun  {name}", anyh(caps, rk), sh_o, sun_dir, tmin, sh_ts)
    res[f"{name}_pt"] = timed(
        f"anyhit pt   {name}", anyh(caps, rk), sh_o, ldir, tmin, sh_tp)

# identity spot-check (closest, full outputs)
a = closest((), True)(mo, md, mtmin, mtmax)
b = closest(closest_caps, True)(mo, md, mtmin, mtmax)
same = all(bool(jnp.all(x == y)) for x, y in zip(a, b))
print(f"mat: live {res['nocap_mat']/res['live_mat']:.2f}x  "
      f"rekey {res['nocap_mat']/res['rekey_mat']:.2f}x  "
      f"rekey+split {res['nocap_mat']/res['rekeysplit_mat']:.2f}x  "
      f"(vs nocap)", flush=True)
for k in ("sun", "pt"):
    print(f"{k}: live {res[f'nocap_{k}']/res[f'live_{k}']:.2f}x  "
          f"rekey {res[f'nocap_{k}']/res[f'rekey_{k}']:.2f}x  "
          f"(vs nocap)", flush=True)
print(f"closest drain identity vs nocap: {same}", flush=True)
