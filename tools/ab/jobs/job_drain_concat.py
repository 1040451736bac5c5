# repl job: minimized drain-abort repro candidate — the frame's any-hit
# traces BOTH shadow sets as ONE concatenated 2R wavefront (4.17M rays,
# 510 pallas grid steps); the r04 standalone cap A/Bs only ever ran the
# sets separately (2.09M, 255 steps).  If the capped concat aborts
# standalone, the full-frame abort reproduces without the frame.
import jax.numpy as jnp

table8c, nr8c = (globals().get("table8"), globals().get("nr8"))
if table8c is None:
    _b8 = tw8._with_bvh8(bvh)
    table8c, nr8c = tw8._unified_table8(_b8)
    table8c = jax.device_put(table8c)
    globals()["table8"], globals()["nr8"], globals()["_bvh8"] = \
        table8c, nr8c, _b8
_b8 = globals()["_bvh8"]

co = jnp.concatenate([pl_o, sh_o])
cd = jnp.concatenate([pl_d, sun_d])
ca = jnp.concatenate([pl_tmin, tmin0])
cb = jnp.concatenate([pl_tmax, sh_ts])
print(f"concat 2R = {co.shape[0]} rays", flush=True)

import time as _t
for caps in ((), (16, 128)):
    t0 = _t.perf_counter()
    try:
        hit = tw8._traverse_wide8_packed(
            table8c, nr8c, _b8.tris, co, cd, ca, cb,
            cull_backface=False, any_hit=True, any_order=True,
            phase_split=True, drain_caps=caps)
        occ = float(jnp.sum((hit.t < 3.0e38).astype(jnp.float32)))
        print(f"caps={caps}: PASS occluded={occ:.0f} "
              f"in {_t.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"caps={caps}: ABORT after {_t.perf_counter()-t0:.1f}s: "
              f"{e!r:.200}", flush=True)
