# repl job: minimized repro for the full-frame drain abort — compose the
# frame's RIDING VARIADIC SORT (reorder.sort_wavefront, ~18 operands in
# one lax.sort) with a capped any-hit traversal in ONE jit program.
# Evidence so far (r05 ladder): frame+caps aborts; frame+caps+NO_SORT
# passes; caps standalone (incl. 2R concat, 510 grid steps) pass.
import jax
import jax.numpy as jnp

_b8 = globals().get("_bvh8") or tw8._with_bvh8(bvh)
table8c = globals().get("table8"); nr8c = globals().get("nr8")
if table8c is None:
    table8c, nr8c = tw8._unified_table8(_b8)
    table8c = jax.device_put(table8c)

_lo, _hi = trace._root_bounds(bvh)
R2 = R
f32 = jnp.float32
extra = (jnp.zeros((R2, 3), f32), jnp.ones((R2, 3), f32),
         jnp.ones((R2,), f32), jnp.zeros((R2,), jnp.uint32),
         jnp.zeros((R2,), jnp.uint32), sh_ts > 0, sh_ts > 0,
         jnp.arange(R2, dtype=jnp.int32), sh_o, sh_ts,
         jnp.zeros((R2, 3), f32), ldir, sh_tp, jnp.zeros((R2, 3), f32))

import time as _t


def _run(label, caps, use_riding_sort):
    def prog(o, d, a, b):
        if use_riding_sort:
            out = reorder.sort_wavefront(o, d, a, b, _lo, _hi,
                                         (o, d, a, b, *extra),
                                         probe=bvh.probe)
            o, d, a, b = out[:4]
        hit = tw8._traverse_wide8_packed(
            table8c, nr8c, _b8.tris, o, d, a, b,
            cull_backface=False, any_hit=True, any_order=True,
            phase_split=True, drain_caps=caps)
        return jnp.sum((hit.t < 3.0e38).astype(f32))

    t0 = _t.perf_counter()
    try:
        v = float(hot_jit(prog)(sh_o, sun_d, tmin0, sh_ts))
        print(f"{label}: PASS occ={v:.0f} in {_t.perf_counter()-t0:.1f}s",
              flush=True)
        return True
    except Exception as e:
        print(f"{label}: ABORT after {_t.perf_counter()-t0:.1f}s: "
              f"{e!r:.200}", flush=True)
        return False


_run("sort+capped",   (16, 128), True)
_run("sort+uncapped", (),        True)
_run("nosort+capped", (16, 128), False)
