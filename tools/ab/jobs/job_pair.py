# repl_server job: pair-mode (two-wave software pipelining) A/B on the
# preloaded REAL bounce-2 wavefronts (see tools/ab/ab_pair.py for the
# synthetic-set standalone).  Uses repl_setup globals: tw8, bvh,
# mo/md/mtmin/mtmax (sorted material closest set), sh_o/sun_d/tmin0/sh_ts
# (sun any-hit set), pl_o/pl_d/pl_tmin/pl_tmax (flipped point any-hit
# set), timed.
# reuse the session's unified table when a sibling job (e.g.
# job_drain_rekey) already built and device-put an identical one — the
# long-lived REPL otherwise holds two copies of the largest scene array
_g = globals()
if all(k in _g for k in ("table8", "nr8", "_bvh8")):
    _bvh8p, table8p, nr8p = _bvh8, table8, nr8
else:
    _bvh8p = tw8._with_bvh8(bvh)
    table8p, nr8p = tw8._unified_table8(_bvh8p)
    table8p = jax.device_put(table8p)
    _g["_bvh8"], _g["table8"], _g["nr8"] = _bvh8p, table8p, nr8p


def _pclosest(pair):
    def f(o, d, a, b):
        return tw8._traverse_wide8_packed(
            table8p, nr8p, _bvh8p.tris, o, d, a, b,
            cull_backface=True, any_hit=False, pair=pair)
    return f


def _panyh(pair):
    def f(o, d, a, b):
        hit = tw8._traverse_wide8_packed(
            table8p, nr8p, _bvh8p.tris, o, d, a, b,
            cull_backface=False, any_hit=True,
            any_order=True, phase_split=True, pair=pair)
        return hit.t < 3.0e38
    return f


# one-shot identity check on the real TPU lowering (the CPU test
# test_pair_mode_matches_single covers interpret only): pair and single
# must agree bitwise on a real workload before the timing arms count
import numpy as _np

_hs = tw8._traverse_wide8_packed(
    table8p, nr8p, _bvh8p.tris, mo, md, mtmin, mtmax,
    cull_backface=True, any_hit=False, pair=False)
_hp = tw8._traverse_wide8_packed(
    table8p, nr8p, _bvh8p.tris, mo, md, mtmin, mtmax,
    cull_backface=True, any_hit=False, pair=True)
assert _np.array_equal(_np.asarray(_hs.t), _np.asarray(_hp.t)), \
    "pair-mode t mismatch on TPU"
assert _np.array_equal(_np.asarray(_hs.tri), _np.asarray(_hp.tri)), \
    "pair-mode tri mismatch on TPU"
print("pair identity (closest, real wavefront): exact", flush=True)

pr = {}
# interleaved arms: single, pair, single, pair (timed is best-of-6 inside)
for rep in ("a", "b"):
    pr[f"mat_s_{rep}"] = timed(f"closest mat single/{rep}", _pclosest(False),
                               mo, md, mtmin, mtmax)
    pr[f"mat_p_{rep}"] = timed(f"closest mat pair/{rep}", _pclosest(True),
                               mo, md, mtmin, mtmax)
    pr[f"sun_s_{rep}"] = timed(f"anyhit sun single/{rep}", _panyh(False),
                               sh_o, sun_d, tmin0, sh_ts)
    pr[f"sun_p_{rep}"] = timed(f"anyhit sun pair/{rep}", _panyh(True),
                               sh_o, sun_d, tmin0, sh_ts)
    pr[f"pt_s_{rep}"] = timed(f"anyhit pt  single/{rep}", _panyh(False),
                              pl_o, pl_d, pl_tmin, pl_tmax)
    pr[f"pt_p_{rep}"] = timed(f"anyhit pt  pair/{rep}", _panyh(True),
                              pl_o, pl_d, pl_tmin, pl_tmax)

for k in ("mat", "sun", "pt"):
    s = min(pr[f"{k}_s_a"], pr[f"{k}_s_b"])
    p = min(pr[f"{k}_p_a"], pr[f"{k}_p_b"])
    print(f"{k}: pair {s / p:.3f}x  (single {s*1e3:.1f} ms, "
          f"pair {p*1e3:.1f} ms)", flush=True)
