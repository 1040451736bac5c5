# repl_server job: pair-mode (two-wave software pipelining) A/B on the
# preloaded REAL bounce-2 wavefronts (see tools/ab/ab_pair.py for the
# synthetic-set standalone).  Uses repl_setup globals: tw8, bvh,
# mo/md/mtmin/mtmax (sorted material closest set), sh_o/sun_d/tmin0/sh_ts
# (sun any-hit set), pl_o/pl_d/pl_tmin/pl_tmax (flipped point any-hit
# set), timed.
_bvh8p = tw8._with_bvh8(bvh)
table8p, nr8p = tw8._unified_table8(_bvh8p)
table8p = jax.device_put(table8p)


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
