# repl_server job: drain caps x rekey x phase-split A/B on the preloaded
# bounce-2 wavefronts (see tools/ab/ab_drain_rekey.py for the standalone
# version).  Uses repl_setup globals: tw8, bvh, mo/md/mtmin/mtmax (sorted
# material closest set), sh_o/sun_d/tmin0/sh_ts (sun any-hit set),
# pl_o/pl_d/pl_tmin/pl_tmax (flipped point any-hit set), timed.
table8, nr8 = tw8._unified_table8(tw8._with_bvh8(bvh))
table8 = jax.device_put(table8)
_bvh8 = tw8._with_bvh8(bvh)


def _closest(caps, rekey, split=False):
    def f(o, d, a, b):
        return tw8._traverse_wide8_packed(
            table8, nr8, _bvh8.tris, o, d, a, b,
            cull_backface=True, any_hit=False, phase_split=split,
            drain_caps=caps, drain_rekey=rekey)
    return f


def _anyh(caps, rekey):
    def f(o, d, a, b):
        hit = tw8._traverse_wide8_packed(
            table8, nr8, _bvh8.tris, o, d, a, b,
            cull_backface=False, any_hit=True,
            any_order=True, phase_split=True,
            drain_caps=caps, drain_rekey=rekey)
        return hit.t < 3.0e38
    return f


CC = (256, 1024)
AC = (16, 128)
r = {}
for name, caps, rk, sp in (("nocap", (), True, False),
                           ("live", CC, False, False),
                           ("rekey", CC, True, False),
                           ("rekeysplit", CC, True, True)):
    r[name] = timed(f"closest mat {name}", _closest(caps, rk, sp),
                    mo, md, mtmin, mtmax)
for name, caps, rk in (("anocap", (), True), ("alive", AC, False),
                       ("arekey", AC, True)):
    r[name + "_sun"] = timed(f"anyhit sun {name}", _anyh(caps, rk),
                             sh_o, sun_d, tmin0, sh_ts)
    r[name + "_pt"] = timed(f"anyhit pt  {name}", _anyh(caps, rk),
                            pl_o, pl_d, pl_tmin, pl_tmax)
print(f"mat: live {r['nocap']/r['live']:.2f}x rekey {r['nocap']/r['rekey']:.2f}x "
      f"rekey+split {r['nocap']/r['rekeysplit']:.2f}x", flush=True)
print(f"sun: live {r['anocap_sun']/r['alive_sun']:.2f}x "
      f"rekey {r['anocap_sun']/r['arekey_sun']:.2f}x", flush=True)
print(f"pt:  live {r['anocap_pt']/r['alive_pt']:.2f}x "
      f"rekey {r['anocap_pt']/r['arekey_pt']:.2f}x", flush=True)
a = _closest((), True)(mo, md, mtmin, mtmax)
b = _closest(CC, True, True)(mo, md, mtmin, mtmax)
print("identity rekey+split vs nocap:",
      all(bool(jnp.all(x == y)) for x, y in zip(a, b)), flush=True)
