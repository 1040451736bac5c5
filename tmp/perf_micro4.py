"""Composite microbench: the real wide-kernel body rebuilt piecewise.
Variants add blocks one at a time: fetch -> +interior -> +leaf -> +decision.
All cursors synthetic (rows never die), fixed ITERS trips."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20_000
TAB_ROWS = 65536
NR = 32738
W = 64
LEAF_TESTS = 4
STACK_DEPTH = 64
tiny = 1e-30
big = 3.0e38

def run(name, kernel, extra_scratch):
    table = jnp.arange(TAB_ROWS * 128, dtype=jnp.int32).reshape(TAB_ROWS, 128)
    scratch = ([pltpu.VMEM((W, 128), jnp.float32) for _ in range(11)]
               + [pltpu.VMEM((W, 128), jnp.int32) for _ in range(5)]
               + extra_scratch)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(lambda t: call(t))
    r = f(table); np.asarray(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(table)); best = min(best, time.perf_counter() - t0)
    print(f"{name:<44s} {best/ITERS*1e9:7.0f} ns/trip")

def make(interior=False, leaf=False, decision=False, anyh=False):
    def kernel(uni_ref, out,
               rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rtmin, wbest,
               nscr, wtri, whit, meta, stack):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
        meta[...] = jnp.zeros((W, 128), jnp.int32)
        for r in (rox, roy, roz, rtmin):
            r[...] = jnp.zeros((W, 128), jnp.float32)
        for r in (rdx, rdy, rdz, rix, riy, riz):
            r[...] = jnp.ones((W, 128), jnp.float32)
        wbest[...] = jnp.full((W, 128), big)
        wtri[...] = jnp.zeros((W, 128), jnp.int32)
        whit[...] = jnp.zeros((W, 128), jnp.int32)
        stack[...] = jnp.zeros((W, 128), jnp.int32)

        def body(it):
            # fetch
            for j in range(W):
                c = meta[j, 0]
                ii = c >= 0
                isdone = c == -(1 << 30)
                start = (~c) >> 4
                row = jnp.where(ii, c >> 3, jnp.where(isdone, NR, NR + 1 + (start >> 3)))
                row = jnp.minimum(jnp.maximum(row, 0), TAB_ROWS - 1)
                sh = jnp.where(ii, (c & 7) << 4, (start & 7) << 4)
                nscr[pl.ds(j, 1), :] = pltpu.roll(
                    uni_ref[pl.ds(row, 1), :], shift=-sh, axis=1)

            c_all = meta[:, 0:1]
            ii_m = c_all >= 0
            il_m = (c_all < 0) & (c_all != -(1 << 30))
            done_m = c_all == -(1 << 30)

            def colf(i):
                return pltpu.bitcast(nscr[:, i:i+1], jnp.float32)
            ox, oy, oz = rox[...], roy[...], roz[...]
            ix, iy, iz = rix[...], riy[...], riz[...]
            t_min = rtmin[...]
            best = wbest[...]

            nxt_int = c_all * 0
            far = c_all * 0
            code = c_all * 0 + 1
            if interior:
                def slab(b):
                    ax = (colf(b+0) - ox) * ix; bx = (colf(b+3) - ox) * ix
                    ay = (colf(b+1) - oy) * iy; by = (colf(b+4) - oy) * iy
                    az = (colf(b+2) - oz) * iz; bz = (colf(b+5) - oz) * iz
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(ax,bx), jnp.minimum(ay,by)),
                                     jnp.maximum(jnp.minimum(az,bz), t_min))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(ax,bx), jnp.maximum(ay,by)),
                                     jnp.minimum(jnp.maximum(az,bz), best))
                    return tn, tf
                tn0, tf0 = slab(0)
                tn1, tf1 = slab(6)
                t0r = jnp.min(jnp.where(tn0 <= tf0, tn0, big), axis=1, keepdims=True)
                t1r = jnp.min(jnp.where(tn1 <= tf1, tn1, big), axis=1, keepdims=True)
                h0r = t0r < big; h1r = t1r < big; near0 = t0r <= t1r
                e0col = nscr[:, 12:13]; e1col = nscr[:, 13:14]
                nxt_int = jnp.where(h0r & h1r, jnp.where(near0, e0col, e1col),
                                    jnp.where(h0r, e0col, e1col))
                far = jnp.where(near0, e1col, e0col)
                code = jnp.where(h0r | h1r, 1, 0) + jnp.where(h0r & h1r, 2, 0)

            if leaf:
                lf = pltpu.bitcast(nscr[...], jnp.float32)
                dx, dy, dz = rdx[...], rdy[...], rdz[...]
                tri_best = wtri[...]
                hit_found = whit[...] != 0
                def coll(i): return lf[:, i:i+1]
                for k in range(LEAF_TESTS):
                    b = k * 16
                    v0x, v0y, v0z = coll(b+0), coll(b+1), coll(b+2)
                    e1x, e1y, e1z = coll(b+3), coll(b+4), coll(b+5)
                    e2x, e2y, e2z = coll(b+6), coll(b+7), coll(b+8)
                    cull_disable = coll(b+9) > 0.5
                    candidate = coll(b+10) > 0.5
                    tid = coll(b+11)
                    pvx = dy*e2z - dz*e2y; pvy = dz*e2x - dx*e2z; pvz = dx*e2y - dy*e2x
                    det = e1x*pvx + e1y*pvy + e1z*pvz
                    inv_det = 1.0 / jnp.where(jnp.abs(det) < tiny, 1.0, det)
                    tvx = ox - v0x; tvy = oy - v0y; tvz = oz - v0z
                    mu = (tvx*pvx + tvy*pvy + tvz*pvz) * inv_det
                    qvx = tvy*e1z - tvz*e1y; qvy = tvz*e1x - tvx*e1z; qvz = tvx*e1y - tvy*e1x
                    mv = (dx*qvx + dy*qvy + dz*qvz) * inv_det
                    mt = (e2x*qvx + e2y*qvy + e2z*qvz) * inv_det
                    valid = (il_m & candidate & (jnp.abs(det) > tiny)
                             & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                             & (mt >= t_min) & (mt < best))
                    valid &= (det > tiny) | cull_disable
                    best = jnp.where(valid, mt, best)
                    tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                    hit_found |= valid
                wbest[...] = best
                wtri[...] = tri_best
                whit[...] = hit_found.astype(jnp.int32)

            if decision:
                sp = meta[:, 1:2]
                both = ii_m & (code >= 3)
                any1 = ii_m & (code >= 1)
                lstart = (~c_all) >> 4
                lend = lstart + ((~c_all) & 15) - 1
                row2 = lend >> 3
                extra = il_m & (row2 != (lstart >> 3))
                leaf2 = ~(((row2 << 3) << 4) | 1)
                push_val = jnp.where(ii_m, far, leaf2)
                do_push = (both | extra) & (sp < STACK_DEPTH)
                stack[...] = jnp.where((colw == sp) & do_push, push_val, stack[...])
                sp2 = sp + jnp.where(do_push, 1, 0)
                can_pop = sp2 > 0
                top = jnp.sum(jnp.where(colw == sp2-1, stack[...], 0), axis=1, keepdims=True)
                newc = jnp.where(any1, nxt_int, jnp.where(can_pop, top, 0))
                popped = (~any1) & (~done_m) & can_pop
                sp3 = sp2 - jnp.where(popped, 1, 0)
                # synthetic: never die, wander the table
                newc = (jnp.abs(newc) + it) % (TAB_ROWS * 8 - 9)
                meta[...] = jnp.where(colw == 0, newc,
                                      jnp.where(colw == 1, jnp.abs(sp3) % 64, meta[...]))
            else:
                newc = (c_all * 5 + 1 + it) % (TAB_ROWS * 8 - 9)
                meta[...] = jnp.where(colw == 0, newc, meta[...])
            return it + 1
        jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
        out[...] = nscr[0:8, :]
    return kernel

#run("fetch only", make(), [])
#
#
#
run("fetch + interior + leaf + decision", make(interior=True, leaf=True, decision=True), [])

# --- full body + refill machinery (rows die ~every 64 trips) ---
TOTAL_ROWS = 2048
def make_refill(gate=True, die_mask=63):
    base = make(interior=True, leaf=True, decision=True)
    def kernel(uni_ref, pox, poy, poz, pdx, pdy, pdz, ptmin, ptmax,
               obest, otri, ohit, out,
               rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rtmin, wbest,
               nscr, wtri, whit, meta, stack, nrw, cnt):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
        DONE = -(1 << 30)
        meta[...] = jnp.where(colw == 2, -1, jnp.where(colw == 0, DONE, 0))
        for r in (rox, roy, roz, rtmin):
            r[...] = jnp.zeros((W, 128), jnp.float32)
        for r in (rdx, rdy, rdz, rix, riy, riz):
            r[...] = jnp.ones((W, 128), jnp.float32)
        wbest[...] = jnp.full((W, 128), big)
        wtri[...] = jnp.zeros((W, 128), jnp.int32)
        whit[...] = jnp.zeros((W, 128), jnp.int32)
        stack[...] = jnp.zeros((W, 128), jnp.int32)
        nrw[0] = 0
        cnt[0] = W

        def refill_block():
            for j in range(W):
                need = (meta[j, 0] == DONE) & (nrw[0] < TOTAL_ROWS)
                @pl.when(need)
                def _():
                    src = meta[j, 2]
                    @pl.when(src >= 0)
                    def _():
                        dst = jnp.maximum(src, 0)
                        obest[pl.ds(dst, 1), :] = wbest[pl.ds(j, 1), :]
                        otri[pl.ds(dst, 1), :] = wtri[pl.ds(j, 1), :]
                        ohit[pl.ds(dst, 1), :] = whit[pl.ds(j, 1), :]
                    new = nrw[0]
                    nrw[0] = new + 1
                    rox[pl.ds(j, 1), :] = pox[pl.ds(new, 1), :]
                    roy[pl.ds(j, 1), :] = poy[pl.ds(new, 1), :]
                    roz[pl.ds(j, 1), :] = poz[pl.ds(new, 1), :]
                    dxr = pdx[pl.ds(new, 1), :]
                    rdx[pl.ds(j, 1), :] = dxr
                    rdy[pl.ds(j, 1), :] = pdy[pl.ds(new, 1), :]
                    rdz[pl.ds(j, 1), :] = pdz[pl.ds(new, 1), :]
                    rix[pl.ds(j, 1), :] = 1.0 / jnp.maximum(dxr, 1e-3)
                    riy[pl.ds(j, 1), :] = rix[pl.ds(j, 1), :]
                    riz[pl.ds(j, 1), :] = rix[pl.ds(j, 1), :]
                    tminr = ptmin[pl.ds(new, 1), :]
                    tmaxr = ptmax[pl.ds(new, 1), :]
                    rtmin[pl.ds(j, 1), :] = tminr
                    wbest[pl.ds(j, 1), :] = jnp.minimum(tmaxr, big)
                    wtri[pl.ds(j, 1), :] = jnp.zeros((1, 128), jnp.int32)
                    whit[pl.ds(j, 1), :] = jnp.zeros((1, 128), jnp.int32)
                    live = jnp.sum(jnp.where(tminr <= tmaxr, 1, 0), axis=1, keepdims=True)
                    cur0 = jnp.where(live > 0, 0, DONE)
                    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                    meta[pl.ds(j, 1), :] = jnp.where(col1 == 0, cur0,
                                                     jnp.where(col1 == 2, new, 0))

        def body(state):
            it, _, n_int, n_leaf = state
            if gate:
                idle = cnt[0]
                pl.when((nrw[0] < TOTAL_ROWS) & (idle >= W // 4))(refill_block)
            # fetch
            for j in range(W):
                c = meta[j, 0]
                ii = c >= 0
                isdone = c == DONE
                start = (~c) >> 4
                row = jnp.where(ii, c >> 3, jnp.where(isdone, NR, NR + 1 + (start >> 3)))
                row = jnp.minimum(jnp.maximum(row, 0), TAB_ROWS - 1)
                sh = jnp.where(ii, (c & 7) << 4, (start & 7) << 4)
                nscr[pl.ds(j, 1), :] = pltpu.roll(uni_ref[pl.ds(row, 1), :], shift=-sh, axis=1)
            c_all = meta[:, 0:1]
            ii_m = c_all >= 0
            il_m = (c_all < 0) & (c_all != DONE)
            done_m = c_all == DONE
            # synthetic wander + death
            newc = (jnp.abs(c_all) * 5 + 1 + it) % (TAB_ROWS * 8 - 9)
            dies = (newc & die_mask) == 0
            newc = jnp.where(done_m | dies, DONE, newc)
            meta[...] = jnp.where(colw == 0, newc, meta[...])
            idle_now = jnp.sum(jnp.where(newc == DONE, 1, 0))
            cnt[0] = idle_now
            alldone = (nrw[0] >= TOTAL_ROWS) & (idle_now >= W)
            n_int += jnp.sum(jnp.where(ii_m, 1, 0))
            n_leaf += jnp.sum(jnp.where(il_m, 1, 0))
            return (it + 1, alldone, n_int, n_leaf)
        jax.lax.while_loop(lambda st: (~st[1]) & (st[0] < ITERS), body,
                           (jnp.int32(0), False, jnp.int32(0), jnp.int32(0)))
        out[...] = nscr[0:8, :]
    return kernel

def run_refill(name, kernel):
    table = jnp.arange(TAB_ROWS * 128, dtype=jnp.int32).reshape(TAB_ROWS, 128)
    pool_f = jnp.ones((TOTAL_ROWS, 128), jnp.float32)
    scratch = ([pltpu.VMEM((W, 128), jnp.float32) for _ in range(11)]
               + [pltpu.VMEM((W, 128), jnp.int32) for _ in range(5)]
               + [pltpu.SMEM((1,), jnp.int32), pltpu.SMEM((1,), jnp.int32)])
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((TOTAL_ROWS, 128), jnp.float32),
                   jax.ShapeDtypeStruct((TOTAL_ROWS, 128), jnp.int32),
                   jax.ShapeDtypeStruct((TOTAL_ROWS, 128), jnp.int32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(lambda t, p: call(t, p, p, p, p, p, p, p, p))
    r = f(table, pool_f); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.tree.map(np.asarray, f(table, pool_f))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<44s} {best/ITERS*1e9:7.0f} ns/trip")

#
#

# --- full body, nested while inside fori over waves with block load/flush ---
def make_waves(n_waves, per_wave):
    inner = make(interior=True, leaf=True, decision=True)
    # rebuild: same body, but structured as waves
    def kernel(uni_ref, pool, obest, out,
               rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rtmin, wbest,
               nscr, wtri, whit, meta, stack):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
        def body(state):
            it, _ = state
            for j in range(W):
                c = meta[j, 0]
                ii = c >= 0
                isdone = c == -(1 << 30)
                start = (~c) >> 4
                row = jnp.where(ii, c >> 3, jnp.where(isdone, NR, NR + 1 + (start >> 3)))
                row = jnp.minimum(jnp.maximum(row, 0), TAB_ROWS - 1)
                sh = jnp.where(ii, (c & 7) << 4, (start & 7) << 4)
                nscr[pl.ds(j, 1), :] = pltpu.roll(uni_ref[pl.ds(row, 1), :], shift=-sh, axis=1)
            c_all = meta[:, 0:1]
            ii_m = c_all >= 0
            il_m = (c_all < 0) & (c_all != -(1 << 30))
            done_m = c_all == -(1 << 30)
            def colf(i): return pltpu.bitcast(nscr[:, i:i+1], jnp.float32)
            ox, oy, oz = rox[...], roy[...], roz[...]
            ix, iy, iz = rix[...], riy[...], riz[...]
            t_min = rtmin[...]
            best = wbest[...]
            def slab(b):
                ax = (colf(b+0) - ox) * ix; bx = (colf(b+3) - ox) * ix
                ay = (colf(b+1) - oy) * iy; by = (colf(b+4) - oy) * iy
                az = (colf(b+2) - oz) * iz; bz = (colf(b+5) - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(ax,bx), jnp.minimum(ay,by)),
                                 jnp.maximum(jnp.minimum(az,bz), t_min))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(ax,bx), jnp.maximum(ay,by)),
                                 jnp.minimum(jnp.maximum(az,bz), best))
                return tn, tf
            tn0, tf0 = slab(0); tn1, tf1 = slab(6)
            t0r = jnp.min(jnp.where(tn0 <= tf0, tn0, big), axis=1, keepdims=True)
            t1r = jnp.min(jnp.where(tn1 <= tf1, tn1, big), axis=1, keepdims=True)
            h0r = t0r < big; h1r = t1r < big; near0 = t0r <= t1r
            e0col = nscr[:, 12:13]; e1col = nscr[:, 13:14]
            nxt_int = jnp.where(h0r & h1r, jnp.where(near0, e0col, e1col),
                                jnp.where(h0r, e0col, e1col))
            far = jnp.where(near0, e1col, e0col)
            code = jnp.where(h0r | h1r, 1, 0) + jnp.where(h0r & h1r, 2, 0)
            lf = pltpu.bitcast(nscr[...], jnp.float32)
            dx, dy, dz = rdx[...], rdy[...], rdz[...]
            tri_best = wtri[...]
            hit_found = whit[...] != 0
            def coll(i): return lf[:, i:i+1]
            for k in range(LEAF_TESTS):
                b = k * 16
                v0x, v0y, v0z = coll(b+0), coll(b+1), coll(b+2)
                e1x, e1y, e1z = coll(b+3), coll(b+4), coll(b+5)
                e2x, e2y, e2z = coll(b+6), coll(b+7), coll(b+8)
                cand = coll(b+10) > 0.5
                tid = coll(b+11)
                pvx = dy*e2z - dz*e2y; pvy = dz*e2x - dx*e2z; pvz = dx*e2y - dy*e2x
                det = e1x*pvx + e1y*pvy + e1z*pvz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < tiny, 1.0, det)
                tvx = ox - v0x; tvy = oy - v0y; tvz = oz - v0z
                mu = (tvx*pvx + tvy*pvy + tvz*pvz) * inv_det
                qvx = tvy*e1z - tvz*e1y; qvy = tvz*e1x - tvx*e1z; qvz = tvx*e1y - tvy*e1x
                mv = (dx*qvx + dy*qvy + dz*qvz) * inv_det
                mt = (e2x*qvx + e2y*qvy + e2z*qvz) * inv_det
                valid = (il_m & cand & (jnp.abs(det) > tiny)
                         & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                         & (mt >= t_min) & (mt < best))
                best = jnp.where(valid, mt, best)
                tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                hit_found |= valid
            wbest[...] = best
            wtri[...] = tri_best
            whit[...] = hit_found.astype(jnp.int32)
            sp = meta[:, 1:2]
            both = ii_m & (code >= 3)
            any1 = ii_m & (code >= 1)
            lstart = (~c_all) >> 4
            lend = lstart + ((~c_all) & 15) - 1
            row2 = lend >> 3
            extra = il_m & (row2 != (lstart >> 3))
            leaf2 = ~(((row2 << 3) << 4) | 1)
            push_val = jnp.where(ii_m, far, leaf2)
            do_push = (both | extra) & (sp < STACK_DEPTH)
            stack[...] = jnp.where((colw == sp) & do_push, push_val, stack[...])
            sp2 = sp + jnp.where(do_push, 1, 0)
            top = jnp.sum(jnp.where(colw == sp2-1, stack[...], 0), axis=1, keepdims=True)
            newc = jnp.where(any1, nxt_int, jnp.where(sp2 > 0, top, 0))
            sp3 = sp2 - jnp.where((~any1) & (~done_m) & (sp2 > 0), 1, 0)
            newc = (jnp.abs(newc) + it) % (TAB_ROWS * 8 - 9)
            meta[...] = jnp.where(colw == 0, newc, jnp.where(colw == 1, jnp.abs(sp3) % 64, meta[...]))
            idle_now = jnp.sum(jnp.where(newc == -1, 1, 0))
            flag = idle_now >= W
            if COND_MODE == "counter":
                flag = it < -1
            return (it + 1, flag)
        def wave(w, trips):
            base = pl.multiple_of(w * W, W)
            rox[...] = pool[pl.ds(base, W), :]
            roy[...] = pool[pl.ds(base, W), :]
            roz[...] = pool[pl.ds(base, W), :]
            rdx[...] = pool[pl.ds(base, W), :] + 1.0
            rdy[...] = pool[pl.ds(base, W), :] + 1.0
            rdz[...] = pool[pl.ds(base, W), :] + 1.0
            rix[...] = pool[pl.ds(base, W), :] + 1.0
            riy[...] = pool[pl.ds(base, W), :] + 1.0
            riz[...] = pool[pl.ds(base, W), :] + 1.0
            rtmin[...] = jnp.zeros((W, 128), jnp.float32)
            wbest[...] = jnp.full((W, 128), big)
            wtri[...] = jnp.zeros((W, 128), jnp.int32)
            whit[...] = jnp.zeros((W, 128), jnp.int32)
            meta[...] = jnp.zeros((W, 128), jnp.int32)
            stack[...] = jnp.zeros((W, 128), jnp.int32)
            if COND_MODE == "blocked":
                KB = 8
                def block8(st):
                    st = jax.lax.fori_loop(0, KB, lambda _, s2: body(s2), st)
                    return st
                it_end, _ = jax.lax.while_loop(
                    lambda st: (~st[1]) & (st[0] < per_wave),
                    block8, (jnp.int32(0), False))
            else:
                it_end, _ = jax.lax.while_loop(lambda st: (~st[1]) & (st[0] < per_wave),
                                               body, (jnp.int32(0), False))
            obest[pl.ds(base, W), :] = wbest[...]
            return trips + it_end
        jax.lax.fori_loop(0, n_waves, wave, jnp.int32(0))
        out[...] = nscr[0:8, :]
    return kernel

def run_waves(name, kernel):
    table = jnp.arange(TAB_ROWS * 128, dtype=jnp.int32).reshape(TAB_ROWS, 128)
    pool_f = jnp.ones((2048, 128), jnp.float32)
    scratch = ([pltpu.VMEM((W, 128), jnp.float32) for _ in range(11)]
               + [pltpu.VMEM((W, 128), jnp.int32) for _ in range(5)])
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((2048, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(lambda t, p: call(t, p))
    r = f(table, pool_f); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.tree.map(np.asarray, f(table, pool_f))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<44s} {best/ITERS*1e9:7.0f} ns/trip")

COND_MODE = "reduce"



# --- G independent groups interleaved in one body (latency hiding test) ---
def make_groups(G, rows_per):
    def kernel(uni_ref, out, *bufs):
        # per-group buffers: 11 f32 + 5 i32 each
        nb = 16
        groups = [bufs[g*nb:(g+1)*nb] for g in range(G)]
        colw = jax.lax.broadcasted_iota(jnp.int32, (rows_per, 128), 1)
        for g in range(G):
            (rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rtmin, wbest,
             nscr, wtri, whit, meta, stack) = groups[g]
            meta[...] = jnp.zeros((rows_per, 128), jnp.int32)
            for r in (rox, roy, roz, rtmin):
                r[...] = jnp.zeros((rows_per, 128), jnp.float32)
            for r in (rdx, rdy, rdz, rix, riy, riz):
                r[...] = jnp.ones((rows_per, 128), jnp.float32)
            wbest[...] = jnp.full((rows_per, 128), big)
            wtri[...] = jnp.zeros((rows_per, 128), jnp.int32)
            whit[...] = jnp.zeros((rows_per, 128), jnp.int32)
            stack[...] = jnp.zeros((rows_per, 128), jnp.int32)
        def body(it):
            # phase 1: all fetches (independent across groups)
            for g in range(G):
                (rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rtmin, wbest,
                 nscr, wtri, whit, meta, stack) = groups[g]
                for j in range(rows_per):
                    c = meta[j, 0]
                    row = jnp.minimum(jnp.maximum(c >> 3, 0), TAB_ROWS - 1)
                    sh = (c & 7) << 4
                    nscr[pl.ds(j, 1), :] = pltpu.roll(uni_ref[pl.ds(row, 1), :], shift=-sh, axis=1)
            # phase 2: vector math per group (independent chains)
            for g in range(G):
                (rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rtmin, wbest,
                 nscr, wtri, whit, meta, stack) = groups[g]
                c_all = meta[:, 0:1]
                ii_m = c_all >= 0
                il_m = (c_all < 0) & (c_all != -(1 << 30))
                def colf(i): return pltpu.bitcast(nscr[:, i:i+1], jnp.float32)
                ox, oy, oz = rox[...], roy[...], roz[...]
                ix, iy, iz = rix[...], riy[...], riz[...]
                t_min = rtmin[...]
                best = wbest[...]
                def slab(b):
                    ax = (colf(b+0) - ox) * ix; bx = (colf(b+3) - ox) * ix
                    ay = (colf(b+1) - oy) * iy; by = (colf(b+4) - oy) * iy
                    az = (colf(b+2) - oz) * iz; bz = (colf(b+5) - oz) * iz
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(ax,bx), jnp.minimum(ay,by)),
                                     jnp.maximum(jnp.minimum(az,bz), t_min))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(ax,bx), jnp.maximum(ay,by)),
                                     jnp.minimum(jnp.maximum(az,bz), best))
                    return tn, tf
                tn0, tf0 = slab(0); tn1, tf1 = slab(6)
                t0r = jnp.min(jnp.where(tn0 <= tf0, tn0, big), axis=1, keepdims=True)
                t1r = jnp.min(jnp.where(tn1 <= tf1, tn1, big), axis=1, keepdims=True)
                h0r = t0r < big; h1r = t1r < big; near0 = t0r <= t1r
                e0col = nscr[:, 12:13]; e1col = nscr[:, 13:14]
                nxt_int = jnp.where(h0r & h1r, jnp.where(near0, e0col, e1col),
                                    jnp.where(h0r, e0col, e1col))
                # leaf MT x4
                lf = pltpu.bitcast(nscr[...], jnp.float32)
                dx, dy, dz = rdx[...], rdy[...], rdz[...]
                tri_best = wtri[...]
                hit_found = whit[...] != 0
                def coll(i): return lf[:, i:i+1]
                for k in range(LEAF_TESTS):
                    b = k * 16
                    v0x, v0y, v0z = coll(b+0), coll(b+1), coll(b+2)
                    e1x, e1y, e1z = coll(b+3), coll(b+4), coll(b+5)
                    e2x, e2y, e2z = coll(b+6), coll(b+7), coll(b+8)
                    cand = coll(b+10) > 0.5
                    tid = coll(b+11)
                    pvx = dy*e2z - dz*e2y; pvy = dz*e2x - dx*e2z; pvz = dx*e2y - dy*e2x
                    det = e1x*pvx + e1y*pvy + e1z*pvz
                    inv_det = 1.0 / jnp.where(jnp.abs(det) < tiny, 1.0, det)
                    tvx = ox - v0x; tvy = oy - v0y; tvz = oz - v0z
                    mu = (tvx*pvx + tvy*pvy + tvz*pvz) * inv_det
                    qvx = tvy*e1z - tvz*e1y; qvy = tvz*e1x - tvx*e1z; qvz = tvx*e1y - tvy*e1x
                    mv = (dx*qvx + dy*qvy + dz*qvz) * inv_det
                    mt = (e2x*qvx + e2y*qvy + e2z*qvz) * inv_det
                    valid = (il_m & cand & (jnp.abs(det) > tiny)
                             & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                             & (mt >= t_min) & (mt < best))
                    best = jnp.where(valid, mt, best)
                    tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                    hit_found |= valid
                wbest[...] = best
                wtri[...] = tri_best
                whit[...] = hit_found.astype(jnp.int32)
                # decision
                sp = meta[:, 1:2]
                code = jnp.where(h0r | h1r, 1, 0) + jnp.where(h0r & h1r, 2, 0)
                both = ii_m & (code >= 3)
                any1 = ii_m & (code >= 1)
                far = jnp.where(near0, e1col, e0col)
                do_push = both & (sp < STACK_DEPTH)
                stack[...] = jnp.where((colw == sp) & do_push, far, stack[...])
                sp2 = sp + jnp.where(do_push, 1, 0)
                top = jnp.sum(jnp.where(colw == sp2-1, stack[...], 0), axis=1, keepdims=True)
                newc = jnp.where(any1, nxt_int, jnp.where(sp2 > 0, top, 0))
                newc = (jnp.abs(newc) + it) % (TAB_ROWS * 8 - 9)
                sp3 = sp2 - jnp.where((~any1) & (sp2 > 0), 1, 0)
                meta[...] = jnp.where(colw == 0, newc, jnp.where(colw == 1, jnp.abs(sp3) % 64, meta[...]))
            return it + 1
        jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
        out[...] = groups[0][11][0:8, :]
    return kernel

def run_groups(name, G, rows_per):
    table = jnp.arange(TAB_ROWS * 128, dtype=jnp.int32).reshape(TAB_ROWS, 128)
    scratch = []
    for g in range(G):
        scratch += [pltpu.VMEM((rows_per, 128), jnp.float32) for _ in range(11)]
        scratch += [pltpu.VMEM((rows_per, 128), jnp.int32) for _ in range(5)]
    call = pl.pallas_call(
        make_groups(G, rows_per),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(lambda t: call(t))
    r = f(table); np.asarray(r)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(f(table)); best = min(best, time.perf_counter() - t0)
    print(f"{name:<44s} {best/ITERS*1e9:7.0f} ns/trip ({best/ITERS/(G*rows_per)*1e9:.0f} ns/slot)")

#run_groups("groups: 1 x 64 rows", 1, 64)
#run_groups("groups: 2 x 32 rows", 2, 32)
#run_groups("groups: 4 x 16 rows", 4, 16)
#run_groups("groups: 2 x 64 rows", 2, 64)

# --- grid-wave variant: exact real-kernel structure (grid steps = waves,
# block-spec streamed pool, block4 + alldone carry, counters accumulate) ---
def make_grid(rows_per, per_wave):
    W2 = rows_per
    def kernel(uni_ref, pox, obest, octr, *scratch):
        (rox, rix, wbest, nscr, wtri, whit, meta, stack) = scratch
        colw = jax.lax.broadcasted_iota(jnp.int32, (W2, 128), 1)
        zf = jnp.zeros((W2, 128), jnp.float32)
        zi = jnp.zeros((W2, 128), jnp.int32)
        def body(state):
            it, _, n_int, n_leaf = state
            for j in range(W2):
                nscr[pl.ds(j, 1), :] = pltpu.roll(
                    uni_ref[pl.ds(meta[j, 3], 1), :], shift=-meta[j, 4], axis=1)
            c_all = meta[:, 0:1] + zi
            ii_m = c_all >= 0
            il_m = (c_all < 0) & (c_all != -(1 << 30))
            done_m = c_all == -(1 << 30)
            def colf(i): return pltpu.bitcast(nscr[:, i:i+1], jnp.float32)
            ox = rox[...]; ix = rix[...]
            t_min = zf; best = wbest[...]
            def slab(b):
                ax = (colf(b+0) - ox) * ix; bx = (colf(b+3) - ox) * ix
                ay = (colf(b+1) - ox) * ix; by = (colf(b+4) - ox) * ix
                az = (colf(b+2) - ox) * ix; bz = (colf(b+5) - ox) * ix
                tn = jnp.maximum(jnp.maximum(jnp.minimum(ax,bx), jnp.minimum(ay,by)),
                                 jnp.maximum(jnp.minimum(az,bz), t_min))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(ax,bx), jnp.maximum(ay,by)),
                                 jnp.minimum(jnp.maximum(az,bz), best))
                return tn, tf
            tn0, tf0 = slab(0); tn1, tf1 = slab(6)
            t0r = jnp.min(jnp.where(tn0 <= tf0, tn0, big), axis=1, keepdims=True) + zf
            t1r = jnp.min(jnp.where(tn1 <= tf1, tn1, big), axis=1, keepdims=True) + zf
            h0r = t0r < big; h1r = t1r < big; near0 = t0r <= t1r
            e0col = nscr[:, 12:13] + zi; e1col = nscr[:, 13:14] + zi
            nxt_int = jnp.where(h0r & h1r, jnp.where(near0, e0col, e1col),
                                jnp.where(h0r, e0col, e1col))
            far = jnp.where(near0, e1col, e0col)
            code = jnp.where(h0r | h1r, 1, 0) + jnp.where(h0r & h1r, 2, 0)
            # leaf
            lf = pltpu.bitcast(nscr[...], jnp.float32)
            tri_best = wtri[...]; hit_found = whit[...] != 0
            def coll(i): return lf[:, i:i+1]
            for k in range(LEAF_TESTS):
                b = k * 16
                v0x, v0y, v0z = coll(b+0), coll(b+1), coll(b+2)
                e1x, e1y, e1z = coll(b+3), coll(b+4), coll(b+5)
                e2x, e2y, e2z = coll(b+6), coll(b+7), coll(b+8)
                cand = coll(b+10) > 0.5; tid = coll(b+11)
                pvx = ox*e2z - ox*e2y; pvy = ox*e2x - ox*e2z; pvz = ox*e2y - ox*e2x
                det = e1x*pvx + e1y*pvy + e1z*pvz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < tiny, 1.0, det)
                tvx = ox - v0x; tvy = ox - v0y; tvz = ox - v0z
                mu = (tvx*pvx + tvy*pvy + tvz*pvz) * inv_det
                qvx = tvy*e1z - tvz*e1y; qvy = tvz*e1x - tvx*e1z; qvz = tvx*e1y - tvy*e1x
                mv = (ox*qvx + ox*qvy + ox*qvz) * inv_det
                mt = (e2x*qvx + e2y*qvy + e2z*qvz) * inv_det
                valid = (il_m & cand & (jnp.abs(det) > tiny)
                         & (mu >= 0.0) & (mv >= 0.0) & (mu + mv <= 1.0)
                         & (mt >= t_min) & (mt < best))
                best = jnp.where(valid, mt, best)
                tri_best = jnp.where(valid, tid.astype(jnp.int32), tri_best)
                hit_found |= valid
            wbest[...] = best; wtri[...] = tri_best
            whit[...] = hit_found.astype(jnp.int32)
            # decision
            sp = meta[:, 1:2] + zi
            both = ii_m & (code >= 3); any1 = ii_m & (code >= 1)
            lstart = (~c_all) >> 4
            lend = lstart + ((~c_all) & 15) - 1
            row2 = lend >> 3
            extra = il_m & (row2 != (lstart >> 3))
            leaf2 = ~(((row2 << 3) << 4) | 1)
            push_val = jnp.where(ii_m, far, leaf2)
            do_push = (both | extra) & (sp < STACK_DEPTH)
            stack[...] = jnp.where((colw == sp) & do_push, push_val, stack[...])
            sp2 = sp + jnp.where(do_push, 1, 0)
            can_pop = sp2 > 0
            top = jnp.sum(jnp.where(colw == sp2-1, stack[...], 0), axis=1, keepdims=True)
            newc = jnp.where(any1, nxt_int, jnp.where(can_pop, top, 0))
            popped = (~any1) & (~done_m) & can_pop
            sp3 = sp2 - jnp.where(popped, 1, 0)
            newc = (jnp.abs(newc) * 5 + 1 + it) % (TAB_ROWS * 8 - 9)   # synthetic: never done
            rowv = jnp.minimum(jnp.maximum(newc >> 3, 0), TAB_ROWS - 1)
            shv = (newc & 7) << 4
            meta[...] = jnp.where(colw == 0, newc,
                        jnp.where(colw == 1, jnp.abs(sp3) % 64,
                        jnp.where(colw == 3, rowv,
                        jnp.where(colw == 4, shv, meta[...]))))
            idle_now = jnp.sum(jnp.where(newc == -1, 1, 0))
            alldone = idle_now >= W2 * 128
            n_int += jnp.sum(jnp.where(ii_m, 1, 0))
            n_leaf += jnp.sum(jnp.where(il_m, 1, 0))
            return (it + 1, alldone, n_int, n_leaf)
        def block4(state):
            for _ in range(4):
                state = body(state)
            return state
        def cond(state):
            return (~state[1]) & (state[0] < per_wave)
        rox[...] = pox[...]
        rix[...] = pox[...] + 1.0
        wbest[...] = jnp.full((W2, 128), big)
        wtri[...] = jnp.zeros((W2, 128), jnp.int32)
        whit[...] = jnp.zeros((W2, 128), jnp.int32)
        meta[...] = jnp.where(colw == 3, 1, 0)
        trips, _, n_int, n_leaf = jax.lax.while_loop(
            cond, block4, (jnp.int32(0), False, jnp.int32(0), jnp.int32(0)))
        obest[...] = wbest[...]
        shape = (8, 128)
        iters = jnp.zeros(shape, jnp.int32) + trips
        @pl.when(pl.program_id(0) == 0)
        def _():
            octr[...] = jnp.zeros(shape, jnp.int32)
        octr[...] = octr[...] + iters
    return kernel

def run_grid(name, n_waves, rows_per, per_wave):
    table = jnp.arange(TAB_ROWS * 128, dtype=jnp.int32).reshape(TAB_ROWS, 128)
    pool = jnp.ones((n_waves * rows_per, 128), jnp.float32)
    tab_spec = pl.BlockSpec(table.shape, lambda w: (0, 0), memory_space=pltpu.VMEM)
    wave_spec = pl.BlockSpec((rows_per, 128), lambda w: (w, 0), memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((8, 128), lambda w: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_grid(rows_per, per_wave),
        grid=(n_waves,),
        in_specs=[tab_spec, wave_spec],
        out_specs=[wave_spec, ctr_spec],
        out_shape=[jax.ShapeDtypeStruct((n_waves * rows_per, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((rows_per, 128), jnp.float32) for _ in range(3)]
        + [pltpu.VMEM((rows_per, 128), jnp.int32) for _ in range(5)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(lambda t, p: call(t, p))
    r = f(table, pool); jax.tree.map(np.asarray, r)
    total = n_waves * per_wave
    bestt = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); jax.tree.map(np.asarray, f(table, pool))
        bestt = min(bestt, time.perf_counter() - t0)
    print(f"{name:<44s} {bestt/total*1e9:7.0f} ns/trip")

run_grid("grid-waves 32x625, W=64 full body", 32, 64, 628)
run_grid("grid-waves 1 wave, W=64 full body", 1, 64, 20000)
