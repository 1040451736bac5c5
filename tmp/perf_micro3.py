"""Microbench: cost of per-row dynamic fetches when the index comes from
(a) SMEM arithmetic, (b) VMEM scalar reads, (c) SMEM filled by a per-trip
VMEM->SMEM DMA of a (W,1) cursor column."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20_000
TAB_ROWS = 65536  # bench-scene-sized table (33 MB)
W = 64

def run(name, kernel, scratch):
    table = jnp.arange(TAB_ROWS * 128, dtype=jnp.int32).reshape(TAB_ROWS, 128)
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

# (a) SMEM-arithmetic indices
def kern_smem(tab, out, nscr, meta, sm):
    def body(i):
        for j in range(W):
            sm[j] = (i * 7 + j * 13) % (TAB_ROWS - 9)
        for j in range(W):
            sh = (sm[j] % 8) * 16
            nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(sm[j], 1), :], shift=-sh, axis=1)
        return i + 1
    jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
    out[...] = nscr[0:8, :]
run("(a) SMEM-arith indices", kern_smem,
    [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32), pltpu.SMEM((W,), jnp.int32)])

# (b) VMEM scalar-read indices (vector-written each trip, like meta)
def kern_vmem(tab, out, nscr, meta, sm):
    colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    meta[...] = jnp.zeros((W, 128), jnp.int32)
    def body(i):
        for j in range(W):
            c = meta[j, 0]
            sh = (c % 8) * 16
            nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
        newc = (meta[:, 0:1] * 5 + 1 + i) % (TAB_ROWS - 9)
        meta[...] = jnp.where(colw == 0, newc, meta[...])
        return i + 1
    jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
    out[...] = nscr[0:8, :]
run("(b) VMEM scalar-read indices", kern_vmem,
    [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32), pltpu.SMEM((W,), jnp.int32)])


# (d) = (b) + vector->SMEM reduce sync per trip
def kern_reduce(tab, out, nscr, meta, sm):
    colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    meta[...] = jnp.zeros((W, 128), jnp.int32)
    def body(i):
        for j in range(W):
            c = meta[j, 0]
            sh = (c % 8) * 16
            nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
        newc = (meta[:, 0:1] * 5 + 1 + i) % (TAB_ROWS - 9)
        meta[...] = jnp.where(colw == 0, newc, meta[...])
        sm[0] = jnp.sum(jnp.where(newc == 7, 1, 0))
        return i + 1
    jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
    out[...] = nscr[0:8, :]
run("(d) (b) + reduce->SMEM sync", kern_reduce,
    [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32), pltpu.SMEM((W,), jnp.int32)])

# (e) = (b) + reduces in the while carry (like alldone + counters)
def kern_carry(tab, out, nscr, meta, sm):
    colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    meta[...] = jnp.zeros((W, 128), jnp.int32)
    def body(st):
        i, a, b2 = st
        for j in range(W):
            c = meta[j, 0]
            sh = (c % 8) * 16
            nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
        newc = (meta[:, 0:1] * 5 + 1 + i) % (TAB_ROWS - 9)
        meta[...] = jnp.where(colw == 0, newc, meta[...])
        a += jnp.sum(jnp.where(newc == 7, 1, 0))
        b2 |= a > 10**9
        return (i + 1, a, b2)
    jax.lax.while_loop(lambda st: (st[0] < ITERS) & (~st[2]), body,
                       (jnp.int32(0), jnp.int32(0), False))
    out[...] = nscr[0:8, :]
run("(e) (b) + carry reduces + cond flag", kern_carry,
    [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32), pltpu.SMEM((W,), jnp.int32)])

# (f) = (b) + rarely-taken pl.when block with W nested whens + dyn stores
def kern_when(tab, out, nscr, meta, sm):
    colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    meta[...] = jnp.zeros((W, 128), jnp.int32)
    sm[0] = 0
    def body(i):
        @pl.when(sm[0] > ITERS)
        def _():
            for j in range(W):
                @pl.when(meta[j, 0] == -123)
                def _():
                    src = meta[j, 1]
                    dst = jnp.maximum(src, 0)
                    out[pl.ds(dst % 8, 1), :] = nscr[pl.ds(j, 1), :]
                    nscr[pl.ds(j, 1), :] = tab[pl.ds(dst, 1), :]
        for j in range(W):
            c = meta[j, 0]
            sh = (c % 8) * 16
            nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
        newc = (meta[:, 0:1] * 5 + 1 + i) % (TAB_ROWS - 9)
        meta[...] = jnp.where(colw == 0, newc, meta[...])
        return i + 1
    jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
    out[...] = nscr[0:8, :]
run("(f) (b) + rarely-taken refill-like when", kern_when,
    [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32), pltpu.SMEM((W,), jnp.int32)])

# (g) = (b) + N column-broadcast ops against (W,128)
def make_cols(ncols):
    def kern(tab, out, nscr, meta, sm, acc):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
        meta[...] = jnp.zeros((W, 128), jnp.int32)
        def body(i):
            for j in range(W):
                c = meta[j, 0]
                sh = (c % 8) * 16
                nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
            x = acc[...]
            nf = pltpu.bitcast(nscr[...], jnp.float32)
            for i2 in range(ncols):
                col = nf[:, i2 : i2 + 1]
                x = x * 1.0000001 + col
            acc[...] = x
            newc = (meta[:, 0:1] * 5 + 1 + i) % (TAB_ROWS - 9)
            meta[...] = jnp.where(colw == 0, newc, meta[...])
            return i + 1
        jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
        out[...] = nscr[0:8, :]
    return kern
for nc in (12, 48, 96):
    run(f"(g) (b) + {nc} column broadcasts", make_cols(nc),
        [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32),
         pltpu.SMEM((W,), jnp.int32), pltpu.VMEM((W, 128), jnp.float32)])

# (h) = (b) + N lane reductions (axis=1) on (W,128)
def make_red(nred):
    def kern(tab, out, nscr, meta, sm, acc):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
        meta[...] = jnp.zeros((W, 128), jnp.int32)
        def body(i):
            for j in range(W):
                c = meta[j, 0]
                sh = (c % 8) * 16
                nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
            nf = pltpu.bitcast(nscr[...], jnp.float32)
            x = acc[...]
            r = jnp.zeros((W, 1), jnp.float32)
            for i2 in range(nred):
                r = r + jnp.min(x * (1.0 + i2), axis=1, keepdims=True)
            acc[...] = x + r
            newc = (meta[:, 0:1] * 5 + 1 + i) % (TAB_ROWS - 9)
            meta[...] = jnp.where(colw == 0, newc, meta[...])
            return i + 1
        jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
        out[...] = nscr[0:8, :]
    return kern
for nr in (2, 6):
    run(f"(h) (b) + {nr} lane reductions", make_red(nr),
        [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32),
         pltpu.SMEM((W,), jnp.int32), pltpu.VMEM((W, 128), jnp.float32)])

# (i) = (b) + chained (W,1) integer decision-like ops
def make_narrow(nops):
    def kern(tab, out, nscr, meta, sm, stk):
        colw = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
        meta[...] = jnp.zeros((W, 128), jnp.int32)
        def body(i):
            for j in range(W):
                c = meta[j, 0]
                sh = (c % 8) * 16
                nscr[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(c, 1), :], shift=-sh, axis=1)
            c_all = meta[:, 0:1]
            sp = meta[:, 1:2]
            x = c_all
            for k in range(nops // 6):
                m1 = x >= 0
                lstart = (~x) >> 4
                lend = lstart + ((~x) & 15) - 1
                row2 = lend >> 3
                ex = m1 & (row2 != (lstart >> 3))
                x = jnp.where(ex, ~(((row2 << 3) << 4) | 1), x + 1)
            do_push = (x & 1) > 0
            stk[...] = jnp.where((colw == sp) & do_push, x, stk[...])
            sp2 = sp + jnp.where(do_push, 1, 0)
            top = jnp.sum(jnp.where(colw == sp2 - 1, stk[...], 0), axis=1, keepdims=True)
            newc = jnp.where(do_push, top % (TAB_ROWS - 9), (c_all * 5 + 1 + i) % (TAB_ROWS - 9))
            meta[...] = jnp.where(colw == 0, newc, jnp.where(colw == 1, sp2 % 64, meta[...]))
            return i + 1
        jax.lax.while_loop(lambda i: i < ITERS, body, jnp.int32(0))
        out[...] = nscr[0:8, :]
    return kern
for no in (6, 30):
    run(f"(i) (b) + {no} narrow (W,1) ops + stack", make_narrow(no),
        [pltpu.VMEM((W, 128), jnp.int32), pltpu.VMEM((W, 128), jnp.int32),
         pltpu.SMEM((W,), jnp.int32), pltpu.VMEM((W, 128), jnp.int32)])
