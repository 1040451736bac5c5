"""Composed microbench: realistic interior+leaf iteration bodies at varying
row counts / unroll factors, to pick the new kernel shape."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30_000
ROWS_TAB = 8192

def run(name, kernel, scratch, iters=ITERS):
    table_i = jnp.arange(ROWS_TAB * 128, dtype=jnp.int32).reshape(ROWS_TAB, 128)
    table_f = jnp.ones((ROWS_TAB, 128), jnp.float32)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    f = jax.jit(lambda a, b: call(a, b))
    r = f(table_i, table_f); np.asarray(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(table_i, table_f)); best = min(best, time.perf_counter() - t0)
    print(f"{name:<46s} {best/iters*1e9:7.0f} ns/iter")

def slab2(nscr_f, ox, ix, tmin, best):
    """2-child slab test using column broadcasts from an (R,128) f32 scratch."""
    def colf(i): return nscr_f[:, i:i+1]
    tns, tfs = [], []
    for b in (0, 6):
        ax = (colf(b+0) - ox) * ix; bx = (colf(b+3) - ox) * ix
        ay = (colf(b+1) - ox) * ix; by = (colf(b+4) - ox) * ix
        az = (colf(b+2) - ox) * ix; bz = (colf(b+5) - ox) * ix
        tn = jnp.maximum(jnp.maximum(jnp.minimum(ax,bx), jnp.minimum(ay,by)),
                         jnp.maximum(jnp.minimum(az,bz), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(ax,bx), jnp.maximum(ay,by)),
                         jnp.minimum(jnp.maximum(az,bz), best))
        tns.append(tn); tfs.append(tf)
    return tns, tfs

def make_full(n_rows, unroll):
    """interior iteration: fetch+roll per row, slab, decision, vec-stack."""
    def kern(tab_i, tab_f, out, f0, f1, i0, i1, stk, sm):
        col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
        def body(i):
            for u in range(unroll):
                for j in range(n_rows):
                    sm[j] = (i * 7 + j * 13 + u) % (ROWS_TAB - 1)
                for j in range(n_rows):
                    sh = (sm[j] % 8) * 16
                    i0[pl.ds(j, 1), :] = pltpu.roll(
                        tab_i[pl.ds(sm[j], 1), :], shift=-sh, axis=1)
                nf = pltpu.bitcast(i0[...], jnp.float32)
                ox = f0[:, 0:1]; ix = f0[:, 1:2]
                tns, tfs = slab2(nf, ox, ix, f0[:, 2:3], f0[:, 3:4])
                t0r = jnp.min(jnp.where(tns[0] <= tfs[0], tns[0], 3e38), axis=1, keepdims=True)
                t1r = jnp.min(jnp.where(tns[1] <= tfs[1], tns[1], 3e38), axis=1, keepdims=True)
                h0 = t0r < 3e38; h1 = t1r < 3e38
                nxt = jnp.where(h0, i0[:, 12:13], i0[:, 13:14])
                # vectorized push + pop
                sp = i1[:, 0:1] % 96
                stk[...] = jnp.where(col == sp, nxt, stk[...])
                top = jnp.sum(jnp.where(col == sp - 1, stk[...], 0), axis=1, keepdims=True)
                i1[...] = jnp.where(col == 0, (top + nxt) % ROWS_TAB, i1[...] + 1)
            return i + 1
        jax.lax.while_loop(lambda i: i < ITERS // unroll, body, jnp.int32(0))
        out[...] = i1[0:8, :]
    scratch = [
        pltpu.VMEM((n_rows, 128), jnp.float32), pltpu.VMEM((n_rows, 128), jnp.float32),
        pltpu.VMEM((n_rows, 128), jnp.int32), pltpu.VMEM((n_rows, 128), jnp.int32),
        pltpu.VMEM((n_rows, 128), jnp.int32),
        pltpu.SMEM((n_rows,), jnp.int32),
    ]
    return kern, scratch

for rows in (32, 64, 128):
    for unroll in (1, 2):
        k, s = make_full(rows, unroll)
        run(f"interior rows={rows} unroll={unroll}", k, s)
        # report per row-visit cost
