"""Microbench per-iteration building blocks of the traversal kernel.

Each variant runs ITERS while-loop iterations doing one isolated pattern;
report ns/iter. Identifies where the 3.4us/iter goes.
"""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

ITERS = 100_000
ROWS = 4096  # node table rows

def run(name, kernel, n_scratch_f32=2, n_scratch_i32=2, smem=None, table_dtype=jnp.int32):
    table = jnp.arange(ROWS * 128, dtype=table_dtype).reshape(ROWS, 128)
    scratch = [pltpu.VMEM((8, 128), jnp.float32) for _ in range(n_scratch_f32)]
    scratch += [pltpu.VMEM((8, 128), jnp.int32) for _ in range(n_scratch_i32)]
    if smem:
        scratch += smem
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    f = jax.jit(lambda t: call(t))
    r = f(table); np.asarray(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(table)); best = min(best, time.perf_counter() - t0)
    print(f"{name:<40s} {best/ITERS*1e9:7.0f} ns/iter")

def loop(body):
    def kern(*refs):
        def b(i):
            body(i, *refs)
            return i + 1
        jax.lax.while_loop(lambda i: i < ITERS, b, jnp.int32(0))
        refs[1][...] = jnp.zeros((8, 128), jnp.int32)
    return kern

# 1. empty loop
def empty(i, tab, out, f0, f1, i0, i1):
    pass
run("empty loop", loop(empty))

# 2. one vector op per iter
def one_vop(i, tab, out, f0, f1, i0, i1):
    f0[...] = f0[...] + 1.0
run("1 vector add (8,128)", loop(one_vop))

# 3. 60 vector ops
def many_vop(i, tab, out, f0, f1, i0, i1):
    x = f0[...]
    for _ in range(60):
        x = x * 1.000001 + 0.5
    f0[...] = x
run("60 vector fma (8,128)", loop(many_vop))

# 4. 8 dynamic row fetches (no roll), index from SMEM
def fetch8(i, tab, out, f0, f1, i0, i1, sm):
    for j in range(8):
        sm[j] = (i * 7 + j * 13) % (ROWS - 1)
    for j in range(8):
        i0[pl.ds(j, 1), :] = tab[pl.ds(sm[j], 1), :]
run("8 dynamic row fetches", loop(fetch8), smem=[pltpu.SMEM((8,), jnp.int32)])

# 5. 8 fetches + dynamic roll
def fetch8_roll(i, tab, out, f0, f1, i0, i1, sm):
    for j in range(8):
        sm[j] = (i * 7 + j * 13) % (ROWS - 1)
    for j in range(8):
        sh = (sm[j] % 8) * 16
        i0[pl.ds(j, 1), :] = pltpu.roll(tab[pl.ds(sm[j], 1), :], shift=-sh, axis=1)
run("8 dynamic fetches + dyn roll", loop(fetch8_roll), smem=[pltpu.SMEM((8,), jnp.int32)])

# 6. scalar SMEM block (30 ops x 8 rows) like the stack bookkeeping
def scalar_block(i, tab, out, f0, f1, i0, i1, sm, stk):
    for j in range(8):
        c = sm[j]
        ii = c >= 0
        spj = sm[j]
        slot = jnp.minimum(spj % 64, 63)
        prev = stk[j, slot]
        stk[j, slot] = jnp.where(ii, c * 2, prev)
        spj = spj + jnp.where(ii, 1, 0)
        top = stk[j, jnp.maximum(spj % 64 - 1, 0)]
        nxt = jnp.where(ii, top, c + 1)
        sm[j] = (nxt + i) % 1024
run("scalar stack block (8 rows)", loop(scalar_block),
    smem=[pltpu.SMEM((8,), jnp.int32), pltpu.SMEM((8, 64), jnp.int32)])

# 7. vectorized stack ops on (8,128) VMEM
def vstack(i, tab, out, f0, f1, i0, i1):
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sp = i1[:, 0:1] % 64
    push_val = i1[:, 1:2]
    stk = i0[...]
    stk = jnp.where(col == sp, push_val, stk)          # push
    top = jnp.sum(jnp.where(col == sp - 1, stk, 0), axis=1, keepdims=True)  # pop/peek
    i0[...] = stk
    i1[...] = jnp.where(col == 0, top, i1[...]) + 1
run("vectorized stack push+pop (VPU)", loop(vstack))

# 8. per-row reduction to (8,1) + scalar readback of 8 values
def reduce_read(i, tab, out, f0, f1, i0, i1, sm):
    r = jnp.min(f0[...], axis=1, keepdims=True)
    f1[:, 0:1] = r
    for j in range(8):
        sm[j] = jnp.where(f1[j, 0] > 0, j, j + 1)
run("(8,1) reduce + 8 scalar readbacks", loop(reduce_read), smem=[pltpu.SMEM((8,), jnp.int32)])

# 9. pl.when gated block (taken)
def when_block(i, tab, out, f0, f1, i0, i1):
    @pl.when(i % 2 == 0)
    def _():
        f0[...] = f0[...] + 1.0
    @pl.when(i % 2 != 0)
    def _():
        f1[...] = f1[...] + 1.0
run("2x pl.when gated vector add", loop(when_block))
