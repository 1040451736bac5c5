"""Gather-free small-table row selection.

XLA:TPU lowers an (R,)-indexed gather to ~15-45 ms per column at R=2M —
catastrophic when the table is tiny (materials, lights).  For a table of M
rows with M small, a one-hot (R, M) @ (M, C) matmul selects ALL C columns in
one MXU pass; the one-hot never hits HBM in full because the contraction is
chunked over R with lax.map.

Used for material records (pt/surface.py, M = material count) and light
records (pt/integrator.py).  Exact for f32 payloads (one nonzero term per
output row at HIGHEST precision) and for integer payloads with magnitude
< 2^24 (texture ids, flags).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_CHUNK = 1 << 18

# beyond this table size the one-hot compare work (R*M) outgrows the gather
# cost it replaces; measured crossover is far higher but stay conservative
MAX_ONEHOT_ROWS = 2048


def onehot_select(idx: Array, table: Array, chunk: int = _CHUNK) -> Array:
    """table[idx] for (R,) i32 idx and (M, C) f32 table, without a gather.

    Returns (R, C) f32.  Falls back to a real gather when M is large."""
    m, _ = table.shape
    r = idx.shape[0]
    if m > MAX_ONEHOT_ROWS or r <= 4096:
        return table[idx]
    chunk = min(chunk, r)
    while r % chunk:
        chunk //= 2
    cols = jnp.arange(m, dtype=idx.dtype)

    def blk(ic: Array) -> Array:
        onehot = (ic[:, None] == cols[None, :]).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, table, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    out = jax.lax.map(blk, idx.reshape(r // chunk, chunk))
    return out.reshape(r, table.shape[1])
