"""jit helpers for TPU-specific compiler options.

The Pallas traversal kernel keeps the packed BVH tables VMEM-resident; for
Sponza-scale scenes their footprint (~35 MB) exceeds XLA:TPU's default
scoped-VMEM budget (16 MB), so jits that may inline the kernel raise the
limit via per-compile options (v5e has 128 MB of physical VMEM).  The
option is TPU-only — other backends reject unknown flags.
"""

from __future__ import annotations

import jax

SCOPED_VMEM_KIB = 96 * 1024  # 96 MB of scoped VMEM for kernel-carrying jits


def tpu_compiler_options() -> dict | None:
    try:
        if jax.default_backend() == "tpu":
            return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}
    except Exception:
        pass
    return None


def hot_jit(fn=None, /, **jit_kwargs):
    """jax.jit with the raised TPU scoped-VMEM limit (no-op elsewhere).

    Off-TPU this must reduce to a PLAIN jax.jit: passing compiler_options
    (even None) routes dispatch through jax 0.9's explicit-attributes C++
    function cache, which exhibits the executable-resolution bug
    ("Execution supplied N buffers but compiled program expected M") once
    several signatures coexist in one process — see tools/ab/repro_bufbug.py."""
    opts = tpu_compiler_options()

    def wrap(f):
        if opts is None and not jit_kwargs:
            return jax.jit(f)
        if opts is None:
            return jax.jit(f, **jit_kwargs)
        return jax.jit(f, compiler_options=opts, **jit_kwargs)

    if fn is None:
        return wrap
    return wrap(fn)
