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


def enable_compile_cache() -> None:
    """Point jax's persistent compilation cache at a repo-local dir
    (unless the user already configured one).  Serialization failures on
    exotic PJRT plugins downgrade to plain recompiles with a warning, so
    this is safe to enable unconditionally."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # explicit user choice wins
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(root, ".jax_tpu_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without the knobs: just skip


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
