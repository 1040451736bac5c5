"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md section 4 item 3: sharded renders over forced host CPU devices
substitute for a real TPU pod; single-device tests just use device 0.

Note: this box's site hook registers a remote-TPU PJRT plugin and forces
``jax_platforms="axon,cpu"`` via config (which beats the JAX_PLATFORMS env
var), so tests must override the *config* before first backend use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent-cache loads trip a spurious XLA:CPU AOT machine-feature check
# (+prefer-no-scatter/+prefer-no-gather are XLA pseudo-features, not ISA
# bits) that logs a full feature dump per executable; silence C++ logs.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_num_cpu_devices", int(os.environ.get("VRT_TEST_DEVICES", "8"))
)
jax.config.update("jax_enable_x64", False)

# This box has ONE cpu core, so XLA compile time dominates suite wall time.
# A persistent compilation cache makes re-runs cheap (first run still pays);
# the cache key includes device count/platform, so the 8-device CPU mesh and
# the sharding subprocess share entries across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default-skip @pytest.mark.slow tests (pre-commit usage); VRT_SLOW=1
    runs the full suite (CI / pre-release)."""
    if os.environ.get("VRT_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (set VRT_SLOW=1 to run)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


# NOTE: do NOT add a jax.clear_caches() fixture here.  It makes the jax 0.9
# executable-resolution bug ("Execution supplied N buffers but compiled
# program expected M") MORE likely, not less — clearing drops weak refs and
# recycled treedef ids then collide in the global executable store.  The
# mitigation lives at the call sites (per-structure jit instances that keep
# strong treedef references, e.g. hybrid.render_hybrid).
