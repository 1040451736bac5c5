"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md section 4 item 3: sharded renders over forced host CPU devices
substitute for a real TPU pod; single-device tests just use device 0.

Note: this box's site hook registers a remote-TPU PJRT plugin and forces
``jax_platforms="axon,cpu"`` via config (which beats the JAX_PLATFORMS env
var), so tests must override the *config* before first backend use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# NOTE: do NOT add a jax.clear_caches() fixture here.  It makes the jax 0.9
# executable-resolution bug ("Execution supplied N buffers but compiled
# program expected M") MORE likely, not less — clearing drops weak refs and
# recycled treedef ids then collide in the global executable store.  The
# mitigation lives at the call sites (per-structure jit instances that keep
# strong treedef references, e.g. hybrid.render_hybrid).
