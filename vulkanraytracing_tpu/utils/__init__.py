from vulkanraytracing_tpu.utils.logging import log_d, log_e, log_i, log_t, log_w  # noqa: F401
from vulkanraytracing_tpu.utils.timing import ScopeTime, Timer  # noqa: F401
