from vulkanraytracing_tpu.hybrid.renderer import render_hybrid  # noqa: F401
