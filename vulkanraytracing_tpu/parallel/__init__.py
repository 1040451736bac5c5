from vulkanraytracing_tpu.parallel.mesh import (  # noqa: F401
    make_render_mesh,
    replicate_scene,
    shard_render_frame,
    shard_render_frame_samples,
)
