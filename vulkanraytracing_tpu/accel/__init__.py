from vulkanraytracing_tpu.accel.lbvh import build_bvh, build_scene_bvh  # noqa: F401
