"""Capture a jax profiler trace of ONE real frame and aggregate device
time by op name (perfetto trace.json.gz parsing, no tensorboard)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tmp")

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame_impl
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
camera = Camera(cfg.camera).to_device()
state = create_render_state(cfg)

# warm/compile
state, _ = render_frame_impl(scene, cfg, camera, state)
print("warm frame scalar:", float(state.accumulation[0, 0, 0]), flush=True)

with jax.profiler.trace("/tmp/jaxtrace"):
    state, _ = render_frame_impl(scene, cfg, camera, state)
    print("traced frame scalar:", float(state.accumulation[0, 0, 0]),
          flush=True)

paths = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
print("trace files:", paths, flush=True)
if not paths:
    sys.exit(1)
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace.get("traceEvents", [])
# find device lanes (TPU core threads)
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}
agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
print(f"\ndevice total {total:.0f} ms across {len(agg)} op names "
      f"(pids: { {p: pid_names[p] for p in dev_pids} })")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms:9.1f} ms  x{cnt[name]:<5d} {name[:110]}")
