"""The Engine: application lifecycle, frame loop, mode toggle.

Ref: Source/Engine/Engine.hpp:65-118 + Private/Engine.cpp — Create wires
Window/VulkanContext/Renderer/FrameLoop/SceneModel/Environment/systems
(:106-136); Run polls events, Processes each system, then draws via the
active render system (:138-168); the T key toggles
RenderMode::{eHybrid, ePathTracing} (:222-245); eCameraUpdate resets the
progressive accumulation (RenderSystemPT.cpp:181-182, 443-446).

The TPU engine is headless: a real window/GLFW loop is replaced by
``inject_key`` / ``inject_mouse_move`` (scriptable input — tests and the
CLI drive it), and "present" is the accumulated framebuffer you can fetch
or write to PNG at any time.  Checkpoint/resume captures the
(framebuffer, spp, camera) triple the reference keeps implicit
(SURVEY.md section 5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.app.events import EventBus, EventType, Key, KeyAction, KeyInput
from vulkanraytracing_tpu.app.systems import CameraSystem, StatsSystem, System
from vulkanraytracing_tpu.config import Config, RenderMode
from vulkanraytracing_tpu.pt.render import (
    RenderState,
    create_render_state,
    render_frame,
    reset_accumulation,
    to_display,
)
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.types import Scene
from vulkanraytracing_tpu.utils import Timer, log_i
from vulkanraytracing_tpu.utils.profiling import RayCounter


class Engine:
    def __init__(
        self,
        cfg: Config,
        scene: Scene,
        camera: Optional[Camera] = None,
        instances=None,          # accel.tlas.InstanceSoup — two-level scene
        animation=None,          # frame_index -> (I, 3, 4) world transforms
        mesh=None,               # jax.sharding.Mesh — multi-chip pixel DP
    ):
        self.cfg = cfg
        self.scene = scene
        self.mesh = mesh
        self.bus = EventBus()
        # --- animated instances (BASELINE config 5: "animated instances:
        # BVH refit, accumulation reset per move").  Ref: per-frame TLAS
        # update, SceneModel.cpp:870-909 + AccelerationStructureManager
        # eAllowUpdate refits (:167-192).  The soup is built + Morton-
        # ordered once; each frame with changed transforms runs the
        # on-device refit (accel.tlas.refit_tlas) and resets accumulation.
        self._soup_sorted = None
        self._animation = animation
        self._frame_index = 0
        self._last_transforms = None
        if instances is not None:
            from vulkanraytracing_tpu.accel.tlas import build_tlas, permute_soup

            t0 = animation(0) if animation is not None else None
            if t0 is None:
                raise ValueError("instances require an animation callback")
            geom, bvh, order = build_tlas(instances, jnp.asarray(t0))
            self._soup_sorted = permute_soup(instances, order)
            self.scene = scene._replace(geometry=geom, bvh=bvh)
            self._last_transforms = np.asarray(t0)
        self.camera = camera or Camera(cfg.camera)
        self.render_mode = cfg.render_mode
        self.timer = Timer()
        self.total_rays = 0.0
        self.ray_counter = RayCounter()

        self.state: RenderState = create_render_state(cfg)
        self._camera_dirty = True
        self._camera_dev = None

        self.systems: list[System] = []
        self.camera_system = CameraSystem(self.camera, self.bus)
        self.stats = StatsSystem()
        self.add_system(self.camera_system)
        self.add_system(self.stats)

        # eCameraUpdate -> ResetAccumulation (RenderSystemPT.cpp:181-182)
        self.bus.add_handler(EventType.CAMERA_UPDATE, self._on_camera_update)
        self.bus.add_handler(EventType.KEY_INPUT, self._on_key)
        self.bus.add_handler(EventType.RESIZE, self._on_resize)

        self.stats.bind_text(
            lambda: f"spp {int(self.state.accum_index)}"
        )
        self.stats.bind_text(
            lambda: f"{self.ray_counter.mrays_per_sec():.2f} Mrays/s"
        )
        self.stats.bind_text(
            lambda: "camera position: %.2f %.2f %.2f"
            % tuple(self.camera.description.position)
        )

    # --- systems (Engine.hpp GetSystem/AddSystem analog) ---

    def add_system(self, system: System) -> None:
        self.systems.append(system)

    def get_system(self, kind: type) -> System:
        for s in self.systems:
            if isinstance(s, kind):
                return s
        raise KeyError(kind)

    # --- event handlers ---

    def _on_camera_update(self, _payload=None) -> None:
        self.state = reset_accumulation(self.state)
        self._camera_dirty = True

    def _on_key(self, event: KeyInput) -> None:
        if event.action != KeyAction.PRESS:
            return
        if event.key == Key.T:  # mode toggle (Engine.cpp:237-244)
            self.render_mode = (
                RenderMode.HYBRID
                if self.render_mode == RenderMode.PATH_TRACING
                else RenderMode.PATH_TRACING
            )
            log_i(f"render mode: {self.render_mode.value}")
        elif event.key == Key.R:  # reload -> reset (RenderSystemPT.cpp:419-441)
            self.state = reset_accumulation(self.state)

    def _on_resize(self, extent) -> None:
        w, h = extent
        if w and h and (w != self.cfg.width or h != self.cfg.height):
            self.cfg = self.cfg.replace(width=w, height=h)
            self.state = create_render_state(self.cfg)
            self._camera_dirty = True

    # --- scripted input (the Window callbacks, Window.cpp:12-66) ---

    def inject_key(self, key: Key, action: KeyAction = KeyAction.PRESS) -> None:
        self.bus.trigger(EventType.KEY_INPUT, KeyInput(key, action))

    def inject_mouse_move(self, x: float, y: float) -> None:
        self.bus.trigger(EventType.MOUSE_MOVE, (x, y))

    def inject_resize(self, width: int, height: int) -> None:
        self.bus.trigger(EventType.RESIZE, (width, height))

    # --- frame loop (Engine::Run + FrameLoop::Draw) ---

    def _device_camera(self):
        if self._camera_dirty or self._camera_dev is None:
            self._camera_dev = self.camera.to_device(self.cfg.reverse_depth)
            self._camera_dirty = False
        return self._camera_dev

    def _advance_animation(self) -> None:
        if self._soup_sorted is None or self._animation is None:
            return
        transforms = np.asarray(self._animation(self._frame_index))
        self._frame_index += 1
        if np.array_equal(transforms, self._last_transforms):
            return  # static this frame: keep accumulating
        from vulkanraytracing_tpu.accel.tlas import refit_tlas

        geom, bvh = refit_tlas(
            self.scene.bvh, self._soup_sorted, jnp.asarray(transforms)
        )
        self.scene = self.scene._replace(geometry=geom, bvh=bvh)
        self._last_transforms = transforms
        self.state = reset_accumulation(self.state)  # "reset per move"

    def draw(self) -> None:
        """One frame with the active render system (Engine.cpp:154-166)."""
        dt = self.timer.get_delta_seconds()
        for system in self.systems:
            system.process(dt)

        self._advance_animation()
        camera = self._device_camera()
        if self.render_mode == RenderMode.PATH_TRACING:
            if self.mesh is not None:
                # multi-chip pixel data parallelism (SURVEY.md section 2.7):
                # rows sharded over the mesh, same per-pixel RNG streams, so
                # the image is bit-identical to single-device rendering
                from vulkanraytracing_tpu.parallel import shard_render_frame

                self.state, stats = shard_render_frame(
                    self.scene, self.cfg, camera, self.state, self.mesh
                )
            else:
                self.state, stats = render_frame(
                    self.scene, self.cfg, camera, self.state
                )
            self.total_rays += float(stats.rays)
            self.ray_counter.add(stats.rays)
        else:
            from vulkanraytracing_tpu.hybrid import render_hybrid

            image = render_hybrid(self.scene, self.cfg, camera)
            # hybrid is non-progressive: the "accumulator" holds the frame
            self.state = RenderState(
                accumulation=image, accum_index=self.state.accum_index
            )

    def run(self, frames: int) -> None:
        for _ in range(frames):
            self.draw()

    # --- output ---

    def display_image(self) -> np.ndarray:
        return to_display(self.state, self.cfg)

    def hud_lines(self) -> list[str]:
        return self.stats.lines()

    # --- checkpoint / resume (SURVEY.md section 5) ---

    def save_checkpoint(self, path: str | Path) -> None:
        """Persist the (framebuffer, spp, camera) render state."""
        d = self.camera.description
        np.savez(
            str(path),
            accumulation=np.asarray(self.state.accumulation),
            accum_index=np.asarray(self.state.accum_index),
            camera_position=np.asarray(d.position),
            camera_target=np.asarray(d.target),
            camera_up=np.asarray(d.up),
            camera_params=np.asarray(
                [d.x_fov, d.aspect_ratio, d.z_near, d.z_far]
            ),
            render_mode=self.render_mode.value,
        )

    def load_checkpoint(self, path: str | Path) -> None:
        import dataclasses

        import jax.numpy as jnp

        data = np.load(str(path), allow_pickle=False)
        self.state = RenderState(
            accumulation=jnp.asarray(data["accumulation"]),
            accum_index=jnp.asarray(data["accum_index"]),
        )
        fov, aspect, znear, zfar = data["camera_params"]
        self.camera.description = dataclasses.replace(
            self.camera.description,
            position=tuple(data["camera_position"]),
            target=tuple(data["camera_target"]),
            up=tuple(data["camera_up"]),
            x_fov=float(fov),
            aspect_ratio=float(aspect),
            z_near=float(znear),
            z_far=float(zfar),
        )
        self.render_mode = RenderMode(str(data["render_mode"]))
        self._camera_dirty = True
