"""Camera with exact matrix parity to the reference.

Ref: Source/Engine/Camera.hpp:3-42 and Private/Camera.cpp:52-66.  The
reference builds a glm::lookAt view matrix and a glm::perspective projection
(GLM_FORCE_DEPTH_ZERO_TO_ONE, pch.hpp:24) with three quirks that must be
preserved for image parity:

1. the *vertical* fov is ``xFov / aspectRatio`` (Camera.cpp:59);
2. reverse depth swaps zNear/zFar into the projection (Camera.cpp:60-61,
   Config.hpp:37 kReverseDepth = true);
3. ``P[1][1]`` is negated for Vulkan's Y-down clip space (Camera.cpp:65).

The path tracer only ever consumes the *inverses* (PathTracing.h:10-16
CameraPT{inverseView, inverseProj, zNear, zFar}; primary-ray construction in
RayGen.rgen:68-82), which ``CameraPT`` precomputes here in float64 and stores
as float32.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.config import CameraConfig


class CameraPT(NamedTuple):
    """Device-side camera uniform (ref: PathTracing/PathTracing.h:10-16)."""

    inverse_view: jnp.ndarray  # (4, 4) f32
    inverse_proj: jnp.ndarray  # (4, 4) f32
    z_near: jnp.ndarray        # () f32
    z_far: jnp.ndarray         # () f32


def look_at(position, target, up) -> np.ndarray:
    """glm::lookAtRH in row-vector-on-the-right convention: v' = V @ v."""
    position = np.asarray(position, np.float64)
    f = _normalize(np.asarray(target, np.float64) - position)
    s = _normalize(np.cross(f, np.asarray(up, np.float64)))
    u = np.cross(s, f)
    view = np.eye(4)
    view[0, :3] = s
    view[1, :3] = u
    view[2, :3] = -f
    view[0, 3] = -s @ position
    view[1, 3] = -u @ position
    view[2, 3] = f @ position
    return view


def perspective(y_fov: float, aspect: float, z_near: float, z_far: float) -> np.ndarray:
    """glm::perspectiveRH_ZO (depth in [0, 1])."""
    tan_half = np.tan(y_fov / 2.0)
    p = np.zeros((4, 4))
    p[0, 0] = 1.0 / (aspect * tan_half)
    p[1, 1] = 1.0 / tan_half
    p[2, 2] = z_far / (z_near - z_far)
    p[2, 3] = -(z_far * z_near) / (z_far - z_near)
    p[3, 2] = -1.0
    return p


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


@dataclasses.dataclass
class Camera:
    """Host-side camera state (the mutable Description of Camera.hpp)."""

    description: CameraConfig

    def view_matrix(self) -> np.ndarray:
        d = self.description
        return look_at(d.position, d.target, d.up)

    def projection_matrix(self, reverse_depth: bool = True) -> np.ndarray:
        d = self.description
        y_fov = d.x_fov / d.aspect_ratio  # quirk (1)
        z_near = d.z_far if reverse_depth else d.z_near  # quirk (2)
        z_far = d.z_near if reverse_depth else d.z_far
        p = perspective(y_fov, d.aspect_ratio, z_near, z_far)
        p[1, 1] = -p[1, 1]  # quirk (3)
        return p

    def to_device(self, reverse_depth: bool = True) -> CameraPT:
        d = self.description
        return CameraPT(
            inverse_view=jnp.asarray(np.linalg.inv(self.view_matrix()), jnp.float32),
            inverse_proj=jnp.asarray(
                np.linalg.inv(self.projection_matrix(reverse_depth)), jnp.float32
            ),
            z_near=jnp.float32(d.z_near),
            z_far=jnp.float32(d.z_far),
        )

    # --- mutators mirroring Camera.cpp:12-50 ---

    def set_position(self, position) -> None:
        self.description = dataclasses.replace(self.description, position=tuple(position))

    def set_direction(self, direction) -> None:
        p = np.asarray(self.description.position)
        self.description = dataclasses.replace(
            self.description, target=tuple(p + np.asarray(direction))
        )

    def set_target(self, target) -> None:
        self.description = dataclasses.replace(self.description, target=tuple(target))
