"""Procedural test scenes and mesh generators.

The reference ships no assets (Sponza/SunnyHills are external downloads,
Config.hpp:26-27), so tests and benchmarks here use procedural geometry:
the single triangle, a Cornell box, random triangle soup, and a Sponza-scale
architectural scene for throughput benchmarking.  ``generate_sphere`` mirrors
MeshHelpers::GenerateSphere (Source/Engine/Render/Private/MeshHelpers.cpp:11-60,
default 256x128 segments) used for point-light gizmos.
"""

from __future__ import annotations

import numpy as np

from vulkanraytracing_tpu.scene import types
from vulkanraytracing_tpu.scene.types import (
    Materials,
    PointLights,
    Scene,
    TraceGeometry,
    concat_geometry,
    constant_environment,
    make_materials,
    make_trace_geometry,
    no_direct_light,
)

import jax.numpy as jnp


def generate_sphere(radius: float = 1.0, lat: int = 16, lon: int = 32):
    """UV sphere (positions, indices) — MeshHelpers::GenerateSphere analog."""
    phis = np.linspace(0.0, np.pi, lat + 1)
    thetas = np.linspace(0.0, 2.0 * np.pi, lon, endpoint=False)
    verts = []
    for phi in phis:
        for theta in thetas:
            verts.append(
                [
                    radius * np.sin(phi) * np.cos(theta),
                    radius * np.cos(phi),
                    radius * np.sin(phi) * np.sin(theta),
                ]
            )
    verts = np.asarray(verts, np.float32)
    idx = []
    for i in range(lat):
        for j in range(lon):
            a = i * lon + j
            b = i * lon + (j + 1) % lon
            c = (i + 1) * lon + j
            d = (i + 1) * lon + (j + 1) % lon
            # counter-clockwise seen from outside (front faces out)
            idx.append([a, b, c])
            idx.append([b, d, c])
    return verts, np.asarray(idx, np.int32)


def _quad(p0, p1, p2, p3):
    """Two CCW triangles for the quad p0-p1-p2-p3."""
    verts = np.asarray([p0, p1, p2, p3], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, idx


def single_triangle_scene(env_color=(0.1, 0.1, 0.1)) -> Scene:
    """The minimum E2E slice (BASELINE.json config 0): one triangle facing
    the default camera, flat shading via env + emission."""
    positions = np.array(
        [[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0]], np.float32
    )
    indices = np.array([[0, 1, 2]], np.int32)
    geometry = make_trace_geometry(positions, indices)
    materials = make_materials(
        base_color_factors=[(0.8, 0.2, 0.2, 1.0)],
        emission_factors=[(0.5, 0.1, 0.1, 1.0)],
        roughness_factors=[0.8],
        metallic_factors=[0.0],
    )
    return Scene(
        geometry=geometry,
        materials=materials,
        environment=constant_environment(env_color),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
    )


def cornell_box_scene(
    light_intensity: float = 20.0, with_point_lights: bool = True
) -> Scene:
    """Classic Cornell box in a y-up, z-toward-viewer frame, sized [-1, 1]^3,
    open on +Z toward the default camera.  Materials: white walls, red left,
    green right, one emissive ceiling panel, one metal box stand-in sphere."""
    parts: list[tuple[np.ndarray, np.ndarray, int]] = []

    # floor (y=-1, normal +Y)
    v, i = _quad([-1, -1, -1], [-1, -1, 1], [1, -1, 1], [1, -1, -1])
    parts.append((v, i, 0))
    # ceiling (y=+1, normal -Y)
    v, i = _quad([-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1])
    parts.append((v, i, 0))
    # back wall (z=-1, normal +Z)
    v, i = _quad([-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1])
    parts.append((v, i, 0))
    # left wall (x=-1, red, normal +X)
    v, i = _quad([-1, -1, -1], [-1, 1, -1], [-1, 1, 1], [-1, -1, 1])
    parts.append((v, i, 1))
    # right wall (x=+1, green, normal -X)
    v, i = _quad([1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1])
    parts.append((v, i, 2))
    # emissive panel just below the ceiling
    v, i = _quad(
        [-0.4, 0.98, -0.4], [0.4, 0.98, -0.4], [0.4, 0.98, 0.4], [-0.4, 0.98, 0.4]
    )
    parts.append((v, i, 3))
    # metallic sphere
    sv, si = generate_sphere(0.35, lat=12, lon=24)
    sv = sv + np.array([0.35, -0.65, -0.3], np.float32)
    parts.append((sv, si, 4))
    # diffuse sphere
    sv, si = generate_sphere(0.3, lat=12, lon=24)
    sv = sv + np.array([-0.45, -0.7, 0.2], np.float32)
    parts.append((sv, si, 5))

    geoms = [
        make_trace_geometry(v, i, material_id=m, cull_disable=True)
        for v, i, m in parts
    ]
    geometry = concat_geometry(geoms)

    materials = make_materials(
        base_color_factors=[
            (0.73, 0.73, 0.73, 1.0),  # white
            (0.65, 0.05, 0.05, 1.0),  # red
            (0.12, 0.45, 0.15, 1.0),  # green
            (1.0, 1.0, 1.0, 1.0),     # light
            (0.9, 0.8, 0.6, 1.0),     # metal
            (0.2, 0.3, 0.8, 1.0),     # blue diffuse
        ],
        emission_factors=[
            (0, 0, 0, 1),
            (0, 0, 0, 1),
            (0, 0, 0, 1),
            (light_intensity, light_intensity, light_intensity, 1),
            (0, 0, 0, 1),
            (0, 0, 0, 1),
        ],
        roughness_factors=[1.0, 1.0, 1.0, 1.0, 0.25, 0.8],
        metallic_factors=[0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
    )

    point_lights = None
    if with_point_lights:
        point_lights = PointLights(
            position=jnp.array(
                [[0.0, 0.6, 0.6, 1.0], [-0.6, -0.2, 0.6, 1.0]], jnp.float32
            ),
            color=jnp.array(
                [[4.0, 3.5, 3.0, 1.0], [1.0, 1.5, 3.0, 1.0]], jnp.float32
            ),
        )

    return Scene(
        geometry=geometry,
        materials=materials,
        environment=types.black_environment(),
        direct_light=no_direct_light(),
        point_lights=point_lights,
        bvh=None,
    )


def triangle_soup_scene(
    num_triangles: int, seed: int = 0, extent: float = 10.0, tri_size: float = 0.25
) -> Scene:
    """Random triangle soup — BVH stress geometry."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (num_triangles, 3)).astype(np.float32)
    offsets = rng.normal(0.0, tri_size, (num_triangles, 3, 3)).astype(np.float32)
    tris = centers[:, None, :] + offsets
    positions = tris.reshape(-1, 3)
    indices = np.arange(num_triangles * 3, dtype=np.int32).reshape(-1, 3)
    geometry = make_trace_geometry(positions, indices, cull_disable=True)
    materials = make_materials(
        base_color_factors=[(0.7, 0.7, 0.7, 1.0)], roughness_factors=[0.9],
        metallic_factors=[0.0],
    )
    return Scene(
        geometry=geometry,
        materials=materials,
        environment=constant_environment((1.0, 1.0, 1.0)),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
    )


def sponza_like_scene(target_triangles: int = 262144, seed: int = 7) -> Scene:
    """Sponza-scale architectural benchmark scene: a colonnaded hall with
    floor/walls/ceiling, rows of columns (cylinders), and dense clutter —
    matched to Modern Sponza's triangle count so Mrays/s numbers are
    comparable to the reference workload (BASELINE.md)."""
    rng = np.random.default_rng(seed)
    parts: list[TraceGeometry] = []
    hall = (20.0, 8.0, 10.0)  # x, y, z half-extents-ish

    def add_quad(p0, p1, p2, p3, mat):
        v, i = _quad(p0, p1, p2, p3)
        parts.append(make_trace_geometry(v, i, material_id=mat, cull_disable=True))

    # shell
    add_quad([-hall[0], 0, -hall[2]], [-hall[0], 0, hall[2]],
             [hall[0], 0, hall[2]], [hall[0], 0, -hall[2]], 0)      # floor
    add_quad([-hall[0], hall[1], -hall[2]], [hall[0], hall[1], -hall[2]],
             [hall[0], hall[1], hall[2]], [-hall[0], hall[1], hall[2]], 0)  # ceiling
    add_quad([-hall[0], 0, -hall[2]], [hall[0], 0, -hall[2]],
             [hall[0], hall[1], -hall[2]], [-hall[0], hall[1], -hall[2]], 1)
    add_quad([-hall[0], 0, hall[2]], [-hall[0], hall[1], hall[2]],
             [hall[0], hall[1], hall[2]], [hall[0], 0, hall[2]], 1)
    add_quad([-hall[0], 0, -hall[2]], [-hall[0], hall[1], -hall[2]],
             [-hall[0], hall[1], hall[2]], [-hall[0], 0, hall[2]], 1)
    add_quad([hall[0], 0, -hall[2]], [hall[0], 0, hall[2]],
             [hall[0], hall[1], hall[2]], [hall[0], hall[1], -hall[2]], 1)

    # columns: two rows of detailed spheres-on-cylinders
    lat, lon = 24, 48
    col_sphere_tris = 2 * lat * lon
    n_cols = 16
    for k in range(n_cols):
        x = -hall[0] + (k % (n_cols // 2) + 0.5) * (2 * hall[0] / (n_cols // 2))
        z = -hall[2] * 0.5 if k < n_cols // 2 else hall[2] * 0.5
        sv, si = generate_sphere(0.8, lat=lat, lon=lon)
        sv = sv * np.array([1.0, 5.0, 1.0], np.float32)
        sv = sv + np.array([x, 4.0, z], np.float32)
        parts.append(make_trace_geometry(sv, si, material_id=2))

    used = sum(g.num_triangles for g in parts)
    # clutter spheres to reach the target triangle budget
    remaining = max(target_triangles - used, 0)
    clutter_lat, clutter_lon = 8, 16
    per = 2 * clutter_lat * clutter_lon
    n_clutter = remaining // per
    for _ in range(n_clutter):
        sv, si = generate_sphere(float(rng.uniform(0.1, 0.5)),
                                 lat=clutter_lat, lon=clutter_lon)
        pos = np.array(
            [rng.uniform(-hall[0], hall[0]), rng.uniform(0.2, hall[1] - 0.5),
             rng.uniform(-hall[2], hall[2])], np.float32,
        )
        parts.append(make_trace_geometry(sv + pos, si,
                                         material_id=int(rng.integers(0, 5))))

    geometry = concat_geometry(parts)
    materials = make_materials(
        base_color_factors=[
            (0.65, 0.62, 0.58, 1.0),  # stone floor/ceiling
            (0.55, 0.5, 0.45, 1.0),   # walls
            (0.7, 0.68, 0.6, 1.0),    # columns
            (0.6, 0.3, 0.2, 1.0),     # clutter a
            (0.3, 0.4, 0.6, 1.0),     # clutter b
        ],
        roughness_factors=[0.9, 0.85, 0.7, 0.5, 0.3],
        metallic_factors=[0.0, 0.0, 0.0, 0.0, 0.8],
    )
    sun = types.DirectLight(
        direction=jnp.array([0.3, -1.0, 0.2, 0.0], jnp.float32),
        color=jnp.array([8.0, 7.5, 7.0, 1.0], jnp.float32),
    )
    return Scene(
        geometry=geometry,
        materials=materials,
        environment=constant_environment((2.0, 2.2, 2.5), size=16),
        direct_light=sun,
        point_lights=PointLights(
            position=jnp.array(
                [[-8.0, 2.0, 0.0, 1.0], [8.0, 2.0, 0.0, 1.0],
                 [0.0, 3.0, -4.0, 1.0], [0.0, 3.0, 4.0, 1.0]], jnp.float32,
            ),
            color=jnp.array(
                [[30.0, 25.0, 20.0, 1.0], [20.0, 25.0, 30.0, 1.0],
                 [25.0, 25.0, 25.0, 1.0], [28.0, 22.0, 18.0, 1.0]], jnp.float32,
            ),
        ),
        bvh=None,
    )


def animated_instances_demo(orbiters: int = 4):
    """Two-level animated scene — BASELINE config 5 ("interactive camera +
    animated instances: BVH refit, accumulation reset per move").

    A static ground quad BLAS plus one sphere BLAS instanced ``orbiters``
    times; the animation callback orbits the spheres around the y axis.
    Returns (scene_template, soup, animation) for ``app.engine.Engine``:
    the reference renders this shape of scene through a per-frame TLAS of
    BLAS instances (SceneModel.cpp:870-909).

    Usage::

        scene, soup, anim = animated_instances_demo()
        eng = Engine(cfg, scene, instances=soup, animation=anim)
    """
    import math

    from vulkanraytracing_tpu.accel.tlas import make_instances

    gv, gi = _quad([-6, 0, -6], [-6, 0, 6], [6, 0, 6], [6, 0, -6])
    ground = make_trace_geometry(gv, gi, material_id=0)
    sv, si = generate_sphere(radius=0.6)
    sphere = make_trace_geometry(sv, si, material_id=1)

    soup = make_instances(
        blases=[ground, sphere],
        blas_ids=[0] + [1] * orbiters,
        material_offsets=[0] + [i % 2 for i in range(orbiters)],
    )

    materials = make_materials(
        base_color_factors=[
            (0.7, 0.7, 0.7, 1.0),   # ground
            (0.8, 0.3, 0.2, 1.0),   # orbiter A
            (0.2, 0.4, 0.8, 1.0),   # orbiter B
        ],
        roughness_factors=[0.9, 0.4, 0.2],
        metallic_factors=[0.0, 0.1, 0.8],
    )

    def animation(frame_index: int) -> np.ndarray:
        t = frame_index * (2.0 * math.pi / 96.0)
        mats = [np.eye(4, dtype=np.float32)]  # ground static
        for i in range(orbiters):
            phase = t + i * (2.0 * math.pi / orbiters)
            m = np.eye(4, dtype=np.float32)
            m[0, 3] = 3.0 * math.cos(phase)
            m[1, 3] = 1.2 + 0.4 * math.sin(2.0 * phase)
            m[2, 3] = 3.0 * math.sin(phase)
            mats.append(m)
        return np.stack(mats, axis=0)

    scene = Scene(
        geometry=ground,  # placeholder; Engine replaces it via build_tlas
        materials=materials,
        environment=constant_environment((0.6, 0.7, 0.9)),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
    )
    return scene, soup, animation
