"""glTF loader tests against synthesized assets (the reference ships no
test assets; golden-value checks per SURVEY.md section 4)."""

import base64
import json
import struct

import numpy as np

from vulkanraytracing_tpu.scene import gltf


def _b64(data: bytes) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(data).decode()


def _tri_gltf(
    transform=None,
    with_normals=False,
    with_uvs=False,
    material=None,
    extra_nodes=None,
    extensions=None,
    cameras=None,
    rotation=None,
):
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32
    )
    indices = np.array([0, 1, 2], np.uint16)
    blobs = [positions.tobytes(), indices.tobytes() + b"\x00\x00"]
    accessors = [
        {
            "bufferView": 0, "componentType": 5126, "count": 3,
            "type": "VEC3", "min": [-1, -1, 0], "max": [1, 1, 0],
        },
        {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
    ]
    attributes = {"POSITION": 0}
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": len(blobs[0])},
        {"buffer": 0, "byteOffset": len(blobs[0]), "byteLength": 6},
    ]
    offset = len(blobs[0]) + len(blobs[1])
    if with_normals:
        normals = np.tile([[0, 0, 1]], (3, 1)).astype(np.float32)
        blobs.append(normals.tobytes())
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": 36})
        accessors.append(
            {"bufferView": len(views) - 1, "componentType": 5126, "count": 3, "type": "VEC3"}
        )
        attributes["NORMAL"] = len(accessors) - 1
        offset += 36
    if with_uvs:
        uvs = np.array([[0, 0], [1, 0], [0.5, 1]], np.float32)
        blobs.append(uvs.tobytes())
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": 24})
        accessors.append(
            {"bufferView": len(views) - 1, "componentType": 5126, "count": 3, "type": "VEC2"}
        )
        attributes["TEXCOORD_0"] = len(accessors) - 1
        offset += 24

    blob = b"".join(blobs)
    node = {"mesh": 0}
    if transform is not None:
        node.update(transform)
    if rotation is not None:
        node["rotation"] = rotation
    nodes = [node] + (extra_nodes or [])
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": [
            {"primitives": [{"attributes": attributes, "indices": 1, "material": 0}]}
        ],
        "materials": [material or {}],
        "buffers": [{"uri": _b64(blob), "byteLength": len(blob)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    if extensions:
        doc["extensions"] = extensions
        doc["extensionsUsed"] = list(extensions)
    if cameras:
        doc["cameras"] = cameras
    return doc


def _write(tmp_path, doc, name="scene.gltf"):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return p


def test_basic_triangle(tmp_path):
    scene, camera, pool = gltf.load_scene(_write(tmp_path, _tri_gltf()))
    assert scene.geometry.num_triangles == 1
    assert camera is None and pool is None
    v0 = np.asarray(scene.geometry.v0[0])
    np.testing.assert_allclose(v0, [-1, -1, 0], atol=1e-6)
    # generated flat normal +Z (CCW winding)
    np.testing.assert_allclose(np.asarray(scene.geometry.n0[0]), [0, 0, 1], atol=1e-5)


def test_node_transform_flattens_to_world(tmp_path):
    doc = _tri_gltf(transform={"translation": [5, 0, 0], "scale": [2, 2, 2]})
    scene, _, _ = gltf.load_scene(_write(tmp_path, doc))
    np.testing.assert_allclose(
        np.asarray(scene.geometry.v0[0]), [3, -2, 0], atol=1e-5
    )


def test_nested_hierarchy(tmp_path):
    doc = _tri_gltf()
    # wrap the mesh node in a parent with translation
    doc["nodes"] = [
        {"children": [1], "translation": [0, 10, 0]},
        {"mesh": 0, "translation": [1, 0, 0]},
    ]
    doc["scenes"] = [{"nodes": [0]}]
    scene, _, _ = gltf.load_scene(_write(tmp_path, doc))
    np.testing.assert_allclose(
        np.asarray(scene.geometry.v0[0]), [0, 9, 0], atol=1e-5
    )


def test_material_conversion(tmp_path):
    material = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.5, 0.25, 0.125, 1.0],
            "roughnessFactor": 0.3,
            "metallicFactor": 0.8,
        },
        "emissiveFactor": [1.0, 2.0, 3.0],
        "alphaMode": "OPAQUE",
        "doubleSided": True,
    }
    scene, _, _ = gltf.load_scene(_write(tmp_path, _tri_gltf(material=material)))
    m = scene.materials
    np.testing.assert_allclose(
        np.asarray(m.base_color_factor[0]), [0.5, 0.25, 0.125, 1.0]
    )
    assert abs(float(m.roughness_factor[0]) - 0.3) < 1e-6
    assert abs(float(m.metallic_factor[0]) - 0.8) < 1e-6
    np.testing.assert_allclose(np.asarray(m.emission_factor[0, :3]), [1, 2, 3])
    assert bool(scene.geometry.cull_disable[0])  # doubleSided


def test_point_lights(tmp_path):
    extensions = {
        "KHR_lights_punctual": {
            "lights": [
                {"type": "point", "color": [1.0, 0.5, 0.25], "intensity": 4.0}
            ]
        }
    }
    doc = _tri_gltf(
        extra_nodes=[
            {
                "translation": [1, 2, 3],
                "extensions": {"KHR_lights_punctual": {"light": 0}},
            }
        ],
        extensions=extensions,
    )
    scene, _, _ = gltf.load_scene(_write(tmp_path, doc))
    assert scene.point_lights is not None
    np.testing.assert_allclose(
        np.asarray(scene.point_lights.position[0, :3]), [1, 2, 3]
    )
    # color * intensity (SceneModel.cpp:581-585)
    np.testing.assert_allclose(
        np.asarray(scene.point_lights.color[0, :3]), [4.0, 2.0, 1.0]
    )


def test_camera_conversion(tmp_path):
    cameras = [
        {
            "type": "perspective",
            "perspective": {
                "yfov": 0.8, "aspectRatio": 2.0, "znear": 0.1, "zfar": 500.0
            },
        }
    ]
    doc = _tri_gltf(
        extra_nodes=[{"camera": 0, "translation": [0, 0, 9]}], cameras=cameras
    )
    scene, cam, _ = gltf.load_scene(_write(tmp_path, doc))
    assert cam is not None
    assert abs(cam.x_fov - 0.8 * 2.0) < 1e-6  # xFov = yfov * aspect
    assert cam.position == (0.0, 0.0, 9.0)
    # default direction -Z (kForward)
    assert cam.target[2] < cam.position[2]


def test_tangent_generation_from_uvs(tmp_path):
    doc = _tri_gltf(with_normals=True, with_uvs=True)
    scene, _, _ = gltf.load_scene(_write(tmp_path, doc))
    t = np.asarray(scene.geometry.t0[0])
    # uv.x grows along +X -> tangent ~ +X
    assert t[0] > 0.9, t


def test_glb_container(tmp_path):
    doc = _tri_gltf()
    # move buffer into the GLB BIN chunk
    blob = base64.b64decode(doc["buffers"][0]["uri"].split(",", 1)[1])
    doc["buffers"] = [{"byteLength": len(blob)}]
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    blob += b"\x00" * ((4 - len(blob) % 4) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(blob))
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(blob), 0x004E4942) + blob
    )
    p = tmp_path / "scene.glb"
    p.write_bytes(glb)
    scene, _, _ = gltf.load_scene(p)
    assert scene.geometry.num_triangles == 1


def test_loaded_scene_renders(tmp_path):
    """End-to-end: a loaded glTF renders through the path tracer."""
    import jax.numpy as jnp

    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.types import constant_environment

    material = {
        "pbrMetallicRoughness": {"baseColorFactor": [0.9, 0.2, 0.1, 1.0]},
        "emissiveFactor": [0.4, 0.1, 0.0],
    }
    scene, _, _ = gltf.load_scene(_write(tmp_path, _tri_gltf(material=material)))
    scene = scene._replace(environment=constant_environment((0.1, 0.1, 0.3)))
    cfg = Config(width=32, height=32, traversal=TraversalMode.BRUTE_FORCE,
                 camera=CameraConfig(aspect_ratio=1.0))
    cam = Camera(cfg.camera).to_device()
    st, _ = render_frame(scene, cfg, cam, create_render_state(cfg))
    img = np.asarray(st.accumulation)
    assert not np.isnan(img).any()
    assert img[16, 16, 0] > img[16, 16, 2]  # red triangle at center


def test_export_glb_round_trip(tmp_path):
    """export_scene_glb -> load_scene preserves the triangle SET (exact
    vertex coords per material), material factors, doubleSided flags and
    point lights — the bench routes its procedural scene through this
    round trip so the importer sits on the measured path."""
    from vulkanraytracing_tpu.scene.gltf_export import export_scene_glb
    from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

    scene = cornell_box_scene()
    path = export_scene_glb(scene, tmp_path / "cornell.glb")
    loaded, cam, pool = gltf.load_scene(path)

    def tri_keys(s):
        g = s.geometry
        v0 = np.asarray(g.v0, np.float32)
        p1 = v0 + np.asarray(g.e1, np.float32)
        p2 = v0 + np.asarray(g.e2, np.float32)
        base = np.asarray(s.materials.base_color_factor, np.float32)
        emis = np.asarray(s.materials.emission_factor, np.float32)
        mid = np.asarray(g.material_id, np.int32)
        keys = np.concatenate(
            [v0, p1, p2, base[mid][:, :3], emis[mid][:, :3],
             np.asarray(g.cull_disable, np.float32)[:, None]],
            axis=1,
        )
        order = np.lexsort(keys.T[::-1])
        return keys[order]

    a, b = tri_keys(scene), tri_keys(loaded)
    assert a.shape == b.shape
    # vertex coords are written verbatim as f32; factors round-trip via
    # JSON floats — allow only tiny JSON-serialization noise
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)

    # point lights round-trip (loader bakes intensity into color)
    pl, ll = scene.point_lights, loaded.point_lights
    np.testing.assert_allclose(
        np.asarray(ll.position)[:, :3], np.asarray(pl.position)[:, :3],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ll.color)[:, :3], np.asarray(pl.color)[:, :3], atol=1e-5,
    )


def test_export_glb_textures_and_alpha_round_trip(tmp_path):
    """Textured export (round 5): embedded PNG images + alphaMode MASK
    survive the writer->loader round trip, so the bench's measured scene
    carries the reference's per-hit texture/alpha workload classes
    (Config.hpp:26-27, AnyHit.rahit:33-60)."""
    import numpy as np

    from vulkanraytracing_tpu.ops.texture import build_texture_pool
    from vulkanraytracing_tpu.scene.gltf import load_scene
    from vulkanraytracing_tpu.scene.gltf_export import export_scene_glb
    from vulkanraytracing_tpu.scene.types import (
        Scene,
        constant_environment,
        make_materials,
        make_trace_geometry,
        no_direct_light,
    )

    img = np.zeros((8, 8, 4), np.uint8)
    img[:, :4] = [255, 0, 0, 255]
    img[:, 4:] = [0, 255, 0, 0]  # right half transparent
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    geom = make_trace_geometry(positions, indices, uvs=uvs, material_id=0,
                               cull_disable=True, opaque=False,
                               alpha_test=True)
    mats = make_materials(
        base_color_factors=[(1, 1, 1, 1)],
        roughness_factors=[0.7], metallic_factors=[0.0],
        base_color_textures=[0], alpha_cutoffs=[0.25],
    )
    scene = Scene(
        geometry=geom, materials=mats,
        environment=constant_environment((1, 1, 1)),
        direct_light=no_direct_light(), point_lights=None, bvh=None,
        textures=build_texture_pool([img], size=8),
    )
    glb = tmp_path / "textured.glb"
    export_scene_glb(scene, glb, images=[img])
    loaded, _cam, pool = load_scene(glb)

    assert pool is not None and pool.count == 1
    # level-0 texels identical to the source image
    w0, h0 = int(pool.width[0, 0]), int(pool.height[0, 0])
    assert (w0, h0) == (8, 8)
    lvl0 = np.asarray(pool.texels[: 8 * 8]).reshape(8, 8, 4)
    np.testing.assert_array_equal(lvl0, img)
    # alphaMode MASK + cutoff + the per-tri alpha flags survive
    assert np.asarray(loaded.geometry.alpha_test).all()
    assert not np.asarray(loaded.geometry.opaque).any()
    np.testing.assert_allclose(
        np.asarray(loaded.materials.alpha_cutoff), [0.25], atol=1e-6
    )
    assert int(loaded.materials.base_color_texture[0]) == 0
