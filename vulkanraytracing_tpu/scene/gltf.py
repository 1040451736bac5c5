"""glTF 2.0 scene importer — the SceneModel replacement.

Ref: Source/Engine/Scene/Private/SceneModel.cpp (1544 LoC, the reference's
largest file).  Pure Python/numpy: parses .gltf (JSON) and .glb containers,
walks the node hierarchy with accumulated transforms (EnumerateNodes,
SceneModel.cpp:316-338), converts primitives/materials/lights/cameras, and
*flattens instances to world space* for the single-level trace path (the
two-level TLAS path lives in accel.tlas).

Semantics carried over from the reference:

- TRIANGLES-mode primitives only (SceneModel.cpp:813 Assert);
- normals accumulated from face normals then normalized when the NORMAL
  attribute is missing (CalculateNormals, :223-252);
- tangents from uv gradients with the d == 0 -> 1 guard and the x=1
  fallback for zero tangents (CalculateTangents, :254-302).  The reference
  then *reads the NORMAL accessor when fetching TANGENT* for the RT scene
  (:1116) — a bug SURVEY.md section 7 says to diverge from: we use real
  tangents;
- shading normals/tangents are transformed by the node matrix itself, NOT
  the inverse transpose — matching ClosestHit.rchit:77-78
  (gl_ObjectToWorldEXT * normal), then renormalized;
- instance flags from the material: ForceOpaque for alphaMode OPAQUE,
  TriangleFacingCullDisable for doubleSided (:791-805);
- point lights from KHR_lights_punctual with color * intensity (:555-596);
- the first perspective camera node becomes the camera, with
  xFov = yfov * aspectRatio, direction = rotation * kForward (-Z),
  up = +Y (CreateCamera, :1504-1544); node scale/matrix are ignored for
  the camera exactly as the reference ignores them.
"""

from __future__ import annotations

import base64
import json
import struct
from pathlib import Path
from typing import Any, Optional

import numpy as np

from vulkanraytracing_tpu.config import CameraConfig
from vulkanraytracing_tpu.ops.texture import (
    TexturePool,
    WRAP_CLAMP,
    WRAP_MIRROR,
    WRAP_REPEAT,
    build_texture_pool,
)
from vulkanraytracing_tpu.scene.types import (
    Materials,
    PointLights,
    Scene,
    TraceGeometry,
    concat_geometry,
    constant_environment,
    make_materials,
    no_direct_light,
)

import jax.numpy as jnp

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}
_WRAP_MODES = {10497: WRAP_REPEAT, 33071: WRAP_CLAMP, 33648: WRAP_MIRROR}


class GltfModel:
    """Parsed glTF document + binary buffers (the tinygltf::Model analog)."""

    def __init__(self, doc: dict, buffers: list[bytes], base_dir: Path):
        self.doc = doc
        self.buffers = buffers
        self.base_dir = base_dir

    @staticmethod
    def load(path: str | Path) -> "GltfModel":
        path = Path(path)
        data = path.read_bytes()
        if data[:4] == b"glTF":
            return GltfModel._load_glb(data, path.parent)
        doc = json.loads(data)
        buffers = [
            _load_buffer(b, path.parent) for b in doc.get("buffers", [])
        ]
        return GltfModel(doc, buffers, path.parent)

    @staticmethod
    def _load_glb(data: bytes, base_dir: Path) -> "GltfModel":
        magic, version, _length = struct.unpack_from("<III", data, 0)
        assert magic == 0x46546C67 and version == 2, "bad GLB header"
        pos = 12
        doc: dict = {}
        bin_chunk = b""
        while pos < len(data):
            clen, ctype = struct.unpack_from("<II", data, pos)
            chunk = data[pos + 8 : pos + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                doc = json.loads(chunk)
            elif ctype == 0x004E4942:  # BIN
                bin_chunk = chunk
            pos += 8 + clen
        buffers = []
        for i, b in enumerate(doc.get("buffers", [])):
            if i == 0 and "uri" not in b:
                buffers.append(bin_chunk)
            else:
                buffers.append(_load_buffer(b, base_dir))
        return GltfModel(doc, buffers, base_dir)

    # --- accessors ---

    def accessor(self, index: int) -> np.ndarray:
        """Accessor -> (count, components) float32/int array (zero-copy when
        tightly packed — the DataView path of SceneModel.cpp:175-198)."""
        acc = self.doc["accessors"][index]
        count = acc["count"]
        ncomp = _TYPE_COUNTS[acc["type"]]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        itemsize = np.dtype(dtype).itemsize

        if "bufferView" not in acc:
            out = np.zeros((count, ncomp), dtype)
        else:
            bv = self.doc["bufferViews"][acc["bufferView"]]
            buf = self.buffers[bv["buffer"]]
            offset = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride", 0) or ncomp * itemsize
            if stride == ncomp * itemsize:
                out = np.frombuffer(
                    buf, dtype, count=count * ncomp, offset=offset
                ).reshape(count, ncomp)
            else:
                raw = np.frombuffer(
                    buf, np.uint8, count=stride * count, offset=offset
                ).reshape(count, stride)
                out = raw[:, : ncomp * itemsize].copy().view(dtype)

        if acc.get("sparse"):
            out = _apply_sparse(self, acc, out.copy())
        if acc.get("normalized") and dtype != np.float32:
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / float(info.max)
        return out

    def image_pixels(self, image_index: int) -> np.ndarray:
        """Decode an image (file uri, data uri, or bufferView) via PIL."""
        from io import BytesIO

        from PIL import Image

        img = self.doc["images"][image_index]
        if "uri" in img:
            uri = img["uri"]
            if uri.startswith("data:"):
                payload = base64.b64decode(uri.split(",", 1)[1])
                pil = Image.open(BytesIO(payload))
            else:
                from urllib.parse import unquote

                pil = Image.open(self.base_dir / unquote(uri))
        else:
            bv = self.doc["bufferViews"][img["bufferView"]]
            buf = self.buffers[bv["buffer"]]
            off = bv.get("byteOffset", 0)
            pil = Image.open(BytesIO(buf[off : off + bv["byteLength"]]))
        return np.asarray(pil.convert("RGBA"))


def _load_buffer(buf: dict, base_dir: Path) -> bytes:
    uri = buf.get("uri", "")
    if uri.startswith("data:"):
        return base64.b64decode(uri.split(",", 1)[1])
    from urllib.parse import unquote

    return (base_dir / unquote(uri)).read_bytes()


def _apply_sparse(model: GltfModel, acc: dict, out: np.ndarray) -> np.ndarray:
    sp = acc["sparse"]
    idx_acc = sp["indices"]
    idx_bv = model.doc["bufferViews"][idx_acc["bufferView"]]
    idx_dtype = _COMPONENT_DTYPES[idx_acc["componentType"]]
    idx = np.frombuffer(
        model.buffers[idx_bv["buffer"]], idx_dtype, count=sp["count"],
        offset=idx_bv.get("byteOffset", 0) + idx_acc.get("byteOffset", 0),
    )
    val_acc = sp["values"]
    val_bv = model.doc["bufferViews"][val_acc["bufferView"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    vals = np.frombuffer(
        model.buffers[val_bv["buffer"]], dtype, count=sp["count"] * ncomp,
        offset=val_bv.get("byteOffset", 0) + val_acc.get("byteOffset", 0),
    ).reshape(sp["count"], ncomp)
    out[idx] = vals
    return out


# ----------------------------------------------------------------------------
# node hierarchy


def _node_matrix(node: dict) -> np.ndarray:
    """TRS or matrix -> 4x4 (row convention M @ v)."""
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] = np.diag(node["scale"])
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        m = _quat_matrix(x, y, z, w) @ m
    if "translation" in node:
        t = np.eye(4)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def _quat_matrix(x, y, z, w) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )
    return m


def enumerate_nodes(model: GltfModel):
    """Yield (node_index, world_transform) in hierarchy order
    (EnumerateNodes, SceneModel.cpp:316-338)."""
    doc = model.doc
    scene_idx = doc.get("scene", 0)
    scenes = doc.get("scenes", [{}])
    roots = scenes[scene_idx].get("nodes", []) if scenes else []

    def walk(index: int, parent: np.ndarray):
        node = doc["nodes"][index]
        world = parent @ _node_matrix(node)
        yield index, world
        for child in node.get("children", []):
            yield from walk(child, world)

    for root in roots:
        yield from walk(root, np.eye(4))


# ----------------------------------------------------------------------------
# attribute generation (SceneModel.cpp:223-302)


def calculate_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    normals = np.zeros_like(positions)
    p0 = positions[indices[:, 0]]
    e1 = positions[indices[:, 1]] - p0
    e2 = positions[indices[:, 2]] - p0
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    for k in range(3):
        np.add.at(normals, indices[:, k], fn)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
    return normals


def calculate_tangents(
    positions: np.ndarray, uvs: np.ndarray, indices: np.ndarray
) -> np.ndarray:
    tangents = np.zeros_like(positions)
    p0 = positions[indices[:, 0]]
    e1 = positions[indices[:, 1]] - p0
    e2 = positions[indices[:, 2]] - p0
    t0 = uvs[indices[:, 0]]
    d1 = uvs[indices[:, 1]] - t0
    d2 = uvs[indices[:, 2]] - t0
    d = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    d = np.where(d == 0.0, 1.0, d)  # the d == 0 guard (:279-282)
    ft = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) / d[:, None]
    for k in range(3):
        np.add.at(tangents, indices[:, k], ft)
    lengths = np.linalg.norm(tangents, axis=-1)
    zero = lengths <= 0.0
    tangents[~zero] /= lengths[~zero, None]
    tangents[zero] = [1.0, 0.0, 0.0]  # fallback (:293-299)
    return tangents


# ----------------------------------------------------------------------------
# scene assembly


def load_scene(
    path: str | Path,
    texture_size: int = 2048,
    load_textures: bool = True,
) -> tuple[Scene, Optional[CameraConfig], Optional[TexturePool]]:
    """Load a glTF file into a renderable Scene (world-space flattened).

    Returns (scene, camera_config_or_None, texture_pool_or_None).  The
    environment/sun are not part of glTF — callers attach them
    (Engine.cpp:118-119 creates Environment separately)."""
    model = GltfModel.load(path)
    doc = model.doc

    materials = _convert_materials(doc)
    mat_meta = doc.get("materials", [{}]) or [{}]

    parts: list[TraceGeometry] = []
    for node_index, world in enumerate_nodes(model):
        node = doc["nodes"][node_index]
        if node.get("mesh") is None:
            continue
        mesh = doc["meshes"][node["mesh"]]
        for prim in mesh["primitives"]:
            if prim.get("mode", 4) != 4:
                raise ValueError("only TRIANGLES primitives are supported")
            geom = _convert_primitive(model, prim, world, mat_meta)
            parts.append(geom)

    if not parts:
        raise ValueError(f"no triangle geometry in {path}")
    geometry = concat_geometry(parts)

    point_lights = _convert_point_lights(model)
    camera = _convert_camera(model)

    pool = None
    if load_textures and doc.get("textures"):
        pool = _convert_textures(model, texture_size)

    scene = Scene(
        geometry=geometry,
        materials=materials,
        environment=constant_environment((0.0, 0.0, 0.0)),
        direct_light=no_direct_light(),
        point_lights=point_lights,
        bvh=None,
        textures=pool,
    )
    return scene, camera, pool


def _convert_primitive(
    model: GltfModel, prim: dict, world: np.ndarray, mat_meta: list[dict]
) -> TraceGeometry:
    attrs = prim["attributes"]
    positions = model.accessor(attrs["POSITION"]).astype(np.float32)
    count = positions.shape[0]

    if "indices" in prim:
        indices = model.accessor(prim["indices"]).reshape(-1).astype(np.int64)
    else:
        indices = np.arange(count, dtype=np.int64)
    indices = indices.reshape(-1, 3)

    uvs = (
        model.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
        if "TEXCOORD_0" in attrs
        else np.zeros((count, 2), np.float32)
    )
    normals = (
        model.accessor(attrs["NORMAL"]).astype(np.float32)
        if "NORMAL" in attrs
        else calculate_normals(positions, indices)
    )
    tangents = (
        model.accessor(attrs["TANGENT"]).astype(np.float32)[:, :3]
        if "TANGENT" in attrs
        else calculate_tangents(positions, uvs, indices)
    )

    # world-space flatten; normals/tangents by M (ClosestHit.rchit parity)
    m3 = world[:3, :3]
    pos_w = positions @ m3.T + world[:3, 3]
    nrm_w = normals @ m3.T
    nrm_w /= np.maximum(np.linalg.norm(nrm_w, axis=-1, keepdims=True), 1e-20)
    tan_w = tangents @ m3.T
    tan_w /= np.maximum(np.linalg.norm(tan_w, axis=-1, keepdims=True), 1e-20)

    # negative-determinant transforms flip winding; compensate so backface
    # culling matches the driver's handling of mirrored instances
    if np.linalg.det(m3) < 0:
        indices = indices[:, ::-1]

    mat_id = prim.get("material", 0)
    meta = mat_meta[mat_id] if mat_id < len(mat_meta) else {}
    alpha_mode = meta.get("alphaMode", "OPAQUE")
    double_sided = bool(meta.get("doubleSided", False))
    base_alpha = meta.get("pbrMetallicRoughness", {}).get(
        "baseColorFactor", [1, 1, 1, 1]
    )[3]
    has_base_tex = (
        meta.get("pbrMetallicRoughness", {}).get("baseColorTexture") is not None
    )
    # flag resolution (GetGeometryInstanceFlags, SceneModel.cpp:791-805 +
    # the alpha test of AnyHit.rahit): OPAQUE commits directly; non-opaque
    # materials with a base texture need a per-hit alpha test; untextured
    # cutouts resolve statically
    if alpha_mode == "OPAQUE":
        opaque, alpha_test = True, False
    elif has_base_tex:
        opaque, alpha_test = False, True
    else:
        opaque, alpha_test = base_alpha >= meta.get("alphaCutoff", 0.5), False

    from vulkanraytracing_tpu.scene.types import make_trace_geometry

    return make_trace_geometry(
        pos_w, indices,
        normals=nrm_w, tangents=tan_w, uvs=uvs,
        material_id=mat_id,
        cull_disable=double_sided,
        opaque=opaque,
        alpha_test=alpha_test,
    )


def _convert_materials(doc: dict) -> Materials:
    """Materials -> MaterialRT SOA (CreateMaterialsData, :911-940)."""
    mats = doc.get("materials") or [{}]

    def tex(m: dict, *keys) -> int:
        cur: Any = m
        for k in keys:
            cur = cur.get(k) if isinstance(cur, dict) else None
            if cur is None:
                return -1
        return cur

    return make_materials(
        base_color_factors=[
            m.get("pbrMetallicRoughness", {}).get("baseColorFactor", [1, 1, 1, 1])
            for m in mats
        ],
        emission_factors=[m.get("emissiveFactor", [0, 0, 0]) + [1] for m in mats],
        roughness_factors=[
            m.get("pbrMetallicRoughness", {}).get("roughnessFactor", 1.0)
            for m in mats
        ],
        metallic_factors=[
            m.get("pbrMetallicRoughness", {}).get("metallicFactor", 1.0)
            for m in mats
        ],
        normal_scales=[m.get("normalTexture", {}).get("scale", 1.0) for m in mats],
        alpha_cutoffs=[m.get("alphaCutoff", 0.5) for m in mats],
        base_color_textures=[
            tex(m, "pbrMetallicRoughness", "baseColorTexture", "index")
            for m in mats
        ],
        roughness_metallic_textures=[
            tex(m, "pbrMetallicRoughness", "metallicRoughnessTexture", "index")
            for m in mats
        ],
        normal_textures=[tex(m, "normalTexture", "index") for m in mats],
        emission_textures=[tex(m, "emissiveTexture", "index") for m in mats],
        occlusion_textures=[tex(m, "occlusionTexture", "index") for m in mats],
    )


def _convert_point_lights(model: GltfModel) -> Optional[PointLights]:
    """KHR_lights_punctual point lights (:555-596)."""
    doc = model.doc
    lights_def = doc.get("extensions", {}).get("KHR_lights_punctual", {}).get(
        "lights", []
    )
    if not lights_def:
        return None
    positions, colors = [], []
    for node_index, world in enumerate_nodes(model):
        node = doc["nodes"][node_index]
        ext = node.get("extensions", {}).get("KHR_lights_punctual")
        if not ext:
            continue
        light = lights_def[ext["light"]]
        if light.get("type") != "point":
            continue
        intensity = light.get("intensity", 1.0)
        color = np.asarray(light.get("color", [1, 1, 1]), np.float32) * intensity
        positions.append(np.append(world[:3, 3].astype(np.float32), 1.0))
        colors.append(np.append(color, np.float32(intensity)))
    if not positions:
        return None
    return PointLights(
        position=jnp.asarray(np.stack(positions)),
        color=jnp.asarray(np.stack(colors)),
    )


def _convert_camera(model: GltfModel) -> Optional[CameraConfig]:
    """First perspective camera node (CreateCamera, :1504-1544)."""
    doc = model.doc
    for node_index, _world in enumerate_nodes(model):
        node = doc["nodes"][node_index]
        cam_idx = node.get("camera")
        if cam_idx is None:
            continue
        cam = doc["cameras"][cam_idx]
        if cam.get("type") != "perspective":
            continue
        p = cam["perspective"]
        aspect = p.get("aspectRatio", 16.0 / 9.0)
        # rotation * kForward (-Z); translation only — matching the
        # reference's use of node.translation/rotation directly
        rotation = node.get("rotation", [0, 0, 0, 1])
        rot = _quat_matrix(*rotation)[:3, :3]
        position = np.asarray(node.get("translation", [0, 0, 0]), np.float64)
        direction = rot @ np.array([0.0, 0.0, -1.0])
        return CameraConfig(
            position=tuple(position),
            target=tuple(position + direction),
            up=(0.0, 1.0, 0.0),
            x_fov=float(p["yfov"] * aspect),
            aspect_ratio=float(aspect),
            z_near=float(p.get("znear", 0.01)),
            z_far=float(p.get("zfar", 1000.0)),
        )
    return None


def _convert_textures(model: GltfModel, size: int) -> Optional[TexturePool]:
    """Textures + samplers -> mipped TexturePool at native resolutions,
    capped at ``size`` (CreateTexturesData :942-970 + the TextureManager
    mip pipeline, TextureManager.cpp:113-176)."""
    doc = model.doc
    images, wraps = [], []
    samplers = doc.get("samplers", [])
    for tex in doc.get("textures", []):
        images.append(model.image_pixels(tex["source"]))
        s = samplers[tex["sampler"]] if "sampler" in tex else {}
        wraps.append(
            (
                _WRAP_MODES.get(s.get("wrapS", 10497), WRAP_REPEAT),
                _WRAP_MODES.get(s.get("wrapT", 10497), WRAP_REPEAT),
            )
        )
    return build_texture_pool(images, wraps, size=size)
