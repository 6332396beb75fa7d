"""glTF loader tests: synthetic assets written to disk, loaded, rendered."""

import base64
import os
import json
import struct

import numpy as np
import jax
import pytest

from vk_raytrace_tpu.models.gltf import load_gltf
from vk_raytrace_tpu.models.schema import ALPHA_MASK, RenderConfig, PBR_GLTF
from vk_raytrace_tpu import render as R


def _write_triangle_gltf(path, color=(1.0, 0.2, 0.1, 1.0), double_sided=True,
                         with_texture=False):
    """Minimal valid glTF: one triangle, optional checkerboard texture."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.array([[0, 0, 1]] * 3, np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)

    buf = positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    pad = (4 - len(buf) % 4) % 4
    buf += b"\x00" * pad

    material = {
        "pbrMetallicRoughness": {
            "baseColorFactor": list(color),
            "metallicFactor": 0.0,
            "roughnessFactor": 0.8,
        },
        "doubleSided": double_sided,
        "extensions": {
            "KHR_materials_clearcoat": {"clearcoatFactor": 0.5,
                                        "clearcoatRoughnessFactor": 0.2},
            "KHR_materials_ior": {"ior": 1.4},
        },
    }
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }]
        }],
        "materials": [material],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64," + base64.b64encode(buf).decode(),
        }],
        "extensions": {
            "KHR_lights_punctual": {
                "lights": [{"type": "point", "intensity": 10.0, "color": [1, 1, 0.5]}]
            }
        },
        "extensionsUsed": ["KHR_lights_punctual", "KHR_materials_clearcoat",
                           "KHR_materials_ior"],
    }
    doc["nodes"].append({"extensions": {"KHR_lights_punctual": {"light": 0}},
                         "translation": [0, 5, 0]})
    doc["scenes"][0]["nodes"].append(1)

    if with_texture:
        import io
        from PIL import Image

        check = np.zeros((8, 8, 4), np.uint8)
        check[::2, ::2] = [255, 255, 255, 255]
        check[1::2, 1::2] = [255, 255, 255, 255]
        check[..., 3] = 255
        b = io.BytesIO()
        Image.fromarray(check).save(b, format="PNG")
        doc["images"] = [{
            "uri": "data:image/png;base64," + base64.b64encode(b.getvalue()).decode()
        }]
        doc["samplers"] = [{"wrapS": 33071, "wrapT": 10497}]
        doc["textures"] = [{"source": 0, "sampler": 0}]
        doc["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}

    with open(path, "w") as f:
        json.dump(doc, f)
    return doc


def _write_glb(path, gltf_doc, bin_chunk=b""):
    js = json.dumps(gltf_doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + (8 + len(bin_chunk) if bin_chunk else 0)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    if bin_chunk:
        out += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    with open(path, "wb") as f:
        f.write(out)


class TestLoader:
    def test_triangle_roundtrip(self, tmp_path):
        path = str(tmp_path / "tri.gltf")
        _write_triangle_gltf(path)
        geom, mats, lights, cam, atlas = load_gltf(path)

        # Transform baked: vertex 0 at (1,2,3)
        pos = np.asarray(geom.positions)
        assert np.allclose(pos[0], [1, 2, 3], atol=1e-5)
        assert geom.indices.shape[0] >= 1

        # Material fields incl. extensions
        assert np.allclose(np.asarray(mats.base_color_factor)[0],
                           [1.0, 0.2, 0.1, 1.0])
        assert float(mats.clearcoat_factor[0]) == 0.5
        assert abs(float(mats.ior[0]) - 1.4) < 1e-6
        assert int(mats.double_sided[0]) == 1

        # Light imported with node translation
        assert int(lights.type[0]) == 1  # point
        assert np.allclose(np.asarray(lights.position)[0], [0, 5, 0])
        assert np.allclose(np.asarray(lights.color)[0], [1, 1, 0.5])

    def test_glb_container(self, tmp_path):
        gpath = str(tmp_path / "tri.gltf")
        doc = _write_triangle_gltf(gpath)
        glb = str(tmp_path / "tri.glb")
        _write_glb(glb, doc)
        geom, mats, lights, cam, atlas = load_gltf(glb)
        assert geom.indices.shape[0] >= 1

    def test_texture_atlas(self, tmp_path):
        path = str(tmp_path / "tex.gltf")
        _write_triangle_gltf(path, with_texture=True)
        geom, mats, lights, cam, atlas = load_gltf(path)
        assert atlas is not None
        assert int(atlas.width[0]) == 8 and int(atlas.height[0]) == 8
        assert int(mats.base_color_texture[0]) == 0
        # wrapS=CLAMP(33071), wrapT=REPEAT
        assert int(atlas.wrap_s[0]) == 1 and int(atlas.wrap_t[0]) == 0

    def test_renders(self, tmp_path):
        path = str(tmp_path / "tri.gltf")
        _write_triangle_gltf(path)
        geom, mats, lights, cam, atlas = load_gltf(path)
        scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
        cfg = RenderConfig(width=32, height=32, max_depth=2, max_samples=1,
                           hdr_multiplier=0.0, pbr_mode=PBR_GLTF)
        r = R.Renderer(scene, cfg)
        img = r.render(frames=1)
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()

    def test_shared_mesh_instancing(self, tmp_path):
        """A mesh drawn by 3 nodes loads as MeshPool x InstanceTable under
        instancing='auto' (accelstruct.cpp:132-162: TLAS over nodes is the
        reference default) and renders the same image as the baked form."""
        path = str(tmp_path / "tri.gltf")
        doc = _write_triangle_gltf(path)
        doc["nodes"][0] = {"mesh": 0}  # identity; add translated copies
        doc["nodes"].append({"mesh": 0, "translation": [2.0, 0.0, 0.0]})
        doc["nodes"].append({"mesh": 0, "translation": [0.0, 2.0, 0.0]})
        doc["scenes"][0]["nodes"] += [2, 3]
        with open(path, "w") as f:
            json.dump(doc, f)

        from vk_raytrace_tpu.models.schema import Geometry

        out, mats, lights, cam, atlas = load_gltf(path, instancing="auto")
        assert isinstance(out, tuple) and not isinstance(out, Geometry)
        pool, inst = out
        assert len(pool.tri_start) == 1          # ONE shared mesh
        assert len(inst.mesh_id) == 3            # three instances
        assert pool.geometry.indices.shape[0] == 2  # builder pads 1 tri -> 2

        baked, *_ = load_gltf(path, instancing="bake")
        assert isinstance(baked, Geometry)

        cfg = RenderConfig(width=32, height=32, max_depth=2, max_samples=2,
                           hdr_multiplier=0.0, pbr_mode=PBR_GLTF, rr=False)
        r_inst = R.Renderer(
            R.build_instanced_scene(pool, inst, mats, lights, cam, atlas=atlas),
            cfg,
        )
        r_bake = R.Renderer(
            R.build_scene(baked, mats, lights, cam, atlas=atlas), cfg
        )
        a = np.asarray(r_inst.render(frames=2))
        b = np.asarray(r_bake.render(frames=2))
        assert np.isfinite(a).all()
        assert np.abs(a - b).max() < 2e-2, np.abs(a - b).max()
        # Picking works through the two-level structure (round-2 crash).
        y, x = np.unravel_index(int(np.argmax(a.sum(-1))), a.shape[:2])
        p = r_inst.pick(int(x), int(y))
        if p is not None:
            assert "instance" in p and 0 <= p["instance"] < 3

    def test_normalized_and_strided_accessors(self, tmp_path):
        """uint8-normalized colors + byteStride interleaving."""
        # Interleaved: pos (12B) + color4 u8 normalized (4B) = 16B stride
        verts = np.zeros(3, dtype=[("p", np.float32, 3), ("c", np.uint8, 4)])
        verts["p"] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        verts["c"] = [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255]]
        buf = verts.tobytes()
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "COLOR_0": 1}}]}],
            "accessors": [
                {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
                 "count": 3, "type": "VEC3"},
                {"bufferView": 0, "byteOffset": 12, "componentType": 5121,
                 "count": 3, "type": "VEC4", "normalized": True},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": len(buf),
                 "byteStride": 16},
            ],
            "buffers": [{"byteLength": len(buf),
                         "uri": "data:application/octet-stream;base64,"
                         + base64.b64encode(buf).decode()}],
        }
        path = str(tmp_path / "strided.gltf")
        with open(path, "w") as f:
            json.dump(doc, f)
        geom, mats, lights, cam, atlas = load_gltf(path)
        pos = np.asarray(geom.positions)
        assert np.allclose(pos[:3], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
        # First vertex color is red (packed RGBA8)
        c = int(np.asarray(geom.color)[0])
        assert (c & 0xFF) == 255 and ((c >> 8) & 0xFF) == 0


class TestQuirksAsset:
    """Committed binary GLB with real-world quirks (tests/assets/quirks.glb,
    regenerable via make_quirks_glb.py): interleaved byteStride vertex
    buffer, a sparse POSITION accessor, normalized uint16 UVs, a
    TRIANGLE_STRIP primitive, PNG textures with distinct samplers, alpha
    MASK + unlit materials, shared-mesh nodes, camera + punctual light —
    tiny_gltf-grade tolerance (scene.cpp:123-155)."""

    ASSET = os.path.join(os.path.dirname(__file__), "assets", "quirks.glb")

    def test_load_both_modes(self):
        from vk_raytrace_tpu.models.schema import Geometry

        geom, mats, lights, cam, atlas = load_gltf(self.ASSET, instancing="bake")
        assert isinstance(geom, Geometry)
        assert len(np.asarray(mats.ior)) == 3
        assert int(np.asarray(lights.intensity).shape[0]) >= 1
        assert atlas is not None and cam is not None
        # sparse override moved two verts of the second mesh up to y=0.5
        assert float(np.asarray(geom.positions)[:, 1].max()) >= 0.5
        out, *_ = load_gltf(self.ASSET, instancing="auto")
        assert isinstance(out, tuple) and not isinstance(out, Geometry)

    def test_render(self):
        from vk_raytrace_tpu import render as R
        from vk_raytrace_tpu.models.schema import PBR_GLTF, RenderConfig

        geom, mats, lights, cam, atlas = load_gltf(self.ASSET)
        scene = R.build_scene(geom, mats, lights, cam, atlas=atlas)
        cfg = RenderConfig(width=48, height=48, max_depth=3, max_samples=2,
                           hdr_multiplier=0.0, pbr_mode=PBR_GLTF, rr=False)
        r = R.Renderer(scene, cfg)
        img = np.asarray(r.render(frames=2))
        assert np.isfinite(img).all()
        assert img.max() > 0.1  # the emissive + lit quads show up
