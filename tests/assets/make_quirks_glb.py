"""Generate ``quirks.glb``: a committed binary asset exercising the
real-world glTF features the loader must tolerate (VERDICT r3 item 9 —
tiny_gltf-grade tolerance, scene.cpp:123-155):

* INTERLEAVED vertex buffer (POSITION+NORMAL+TEXCOORD_0 with byteStride)
* a SPARSE accessor overriding two positions
* normalized uint16 TEXCOORD_0 on a second primitive
* a TRIANGLE_STRIP primitive
* three materials (textured PBR, alpha MASK with cutoff, emissive unlit)
* two PNG textures with different samplers (repeat / clamp)
* two nodes SHARING one mesh (instancing) + a camera + a punctual light

Run ``python tests/assets/make_quirks_glb.py`` to regenerate.
"""

from __future__ import annotations

import io
import json
import os
import struct

import numpy as np


def _png(img: np.ndarray) -> bytes:
    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(img).save(b, format="PNG")
    return b.getvalue()


def build() -> bytes:
    bufs: list[bytes] = []
    views: list[dict] = []
    accessors: list[dict] = []

    def add_view(data: bytes, **kw) -> int:
        off = sum(len(b) for b in bufs)
        pad = (-off) % 4
        if pad:
            bufs.append(b"\x00" * pad)
            off += pad
        bufs.append(data)
        views.append(dict(buffer=0, byteOffset=off, byteLength=len(data), **kw))
        return len(views) - 1

    def add_accessor(view, ctype, count, type_, offset=0, normalized=False,
                     minmax=None):
        a = dict(bufferView=view, componentType=ctype, count=count,
                 type=type_, byteOffset=offset)
        if normalized:
            a["normalized"] = True
        if minmax is not None:
            a["min"], a["max"] = minmax
        accessors.append(a)
        return len(accessors) - 1

    F, US, UI = 5126, 5123, 5125

    # ---- mesh 0, prim 0: interleaved quad (pos3 + nrm3 + uv2, stride 32) --
    quad_pos = np.array(
        [[-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1]], np.float32
    )
    quad_nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    quad_uv = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32)
    inter = np.concatenate([quad_pos, quad_nrm, quad_uv], axis=1).astype(
        np.float32
    )
    v_inter = add_view(inter.tobytes(), byteStride=32, target=34962)
    a_pos = add_accessor(
        v_inter, F, 4, "VEC3", 0,
        minmax=(quad_pos.min(0).tolist(), quad_pos.max(0).tolist()),
    )
    a_nrm = add_accessor(v_inter, F, 4, "VEC3", 12)
    a_uv = add_accessor(v_inter, F, 4, "VEC2", 24)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    v_idx = add_view(idx.tobytes(), target=34963)
    a_idx = add_accessor(v_idx, UI, 6, "SCALAR")

    # sparse override: lift two corners of a COPY of the quad positions
    sp_idx = np.array([1, 2], np.uint16)
    sp_val = np.array([[-1, 0.5, 1], [1, 0.5, 1]], np.float32)
    v_spi = add_view(sp_idx.tobytes())
    v_spv = add_view(sp_val.tobytes())
    a_pos_sparse = add_accessor(
        v_inter, F, 4, "VEC3", 0,
        minmax=([-1, 0, -1], [1, 0.5, 1]),
    )
    accessors[a_pos_sparse]["sparse"] = dict(
        count=2,
        indices=dict(bufferView=v_spi, componentType=US),
        values=dict(bufferView=v_spv),
    )

    # ---- mesh 0, prim 1: normalized-u16 UV strip (alpha-masked) ----------
    strip_pos = np.array(
        [[-1, 1, 0], [-1, 2, 0], [0, 1, 0], [0, 2, 0], [1, 1, 0], [1, 2, 0]],
        np.float32,
    )
    v_spos = add_view(strip_pos.tobytes(), target=34962)
    a_spos = add_accessor(
        v_spos, F, 6, "VEC3",
        minmax=(strip_pos.min(0).tolist(), strip_pos.max(0).tolist()),
    )
    strip_uv = (
        np.array([[0, 0], [0, 1], [0.5, 0], [0.5, 1], [1, 0], [1, 1]])
        * 65535
    ).astype(np.uint16)
    v_suv = add_view(strip_uv.tobytes(), byteStride=4, target=34962)
    a_suv = add_accessor(v_suv, US, 6, "VEC2", normalized=True)

    # ---- textures ----------------------------------------------------------
    rng = np.random.default_rng(42)
    checker = np.zeros((32, 32, 4), np.uint8)
    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    checker[..., 0] = np.where((xx // 4 + yy // 4) % 2 == 0, 220, 40)
    checker[..., 1] = 128
    checker[..., 2] = np.where((xx // 4 + yy // 4) % 2 == 0, 40, 220)
    checker[..., 3] = 255
    leaf = np.zeros((16, 16, 4), np.uint8)
    leaf[..., 1] = 180
    leaf[..., 3] = np.where(
        (xx[:16, :16] - 8) ** 2 + (yy[:16, :16] - 8) ** 2 < 36, 255, 0
    )
    v_png0 = add_view(_png(checker[..., :3]))
    v_png1 = add_view(_png(leaf))

    gltf = dict(
        asset=dict(version="2.0", generator="vk_raytrace_tpu quirks"),
        scene=0,
        scenes=[dict(nodes=[0, 1, 2, 3, 4])],
        nodes=[
            dict(mesh=0),
            dict(mesh=0, translation=[2.5, 0.0, 0.0]),  # shared mesh
            dict(mesh=1, translation=[0.0, 0.0, 2.0]),
            dict(camera=0, translation=[0.0, 2.0, 6.0],
                 rotation=[-0.13, 0.0, 0.0, 0.99]),
            dict(
                extensions=dict(
                    KHR_lights_punctual=dict(light=0)
                ),
                translation=[0.0, 4.0, 0.0],
            ),
        ],
        cameras=[dict(type="perspective",
                      perspective=dict(yfov=0.8, znear=0.01))],
        meshes=[
            dict(primitives=[
                dict(attributes=dict(POSITION=a_pos, NORMAL=a_nrm,
                                     TEXCOORD_0=a_uv),
                     indices=a_idx, material=0),
                dict(attributes=dict(POSITION=a_spos, TEXCOORD_0=a_suv),
                     mode=5, material=1),  # TRIANGLE_STRIP
            ]),
            dict(primitives=[
                dict(attributes=dict(POSITION=a_pos_sparse, NORMAL=a_nrm,
                                     TEXCOORD_0=a_uv),
                     indices=a_idx, material=2),
            ]),
        ],
        materials=[
            dict(name="textured",
                 pbrMetallicRoughness=dict(
                     baseColorTexture=dict(index=0),
                     metallicFactor=0.1, roughnessFactor=0.8)),
            dict(name="cutout",
                 pbrMetallicRoughness=dict(
                     baseColorTexture=dict(index=1)),
                 alphaMode="MASK", alphaCutoff=0.5, doubleSided=True),
            dict(name="glow",
                 emissiveFactor=[2.0, 1.5, 0.5],
                 extensions=dict(KHR_materials_unlit=dict())),
        ],
        textures=[dict(source=0, sampler=0), dict(source=1, sampler=1)],
        images=[dict(bufferView=v_png0, mimeType="image/png"),
                dict(bufferView=v_png1, mimeType="image/png")],
        samplers=[dict(wrapS=10497, wrapT=10497),
                  dict(wrapS=33071, wrapT=33071)],
        extensions=dict(
            KHR_lights_punctual=dict(lights=[
                dict(type="point", intensity=40.0, color=[1, 1, 0.9]),
            ])
        ),
        extensionsUsed=["KHR_lights_punctual", "KHR_materials_unlit"],
        bufferViews=views,
        accessors=accessors,
    )
    bin_blob = b"".join(bufs)
    bin_blob += b"\x00" * ((-len(bin_blob)) % 4)
    gltf["buffers"] = [dict(byteLength=len(bin_blob))]

    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_blob)
    out = b"glTF" + struct.pack("<II", 2, total)
    out += struct.pack("<I", len(js)) + b"JSON" + js
    out += struct.pack("<I", len(bin_blob)) + b"BIN\x00" + bin_blob
    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "quirks.glb")
    with open(path, "wb") as f:
        f.write(build())
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")
