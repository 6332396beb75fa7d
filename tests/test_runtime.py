"""Native C++ runtime tests: parity with the JAX/numpy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from vk_raytrace_tpu import runtime
from vk_raytrace_tpu.models import hdr as hdr_mod
from vk_raytrace_tpu.ops import math as vmath


needs_native = pytest.mark.skipif(
    not runtime.available(), reason="native toolchain unavailable"
)


@needs_native
class TestNativeParity:
    def test_oct_encode_matches_jax(self):
        rng = np.random.default_rng(0)
        v = rng.normal(size=(4096, 3))
        v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
        native = runtime.oct_encode(v)
        ref = np.asarray(vmath.oct_encode(jnp.asarray(v)))
        assert np.array_equal(native, ref)

    def test_oct_decode_matches_jax(self):
        rng = np.random.default_rng(1)
        v = rng.normal(size=(2048, 3))
        v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
        packed = runtime.oct_encode(v)
        native = runtime.oct_decode(packed)
        ref = np.asarray(vmath.oct_decode(jnp.asarray(packed)))
        assert np.allclose(native, ref, atol=1e-6)

    def test_pack_rgba8(self):
        rng = np.random.default_rng(2)
        c = rng.uniform(-0.1, 1.1, size=(1000, 4)).astype(np.float32)
        native = runtime.pack_rgba8(c)
        c8 = np.round(np.clip(c, 0, 1) * 255).astype(np.uint32)
        ref = c8[:, 0] | (c8[:, 1] << 8) | (c8[:, 2] << 16) | (c8[:, 3] << 24)
        assert np.array_equal(native, ref)

    def test_smooth_normals_flat_quad(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        n = runtime.smooth_normals(pos, idx)
        assert np.allclose(n, [[0, 0, 1]] * 4)

    def test_alias_table_matches_reference_loop(self):
        """The C++ builder is a port of hdr_sampling.cpp:107-176; its
        selection distribution must match the target near-exactly."""
        rng = np.random.default_rng(3)
        imp = rng.exponential(size=512).astype(np.float32)
        imp[5] *= 200
        q, alias, total = runtime.alias_table_seq(imp)
        assert abs(total - imp.sum()) < 1e-2
        n = len(imp)
        mass = np.clip(q.astype(np.float64), 0, 1)
        np.add.at(mass, alias, 1.0 - np.clip(q.astype(np.float64), 0, 1))
        target = imp / imp.sum() * n
        tv = 0.5 * np.abs(mass - target).sum() / n
        assert tv < 1e-5, tv

    def test_rgbe_rle_decode(self, tmp_path):
        """RLE-encoded scanlines decode identically to the flat writer."""
        h, w = 4, 32
        img = np.zeros((h, w, 3), np.float32)
        img[:, :16] = [1.0, 0.5, 0.25]    # constant run
        img[:, 16:] = np.linspace(0.1, 2.0, 16)[None, :, None]  # literals
        # write RLE .hdr by hand
        maxc = img.max(-1)
        e = np.where(maxc > 1e-32, np.floor(np.log2(np.maximum(maxc, 1e-32))) + 1, 0)
        scale = np.where(maxc > 1e-32, 2.0 ** (8 - e), 0.0)
        rgbe = np.zeros((h, w, 4), np.uint8)
        rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
        rgbe[..., 3] = np.where(maxc > 1e-32, e + 128, 0).astype(np.uint8)
        out = bytearray()
        for y in range(h):
            out += bytes([2, 2, w >> 8, w & 0xFF])
            for c in range(4):
                col = rgbe[y, :, c]
                x = 0
                while x < w:
                    # find run
                    run = 1
                    while x + run < w and col[x + run] == col[x] and run < 127:
                        run += 1
                    if run >= 3:
                        out += bytes([128 + run, col[x]])
                        x += run
                    else:
                        lit = 1
                        while x + lit < w and lit < 128 and (
                            x + lit + 2 >= w or not (
                                col[x + lit] == col[x + lit + 1] == col[x + lit + 2]
                            )
                        ):
                            lit += 1
                        out += bytes([lit]) + col[x : x + lit].tobytes()
                        x += lit
        path = tmp_path / "rle.hdr"
        with open(path, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {h} +X {w}\n".encode())
            f.write(bytes(out))
        decoded = hdr_mod.load_hdr(str(path))
        rel = np.abs(decoded - img) / np.maximum(img, 1e-3)
        assert np.median(rel) < 0.01
