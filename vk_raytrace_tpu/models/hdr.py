"""HDR environment loading + importance-sampling acceleration.

Replaces ``src/hdr_sampling.{hpp,cpp}``:

* Radiance ``.hdr`` (RGBE) decoding in pure numpy (RLE + flat scanlines) —
  the reference uses stb_image (``hdr_sampling.cpp:56-99``); an OpenCV
  fallback covers exotic variants.
* Per-texel solid-angle-weighted importance (``hdr_sampling.cpp:187-219``).
* **Walker alias table built on device**: the reference's sequential
  two-pointer pairing (``hdr_sampling.cpp:107-176``) becomes sort + prefix
  sums + ``searchsorted`` — every small-energy texel's cumulative deficit is
  binary-searched into the cumulative-excess intervals of the large-energy
  texels, which reproduces the sequential pairing exactly (the straddling
  texel is assigned wholly to the current large, as in the reference) but
  runs as three parallel passes on the TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .schema import EnvAccel, Environment


# --------------------------------------------------------------------------
# Radiance RGBE (.hdr) decoding
# --------------------------------------------------------------------------

def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 RGBE -> (..., 3) float32."""
    rgbe = rgbe.astype(np.int32)
    e = rgbe[..., 3]
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)  # 2^(e-128-8)
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]).astype(np.float32)


def load_hdr(path: str) -> np.ndarray:
    """Decode a Radiance .hdr file to (H, W, 3) float32 (linear radiance)."""
    try:
        return _load_hdr_numpy(path)
    except Exception:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise IOError(f"cannot decode HDR: {path}")
        return img[..., ::-1].astype(np.float32)  # BGR -> RGB


def _load_hdr_numpy(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()

    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise IOError("not a radiance file")
    # Header ends at blank line; then the resolution line.
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    res = data[pos:eol].split()
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise IOError(f"unsupported resolution line: {res!r}")
    h, w = int(res[1]), int(res[3])
    pos = eol + 1

    payload = data[pos:]
    from .. import runtime

    native = runtime.rgbe_decode(payload, w, h)
    if native is not None:
        return native

    buf = np.frombuffer(payload, np.uint8)
    out = np.empty((h, w, 4), np.uint8)
    ptr = 0
    for y in range(h):
        if w < 8 or w > 0x7FFF or buf[ptr] != 2 or buf[ptr + 1] != 2:
            # Flat (possibly old-RLE) scanlines: just copy w RGBE pixels.
            row = buf[ptr : ptr + w * 4].reshape(w, 4)
            out[y] = row
            ptr += w * 4
            continue
        if (int(buf[ptr + 2]) << 8 | int(buf[ptr + 3])) != w:
            raise IOError("scanline width mismatch")
        ptr += 4
        for c in range(4):
            x = 0
            while x < w:
                count = int(buf[ptr])
                ptr += 1
                if count > 128:  # run
                    out[y, x : x + count - 128, c] = buf[ptr]
                    ptr += 1
                    x += count - 128
                else:  # literal
                    out[y, x : x + count, c] = buf[ptr : ptr + count]
                    ptr += count
                    x += count
    return _rgbe_to_float(out)


# --------------------------------------------------------------------------
# Alias table (device)
# --------------------------------------------------------------------------

_ALIAS_ROUNDS = 8


def build_alias_table(importance: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Walker alias table from unnormalized weights ``(N,)``.

    Returns ``(q, alias, integral)`` with the same semantics as
    ``HdrSampling::buildAliasmap`` (hdr_sampling.cpp:107-176): ``q[i]`` is the
    acceptance ratio for texel i, ``alias[i]`` the fallback texel.

    The sequential reference routes each below-average texel's deficit to the
    current above-average texel, and — crucially — partially consumed larges
    rejoin the queue and get aliases of their own (its ``s`` index catches up
    with ``large``), which makes the table near-exact. We reproduce that with
    a parallel *cascade*: each round routes all currently-unaliased q<1
    texels into the cumulative-excess intervals of the q>=1 texels
    (prefix sums + ``searchsorted``), decrements the consumed q, and repeats —
    over-consumed larges become next round's smalls. Residual mass shrinks
    geometrically; 8 rounds leaves TV distance at numerical-noise level.
    """
    n = importance.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    total = jnp.sum(importance)
    q = importance * (n / jnp.maximum(total, 1e-30))
    alias = idx

    for _ in range(_ALIAS_ROUNDS):
        small = (q < 1.0) & (alias == idx)
        large = q >= 1.0
        any_pair = jnp.any(small) & jnp.any(large)

        deficit = jnp.where(small, 1.0 - q, 0.0)
        d_before = jnp.cumsum(deficit) - deficit

        excess = jnp.where(large, q - 1.0, 0.0)
        cum_excess = jnp.cumsum(excess)
        # Compact larges to the front (stable by index), keep their cumulative
        # excess boundaries for the interval search.
        large_rank = jnp.cumsum(large.astype(jnp.int32)) - 1
        n_large = jnp.maximum(jnp.sum(large.astype(jnp.int32)), 1)
        sort_key = jnp.where(large, large_rank, n + 1)
        perm = jnp.argsort(sort_key)
        ce_compact = jnp.where(large, cum_excess, jnp.float32(3e38))[perm]
        large_ids = idx[perm]

        j = jnp.clip(
            jnp.searchsorted(ce_compact, d_before, side="right"), 0, n_large - 1
        )
        target = large_ids[j]
        new_alias = jnp.where(small & any_pair, target, alias)
        routed = jax.ops.segment_sum(
            jnp.where(small & any_pair, deficit, 0.0),
            jnp.where(small & any_pair, target, n),  # n = drop bucket
            num_segments=n + 1,
        )[:n]
        q = q - routed
        alias = new_alias

    return q.astype(jnp.float32), alias, total


def pack_env_rows(img: jax.Array, accel) -> jax.Array:
    """(H*W, 16) f32 per-texel rows: [self rgb | right | down | diag |
    q, alias, pdf, alias_pdf]. Neighbors bake the bilinear footprint whose
    top-left is this texel (U wraps, V clamps — hdr_sampling.cpp:68-77),
    so one row gather serves a full bilinear tap."""
    h, w = img.shape[0], img.shape[1]
    right = jnp.roll(img, -1, axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    diag = jnp.roll(down, -1, axis=1)
    n = h * w
    return jnp.concatenate(
        [
            img.reshape(n, 3),
            right.reshape(n, 3),
            down.reshape(n, 3),
            diag.reshape(n, 3),
            accel.q[:, None],
            accel.alias.astype(jnp.float32)[:, None],
            accel.pdf[:, None],
            accel.alias_pdf[:, None],
        ],
        axis=1,
    )


def build_environment(image: np.ndarray | jax.Array) -> Environment:
    """Full environment build: importance + alias table + pdfs
    (``createEnvironmentAccel``, hdr_sampling.cpp:190-248)."""
    img = jnp.asarray(image, jnp.float32)
    h, w = img.shape[0], img.shape[1]

    # Solid angle per row: (cos(theta_y) - cos(theta_{y+1})) * stepPhi
    ys = jnp.arange(h, dtype=jnp.float32)
    step_theta = jnp.pi / h
    step_phi = 2.0 * jnp.pi / w
    area = (jnp.cos(ys * step_theta) - jnp.cos((ys + 1.0) * step_theta)) * step_phi

    max_ch = jnp.max(img, axis=-1)                      # (H, W)
    importance = (max_ch * area[:, None]).reshape(-1)   # (N,)

    lum = (
        0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    )
    average = jnp.mean(lum)

    q, alias, integral = build_alias_table(importance)
    pdf = max_ch.reshape(-1) / jnp.maximum(integral, 1e-30)
    alias_pdf = pdf[alias]

    accel = EnvAccel(alias=alias, q=q, pdf=pdf, alias_pdf=alias_pdf)
    assert h * w < 2**23, "env too large for exact-f32 alias ids"
    return Environment(
        image=img,
        accel=accel,
        integral=integral,
        average=average,
        rows=pack_env_rows(img, accel),
    )


def procedural_sky_hdr(h: int = 64, w: int = 128, sun_dir=(0.3, 0.8, 0.5)) -> np.ndarray:
    """Tiny analytic gradient+sun HDR for tests/benchmarks without assets."""
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    theta = ys * np.pi
    phi = xs * 2 * np.pi - np.pi
    dy = np.cos(theta)[:, None] * np.ones((1, w))
    dx = np.cos(phi)[None, :] * np.sin(theta)[:, None]
    dz = np.sin(phi)[None, :] * np.sin(theta)[:, None]
    d = np.stack([dx, dy, dz], -1)
    sd = np.asarray(sun_dir, np.float64)
    sd /= np.linalg.norm(sd)
    cosg = np.clip((d * sd).sum(-1), -1, 1)
    horizon = np.clip(dy * 0.5 + 0.5, 0, 1)
    sky = (
        np.stack([0.35, 0.5, 0.85], 0)[None, None] * horizon[..., None]
        + np.stack([0.9, 0.7, 0.5], 0)[None, None] * (1 - horizon[..., None]) * 0.4
    )
    sun = np.exp((cosg - 1.0) * 600.0)[..., None] * np.array([500.0, 450.0, 380.0])
    return (sky + sun).astype(np.float32)
