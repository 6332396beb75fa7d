"""High-level renderer: scene ownership, progressive accumulation, post.

The application layer of the framework — the TPU analog of the reference's
``SampleExample`` (frame orchestration, ``src/sample_example.cpp``) +
``RenderOutput`` (accumulation image + tonemap pass, ``src/render_output.cpp``).

Progressive accumulation follows the reference exactly:
``accum = mix(accum, new_sample_mean, 1/(frame+1))``
(``pathtrace.rgen:96-107``), so the accumulation buffer + frame counter are
the complete, checkpointable render state (SURVEY.md §5 "checkpoint/resume").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .integrator.camera import generate_rays
from .integrator.path import sample_pixels
from .models.schema import (
    Camera,
    Environment,
    Geometry,
    Lights,
    Materials,
    RenderConfig,
    SceneData,
    SunSky,
    TextureAtlas,
    Tonemapper,
    default_sun_sky,
    default_tonemapper,
    dummy_atlas,
    dummy_environment,
)
from .ops import rng
from .ops.bvh import build_bvh
from .ops.tonemap import apply_post
from .ops.traverse import PackedScene, pack_scene


def build_scene(
    geometry: Geometry,
    materials: Materials,
    lights: Lights,
    camera: Camera,
    *,
    env: Optional[Environment] = None,
    sun_sky: Optional[SunSky] = None,
    atlas: Optional[TextureAtlas] = None,
    n_lights: Optional[int] = None,
) -> SceneData:
    """Assemble a renderable SceneData (builds the LBVH on device)."""
    bvh = build_bvh(geometry.positions, geometry.indices)
    if n_lights is None:
        # make_lights pads empty tables with one zero-intensity dummy row
        n_lights = int(
            np.count_nonzero(np.asarray(lights.intensity) > 0.0)
        )
    return SceneData(
        geometry=geometry,
        materials=materials,
        lights=lights,
        n_lights=jnp.asarray(n_lights, jnp.int32),
        atlas=atlas if atlas is not None else dummy_atlas(),
        env=env if env is not None else dummy_environment(),
        camera=camera,
        sun_sky=sun_sky if sun_sky is not None else default_sun_sky(),
        bvh=bvh,
    )


def scene_has_alpha(scene: SceneData) -> bool:
    """Static host-side check: any non-opaque material in use?"""
    return bool(np.any(np.asarray(scene.geometry.tri_flags) & 2))


def render_frame_impl(
    scene: SceneData,
    packed: PackedScene,
    cfg: RenderConfig,
    accum: jax.Array,   # (H, W, 3) running mean
    frame: jax.Array,   # () i32
    has_alpha: bool,
) -> jax.Array:
    """One progressive frame: ``maxSamples`` full paths per pixel, averaged,
    then blended into the running mean (pathtrace.rgen:75-107)."""
    w, h = cfg.width, cfg.height
    r = w * h
    pix = jnp.arange(r, dtype=jnp.uint32)

    total = jnp.zeros((r, 3), jnp.float32)
    for s in range(cfg.max_samples):
        seed = rng.tea(pix, frame.astype(jnp.uint32) * cfg.max_samples + s)
        o, d, seed = generate_rays(scene.camera, w, h, frame, seed)
        radiance, seed, _ = sample_pixels(scene, packed, cfg, o, d, seed, has_alpha)
        total = total + radiance

    new = (total / cfg.max_samples).reshape(h, w, 3)
    a = 1.0 / (frame.astype(jnp.float32) + 1.0)
    return accum + (new - accum) * a


render_frame = functools.partial(
    jax.jit, static_argnames=("cfg", "has_alpha"), donate_argnames=("accum",)
)(render_frame_impl)


class Renderer:
    """Progressive path tracer over one scene.

    Usage::

        scene = build_scene(geom, mats, lights, cam, env=env)
        r = Renderer(scene, RenderConfig(width=512, height=512))
        img = r.render(frames=16)          # (H, W, 3) float, post-processed
    """

    def __init__(
        self,
        scene: SceneData,
        cfg: RenderConfig,
        tonemapper: Optional[Tonemapper] = None,
    ):
        self.scene = scene
        self.cfg = cfg
        self.tonemapper = tonemapper or default_tonemapper()
        self.packed = pack_scene(scene.bvh, scene.geometry)
        self.has_alpha = scene_has_alpha(scene)
        self.reset()

    # -- frame/accumulation control (sample_example.cpp:183-207) -----------
    def reset(self) -> None:
        """Reset accumulation (camera/scene change in the reference)."""
        self.frame = 0
        self.accum = jnp.zeros((self.cfg.height, self.cfg.width, 3), jnp.float32)

    def step(self) -> None:
        """Render one progressive frame into the accumulation buffer."""
        self.accum = render_frame(
            self.scene,
            self.packed,
            self.cfg,
            self.accum,
            jnp.asarray(self.frame, jnp.int32),
            self.has_alpha,
        )
        self.frame += 1

    def render(self, frames: int = 1) -> np.ndarray:
        """Accumulate ``frames`` progressive frames and return the
        post-processed LDR image (H, W, 3) in [0, 1]."""
        for _ in range(frames):
            self.step()
        return np.asarray(self.postprocess())

    def hdr(self) -> jax.Array:
        """The raw accumulated radiance image (checkpointable state)."""
        return self.accum

    def postprocess(self) -> jax.Array:
        """Tonemap + post chain (drawPost, sample_example.cpp:362-384)."""
        return apply_post(self.accum, self.tonemapper)

    # -- checkpoint/resume (SURVEY.md §5) ----------------------------------
    def save_state(self):
        return {"accum": np.asarray(self.accum), "frame": self.frame}

    def load_state(self, state) -> None:
        self.accum = jnp.asarray(state["accum"])
        self.frame = int(state["frame"])


def write_png(path: str, img01: np.ndarray) -> None:
    """Write a [0,1] float image to PNG."""
    from PIL import Image

    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
