"""Interactive progressive viewer: the application-shell analog.

The reference is a GLFW window + ImGui panel (``main.cpp:200-264`` frame
loop, ``sample_gui.cpp`` live parameter editing, ``CameraManip`` orbit
controls, drag&drop asset reload). A TPU renderer is headless by nature, so
the TPU-native shell is a tiny zero-dependency HTTP server + browser page:

* progressive frames stream to a canvas (the render loop keeps accumulating
  whenever the camera is still, exactly like ``SampleExample::renderScene``);
* mouse drag orbits / wheel dollies / shift-drag pans (CameraManip.cpp
  semantics: orbit around a pivot, accumulation resets on change);
* a control panel edits tonemapper + render settings live (sample_gui.cpp:
  ``guiTonemapper``/``guiRayTracing``) — tonemap edits re-post the existing
  accumulation without retracing, path edits rebuild the renderer but reuse
  the acceleration structures;
* click picking reports triangle/material/distance (``screenPicking``,
  sample_example.cpp:469-511);
* the scene file is watched; saving it triggers a rebuild (drop/reload,
  main.cpp:289-297).

Run: ``python -m vk_raytrace_tpu.viewer --scene cornell --port 8722``.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import struct
import threading
import time
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


# ----------------------------------------------------------------------------
# Camera manipulation (CameraManip.cpp orbit semantics)
# ----------------------------------------------------------------------------

class OrbitCamera:
    """Eye/pivot orbit state; produces the Camera NamedTuple on demand.

    The pivot is scene-derived like CameraManip's interest point: the
    scene-bounds center projected onto the view ray (not a fixed distance),
    and :meth:`set_pivot` re-targets it from a pick result
    (sample_example.cpp:493-510 sets the camera interest the same way)."""

    def __init__(self, camera, width: int, height: int, bounds=None):
        vi = np.asarray(camera.view_inverse)
        self.eye = vi[:3, 3].copy()
        fwd = -vi[:3, 2]
        if bounds is not None:
            bmin, bmax = bounds
            c = (np.asarray(bmin) + np.asarray(bmax)) * 0.5
            # project the scene center onto the view ray; keep it in front
            self.dist = float(max(np.dot(c - self.eye, fwd), 1.0))
        else:
            self.dist = 3.0
        self.center = self.eye + fwd * self.dist
        self.up = np.array([0.0, 1.0, 0.0])
        pi = np.asarray(camera.proj_inverse)
        fy = abs(float(pi[1, 1]))  # proj[1,1] = -1/tan(fov/2) inverted
        self.fov = float(np.degrees(2.0 * np.arctan(fy))) if fy > 0 else 60.0
        self.width, self.height = width, height
        self.focal = float(camera.focal_dist)
        self.aperture = float(camera.aperture)

    def set_pivot(self, p) -> None:
        self.center = np.asarray(p, np.float64).copy()

    def orbit(self, dx: float, dy: float) -> None:
        off = self.eye - self.center
        r = np.linalg.norm(off)
        theta = np.arctan2(off[0], off[2]) - dx * 0.005
        phi = np.arccos(np.clip(off[1] / max(r, 1e-9), -1, 1)) + dy * 0.005
        phi = np.clip(phi, 0.05, np.pi - 0.05)
        self.eye = self.center + r * np.array(
            [np.sin(phi) * np.sin(theta), np.cos(phi), np.sin(phi) * np.cos(theta)]
        )

    def dolly(self, amount: float) -> None:
        off = self.eye - self.center
        self.eye = self.center + off * float(np.exp(amount * 0.1))

    def pan(self, dx: float, dy: float) -> None:
        fwd = self.center - self.eye
        r = np.linalg.norm(fwd)
        fwd = fwd / max(r, 1e-9)
        side = np.cross(fwd, self.up)
        side /= max(np.linalg.norm(side), 1e-9)
        upv = np.cross(side, fwd)
        move = (-side * dx + upv * dy) * 0.002 * r
        self.eye = self.eye + move
        self.center = self.center + move

    def camera(self):
        from .models.procedural import look_at_camera

        return look_at_camera(
            self.eye, self.center, self.up, self.fov,
            self.width / self.height, self.focal, self.aperture,
        )

    # -- bookmarks (ImGuiH camera JSON analog, scene.cpp:282) --------------
    def to_dict(self) -> dict:
        return {
            "eye": [float(v) for v in self.eye],
            "center": [float(v) for v in self.center],
            "up": [float(v) for v in self.up],
            "fov": self.fov,
            "focal": self.focal,
            "aperture": self.aperture,
        }

    def from_dict(self, d: dict) -> None:
        self.eye = np.asarray(d["eye"], np.float64)
        self.center = np.asarray(d["center"], np.float64)
        self.up = np.asarray(d.get("up", [0, 1, 0]), np.float64)
        self.fov = float(d.get("fov", self.fov))
        self.focal = float(d.get("focal", self.focal))
        self.aperture = float(d.get("aperture", self.aperture))


def _bookmark_path(scene_arg: str) -> str:
    """Per-scene camera persistence file: next to a real scene file
    (``<scene>.cameras.json``, like the reference's per-scene ImGuiH camera
    JSON), or under the cache dir for procedural scene names."""
    if os.path.exists(scene_arg):
        return scene_arg + ".cameras.json"
    base = os.environ.get(
        "VKRT_SCENE_CACHE", os.path.expanduser("~/.cache/vkrt_scene")
    )
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, f"cameras-{scene_arg}.json")


def load_bookmarks(scene_arg: str) -> list:
    try:
        with open(_bookmark_path(scene_arg)) as f:
            return json.load(f)
    except Exception:
        return []


def save_bookmarks(scene_arg: str, marks: list) -> None:
    try:
        with open(_bookmark_path(scene_arg), "w") as f:
            json.dump(marks, f, indent=1)
    except OSError:
        pass


# ----------------------------------------------------------------------------
# PNG encoding (stdlib only)
# ----------------------------------------------------------------------------

def _png_bytes(img01: np.ndarray) -> bytes:
    h, w, _ = img01.shape
    u8 = (np.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    raw = b"".join(b"\x00" + u8[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _scene_stats(r) -> str:
    """guiStatistics (sample_gui.cpp:330-363): scene inventory."""
    from .ops.tlas import InstancedAccel

    g = r.scene.geometry
    lines = [
        f"triangles {int(g.indices.shape[0]):>10,}",
        f"materials {int(np.asarray(r.scene.materials.ior).shape[0]):>10,}",
        f"textures  {int(np.asarray(r.scene.atlas.x).shape[0]):>10,}",
        f"lights    {int(r.scene.n_lights):>10,}",
    ]
    p = r.packed
    if isinstance(p, InstancedAccel):
        lines += [
            f"instances {int(np.asarray(p.inst.mesh_id).shape[0]):>10,}",
            f"meshes    {int(np.asarray(p.mesh_root).shape[0]):>10,}",
            f"BVH rows  {int(np.asarray(p.blas.rows).shape[0]):>10,}",
        ]
    else:
        rows = int(np.asarray(p.opaque.rows).shape[0]) if p.opaque else 0
        if getattr(p, "alpha", None) is not None:
            rows += int(np.asarray(p.alpha.rows).shape[0])
        lines.append(f"BVH rows  {rows:>10,}")
    return "\n".join(lines)


def _prof_stats(r, t_frame: float, cfg) -> str:
    """guiProfiler (sample_gui.cpp:368-423): per-frame timings + device
    memory in lieu of NVML plots."""
    rays = getattr(r, "last_rays", 0)
    lines = [
        f"frame     {r.frame:>10,}",
        f"spp       {r.frame * cfg.max_samples:>10,}",
        f"ms/frame  {1000 * t_frame:>10.1f}",
        f"Mrays/s   {rays / max(t_frame, 1e-9) / 1e6:>10.2f}",
    ]
    for k, v in getattr(r, "build_times", {}).items():
        lines.append(f"{k:<9s} {v:>9.1f}s")
    try:
        from .utils.profiler import device_memory_stats

        mem = device_memory_stats()
        if mem and mem[0].get("bytes_in_use", -1) >= 0:
            lines.append(
                f"dev mem   {mem[0]['bytes_in_use'] / 2**20:>8.0f}MB"
            )
    except Exception:
        pass
    return "\n".join(lines)


# ----------------------------------------------------------------------------
# Viewer service
# ----------------------------------------------------------------------------

# The control inventory mirrors sample_gui.cpp: camera+aperture (:109-117),
# ray-tracing params incl. all 13 debug modes + pipeline select (:122-193),
# the full tonemapper (:196-242), the sun&sky editor (:247-325), scene
# statistics (:330-363) and the profiler readout (:368-423).
_PAGE = """<!doctype html><html><head><title>vk_raytrace_tpu</title><style>
body{margin:0;background:#111;color:#ccc;font:12px monospace;display:flex}
#img{image-rendering:pixelated;cursor:grab;align-self:flex-start}
#panel{padding:10px;min-width:250px;max-height:100vh;overflow-y:auto}
label{display:block;margin-top:4px}
input[type=range]{width:130px;vertical-align:middle}
select{background:#222;color:#ccc}
details{margin-top:8px;border-top:1px solid #333;padding-top:4px}
summary{color:#ca8;cursor:pointer}
.v{color:#8ac;display:inline-block;width:44px;text-align:right}
#stats,#prof{margin-top:8px;white-space:pre;color:#8c8}
.pl{margin-top:4px;color:#589}
.pl canvas{display:block;background:#181818;border:1px solid #333}
#pick{margin-top:8px;white-space:pre;color:#88c}
</style></head><body>
<img id="img" width="__W__" height="__H__">
<div id="panel">
 <b>vk_raytrace_tpu viewer</b>
 <details open><summary>camera</summary>
  <label>fov <span class="v" id="v_fov">60</span><input type="range" id="fov" min="10" max="120" step="1" value="60"></label>
  <label>aperture <span class="v" id="v_aperture">0</span><input type="range" id="aperture" min="0" max="0.5" step="0.005" value="0"></label>
  <label>focal dist <span class="v" id="v_focal">0</span><input type="range" id="focal" min="0" max="60" step="0.2" value="0"></label>
 </details>
 <details open><summary>ray tracing</summary>
  <label>max depth <span class="v" id="v_depth">__D__</span><input type="range" id="depth" min="1" max="10" step="1" value="__D__"></label>
  <label>samples/frame <span class="v" id="v_spp">1</span><input type="range" id="spp" min="1" max="8" step="1" value="1"></label>
  <label>max frames <span class="v" id="v_maxframes">0</span><input type="range" id="maxframes" min="0" max="4096" step="16" value="0"></label>
  <label>pbr model <select id="pbr"><option value="1">glTF</option><option value="0">Disney</option></select></label>
  <label>renderer <select id="renderer"><option value="fused">fused (Pallas)</option><option value="wide">wide (XLA)</option></select></label>
  <label>debug mode <select id="debug">
   <option value="0">none</option><option value="1">base color</option>
   <option value="2">normal</option><option value="3">metallic</option>
   <option value="4">emissive</option><option value="5">alpha</option>
   <option value="6">roughness</option><option value="7">texcoord</option>
   <option value="8">tangent</option><option value="9">radiance</option>
   <option value="10">weight</option><option value="11">ray dir</option>
   <option value="12">heatmap</option></select></label>
  <label><input type="checkbox" id="pause"> pause</label>
 </details>
 <details><summary>tonemapper</summary>
  <label>curve <select id="tonemode"><option value="0">Uncharted2</option>
   <option value="1">Hejl-Richard</option><option value="2">ACES</option></select></label>
  <label>exposure <span class="v" id="v_exposure">0</span><input type="range" id="exposure" min="-4" max="4" step="0.1" value="0"></label>
  <label>brightness <span class="v" id="v_brightness">1</span><input type="range" id="brightness" min="0.1" max="3" step="0.05" value="1"></label>
  <label>contrast <span class="v" id="v_contrast">1</span><input type="range" id="contrast" min="0.1" max="3" step="0.05" value="1"></label>
  <label>saturation <span class="v" id="v_saturation">1</span><input type="range" id="saturation" min="0" max="2" step="0.05" value="1"></label>
  <label>vignette <span class="v" id="v_vignette">0</span><input type="range" id="vignette" min="0" max="2" step="0.05" value="0"></label>
  <label>auto exposure <select id="autoexp"><option value="0">off</option>
   <option value="1">global</option><option value="3">local</option></select></label>
  <label><input type="checkbox" id="dither"> dither</label>
 </details>
 <details><summary>sun &amp; sky</summary>
  <label><input type="checkbox" id="sunsky" __SS__> enabled</label>
  <label>azimuth <span class="v" id="v_azimuth">80</span><input type="range" id="azimuth" min="-180" max="180" step="2" value="80"></label>
  <label>elevation <span class="v" id="v_elevation">15</span><input type="range" id="elevation" min="1" max="89" step="1" value="15"></label>
  <label>haze <span class="v" id="v_haze">0</span><input type="range" id="haze" min="0" max="15" step="0.25" value="0"></label>
  <label>red-blue shift <span class="v" id="v_rbshift">0</span><input type="range" id="rbshift" min="-1" max="1" step="0.05" value="0"></label>
  <label>sky saturation <span class="v" id="v_skysat">1</span><input type="range" id="skysat" min="0" max="1" step="0.05" value="1"></label>
  <label>horizon height <span class="v" id="v_horizon">0</span><input type="range" id="horizon" min="-1" max="1" step="0.02" value="0"></label>
  <label>horizon blur <span class="v" id="v_horizonblur">0.1</span><input type="range" id="horizonblur" min="0" max="1" step="0.02" value="0.1"></label>
  <label>sun disk intensity <span class="v" id="v_sundisk">1</span><input type="range" id="sundisk" min="0" max="5" step="0.1" value="1"></label>
  <label>sun disk scale <span class="v" id="v_sunscale">1</span><input type="range" id="sunscale" min="0.1" max="10" step="0.1" value="1"></label>
  <label>sun glow <span class="v" id="v_sunglow">1</span><input type="range" id="sunglow" min="0" max="5" step="0.1" value="1"></label>
 </details>
 <details open><summary>bookmarks</summary>
  <button id="bmsave">save view</button> <button id="bmclear">clear</button>
  <div id="bmlist"></div>
 </details>
 <details open><summary>statistics</summary><div id="stats"></div></details>
 <details open><summary>profiler</summary><div id="prof"></div>
  <div id="plots">
   <div class="pl">ms/frame <canvas id="pl_ms" width="230" height="36"></canvas></div>
   <div class="pl">Mrays/s <canvas id="pl_mrays" width="230" height="36"></canvas></div>
   <div class="pl">dev mem MB <canvas id="pl_mem" width="230" height="36"></canvas></div>
  </div></details>
 <div id="pick">click image to pick (sets orbit pivot)</div>
</div>
<script>
const img = document.getElementById('img');
let drag = null;
function post(o){fetch('/control',{method:'POST',body:JSON.stringify(o)});}
img.onmousedown = e => {drag = [e.clientX, e.clientY, e.shiftKey]; e.preventDefault();};
window.onmouseup = e => {
  if (drag && Math.abs(e.clientX-drag[0])<2 && Math.abs(e.clientY-drag[1])<2) {
    const r = img.getBoundingClientRect();
    fetch('/pick?x='+Math.round(e.clientX-r.left)+'&y='+Math.round(e.clientY-r.top))
      .then(r=>r.json()).then(j=>{document.getElementById('pick').textContent=JSON.stringify(j,null,1);});
  }
  drag = null;
};
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (Math.abs(dx)+Math.abs(dy) < 2) return;
  post(drag[2] ? {cmd:'pan',dx:dx,dy:dy} : {cmd:'orbit',dx:dx,dy:dy});
  drag = [e.clientX, e.clientY, drag[2]];
};
img.onwheel = e => {post({cmd:'dolly',amount:Math.sign(e.deltaY)}); e.preventDefault();};
const sliders = ['fov','aperture','focal','depth','spp','maxframes','exposure','brightness',
 'contrast','saturation','vignette','azimuth','elevation','haze','rbshift',
 'skysat','horizon','horizonblur','sundisk','sunscale','sunglow'];
for (const id of sliders)
  document.getElementById(id).oninput = e => {
    const el = document.getElementById('v_'+id);
    if (el) el.textContent = e.target.value;
    post({cmd:'set',key:id,value:+e.target.value});
  };
for (const id of ['debug','pbr','tonemode','autoexp'])
  document.getElementById(id).onchange = e => post({cmd:'set',key:id,value:+e.target.value});
document.getElementById('renderer').onchange = e => post({cmd:'set',key:'renderer',value:e.target.value});
document.getElementById('bmsave').onclick = () => post({cmd:'bookmark_save'});
document.getElementById('bmclear').onclick = () => post({cmd:'bookmark_clear'});
let bmCount = -1;
function renderBookmarks(n){
  if (n === bmCount) return; bmCount = n;
  const el = document.getElementById('bmlist'); el.innerHTML = '';
  for (let i = 0; i < n; i++) {
    const b = document.createElement('button');
    b.textContent = 'cam ' + (i+1);
    b.onclick = () => post({cmd:'bookmark_goto',index:i});
    el.appendChild(b);
  }
}
for (const id of ['pause','dither','sunsky'])
  document.getElementById(id).onchange = e => post({cmd:'set',key:id,value:e.target.checked?1:0});
function spark(id, xs){
  const c = document.getElementById(id), g = c.getContext('2d');
  g.clearRect(0, 0, c.width, c.height);
  if (!xs || xs.length < 2) return;
  const lo = Math.min(...xs), hi = Math.max(...xs), span = (hi - lo) || 1;
  g.strokeStyle = '#8ac'; g.beginPath();
  xs.forEach((v, i) => {
    const x = i * (c.width - 2) / (xs.length - 1) + 1;
    const y = c.height - 2 - (v - lo) * (c.height - 4) / span;
    i ? g.lineTo(x, y) : g.moveTo(x, y);
  });
  g.stroke();
  g.fillStyle = '#589'; g.font = '9px monospace';
  g.fillText(hi.toFixed(1), 2, 9);
  g.fillText(lo.toFixed(1), 2, c.height - 2);
}
async function tick(){
  img.src = '/frame.png?t=' + Date.now();
  const s = await (await fetch('/state')).json();
  document.getElementById('stats').textContent = s.stats || '';
  document.getElementById('prof').textContent = (s.busy ? 'BUSY: loading scene...\n' : '') + (s.prof || '');
  renderBookmarks(s.bookmarks || 0);
  if (s.hist) { spark('pl_ms', s.hist.ms); spark('pl_mrays', s.hist.mrays); spark('pl_mem', s.hist.mem); }
}
setInterval(tick, 700); tick();
</script></body></html>"""


class ViewerService:
    def __init__(self, args):
        self.args = args
        self._lock = threading.Lock()
        self._controls = []
        self._frame_png = _png_bytes(np.zeros((args.size[1], args.size[0], 3)))
        self._state = {"frame": 0, "spp": 0, "ms_per_frame": 0}
        self._stop = False
        self._busy = False
        self._bookmarks = load_bookmarks(args.scene)
        self._scene_path = args.scene if os.path.exists(args.scene) else None
        self._mtime = os.path.getmtime(self._scene_path) if self._scene_path else 0

    # -- render thread -----------------------------------------------------
    def run_render_loop(self):
        import dataclasses

        from . import cli as C
        from . import render as R
        from .models.schema import RenderConfig

        args = self.args
        scene, env = C.load_scene_from_args(args)
        self._scene0 = scene  # pristine (un-baked sun&sky, instances intact)
        w, h = args.size
        cfg = RenderConfig(
            width=w, height=h, max_depth=args.depth, max_samples=1,
            firefly_clamp=10.0,
            hdr_multiplier=1.0 if env is not None else 0.0,
            use_sun_sky=bool(args.sun_sky),
        )
        r = R.Renderer(scene, cfg)
        pos = np.asarray(scene.geometry.positions)
        bounds = (pos.min(axis=0), pos.max(axis=0)) if len(pos) else None
        cam = OrbitCamera(scene.camera, w, h, bounds=bounds)
        self._cam = cam
        pause = False
        t_frame = 0.0
        sunsky = scene.sun_sky
        descale_left = 0  # frames left to render at 1/DS (drag in progress)

        r_small = [None]  # lazy interaction-descale renderer (keyed to cfg)

        def rebuild(new_cfg, new_sunsky=None):
            """Path-parameter edit: retrace but KEEP the acceleration
            structures (createRender semantics, sample_example.cpp:322-337).
            A sun&sky edit re-bakes the env map (cached by param hash)."""
            nonlocal cfg, r, sunsky
            cfg = new_cfg
            if new_sunsky is not None:
                sunsky = new_sunsky
            sc = self._scene0._replace(
                sun_sky=sunsky, camera=cam.camera(), instances=None
            )
            r = R.Renderer(sc, cfg, tonemapper=r.tonemapper, packed=r.packed)
            r_small[0] = None  # cfg changed: rebuild the descaled twin lazily

        # Interaction descaling (sample_example.cpp:410-415): while the
        # camera is being dragged, render at 1/DS resolution through a twin
        # renderer sharing the acceleration structures, and upscale for
        # display; full-resolution accumulation restarts when the drag ends.
        DS = max(1, int(os.environ.get("VKRT_VIEW_DESCALE", "4")))

        def get_small():
            if r_small[0] is None and DS > 1:
                import dataclasses

                scfg = dataclasses.replace(
                    cfg, width=max(8, w // DS), height=max(8, h // DS)
                )
                sc = self._scene0._replace(
                    sun_sky=sunsky, camera=cam.camera(), instances=None
                )
                r_small[0] = R.Renderer(
                    sc, scfg, tonemapper=r.tonemapper, packed=r.packed
                )
            return r_small[0]

        def set_sunsky(**kw):
            import jax.numpy as jnp

            vals = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
            rebuild(cfg, new_sunsky=sunsky._replace(**vals))

        _sun_az, _sun_el = [80.0], [15.0]  # slider state (degrees)

        def sun_dir():
            az = np.radians(_sun_az[0])
            el = np.radians(_sun_el[0])
            return np.asarray(
                [np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)],
                np.float32,
            )

        # Monotonic observability counters: transient flags (descaled) can
        # slip between an observer's polls, so the state also carries total
        # descaled frames presented and accumulation resets (race-free for
        # tests and dashboards).
        n_desc = 0
        n_resets = 0
        # Per-frame history ring for the live utilization plots (the NVML
        # sampling-thread analog, nvml_monitor.hpp:56-176: a ring of
        # measurements the GUI plots as curves). Device memory is an RPC
        # over the tunnel, so it is sampled every 8th frame and held.
        from collections import deque

        hist_ms: deque = deque(maxlen=120)
        hist_mrays: deque = deque(maxlen=120)
        hist_mem: deque = deque(maxlen=120)
        last_mem = [-1.0]

        def _sample_mem(frame_no: int) -> float:
            if last_mem[0] < 0 or frame_no % 8 == 0:
                try:
                    from .utils.profiler import device_memory_stats

                    m = device_memory_stats()
                    if m and m[0].get("bytes_in_use", -1) >= 0:
                        last_mem[0] = m[0]["bytes_in_use"] / 2**20
                except Exception:
                    pass
            return last_mem[0]
        while not self._stop:
            # Apply queued UI controls (camera -> reset accumulation;
            # tonemap -> repost only; path params -> rebuild, reuse accel).
            with self._lock:
                controls, self._controls = self._controls, []
            dirty_cam = False
            for c in controls:
                cmd = c.get("cmd")
                if cmd == "_swap":
                    # async reload finished (see _load_async below)
                    self._scene0 = c["scene"]
                    r = c["renderer"]
                    cam = c["cam"]
                    self._cam = cam
                    continue
                if cmd == "bookmark_save":
                    self._bookmarks.append(cam.to_dict())
                    save_bookmarks(args.scene, self._bookmarks)
                    continue
                if cmd == "bookmark_goto":
                    i = int(c.get("index", -1))
                    if 0 <= i < len(self._bookmarks):
                        cam.from_dict(self._bookmarks[i])
                        dirty_cam = True
                    continue
                if cmd == "bookmark_clear":
                    self._bookmarks = []
                    save_bookmarks(args.scene, self._bookmarks)
                    continue
                if cmd == "orbit":
                    cam.orbit(c["dx"], c["dy"]); dirty_cam = True
                elif cmd == "dolly":
                    cam.dolly(c["amount"]); dirty_cam = True
                elif cmd == "pan":
                    cam.pan(c["dx"], c["dy"]); dirty_cam = True
                elif cmd == "pivot":
                    cam.set_pivot(c["p"]); dirty_cam = True
                elif cmd == "set":
                    key, val = c["key"], c["value"]
                    import jax.numpy as jnp

                    f32 = lambda v: jnp.asarray(v, jnp.float32)
                    if key == "pause":
                        pause = bool(val)
                    # -- camera (guiCamera + aperture, sample_gui.cpp:109-117)
                    elif key == "fov":
                        cam.fov = float(val); dirty_cam = True
                    elif key == "aperture":
                        cam.aperture = float(val); dirty_cam = True
                    elif key == "focal":
                        cam.focal = float(val); dirty_cam = True
                    # -- tonemapper (guiTonemapper :196-242): repost only ----
                    elif key == "exposure":
                        # avg_lum is toneMap's exposure multiplier
                        # (tonemapping.glsl:86-88).
                        r.tonemapper = r.tonemapper._replace(
                            avg_lum=f32(2.0 ** val))
                    elif key in ("brightness", "contrast", "saturation",
                                 "vignette"):
                        r.tonemapper = r.tonemapper._replace(**{key: f32(val)})
                    elif key == "autoexp":
                        r.tonemapper = r.tonemapper._replace(
                            auto_exposure=jnp.asarray(int(val), jnp.int32))
                    elif key == "dither":
                        r.tonemapper = r.tonemapper._replace(
                            dither=jnp.asarray(int(val), jnp.int32))
                    elif key == "tonemode":
                        r.tone_mode = int(val)
                    # -- ray tracing (guiRayTracing :122-193) ----------------
                    elif key == "depth":
                        rebuild(dataclasses.replace(cfg, max_depth=int(val)))
                        dirty_cam = True
                    elif key == "spp":
                        rebuild(dataclasses.replace(cfg, max_samples=int(val)))
                        dirty_cam = True
                    elif key == "maxframes":
                        # Convergence stop ("max iterations",
                        # sample_gui.cpp:122-193); 0 = default 100000.
                        # Host-side gate only: no retrace, no accum reset.
                        mf = int(val) if val else 100000
                        cfg = dataclasses.replace(cfg, max_frames=mf)
                        r.cfg = dataclasses.replace(r.cfg, max_frames=mf)
                    elif key == "debug":
                        rebuild(dataclasses.replace(cfg, debug_mode=int(val)))
                        dirty_cam = True
                    elif key == "pbr":
                        rebuild(dataclasses.replace(cfg, pbr_mode=int(val)))
                        dirty_cam = True
                    elif key == "renderer":
                        # Pipeline switch (sample_gui.cpp:180-189): the back
                        # end is chosen at trace time, so clear the jit caches
                        # and retrace (createRender rebuilds pipelines too).
                        os.environ["VKRT_FUSED"] = (
                            "1" if val == "fused" else "0")
                        R.render_pool.clear_cache()
                        R.render_strip.clear_cache()
                        rebuild(cfg)
                        dirty_cam = True
                    # -- sun & sky editor (guiEnvironment :247-325) ----------
                    elif key == "sunsky":
                        rebuild(dataclasses.replace(cfg, use_sun_sky=bool(val)))
                        dirty_cam = True
                    elif key in ("azimuth", "elevation"):
                        (_sun_az if key == "azimuth" else _sun_el)[0] = val
                        set_sunsky(sun_direction=sun_dir()); dirty_cam = True
                    elif key == "haze":
                        set_sunsky(haze=val); dirty_cam = True
                    elif key == "rbshift":
                        set_sunsky(redblueshift=val); dirty_cam = True
                    elif key == "skysat":
                        set_sunsky(saturation=val); dirty_cam = True
                    elif key == "horizon":
                        set_sunsky(horizon_height=val); dirty_cam = True
                    elif key == "horizonblur":
                        set_sunsky(horizon_blur=val); dirty_cam = True
                    elif key == "sundisk":
                        set_sunsky(sun_disk_intensity=val); dirty_cam = True
                    elif key == "sunscale":
                        set_sunsky(sun_disk_scale=val); dirty_cam = True
                    elif key == "sunglow":
                        set_sunsky(sun_glow_intensity=val); dirty_cam = True
            if dirty_cam:
                r.scene = r.scene._replace(camera=cam.camera())
                r.reset()
                n_resets += 1
                descale_left = 2 if DS > 1 else 0

            # Asset hot-reload (drop/reload analog). The reference loads on
            # a detached thread behind a busy flag so the frame loop keeps
            # presenting (main.cpp:183-191, sample_example.cpp:119-162);
            # same here: the scene build + Renderer construction run on a
            # worker thread and the finished renderer is swapped in at the
            # top of a frame. The old scene keeps rendering meanwhile.
            if self._scene_path and not self._busy:
                m = os.path.getmtime(self._scene_path)
                if m != self._mtime:
                    self._mtime = m
                    self._busy = True

                    def _load_async(cfg=cfg, tm=r.tonemapper):
                        try:
                            scene, env = C.load_scene_from_args(args)
                            nr = R.Renderer(scene, cfg, tonemapper=tm)
                            pos = np.asarray(scene.geometry.positions)
                            nc = OrbitCamera(
                                scene.camera, w, h,
                                bounds=(pos.min(axis=0), pos.max(axis=0))
                                if len(pos) else None,
                            )
                            with self._lock:
                                self._controls.append(
                                    {"cmd": "_swap", "scene": scene,
                                     "renderer": nr, "cam": nc}
                                )
                        except Exception:
                            pass
                        finally:
                            self._busy = False

                    threading.Thread(target=_load_async, daemon=True).start()

            if pause or r.converged:
                # converged: m_maxFrames reached (sample_example.cpp:407-408)
                # — keep serving the finished image, stop tracing.
                time.sleep(0.1)
                continue

            t0 = time.time()
            was_descaled = descale_left > 0 and DS > 1
            if descale_left > 0 and get_small() is not None:
                # Interacting: one fast frame at 1/DS, upscaled for display;
                # full-res accumulation stays reset until the drag ends.
                rs = get_small()
                rs.scene = rs.scene._replace(camera=cam.camera())
                rs.tonemapper = r.tonemapper
                rs.tone_mode = getattr(r, "tone_mode", 0)
                rs.reset()
                rs.step()
                img = np.asarray(rs.postprocess())
                img = img.repeat(DS, axis=0).repeat(DS, axis=1)[:h, :w]
                descale_left -= 1
                n_desc += 1
            else:
                r.step()
                img = np.asarray(r.postprocess())
            t_frame = time.time() - t0
            png = _png_bytes(img)
            hist_ms.append(round(1000 * t_frame, 2))
            hist_mrays.append(
                round(getattr(r, "last_rays", 0) / max(t_frame, 1e-9) / 1e6, 3)
            )
            mem_mb = _sample_mem(r.frame)
            if mem_mb >= 0:
                hist_mem.append(round(mem_mb, 1))
            with self._lock:
                self._frame_png = png
                self._renderer = r
                self._state = {
                    "frame": r.frame,
                    "busy": self._busy,
                    "descaled": was_descaled,
                    "descale_frames": n_desc,
                    "resets": n_resets,
                    "bookmarks": len(self._bookmarks),
                    "stats": _scene_stats(r),
                    "prof": _prof_stats(r, t_frame, cfg),
                    "hist": {
                        "ms": list(hist_ms),
                        "mrays": list(hist_mrays),
                        "mem": list(hist_mem),
                    },
                }

    # -- HTTP --------------------------------------------------------------
    def make_handler(service):
        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    with service._lock:
                        png = service._frame_png
                    self._send(200, "image/png", png)
                elif self.path.startswith("/state"):
                    with service._lock:
                        st = dict(service._state)
                    self._send(200, "application/json", json.dumps(st).encode())
                elif self.path.startswith("/pick"):
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    try:
                        x = int(q["x"][0]); y = int(q["y"][0])
                        with service._lock:
                            r = getattr(service, "_renderer", None)
                        res = r.pick(x, y) if r else None
                        if res:
                            res = {k: (v.tolist() if hasattr(v, "tolist") else v)
                                   for k, v in res.items()}
                            # Pick re-targets the orbit pivot (the reference
                            # sets the camera interest point the same way,
                            # sample_example.cpp:493-510).
                            if "position" in res:
                                with service._lock:
                                    service._controls.append(
                                        {"cmd": "pivot", "p": res["position"]}
                                    )
                        self._send(200, "application/json",
                                   json.dumps(res).encode())
                    except Exception as e:
                        self._send(500, "text/plain", str(e).encode())
                else:
                    w, h = service.args.size
                    page = (_PAGE.replace("__W__", str(w))
                            .replace("__H__", str(h))
                            .replace("__D__", str(service.args.depth))
                            .replace("__SS__", "checked" if getattr(
                                service.args, "sun_sky", False) else ""))
                    self._send(200, "text/html", page.encode())

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    c = json.loads(self.rfile.read(n) or b"{}")
                    with service._lock:
                        service._controls.append(c)
                    self._send(200, "application/json", b"{}")
                except Exception as e:
                    self._send(400, "text/plain", str(e).encode())

        return H


def main(argv=None) -> int:
    from .cli import build_parser

    p = argparse.ArgumentParser(parents=[build_parser()], add_help=False,
                                conflict_handler="resolve")
    p.add_argument("--port", type=int, default=8722)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; must be set via jax.config)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    svc = ViewerService(args)
    t = threading.Thread(target=svc.run_render_loop, daemon=True)
    t.start()
    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), svc.make_handler())
    print(f"viewer: http://localhost:{args.port}/  (scene={args.scene})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    svc._stop = True
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
