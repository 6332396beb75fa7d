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
    """Eye/pivot orbit state; produces the Camera NamedTuple on demand."""

    def __init__(self, camera, width: int, height: int):
        vi = np.asarray(camera.view_inverse)
        self.eye = vi[:3, 3].copy()
        fwd = -vi[:3, 2]
        self.dist = 3.0
        self.center = self.eye + fwd * self.dist
        self.up = np.array([0.0, 1.0, 0.0])
        self.fov = 45.0
        self.width, self.height = width, height
        self.focal = float(camera.focal_dist)
        self.aperture = float(camera.aperture)

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


# ----------------------------------------------------------------------------
# Viewer service
# ----------------------------------------------------------------------------

_PAGE = """<!doctype html><html><head><title>vk_raytrace_tpu</title><style>
body{margin:0;background:#111;color:#ccc;font:13px monospace;display:flex}
#img{image-rendering:pixelated;cursor:grab}
#panel{padding:10px;min-width:230px}
label{display:block;margin-top:8px}
input[type=range]{width:200px}
#stats{margin-top:12px;white-space:pre;color:#8c8}
#pick{margin-top:12px;white-space:pre;color:#88c}
</style></head><body>
<img id="img" width="__W__" height="__H__">
<div id="panel">
 <b>vk_raytrace_tpu viewer</b>
 <label>exposure <input type="range" id="exposure" min="-4" max="4" step="0.1" value="0"></label>
 <label>max depth <input type="range" id="depth" min="1" max="10" step="1" value="__D__"></label>
 <label>debug mode <select id="debug"><option value="0">none</option>
  <option value="1">metallic</option><option value="2">normal</option>
  <option value="3">albedo</option><option value="4">emissive</option>
  <option value="5">roughness</option><option value="6">texcoord</option>
  <option value="7">tangent</option><option value="10">heatmap</option></select></label>
 <label><input type="checkbox" id="pause"> pause</label>
 <div id="stats"></div>
 <div id="pick">click image to pick</div>
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
for (const id of ['exposure','depth','debug'])
  document.getElementById(id).oninput = e => post({cmd:'set',key:id,value:+e.target.value});
document.getElementById('pause').onchange = e => post({cmd:'set',key:'pause',value:e.target.checked?1:0});
async function tick(){
  img.src = '/frame.png?t=' + Date.now();
  const s = await (await fetch('/state')).json();
  document.getElementById('stats').textContent =
    'frame    ' + s.frame + '\\nspp      ' + s.spp + '\\nms/frame ' + s.ms_per_frame;
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
        w, h = args.size
        cfg = RenderConfig(
            width=w, height=h, max_depth=args.depth, max_samples=1,
            firefly_clamp=10.0,
            hdr_multiplier=1.0 if env is not None else 0.0,
        )
        r = R.Renderer(scene, cfg)
        cam = OrbitCamera(scene.camera, w, h)
        pause = False
        t_frame = 0.0

        while not self._stop:
            # Apply queued UI controls (camera -> reset accumulation;
            # tonemap -> repost only; path params -> rebuild, reuse accel).
            with self._lock:
                controls, self._controls = self._controls, []
            dirty_cam = False
            for c in controls:
                cmd = c.get("cmd")
                if cmd == "orbit":
                    cam.orbit(c["dx"], c["dy"]); dirty_cam = True
                elif cmd == "dolly":
                    cam.dolly(c["amount"]); dirty_cam = True
                elif cmd == "pan":
                    cam.pan(c["dx"], c["dy"]); dirty_cam = True
                elif cmd == "set":
                    key, val = c["key"], c["value"]
                    if key == "pause":
                        pause = bool(val)
                    elif key == "exposure":
                        # avg_lum is toneMap's exposure multiplier
                        # (tonemapping.glsl:86-88).
                        import jax.numpy as jnp

                        r.tonemapper = r.tonemapper._replace(
                            avg_lum=jnp.asarray(2.0 ** val, jnp.float32))
                    elif key in ("depth", "debug"):
                        cfg = dataclasses.replace(
                            cfg,
                            max_depth=int(val) if key == "depth" else cfg.max_depth,
                            debug_mode=int(val) if key == "debug" else cfg.debug_mode,
                        )
                        r = R.Renderer(r.scene, cfg, tonemapper=r.tonemapper,
                                       packed=r.packed)
                        dirty_cam = True  # forces reset below
            if dirty_cam:
                r.scene = r.scene._replace(camera=cam.camera())
                r.reset()

            # Asset hot-reload (drop/reload analog).
            if self._scene_path:
                m = os.path.getmtime(self._scene_path)
                if m != self._mtime:
                    self._mtime = m
                    try:
                        scene, env = C.load_scene_from_args(args)
                        r = R.Renderer(scene, cfg, tonemapper=r.tonemapper)
                        cam = OrbitCamera(scene.camera, w, h)
                    except Exception:
                        pass

            if pause:
                time.sleep(0.1)
                continue

            t0 = time.time()
            r.step()
            img = np.asarray(r.postprocess())
            t_frame = time.time() - t0
            png = _png_bytes(img)
            with self._lock:
                self._frame_png = png
                self._renderer = r
                self._state = {
                    "frame": r.frame,
                    "spp": r.frame * cfg.max_samples,
                    "ms_per_frame": round(1000 * t_frame, 1),
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
                        self._send(200, "application/json",
                                   json.dumps(res).encode())
                    except Exception as e:
                        self._send(500, "text/plain", str(e).encode())
                else:
                    w, h = service.args.size
                    page = (_PAGE.replace("__W__", str(w))
                            .replace("__H__", str(h))
                            .replace("__D__", str(service.args.depth)))
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
