"""Interactive web viewer: an async render service + browser client.

The reference ships a GLFW/ImGui desktop app whose core concurrency rule is
that ONE worker owns all GPU state and serializes training steps with view
renders (gui/worker.jl:46-58). This module re-imagines that layer for the
TPU build as a tiny HTTP render service: a lock serializes every device
render (the "single owner" protocol), and the browser client implements the
reference's FPV (WASD + mouse-look) and orbit controls (render_state.jl)
against a /frame endpoint.

Zero external dependencies: http.server + PIL JPEG + vanilla JS.

Usage:
    python -m gsplat_tpu view out.safetensors --port 8000
    # or
    Viewer(model, camera).serve(port=8000)
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from io import BytesIO
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax

from .camera import Camera
from .ops.rasterize import RasterizerConfig, render

_PAGE = """<!DOCTYPE html>
<html><head><title>gsplat_tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; overflow:hidden }
#hud { position:fixed; top:8px; left:8px; background:#0008; padding:6px 10px;
       border-radius:4px; pointer-events:none; white-space:pre }
img { display:block; width:100vw; height:100vh; object-fit:contain; cursor:grab }
</style></head><body>
<img id="view"><div id="hud">loading...</div>
<script>
let az=0.5, el=0.3, dist=6, tgt=[0,0,0], busy=false, dirty=true, t0=0, fps=0;
const img=document.getElementById('view'), hud=document.getElementById('hud');
function pose(){
  const ce=Math.cos(el), se=Math.sin(el), ca=Math.cos(az), sa=Math.sin(az);
  const eye=[tgt[0]+dist*ce*ca, tgt[1]+dist*se, tgt[2]+dist*ce*sa];
  return {ex:eye[0],ey:eye[1],ez:eye[2],tx:tgt[0],ty:tgt[1],tz:tgt[2]};
}
async function tick(){
  if(!dirty||busy){ requestAnimationFrame(tick); return }
  busy=true; dirty=false; t0=performance.now();
  const p=pose();
  const q=Object.entries(p).map(([k,v])=>k+'='+v.toFixed(4)).join('&');
  const r=await fetch('/frame?'+q);
  const b=await r.blob();
  img.src=URL.createObjectURL(b);
  fps=1000/(performance.now()-t0);
  hud.textContent=`orbit: drag | zoom: wheel | pan: shift-drag\\n`+
    `az=${az.toFixed(2)} el=${el.toFixed(2)} dist=${dist.toFixed(2)}  ${fps.toFixed(1)} fps`;
  busy=false; requestAnimationFrame(tick);
}
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY,e.shiftKey];};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(drag[2]){ // pan
    const s=dist*0.002, ca=Math.cos(az), sa=Math.sin(az);
    tgt[0]+=s*(dx*sa); tgt[2]-=s*(dx*ca); tgt[1]+=s*dy;
  } else { az+=dx*0.008; el=Math.min(1.5,Math.max(-1.5,el+dy*0.008)); }
  drag=[e.clientX,e.clientY,drag[2]]; dirty=true;
};
window.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001); dirty=true;};
requestAnimationFrame(tick);
</script></body></html>"""


class Viewer:
    """Serves interactive renders of a GaussianModel over HTTP.

    All device work goes through `self._lock` — the single-owner protocol
    that lets a live training loop share the device with the viewer.
    """

    def __init__(
        self,
        model,
        camera: Camera | None = None,
        *,
        width: int = 1024,
        height: int = 576,
        max_instances: int | None = None,
    ):
        self.model = model
        on_tpu = jax.default_backend() == "tpu"
        self.config = RasterizerConfig(
            width=width,
            height=height,
            mode="rgb",
            max_instances=max_instances or ((1 << 21) if on_tpu else (1 << 16)),
            impl="pallas" if on_tpu else "scan",
        )
        self.base_camera = camera or Camera.create(
            width=width, height=height,
            focal=np.array([0.8 * width, 0.8 * width], np.float32),
        )
        self._lock = threading.Lock()
        self.last_render_ms = 0.0

    def render_frame(self, eye, target) -> bytes:
        from PIL import Image

        from .camera import look_at

        R, t = look_at(np.asarray(eye), np.asarray(target))
        cam = self.base_camera.replace(
            R=R, t=t, width=self.config.width, height=self.config.height
        )
        with self._lock:  # single owner of device state
            t0 = time.perf_counter()
            img, _ = render(
                *self.model.render_args(),
                camera=cam,
                config=self.config,
                sh_degree=self.model.max_sh_degree,
            )
            arr = np.clip(np.asarray(img[..., :3]) * 255, 0, 255).astype(np.uint8)
            self.last_render_ms = 1000 * (time.perf_counter() - t0)
        buf = BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def info(self) -> dict:
        return {
            "n_gaussians": int(self.model.n_alive),
            "sh_degree": self.model.max_sh_degree,
            "resolution": [self.config.width, self.config.height],
            "impl": self.config.impl,
            "last_render_ms": round(self.last_render_ms, 1),
        }

    def serve(self, port: int = 8000, host: str = "127.0.0.1"):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif u.path == "/frame":
                    q = {k: float(v[0]) for k, v in parse_qs(u.query).items()}
                    eye = [q.get("ex", 5.0), q.get("ey", 1.0), q.get("ez", 0.0)]
                    tgt = [q.get("tx", 0.0), q.get("ty", 0.0), q.get("tz", 0.0)]
                    try:
                        self._send(200, "image/jpeg", viewer.render_frame(eye, tgt))
                    except Exception as e:  # surface errors to the client
                        self._send(500, "text/plain", str(e).encode())
                elif u.path == "/info":
                    self._send(200, "application/json", json.dumps(viewer.info()).encode())
                else:
                    self._send(404, "text/plain", b"not found")

        server = ThreadingHTTPServer((host, port), Handler)
        print(f"viewer: http://{host}:{port}/  ({viewer.info()})", flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()
