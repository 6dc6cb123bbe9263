"""Interactive web viewer: an async render service + browser client.

The reference ships a GLFW/ImGui desktop app (src/gui/) whose core pieces are

  - a single worker that owns all GPU state and serializes training steps
    with view renders (gui/worker.jl:46-58, 410-496),
  - FPV (WASD + mouse-look) and orbit camera controllers
    (gui/render_state.jl:101-208),
  - a dataset-camera frustum overlay with image thumbnails
    (gui/frustums.jl),
  - a training-details window with live per-term log-scale loss curves and
    a full params readout (gui/training_details.jl:78-110).

This module re-imagines that layer for the TPU build as a tiny HTTP render
service plus a browser client:

  - `Viewer` serves renders of a static model; a lock serializes every
    device render (the "single owner" protocol).
  - `TrainingViewer` adds the live-training layer: a background worker
    thread advances the Trainer in chunk-sized bursts, draining start/stop/
    save commands between bursts exactly like the reference worker drains
    its command channel between steps; `/losses` exposes LossTracker
    snapshots and the client draws the reference's log-scale loss curves.
  - The client implements both FPV (pointer-lock mouse-look + WASD/QE) and
    orbit controllers, and projects dataset-camera frusta onto the view
    with the same look_at convention as `camera.py` (click a frustum to
    jump into that view and see its ground-truth thumbnail).

Zero external dependencies: http.server + PIL JPEG + vanilla JS.

Usage:
    python -m gsplat_tpu view out.safetensors --port 8000
    python -m gsplat_tpu app <colmap_dir> --port 8000   # live training
"""
from __future__ import annotations

import json
import os
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
#stage { position:relative; width:100vw; height:100vh }
#view { display:block; width:100%; height:100%; object-fit:contain; cursor:grab }
#overlay { position:absolute; inset:0; pointer-events:none }
#thumb { position:fixed; bottom:8px; left:8px; max-width:240px; border:1px solid #555;
         display:none }
#panel { position:fixed; top:0; right:0; width:340px; height:100vh; background:#000c;
         padding:10px; box-sizing:border-box; overflow-y:auto; display:none }
#panel h3 { margin:6px 0; font-size:13px; color:#9cf }
#panel button { background:#223; color:#ddd; border:1px solid #446; padding:4px 10px;
                margin:2px; cursor:pointer; font:12px monospace }
#panel button:hover { background:#335 }
#curves { width:318px; height:200px; background:#0a0a14; border:1px solid #333 }
#params { font-size:11px; white-space:pre; color:#aaa; max-height:300px; overflow-y:auto }
#legend span { margin-right:10px }
.stat { color:#9f9 }
</style></head><body>
<div id="stage"><img id="view"><canvas id="overlay"></canvas></div>
<div id="hud">loading...</div>
<img id="thumb">
<div id="panel">
  <h3>training</h3>
  <div id="tstat">-</div>
  <div>
    <button id="btnstart">start</button>
    <button id="btnstop">stop</button>
    <button id="btnsave">save checkpoint</button>
    <button id="btndensify">densify on/off</button>
    <button id="btnexport">export PLY</button>
  </div>
  <h3>file</h3>
  <div id="filemenu">
    <input id="dspath" placeholder="dataset dir (server path)" style="width:200px">
    scale <input id="dsscale" value="" style="width:30px">
    <select id="dsstrat"><option>default</option><option>mcmc</option><option>none</option></select><br>
    <label><input type="checkbox" id="fbil">bilateral</label>
    <label><input type="checkbox" id="fdep">depth</label>
    <label><input type="checkbox" id="fsky">sky</label>
    <label><input type="checkbox" id="fnrm">normal</label>
    <label><input type="checkbox" id="fpose">pose</label>
    <button id="btnopends">open dataset</button><br>
    <input id="ckpath" placeholder="checkpoint / .ply (server path)" style="width:200px">
    <button id="btnopenck">open model</button>
    <button id="btnclose">close scene</button>
  </div>
  <h3>loss curves (log10)</h3>
  <canvas id="curves" width="318" height="200"></canvas>
  <div id="legend"></div>
  <h3>params</h3>
  <div id="params">-</div>
</div>
<script>
'use strict';
// ---------------------------------------------------------------- state
let az=0.5, el=0.3, dist=6, tgt=[0,0,0];          // orbit controller
let fpv=false, eye=[5,1,0], yaw=Math.PI, pitch=0; // FPV controller
let busy=false, dirty=true, fps=0, live=false, training=false;
let frusta=[], showFrusta=true, pickedCam=-1;
const keys=new Set();
const img=document.getElementById('view'), hud=document.getElementById('hud');
const ov=document.getElementById('overlay'), thumb=document.getElementById('thumb');

// ---------------------------------------------------------------- pose math
// Mirrors camera.look_at: +z forward, y down in camera space, world y up.
function norm(v){const l=Math.hypot(v[0],v[1],v[2])||1;return [v[0]/l,v[1]/l,v[2]/l]}
function cross(a,b){return [a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],a[0]*b[1]-a[1]*b[0]]}
function sub(a,b){return [a[0]-b[0],a[1]-b[1],a[2]-b[2]]}
function pose(){
  if(fpv){
    const cp=Math.cos(pitch), fwd=[cp*Math.cos(yaw), Math.sin(pitch), cp*Math.sin(yaw)];
    return {eye:eye.slice(), target:[eye[0]+fwd[0],eye[1]+fwd[1],eye[2]+fwd[2]]};
  }
  const ce=Math.cos(el), se=Math.sin(el), ca=Math.cos(az), sa=Math.sin(az);
  return {eye:[tgt[0]+dist*ce*ca, tgt[1]+dist*se, tgt[2]+dist*ce*sa], target:tgt.slice()};
}
function w2cOf(p){ // rows: right, down, fwd (matches camera.look_at)
  const fwd=norm(sub(p.target,p.eye));
  let right=cross(fwd,[0,1,0]);
  if(Math.hypot(...right)<1e-8) right=cross(fwd,[1,0,0]);
  right=norm(right);
  const down=cross(fwd,right);
  return {R:[right,down,fwd], eye:p.eye};
}

// ---------------------------------------------------------------- frustum overlay
function drawFrusta(){
  const ctx=ov.getContext('2d');
  ov.width=ov.clientWidth; ov.height=ov.clientHeight;
  ctx.clearRect(0,0,ov.width,ov.height);
  if(!showFrusta||!frusta.length||!img.naturalWidth) return;
  const cam=w2cOf(pose());
  // object-fit:contain mapping from render pixels to element pixels
  const s=Math.min(ov.width/img.naturalWidth, ov.height/img.naturalHeight);
  const ox=(ov.width-img.naturalWidth*s)/2, oy=(ov.height-img.naturalHeight*s)/2;
  const fx=serverInfo.focal[0], fy=serverInfo.focal[1];
  const cx=img.naturalWidth/2, cy=img.naturalHeight/2;
  function proj(p){
    const d=sub(p,cam.eye), R=cam.R;
    const z=R[2][0]*d[0]+R[2][1]*d[1]+R[2][2]*d[2];
    if(z<1e-3) return null;
    const x=(R[0][0]*d[0]+R[0][1]*d[1]+R[0][2]*d[2])/z*fx+cx;
    const y=(R[1][0]*d[0]+R[1][1]*d[1]+R[1][2]*d[2])/z*fy+cy;
    return [x*s+ox, y*s+oy];
  }
  ctx.lineWidth=1;
  frusta.forEach((f,i)=>{
    const C=f.c2w, apex=[C[3],C[7],C[11]];
    const d=f.depth;
    const cs=[[-f.w2,-f.h2],[f.w2,-f.h2],[f.w2,f.h2],[-f.w2,f.h2]].map(([u,v])=>[
      C[0]*u*d+C[1]*v*d+C[2]*d+C[3],
      C[4]*u*d+C[5]*v*d+C[6]*d+C[7],
      C[8]*u*d+C[9]*v*d+C[10]*d+C[11]]);
    const pa=proj(apex), pc=cs.map(proj);
    if(!pa||pc.some(p=>!p)) return;
    ctx.strokeStyle=i===pickedCam?'#ff0':(f.test?'#f80':'#4af');
    ctx.beginPath();
    for(const p of pc){ctx.moveTo(pa[0],pa[1]);ctx.lineTo(p[0],p[1]);}
    ctx.moveTo(pc[3][0],pc[3][1]);
    for(const p of pc) ctx.lineTo(p[0],p[1]);
    ctx.stroke();
    f._px=pa;
  });
}
function pickFrustum(x,y){
  let best=-1,bd=400;
  frusta.forEach((f,i)=>{
    if(!f._px) return;
    const d=(f._px[0]-x)**2+(f._px[1]-y)**2;
    if(d<bd){bd=d;best=i;}
  });
  return best;
}
function jumpToCam(i){
  const C=frusta[i].c2w;
  eye=[C[3],C[7],C[11]];
  const fwd=[C[2],C[6],C[10]];
  yaw=Math.atan2(fwd[2],fwd[0]); pitch=Math.asin(Math.max(-1,Math.min(1,fwd[1])));
  fpv=true; pickedCam=i; dirty=true;
  thumb.src='/thumb?i='+frusta[i].i; thumb.style.display='block';
}

// ---------------------------------------------------------------- render loop
let serverInfo={focal:[800,800]};
async function tick(){
  // FPV movement integration
  if(fpv&&keys.size){
    const cp=Math.cos(pitch), fwd=[cp*Math.cos(yaw),Math.sin(pitch),cp*Math.sin(yaw)];
    let right=norm(cross(fwd,[0,1,0]));
    const sp=0.06*dist;
    const mv=(v,s)=>{eye[0]+=v[0]*s;eye[1]+=v[1]*s;eye[2]+=v[2]*s;dirty=true;};
    if(keys.has('w'))mv(fwd,sp); if(keys.has('s'))mv(fwd,-sp);
    if(keys.has('d'))mv(right,sp); if(keys.has('a'))mv(right,-sp);
    if(keys.has('e'))mv([0,1,0],sp); if(keys.has('q'))mv([0,1,0],-sp);
  }
  if((dirty||(live&&training))&&!busy){
    busy=true; dirty=false; const t0=performance.now();
    const p=pose();
    const q=`ex=${p.eye[0]}&ey=${p.eye[1]}&ez=${p.eye[2]}`+
            `&tx=${p.target[0]}&ty=${p.target[1]}&tz=${p.target[2]}`;
    try{
      const r=await fetch('/frame?'+q);
      if(r.ok){ img.src=URL.createObjectURL(await r.blob()); }
      fps=1000/(performance.now()-t0);
    }catch(e){}
    busy=false;
  }
  drawFrusta();
  hud.textContent=(fpv?'FPV: mouse-look (click to lock) WASD/QE move | TAB: orbit'
                      :'orbit: drag | zoom: wheel | pan: shift-drag | TAB: FPV')+
    `\\nF: frusta ${showFrusta?'on':'off'} | T: training panel`+
    `\\n${fps.toFixed(1)} fps`+(live?` | step ${lastStep}`:'');
  requestAnimationFrame(tick);
}

// ---------------------------------------------------------------- input
document.addEventListener('keydown',e=>{
  const k=e.key.toLowerCase();
  if(k==='tab'){e.preventDefault();fpv=!fpv;if(fpv){const p=pose();eye=p.eye;
    const f=norm(sub(p.target,p.eye));yaw=Math.atan2(f[2],f[0]);pitch=Math.asin(f[1]);}
    else{document.exitPointerLock&&document.exitPointerLock();}
    dirty=true;return;}
  if(k==='f'){showFrusta=!showFrusta;return;}
  if(k==='t'){const p=document.getElementById('panel');
    p.style.display=p.style.display==='none'||!p.style.display?'block':'none';return;}
  keys.add(k);
});
document.addEventListener('keyup',e=>keys.delete(e.key.toLowerCase()));
let drag=null;
img.onmousedown=e=>{
  if(fpv){img.requestPointerLock&&img.requestPointerLock();return;}
  drag=[e.clientX,e.clientY,e.shiftKey];
};
img.onclick=e=>{
  if(drag===null&&!fpv){const i=pickFrustum(e.clientX,e.clientY);if(i>=0)jumpToCam(i);}
};
img.ondblclick=async e=>{
  // Orbit-target picking via a depth render (reference handle_pick!).
  if(fpv||!img.naturalWidth) return;
  const s=Math.min(ov.width/img.naturalWidth, ov.height/img.naturalHeight);
  const ox=(ov.width-img.naturalWidth*s)/2, oy=(ov.height-img.naturalHeight*s)/2;
  const px=(e.clientX-ox)/(img.naturalWidth*s), py=(e.clientY-oy)/(img.naturalHeight*s);
  if(px<0||px>1||py<0||py>1) return;
  const p=pose();
  const q=`ex=${p.eye[0]}&ey=${p.eye[1]}&ez=${p.eye[2]}`+
          `&tx=${p.target[0]}&ty=${p.target[1]}&tz=${p.target[2]}&px=${px}&py=${py}`;
  const r=await (await fetch('/pick?'+q)).json();
  if(r.point){
    dist=Math.hypot(r.point[0]-p.eye[0],r.point[1]-p.eye[1],r.point[2]-p.eye[2]);
    tgt=r.point; dirty=true;
  }
};
window.onmouseup=()=>{setTimeout(()=>drag=null,0);};
window.onmousemove=e=>{
  if(fpv&&document.pointerLockElement===img){
    yaw+=e.movementX*0.003; pitch=Math.max(-1.5,Math.min(1.5,pitch-e.movementY*0.003));
    dirty=true; return;
  }
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(Math.abs(dx)+Math.abs(dy)<2) return;
  if(drag[2]){
    const s=dist*0.002, ca=Math.cos(az), sa=Math.sin(az);
    tgt[0]+=s*(dx*sa); tgt[2]-=s*(dx*ca); tgt[1]+=s*dy;
  } else { az+=dx*0.008; el=Math.min(1.5,Math.max(-1.5,el+dy*0.008)); }
  drag=[e.clientX,e.clientY,drag[2]]; dirty=true;
};
window.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001); dirty=true;};

// ---------------------------------------------------------------- training panel
let lastStep=0;
const TERM_COLORS={total:'#fff',l1:'#4af',ssim:'#f4a',depth:'#4fa',normal:'#fa4',
                   sky:'#a4f',bilateral_tv:'#ff4',scale_reg:'#888',opacity_reg:'#8f8'};
async function pollTraining(){
  if(!live) return;
  try{
    const s=await (await fetch('/info')).json();
    training=s.training; lastStep=s.step;
    document.getElementById('tstat').innerHTML=
      `step <span class=stat>${s.step}</span>  gaussians <span class=stat>${s.n_gaussians}</span><br>`+
      `loss <span class=stat>${(s.loss??0).toFixed(5)}</span>  `+
      `<span class=stat>${(s.steps_per_s??0).toFixed(1)}</span> steps/s  `+
      `${s.training?'RUNNING':'paused'}`;
    const h=await (await fetch('/losses')).json();
    drawCurves(h);
  }catch(e){}
  setTimeout(pollTraining, training?1500:4000);
}
function drawCurves(h){
  const cv=document.getElementById('curves'), ctx=cv.getContext('2d');
  ctx.fillStyle='#0a0a14'; ctx.fillRect(0,0,cv.width,cv.height);
  const steps=h.steps||[];
  if(steps.length<2) return;
  let lo=1/0, hi=-1/0; const used=[];
  for(const [term,vals] of Object.entries(h.curves||{})){
    if(!vals.some(v=>v>0)) continue;
    used.push(term);
    for(const v of vals) if(v>0){const l=Math.log10(v); lo=Math.min(lo,l); hi=Math.max(hi,l);}
  }
  if(!used.length) return;
  hi+=0.1; lo-=0.1;
  const x=i=>i/(steps.length-1)*(cv.width-8)+4;
  const y=l=>(1-(l-lo)/(hi-lo))*(cv.height-8)+4;
  ctx.strokeStyle='#333';
  for(let g=Math.ceil(lo);g<=hi;g++){ctx.beginPath();ctx.moveTo(0,y(g));ctx.lineTo(cv.width,y(g));ctx.stroke();
    ctx.fillStyle='#666';ctx.fillText('1e'+g,4,y(g)-2);}
  for(const term of used){
    ctx.strokeStyle=TERM_COLORS[term]||'#999'; ctx.beginPath();
    let pen=false;
    h.curves[term].forEach((v,i)=>{
      if(v<=0){pen=false;return;}
      const px=x(i), py=y(Math.log10(v));
      pen?ctx.lineTo(px,py):ctx.moveTo(px,py); pen=true;
    });
    ctx.stroke();
  }
  document.getElementById('legend').innerHTML=used.map(t=>
    `<span style="color:${TERM_COLORS[t]||'#999'}">${t}</span>`).join('');
}
document.getElementById('btnstart').onclick=()=>fetch('/train?cmd=start');
document.getElementById('btndensify').onclick=async()=>{
  const i=await (await fetch('/info')).json();
  fetch('/train?cmd=densify&on='+(i.densify?0:1));
};
document.getElementById('btnexport').onclick=async()=>{
  const r=await (await fetch('/export')).json(); alert('exported '+r.path);
};
document.getElementById('btnstop').onclick=()=>fetch('/train?cmd=stop');
async function openUrl(u){
  const r=await fetch(u);
  if(!r.ok){alert('open failed: '+await r.text());return;}
  const j=await r.json(); alert('opened '+JSON.stringify(j));
  try{frusta=await (await fetch('/frustums')).json();}catch(e){frusta=[];}
  pickedCam=-1; thumb.style.display='none'; dirty=true;
}
document.getElementById('btnopends').onclick=()=>{
  const p=document.getElementById('dspath').value; if(!p) return;
  let u='/open?dataset='+encodeURIComponent(p);
  const sc=document.getElementById('dsscale').value;
  if(sc) u+='&scale='+sc;
  u+='&strategy='+document.getElementById('dsstrat').value;
  for(const [id,k] of [['fbil','bilateral'],['fdep','depth'],['fsky','sky'],
                       ['fnrm','normal'],['fpose','pose']])
    if(document.getElementById(id).checked) u+='&'+k+'=1';
  openUrl(u);
};
document.getElementById('btnopenck').onclick=()=>{
  const p=document.getElementById('ckpath').value; if(!p) return;
  openUrl('/open?model='+encodeURIComponent(p));
};
document.getElementById('btnclose').onclick=async()=>{
  await fetch('/close'); frusta=[]; pickedCam=-1; thumb.style.display='none'; dirty=true;
};
document.getElementById('btnsave').onclick=async()=>{
  const r=await (await fetch('/save')).json(); alert('saved '+r.path);
};

// ---------------------------------------------------------------- init
(async function(){
  serverInfo=await (await fetch('/info')).json();
  live='training' in serverInfo;
  if(live){document.getElementById('panel').style.display='block';
    const p=await (await fetch('/params')).text();
    document.getElementById('params').textContent=p;
    pollTraining();}
  try{frusta=await (await fetch('/frustums')).json();}catch(e){frusta=[];}
  requestAnimationFrame(tick);
})();
</script></body></html>"""


class Viewer:
    """Serves interactive renders of a GaussianModel over HTTP.

    All device work goes through `self._lock` — the single-owner protocol
    that lets a live training loop share the device with the viewer
    (reference: gui/worker.jl:46-58).
    """

    def __init__(
        self,
        model,
        camera: Camera | None = None,
        *,
        width: int = 1024,
        height: int = 576,
        max_instances: int | None = None,
        dataset=None,
    ):
        self.model = model
        self.dataset = dataset
        on_tpu = jax.default_backend() == "tpu"
        # chunk=32: sub-chunk instance-table alignment — a forward-only
        # layout (the viewer never differentiates) that cuts the alignment
        # padding ~4x at interactive tile grids; 38.9 -> 49.6 FPS at 1080p,
        # image-identical (benchmark/micro15.py).
        self.config = RasterizerConfig(
            width=width,
            height=height,
            mode="rgb",
            max_instances=max_instances or ((1 << 20) if on_tpu else (1 << 16)),
            impl="pallas" if on_tpu else "scan",
            chunk=32,
        )
        self.base_camera = camera or Camera.create(
            width=width, height=height,
            focal=np.array([0.8 * width, 0.8 * width], np.float32),
        )
        self._lock = threading.Lock()
        self.last_render_ms = 0.0

    # ------------------------------------------------------------- rendering
    def _current_model(self):
        return self.model

    def _regrow_on_overflow(self, img, aux, model, cam, config=None):
        """A truncated (instance-budget overflow) render fills only the
        lowest tiles and leaves the rest black — grow the budget to the
        observed demand (+headroom) and re-render, like the Trainer's
        overflow rollback. Must be called under self._lock."""
        import dataclasses

        cfg = config or self.config
        for _ in range(4):
            if not bool(aux["overflow"]):
                break
            demand = int(aux["p_instances"])
            grown = max(2 * cfg.max_instances, demand * 9 // 8 + 1024)
            cfg = dataclasses.replace(cfg, max_instances=grown)
            print(f"[viewer] instance budget overflow (demand {demand}); "
                  f"growing to {grown}", flush=True)
            img, aux = render(
                *model.render_args(), camera=cam, config=cfg,
                sh_degree=model.max_sh_degree,
            )
        # Persist the grown budget even when rendering under a mode override
        # (e.g. pick_point's rgbd config) so the next render/pick doesn't
        # repeat the grow loop and its recompiles.
        if cfg.max_instances > self.config.max_instances:
            self.config = dataclasses.replace(
                self.config, max_instances=cfg.max_instances)
        return img, aux

    def render_frame(self, eye, target) -> bytes:
        from PIL import Image

        from .camera import look_at

        R, t = look_at(np.asarray(eye), np.asarray(target))
        cam = self.base_camera.replace(
            R=R, t=t, width=self.config.width, height=self.config.height
        )
        with self._lock:  # single owner of device state
            model = self._current_model()
            t0 = time.perf_counter()
            img, aux = render(
                *model.render_args(),
                camera=cam,
                config=self.config,
                sh_degree=model.max_sh_degree,
            )
            img, aux = self._regrow_on_overflow(img, aux, model, cam)
            arr = np.clip(np.asarray(img[..., :3]) * 255, 0, 255).astype(np.uint8)
            self.last_render_ms = 1000 * (time.perf_counter() - t0)
        buf = BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def pick_point(self, eye, target, px: float, py: float):
        """Un-project the clicked pixel to a world point using a depth
        render — the reference's double-click orbit-target picking
        (gui/worker.jl handle_pick!, :688-726). Returns None when the click
        hits empty space (transmittance ~1)."""
        from .camera import look_at

        R, t = look_at(np.asarray(eye), np.asarray(target))
        cam = self.base_camera.replace(
            R=R, t=t, width=self.config.width, height=self.config.height
        )
        import dataclasses

        cfg = dataclasses.replace(self.config, mode="rgbd")
        with self._lock:
            model = self._current_model()
            img, _aux = render(
                *model.render_args(), camera=cam, config=cfg,
                sh_degree=model.max_sh_degree,
            )
            img, _aux = self._regrow_on_overflow(img, _aux, model, cam, config=cfg)
            x = int(np.clip(px * cfg.width, 0, cfg.width - 1))
            y = int(np.clip(py * cfg.height, 0, cfg.height - 1))
            depth = float(np.asarray(img[y, x, 3]))
        if not np.isfinite(depth) or depth <= 1e-6:
            return None
        # Pixel ray in camera space (+z forward, y down), scaled to depth.
        fx, fy = float(cam.focal[0]), float(cam.focal[1])
        cx, cy = cfg.width * float(cam.principal[0]), cfg.height * float(cam.principal[1])
        pc = np.array([(x - cx) / fx * depth, (y - cy) / fy * depth, depth])
        Rw = np.asarray(R)
        world = Rw.T @ (pc - np.asarray(t))
        return [float(v) for v in world]

    # ------------------------------------------------------------- metadata
    def info(self) -> dict:
        return {
            "n_gaussians": int(self._current_model().n_alive),
            "sh_degree": self._current_model().max_sh_degree,
            "resolution": [self.config.width, self.config.height],
            "focal": [float(self.base_camera.focal[0]), float(self.base_camera.focal[1])],
            "impl": self.config.impl,
            "last_render_ms": round(self.last_render_ms, 1),
        }

    def frustums(self) -> list:
        """Dataset-camera frusta for the client overlay (gui/frustums.jl).

        Each entry carries the c2w matrix plus the half-extents of the image
        plane at unit depth, so the client can place the frustum rectangle
        with the camera's true aspect/fov."""
        if self.dataset is None:
            return []
        depth = 0.15 * float(getattr(self.dataset, "camera_extent", 1.0) or 1.0)
        out = []
        test = set(getattr(self.dataset, "test_ids", []) or [])
        for i, cam in enumerate(self.dataset.cameras):
            c2w = np.asarray(cam.c2w)[:3, :4]
            out.append({
                "i": i,
                "c2w": [round(float(v), 5) for v in c2w.ravel()],
                "w2": round(0.5 * cam.width / float(cam.focal[0]), 4),
                "h2": round(0.5 * cam.height / float(cam.focal[1]), 4),
                "depth": round(depth, 4),
                "test": i in test,
            })
        return out

    def thumbnail(self, i: int) -> bytes:
        """Downscaled ground-truth view i as JPEG (frustum thumbnails)."""
        from PIL import Image

        img = np.asarray(self.dataset.images[i])
        arr = np.clip(img * 255, 0, 255).astype(np.uint8)
        im = Image.fromarray(arr)
        im.thumbnail((256, 256))
        buf = BytesIO()
        im.save(buf, "JPEG", quality=80)
        return buf.getvalue()

    # ------------------------------------------------------------- routing
    def handle(self, path: str, q: dict):
        """Return (code, content_type, body) or None if unhandled."""
        if path == "/":
            return 200, "text/html", _PAGE.encode()
        if path == "/frame":
            eye = [q.get("ex", 5.0), q.get("ey", 1.0), q.get("ez", 0.0)]
            tgt = [q.get("tx", 0.0), q.get("ty", 0.0), q.get("tz", 0.0)]
            return 200, "image/jpeg", self.render_frame(eye, tgt)
        if path == "/info":
            return 200, "application/json", json.dumps(self.info()).encode()
        if path == "/frustums":
            return 200, "application/json", json.dumps(self.frustums()).encode()
        if path == "/thumb" and self.dataset is not None:
            return 200, "image/jpeg", self.thumbnail(int(q.get("i", 0)))
        if path == "/pick":
            eye = [q.get("ex", 5.0), q.get("ey", 1.0), q.get("ez", 0.0)]
            tgt = [q.get("tx", 0.0), q.get("ty", 0.0), q.get("tz", 0.0)]
            pt = self.pick_point(eye, tgt, float(q.get("px", 0.5)), float(q.get("py", 0.5)))
            return 200, "application/json", json.dumps({"point": pt}).encode()
        if path == "/export":
            from .models.gaussians import export_ply

            out = os.path.join(
                getattr(self, "out_dir", "."), "viewer_export.ply"
            )
            with self._lock:
                export_ply(self._current_model(), out)
            return 200, "application/json", json.dumps({"path": out}).encode()
        if path == "/open":
            return self._open(q)
        return None

    @staticmethod
    def _load_model_file(path: str):
        if path.endswith(".ply"):
            from .models.gaussians import import_ply

            return import_ply(path)
        from .io.checkpoint import load_checkpoint

        state, _cam, _meta = load_checkpoint(path)
        return state.model

    def _open(self, q: dict):
        """File-menu open (reference gui.jl:206-258): swap the viewed model
        for a checkpoint/PLY from the server's filesystem — the web
        equivalent of the desktop app's file dialog (the service binds
        loopback by default, same trust domain as the local app)."""
        path = str(q.get("model", ""))
        if not path:
            return 400, "text/plain", b"need model=PATH (.safetensors or .ply)"
        model = self._load_model_file(path)
        with self._lock:
            self.model = model
        return 200, "application/json", json.dumps(
            {"opened": path, "n_gaussians": int(model.n_alive)}
        ).encode()

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
                q = {}
                for k, v in parse_qs(u.query).items():
                    try:
                        q[k] = float(v[0])
                    except ValueError:
                        q[k] = v[0]
                try:
                    r = viewer.handle(u.path, q)
                except Exception as e:  # surface errors to the client
                    r = 500, "text/plain", str(e).encode()
                if r is None:
                    r = 404, "text/plain", b"not found"
                self._send(*r)

        server = ThreadingHTTPServer((host, port), Handler)
        print(f"viewer: http://{host}:{port}/  ({viewer.info()})", flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()


class TrainingViewer(Viewer):
    """Live-training viewer: watch and steer a Trainer from the browser.

    Re-implements the reference RenderWorker protocol
    (gui/worker.jl:410-496, 528-585) for the HTTP service: a background
    worker thread advances training in chunk-sized bursts, and commands
    (start/stop/save) are drained between bursts. View renders and training
    bursts serialize on the same single-owner lock, so the device never
    sees interleaved host state.
    """

    def __init__(self, trainer, *, width: int = 1024, height: int = 576,
                 max_steps: int | None = None, out_dir: str = ".",
                 max_instances: int | None = None):
        super().__init__(
            trainer.state.model,
            width=width, height=height,
            max_instances=max_instances, dataset=trainer.dataset,
        )
        self.trainer = trainer
        self.max_steps = max_steps
        self.out_dir = out_dir
        self._run = threading.Event()
        self._shutdown = threading.Event()
        self._saved_strategy = None
        self._worker = threading.Thread(target=self._train_loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- worker
    def _train_loop(self):
        burst = max(1, self.trainer.chunk_steps)
        while not self._shutdown.is_set():
            if not self._run.wait(timeout=0.2):
                continue
            if self.max_steps is not None and self.trainer.step >= self.max_steps:
                self._run.clear()
                continue
            n = burst
            if self.max_steps is not None:
                n = min(n, self.max_steps - self.trainer.step)
            try:
                with self._lock:  # single owner: no renders mid-burst
                    self.trainer.train(n)
            except Exception as e:
                print(f"training aborted: {e}", flush=True)
                self._run.clear()

    def _current_model(self):
        return self.trainer.state.model

    def stop(self):
        self._run.clear()
        self._shutdown.set()

    # ------------------------------------------------------------- metadata
    def info(self) -> dict:
        d = super().info()
        tr = self.trainer
        sm = tr.losses.smoothed()
        steps_per_s = (
            tr.train_steps_timed / tr.train_time if tr.train_time > 0 else 0.0
        )
        d.update({
            "training": self._run.is_set(),
            "step": int(tr.step),
            "loss": float(sm.get("total", 0.0)),
            "steps_per_s": round(steps_per_s, 2),
            "max_steps": self.max_steps,
            "densify": self.trainer.strategy is not None,
        })
        return d

    # ------------------------------------------------------------- routing
    def handle(self, path: str, q: dict):
        if path == "/train":
            cmd = q.get("cmd", "start")
            if cmd == "start":
                if "steps" in q:
                    self.max_steps = int(self.trainer.step) + int(q["steps"])
                self._run.set()
            elif cmd == "stop":
                self._run.clear()
            elif cmd == "densify":
                # The reference worker's densify atomic flag: commands drain
                # between bursts, so swapping the strategy out/in is safe.
                on = int(q.get("on", 1))
                if on and self._saved_strategy is not None:
                    self.trainer.strategy = self._saved_strategy
                    self._saved_strategy = None
                elif not on and self.trainer.strategy is not None:
                    self._saved_strategy = self.trainer.strategy
                    self.trainer.strategy = None
            return 200, "application/json", json.dumps(self.info()).encode()
        if path == "/losses":
            snap = self.trainer.losses.history.snapshot()
            return 200, "application/json", json.dumps(snap).encode()
        if path == "/params":
            import dataclasses

            p = self.trainer.opt_params
            body = "\n".join(
                f"{f.name:>28} = {getattr(p, f.name)}" for f in dataclasses.fields(p)
            )
            return 200, "text/plain", body.encode()
        if path == "/save":
            from .io.checkpoint import save_checkpoint

            with self._lock:
                step = int(self.trainer.step)
                out = os.path.join(self.out_dir, f"live_{step:06d}.safetensors")
                save_checkpoint(out, self.trainer.state)
            return 200, "application/json", json.dumps({"path": out, "step": step}).encode()
        if path == "/close":
            # Reference "Close scene" (gui.jl:251-257): drop the training
            # scene; the current model stays viewable read-only.
            self._run.clear()
            with self._lock:
                self.model = self.trainer.state.model
                self.dataset = None
                self.max_steps = self.trainer.step
            return 200, "application/json", json.dumps({"closed": True}).encode()
        return super().handle(path, q)

    def _open(self, q: dict):
        """The reference File-menu modal (gui.jl:206-258), web-side:

        - /open?dataset=DIR[&scale=N][&strategy=default|mcmc|none]
          [&holdout=K][&seed=S][&bilateral=0/1][&depth=0/1][&sky=0/1]
          [&normal=0/1][&pose=0/1] — load a COLMAP scene with the modal's
          scale/strategy/feature toggles and rebuild the Trainer;
        - /open?model=PATH — resume a checkpoint (with the current dataset,
          exact Adam/step/SH-ramp resume) or import a PLY as step-0 state.

        Commands drain between training bursts: training is stopped first,
        and the swap happens under the single-owner lock.
        """
        self._run.clear()
        tr = self.trainer
        if q.get("dataset"):
            from .api import _build_trainer, standard_scale
            from .data.colmap import load_colmap

            path = str(q["dataset"])
            scale = int(q.get("scale") or standard_scale(path))
            strategy = str(q.get("strategy", "default"))
            opt = tr.opt_params
            toggles = {
                "bilateral": "use_bilateral_grid", "depth": "use_depth_loss",
                "sky": "use_sky_dome", "normal": "use_normal_loss",
                "pose": "use_pose_opt",
            }
            kw = {f: bool(int(q[k])) for k, f in toggles.items() if k in q}
            if kw:
                opt = opt.replace(**kw)
            ds = load_colmap(path, scale=scale, holdout=int(q.get("holdout", 8)))
            trainer = _build_trainer(
                ds, opt, None if strategy == "none" else strategy,
                max_instances=tr.max_instances, seed=int(q.get("seed", 0)),
            )
            with self._lock:
                self.trainer = trainer
                self.dataset = ds
                self.model = trainer.state.model
                self.max_steps = None
            return 200, "application/json", json.dumps({
                "opened": path, "views": len(ds.cameras),
                "points": len(ds.points), "strategy": strategy, "scale": scale,
            }).encode()
        if q.get("model"):
            path = str(q["model"])
            if self.dataset is None:
                return 409, "text/plain", b"no dataset loaded; open one first"
            from .train.trainer import Trainer

            if path.endswith(".ply"):
                model = self._load_model_file(path)
                trainer = Trainer(
                    model, self.dataset, opt_params=tr.opt_params,
                    strategy=tr.strategy, max_instances=tr.max_instances,
                )
            else:
                trainer = Trainer.from_checkpoint(
                    path, self.dataset, opt_params=tr.opt_params,
                    strategy=tr.strategy, max_instances=tr.max_instances,
                )
            with self._lock:
                self.trainer = trainer
                self.model = trainer.state.model
            return 200, "application/json", json.dumps(
                {"opened": path, "step": int(trainer.step)}
            ).encode()
        return 400, "text/plain", b"need dataset=DIR or model=PATH"
