"""Interactive scene viewer: a self-contained HTTP orbit viewer over a
trained experiment (the TPU-era stand-in for the reference's kaolin-wisp GUI,
``app/visualizer/`` — SURVEY.md §2.6 lowest-priority row).

Serves one HTML page with mouse-orbit / scroll-zoom / WASD controls and
rgb / depth / normals view modes; each interaction renders a frame through
the real renderer (low-res by default so CPU is usable; on the TPU it is
interactive). Usage::

    python -m neuralsim_tpu.tools.viewer --config <exp>/config.yaml \
        --resume_dir <exp> [--viewer.port=7007] [--viewer.res=160]
"""
from __future__ import annotations

import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>neuralsim_tpu viewer</title>
<style>body{margin:0;background:#111;color:#ddd;font-family:monospace}
#c{display:block;margin:12px auto;border:1px solid #333;image-rendering:pixelated}
#hud{position:fixed;top:8px;left:12px;font-size:12px;line-height:1.5}</style>
</head><body>
<div id="hud">drag: orbit &middot; wheel: zoom &middot; WASD: pan &middot;
keys 1/2/3: rgb/depth/normals<br><span id="st"></span></div>
<canvas id="c" width="512" height="512"></canvas>
<script>
let az=0.6, el=0.35, dist=2.5, cx=0, cy=0, cz=0, mode='rgb', busy=false, dirty=true;
const cv=document.getElementById('c'), st=document.getElementById('st');
let drag=false, lx=0, ly=0;
cv.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;az-=(e.clientX-lx)*0.01;
 el=Math.max(-1.5,Math.min(1.5,el+(e.clientY-ly)*0.01));lx=e.clientX;ly=e.clientY;dirty=true};
cv.onwheel=e=>{e.preventDefault();dist*=Math.exp(e.deltaY*0.001);dirty=true};
window.onkeydown=e=>{const s=dist*0.05;
 if(e.key=='w')cz-=s; if(e.key=='s')cz+=s; if(e.key=='a')cx-=s; if(e.key=='d')cx+=s;
 if(e.key=='1')mode='rgb'; if(e.key=='2')mode='depth'; if(e.key=='3')mode='normals';
 dirty=true};
async function tick(){
 if(dirty&&!busy){busy=true;dirty=false;
  const t0=performance.now();
  const q=`az=${az}&el=${el}&dist=${dist}&cx=${cx}&cy=${cy}&cz=${cz}&mode=${mode}`;
  const img=new Image();
  img.onload=()=>{cv.getContext('2d').drawImage(img,0,0,cv.width,cv.height);
   st.textContent=`${mode} | ${(performance.now()-t0).toFixed(0)} ms`;busy=false};
  img.onerror=()=>{busy=false};
  img.src='/render?'+q;}
 requestAnimationFrame(tick);}
tick();
</script></body></html>"""


def _orbit_c2w(az, el, dist, center):
    """OpenCV camera orbiting ``center``."""
    fwd = -np.array([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)])
    eye = center - fwd * dist
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-9
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


class ViewerState:
    def __init__(self, renderer, params, res: int, occ=None):
        self.renderer = renderer
        self.params = params
        self.res = res
        self.occ = occ
        self.lock = threading.Lock()

    def render(self, q: Dict[str, str]) -> bytes:
        import jax.numpy as jnp
        from ..scene.observers.cameras_math import get_rays
        from ..utils.logger import color_depth
        az, el = float(q.get("az", 0.6)), float(q.get("el", 0.35))
        dist = float(q.get("dist", 2.5))
        center = np.array([float(q.get("cx", 0)), float(q.get("cy", 0)),
                           float(q.get("cz", 0))])
        mode = q.get("mode", "rgb")
        R = self.res
        f = R * 0.9
        intr = jnp.asarray([[f, 0, R / 2], [0, f, R / 2], [0, 0, 1]],
                           jnp.float32)
        ys, xs = np.meshgrid(np.arange(R) + 0.5, np.arange(R) + 0.5,
                             indexing="ij")
        xy = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
        ro, rd = get_rays(xy, intr, jnp.asarray(_orbit_c2w(az, el, dist,
                                                           center),
                                                jnp.float32))
        with self.lock:
            r = self.renderer.render_chunked(
                self.params, ro, rd, rayschunk=R * R, occ_states=self.occ,
                query_overrides={"perturb": False})
        if mode == "depth":
            img = color_depth(np.asarray(r["depth_volume"]).reshape(R, R))
        elif mode == "normals" and "normals_volume" in r:
            img = np.asarray(r["normals_volume"]).reshape(R, R, 3) * 0.5 + 0.5
        else:
            img = np.asarray(r["rgb_volume"]).reshape(R, R, 3)
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)
                        ).save(buf, "PNG")
        return buf.getvalue()


def serve(state: ViewerState, port: int = 7007):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/render":
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    png = state.render(q)
                except Exception as e:  # pragma: no cover
                    self.send_error(500, str(e))
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            else:
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())

    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"viewer at http://localhost:{port}  (ctrl-c to stop)", flush=True)
    httpd.serve_forever()


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    from .train import build_everything
    from ..utils.checkpoint import CheckpointIO
    _, scene, bank, renderer, trainer, loader = build_everything(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    state = trainer.init_state(key, params=params)
    restored = CheckpointIO(os.path.join(exp_dir, "ckpts")).load(
        state, cfg.get("ckpt"))
    occ = None
    if restored is not None:
        st = (type(state)(*restored) if not isinstance(restored, type(state))
              else restored)
        params = st.params
        occ = st.occ
    vcfg = cfg.get("viewer", {})
    state_v = ViewerState(renderer, params, int(vcfg.get("res", 160)),
                          occ=occ)
    serve(state_v, int(vcfg.get("port", 7007)))


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu viewer").parse(argv))


if __name__ == "__main__":
    main()
