#!/usr/bin/env python3
"""Web viewer — the reference web_nav.py's observability half, offline.

The reference serves a Flask app with a live MJPEG camera feed and a 2-D
map with the robot trail (simulation/isaac/tools/web_nav.py).  Our rollouts
are batch programs, so the equivalent is a replay/result viewer: a stdlib
HTTP server over a campaign/repeat output directory that shows the metrics
tables, rendered figures, and an interactive canvas replay of the GT/nav
trails scrubbed over time.

    python tools/web_viewer.py --dir runs/campaign --port 8765
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

PAGE = """<!DOCTYPE html>
<html><head><title>nclt_slam_tpu viewer</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; background: #fafafa; }}
 canvas {{ border: 1px solid #ccc; background: white; }}
 table {{ border-collapse: collapse; }}
 td, th {{ border: 1px solid #ddd; padding: 4px 8px; font-size: 13px; }}
 img {{ max-width: 95%; }}
</style></head>
<body>
<h2>nclt_slam_tpu — run viewer</h2>
<div id="metrics">{metrics_html}</div>
<h3>figures</h3>
{figures_html}
<h3>trajectory replay</h3>
<canvas id="cv" width="1000" height="520"></canvas><br>
<input type="range" id="scrub" min="0" max="1000" value="1000" style="width:1000px">
<script>
const traj = {traj_json};
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
function bounds(pts) {{
  let xs = pts.map(p=>p[0]), ys = pts.map(p=>p[1]);
  return [Math.min(...xs), Math.max(...xs), Math.min(...ys), Math.max(...ys)];
}}
function draw(frac) {{
  ctx.clearRect(0,0,cv.width,cv.height);
  if (!traj.gt || !traj.gt.length) {{ ctx.fillText('no trajectory data', 20, 20); return; }}
  const [x0,x1,y0,y1] = bounds(traj.gt);
  const sx = (cv.width-40)/(x1-x0+1e-6), sy = (cv.height-40)/(y1-y0+1e-6);
  const s = Math.min(sx, sy);
  const tx = p => 20 + (p[0]-x0)*s, ty = p => cv.height-20 - (p[1]-y0)*s;
  const n = Math.max(2, Math.floor(traj.gt.length*frac));
  for (const [pts, color] of [[traj.gt.slice(0,n), '#1f77b4'],
                              [(traj.nav||[]).slice(0,n), '#ff7f0e']]) {{
    if (!pts.length) continue;
    ctx.beginPath(); ctx.strokeStyle = color; ctx.lineWidth = 1.5;
    ctx.moveTo(tx(pts[0]), ty(pts[0]));
    for (const p of pts) ctx.lineTo(tx(p), ty(p));
    ctx.stroke();
  }}
  const last = traj.gt[n-1];
  ctx.beginPath(); ctx.fillStyle = '#d62728';
  ctx.arc(tx(last), ty(last), 5, 0, 7); ctx.fill();
}}
document.getElementById('scrub').oninput = e => draw(e.target.value/1000);
draw(1.0);
</script>
</body></html>
"""


def build_page(run_dir: Path) -> str:
    metrics_html = ""
    mp = run_dir / "metrics.json"
    if mp.is_file():
        blob = json.loads(mp.read_text())
        per_route = blob.get("per_route")
        if per_route:
            rows = "".join(
                f"<tr><td>{n}</td><td>{m.get('cov_visited')}/"
                f"{m.get('cov_total')}</td><td>{m.get('final_d'):.1f}</td>"
                f"<td>{m.get('return_d'):.1f}</td>"
                f"<td>{(m.get('drift_mean') or 0):.2f}</td></tr>"
                for n, m in per_route.items())
            metrics_html = ("<table><tr><th>route</th><th>coverage</th>"
                            "<th>reach [m]</th><th>return [m]</th>"
                            "<th>drift [m]</th></tr>" + rows + "</table>")
        else:
            metrics_html = f"<pre>{json.dumps(blob, indent=2)}</pre>"

    figures_html = "".join(
        f'<img src="/{p.name}"><br>' for p in sorted(run_dir.glob("*.png")))

    traj = {"gt": [], "nav": []}
    tg = run_dir / "traj_gt.csv"
    if tg.is_file():
        import numpy as np

        raw = np.loadtxt(tg, delimiter=",", skiprows=1, ndmin=2)
        traj["gt"] = raw[::5, 1:3].round(2).tolist()
        npz = run_dir / "nav_pose.csv"
        if npz.is_file():
            nav = np.loadtxt(npz, delimiter=",", skiprows=1, ndmin=2)
            traj["nav"] = nav[::5, 1:3].round(2).tolist()
    return PAGE.format(metrics_html=metrics_html, figures_html=figures_html,
                       traj_json=json.dumps(traj))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", required=True)
    ap.add_argument("--port", type=int, default=8765)
    args = ap.parse_args(argv)
    run_dir = Path(args.dir)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path in ("/", "/index.html"):
                body = build_page(run_dir).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            else:
                p = run_dir / self.path.lstrip("/")
                if p.is_file() and p.suffix in (".png", ".json", ".csv"):
                    self.send_response(200)
                    ctype = {"png": "image/png", "json": "application/json",
                             "csv": "text/csv"}[p.suffix[1:]]
                    self.send_header("Content-Type", ctype)
                    self.end_headers()
                    self.wfile.write(p.read_bytes())
                else:
                    self.send_error(404)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("0.0.0.0", args.port), Handler)
    print(f"[web_viewer] serving {run_dir} on :{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
