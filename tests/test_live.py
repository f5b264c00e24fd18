"""Live drive server (cli.live — web_nav.py live-half equivalent):
endpoints serve, the depth feed renders, and click-to-drive retargets the
real dispatcher."""

import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
PORT = 8991


def _get(path, timeout=5):
    with urllib.request.urlopen(f"http://localhost:{PORT}{path}",
                                timeout=timeout) as r:
        return r.read()


def _post(path, body):
    req = urllib.request.Request(f"http://localhost:{PORT}{path}",
                                 data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.read()


@pytest.fixture(scope="module")
def live_server():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "nclt_slam_tpu.cli.live",
         "--route", "09_se_ne", "--mode", "gt", "--port", str(PORT),
         "--scale", "0.25", "--teach-ticks", "300", "--ticks", "2000",
         "--chunk", "25", "--max-chunks", "40", "--platform", "cpu"],
        cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    # wait for the server + first chunk (teach + compile take a while on CPU)
    deadline = time.time() + 420
    state = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise RuntimeError(f"live server died:\n{out[-3000:]}")
        try:
            state = json.loads(_get("/state.json"))
            if state.get("tick", 0) >= 25:
                break
        except Exception:
            pass
        time.sleep(2)
    assert state and state.get("tick", 0) >= 25, "no first chunk in time"
    yield proc
    proc.kill()
    proc.wait()


def test_live_endpoints(live_server):
    page = _get("/").decode()
    assert "live drive" in page
    scene = json.loads(_get("/scene.json"))
    assert scene["obstacles"] and scene["wps"] and len(scene["bounds"]) == 4
    png = _get("/depth.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    state = json.loads(_get("/state.json"))
    assert state["gt"] and state["n_wps"] > 0


def test_live_click_to_drive(live_server):
    """POST /goal retargets the dispatcher; the robot converges on it."""
    state = json.loads(_get("/state.json"))
    x0, y0 = state["gt"][-1]
    goal = {"x": x0 + 6.0, "y": y0 + 4.0}
    _post("/goal", goal)
    deadline = time.time() + 300
    best = 1e9
    while time.time() < deadline:
        s = json.loads(_get("/state.json"))
        if s.get("goal"):
            gx, gy = s["gt"][-1]
            best = min(best, np.hypot(gx - goal["x"], gy - goal["y"]))
            if best < 3.5 or not s.get("running", True):
                break
        time.sleep(2)
    assert best < 3.5, f"never approached clicked goal (best {best:.1f} m)"


def test_live_stop_pauses(live_server):
    _post("/ctl", {"cmd": "stop"})
    # the server flips state.json "paused" only once the drive loop has
    # parked between chunks (an in-flight chunk may land first); from that
    # point the tick counter must hold still
    deadline = time.time() + 240
    s = json.loads(_get("/state.json"))
    while time.time() < deadline:
        s = json.loads(_get("/state.json"))
        if s.get("paused") or not s.get("running", True):
            break
        time.sleep(2)
    assert s.get("paused") or not s.get("running", True), \
        "server never parked after STOP"
    t1 = s["tick"]
    time.sleep(4)
    t3 = json.loads(_get("/state.json"))["tick"]
    _post("/ctl", {"cmd": "go"})
    assert t3 == t1, "ticks kept advancing while STOPped"
