"""Route registry + offline route generator (layer L8 of the reference).

Re-implements the capability of routes/_common/scripts/generate_routes.py:
A* over an inflated 0.5 m occupancy grid of the scene colliders, path
thinning, Chaikin corner-cutting, 0.8 m resampling, and a hairpin turnaround
arc with a blended offset return leg.  Runs offline in numpy (route
generation is a build-time tool, not a hot path); outputs are packed to
fixed-size arrays for the jitted rollout.

The spawn/turnaround registry keeps the reference's authoritative per-route
coordinates (experiments/_baselines_common/route_params.sh,
compute_metrics.py ROUTE_META) so metrics remain comparable.
"""

from __future__ import annotations

import heapq
import math
from typing import NamedTuple

import numpy as np

from nclt_slam_tpu.scene.colliders import SceneColliders, default_scene
from nclt_slam_tpu.scene.terrain import ROAD_WPS

# Fixed capacity of a dense (0.8 m) route polyline incl. turnaround + return.
DENSE_CAP = 768

CLEARANCE = 2.0
ROBOT_R = 0.4
INFLATION = CLEARANCE + ROBOT_R
GRID_MIN = (-105.0, -50.0)
GRID_MAX = (80.0, 45.0)
GRID_RES = 0.5

LT = (-90.0, 35.0)
RT = (65.0, 35.0)
LB = (-90.0, -35.0)
RB = (65.0, -35.0)

# route name -> (spawn, turnaround). Same numbers as the reference registry.
ROUTE_META = {
    "01_road":         {"spawn": (-80.0, -1.4), "turnaround": (70.5, -2.7)},
    "02_north_forest": {"spawn": (-84.4, 4.5), "turnaround": (70.4, -2.3)},
    "03_south":        {"spawn": (-94.9, -6.0), "turnaround": (69.7, -5.1)},
    "04_nw_se":        {"spawn": LT, "turnaround": RB},
    "05_ne_sw":        {"spawn": RT, "turnaround": LB},
    "06_nw_ne":        {"spawn": LT, "turnaround": RT},
    "07_se_sw":        {"spawn": RB, "turnaround": LB},
    "08_nw_sw":        {"spawn": LT, "turnaround": LB},
    "09_se_ne":        {"spawn": RB, "turnaround": RT},
    "10_nmid_smid":    {"spawn": (-20.0, 30.0), "turnaround": (24.75, -31.69)},
    "11_nw_mid":       {"spawn": (-90.0, 35.0), "turnaround": (-24.32, -12.61)},
    "12_ne_mid":       {"spawn": (65.0, 35.0), "turnaround": (-20.9, -1.84)},
    "13_cross_nws":    {"spawn": (-30.0, 20.0), "turnaround": (27.42, -15.53)},
    "14_se_mid":       {"spawn": (65.0, -35.0), "turnaround": (-0.47, 17.48)},
    "15_wmid_smid":    {"spawn": (-61.5, 8.5), "turnaround": (25.5, -31.55)},
}

ALL_ROUTES = list(ROUTE_META.keys())
# Routes 01-03 follow the road / its forest verges rather than A* diagonals.
ROAD_LIKE = {"01_road", "02_north_forest", "03_south"}
ROAD_OFFSET = {"01_road": 0.0, "02_north_forest": 26.0, "03_south": -20.0}


class Route(NamedTuple):
    name: str
    dense_xy: np.ndarray     # (DENSE_CAP, 2) float32 — 0.8 m waypoints, padded
    n_dense: int
    spawn: tuple             # (x, y)
    spawn_yaw: float
    turnaround: tuple        # (x, y)
    turnaround_idx: int      # dense index of the hairpin apex


# ---------------------------------------------------------------------------
# occupancy grid + A*
# ---------------------------------------------------------------------------

def build_grid(scene: SceneColliders) -> np.ndarray:
    W = int(math.ceil((GRID_MAX[0] - GRID_MIN[0]) / GRID_RES))
    H = int(math.ceil((GRID_MAX[1] - GRID_MIN[1]) / GRID_RES))
    xs = GRID_MIN[0] + (np.arange(W) + 0.5) * GRID_RES
    ys = GRID_MIN[1] + (np.arange(H) + 0.5) * GRID_RES
    gx, gy = np.meshgrid(xs, ys)             # (H, W)
    grid = np.zeros((H, W), bool)
    for i in range(scene.xy.shape[0]):
        if not scene.valid[i]:
            continue
        ox, oy = scene.xy[i]
        rr = scene.radius[i] + INFLATION
        grid |= (gx - ox) ** 2 + (gy - oy) ** 2 <= rr * rr
    return grid


def _w2c(x, y):
    return (int((y - GRID_MIN[1]) / GRID_RES), int((x - GRID_MIN[0]) / GRID_RES))


def _c2w(r, c):
    return (GRID_MIN[0] + (c + 0.5) * GRID_RES, GRID_MIN[1] + (r + 0.5) * GRID_RES)


def _nearest_free(grid, cell):
    if not grid[cell]:
        return cell
    H, W = grid.shape
    for rad in range(1, 30):
        for dr in range(-rad, rad + 1):
            for dc in range(-rad, rad + 1):
                r, c = cell[0] + dr, cell[1] + dc
                if 0 <= r < H and 0 <= c < W and not grid[r, c]:
                    return (r, c)
    raise RuntimeError("no free cell near start/goal")


def astar(grid: np.ndarray, start, goal):
    H, W = grid.shape
    s = _nearest_free(grid, _w2c(*start))
    g = _nearest_free(grid, _w2c(*goal))
    nbrs = [(-1, -1, 1.414), (-1, 0, 1.0), (-1, 1, 1.414), (0, -1, 1.0),
            (0, 1, 1.0), (1, -1, 1.414), (1, 0, 1.0), (1, 1, 1.414)]
    came = {}
    gs = {s: 0.0}
    pq = [(0.0, s)]
    while pq:
        _, u = heapq.heappop(pq)
        if u == g:
            break
        for dy, dx, cost in nbrs:
            v = (u[0] + dy, u[1] + dx)
            if not (0 <= v[0] < H and 0 <= v[1] < W) or grid[v]:
                continue
            tg = gs[u] + cost
            if tg < gs.get(v, 1e18):
                gs[v] = tg
                heapq.heappush(pq, (tg + math.hypot(g[0] - v[0], g[1] - v[1]), v))
                came[v] = u
    if g not in came and s != g:
        raise RuntimeError(f"A*: no path {start} -> {goal}")
    path = [g]
    while path[-1] != s:
        path.append(came[path[-1]])
    path.reverse()
    return [_c2w(r, c) for r, c in path]


# ---------------------------------------------------------------------------
# smoothing pipeline
# ---------------------------------------------------------------------------

def thin_path(path, step=3.5):
    out = [path[0]]
    for p in path[1:]:
        if math.hypot(p[0] - out[-1][0], p[1] - out[-1][1]) >= step:
            out.append(p)
    if out[-1] != path[-1]:
        out.append(path[-1])
    return out


def chaikin(path, iters=2):
    pts = [(float(x), float(y)) for x, y in path]
    for _ in range(iters):
        new = [pts[0]]
        for i in range(len(pts) - 1):
            p, q = pts[i], pts[i + 1]
            new.append((0.75 * p[0] + 0.25 * q[0], 0.75 * p[1] + 0.25 * q[1]))
            new.append((0.25 * p[0] + 0.75 * q[0], 0.25 * p[1] + 0.75 * q[1]))
        new.append(pts[-1])
        pts = new
    return pts


def resample_ds(path, ds=0.8):
    xs = np.array([p[0] for p in path])
    ys = np.array([p[1] for p in path])
    t = np.concatenate(([0.0], np.cumsum(np.hypot(np.diff(xs), np.diff(ys)))))
    tt = np.linspace(0.0, t[-1], max(int(t[-1] / ds) + 1, 2))
    return list(zip(np.interp(tt, t, xs).tolist(), np.interp(tt, t, ys).tolist()))


def _obstacle_list(scene: SceneColliders):
    return [(float(scene.xy[i, 0]), float(scene.xy[i, 1]), float(scene.radius[i]))
            for i in range(scene.xy.shape[0]) if scene.valid[i]]


def _uturn(p_last, p_prev, side, radius, n):
    heading = p_last - p_prev
    heading = heading / (np.linalg.norm(heading) + 1e-9)
    perp = np.array([-heading[1], heading[0]]) * side
    center = p_last + perp * radius
    a0 = math.atan2(p_last[1] - center[1], p_last[0] - center[0])
    angs = np.linspace(0.0, math.pi * side, n) + a0
    pts = [(center[0] + radius * math.cos(a), center[1] + radius * math.sin(a))
           for a in angs]
    return pts, perp


def add_turnaround_loop(outbound, obs, radius=1.5, n=18, blend=10):
    """Hairpin: 180° arc tangent to the outbound heading, then a return leg
    offset by 2r that blends back onto the reversed outbound line.  Side and
    radius chosen for >= 1.4 m clearance; falls back to an in-place reverse."""
    p_last = np.array(outbound[-1])
    p_prev = np.array(outbound[-3])
    best = None
    for side in (+1, -1):
        for r in (radius, radius * 0.85, radius * 0.7, radius * 0.55):
            arc, perp = _uturn(p_last, p_prev, side, r, n)
            wc = min((math.hypot(ax - ox, ay - oy) - orad
                      for ax, ay in arc for ox, oy, orad in obs), default=1e9)
            if wc >= 1.4 and (best is None or wc > best[0]):
                best = (wc, arc, perp, r)
                break
    if best is None:
        return outbound + list(reversed(outbound[:-1]))
    _, arc, perp, r = best
    rev = list(reversed(outbound[:-1]))
    shift = 2.0 * r
    ret = []
    for i, (rx, ry) in enumerate(rev):
        w = max(0.0, 1.0 - i / blend) if blend > 0 else 0.0
        ret.append((rx + perp[0] * shift * w, ry + perp[1] * shift * w))
    return outbound + arc + ret


def _road_like_outbound(name, spawn, turnaround, grid):
    """Routes 01-03: follow the road's S-curve (offset into the forest for
    02/03) instead of a corner-to-corner diagonal.  The offset polyline is
    used as a chain of via points and each leg is planned with A* so the
    route keeps the road's shape while clearing scene colliders."""
    off = ROAD_OFFSET[name]
    x0, x1 = spawn[0], turnaround[0]
    xs = np.linspace(x0, x1, 8)
    ys = np.interp(xs, ROAD_WPS[:, 0], ROAD_WPS[:, 1]) + off
    vias = list(zip(xs.tolist(), ys.tolist()))
    vias[0] = spawn
    vias[-1] = turnaround
    raw = []
    for a, b in zip(vias[:-1], vias[1:]):
        leg = astar(grid, a, b)
        raw.extend(leg if not raw else leg[1:])
    return raw


def generate_route(name: str, scene: SceneColliders | None = None,
                   grid: np.ndarray | None = None) -> Route:
    scene = scene if scene is not None else default_scene()
    meta = ROUTE_META[name]
    spawn, turnaround = meta["spawn"], meta["turnaround"]
    obs = _obstacle_list(scene)
    if grid is None:
        grid = build_grid(scene)
    if name in ROAD_LIKE:
        raw = _road_like_outbound(name, spawn, turnaround, grid)
    else:
        raw = astar(grid, spawn, turnaround)
    sm = resample_ds(chaikin(thin_path(raw, 3.5), 2), 0.8)
    turnaround_idx = len(sm) - 1
    full = add_turnaround_loop(sm, obs)
    full = resample_ds(chaikin(full, 1), 0.8)
    n = len(full)
    if n > DENSE_CAP:
        full = full[:DENSE_CAP]
        n = DENSE_CAP
    dense = np.zeros((DENSE_CAP, 2), np.float32)
    dense[:n] = np.asarray(full, np.float32)
    dense[n:] = dense[n - 1]  # pad with last point so masked ops stay sane
    # apex index after final resampling = closest dense point to turnaround
    d = np.hypot(dense[:n, 0] - turnaround[0], dense[:n, 1] - turnaround[1])
    apex = int(np.argmin(d))
    dxy = dense[min(5, n - 1)] - dense[0]
    spawn_yaw = float(math.atan2(dxy[1], dxy[0]))
    return Route(name=name, dense_xy=dense, n_dense=n, spawn=tuple(dense[0]),
                 spawn_yaw=spawn_yaw, turnaround=turnaround, turnaround_idx=apex)


_route_cache: dict[tuple, Route] = {}
_grid_cache: dict[int, np.ndarray] = {}

# Disk cache: offline route generation (Python A* over the inflated grid)
# costs tens of seconds per diagonal route; generated routes for the default
# scene are cached as package data so runtime users just load arrays.
_DATA_DIR = __import__("pathlib").Path(__file__).parent / "data"


def _route_cache_path(name: str, seed: int):
    return _DATA_DIR / f"route_{name}_seed{seed}.npz"


def _load_cached_route(name: str, seed: int) -> Route | None:
    p = _route_cache_path(name, seed)
    if not p.is_file():
        return None
    z = np.load(p)
    return Route(name=name, dense_xy=z["dense_xy"], n_dense=int(z["n_dense"]),
                 spawn=tuple(z["spawn"]), spawn_yaw=float(z["spawn_yaw"]),
                 turnaround=tuple(z["turnaround"]),
                 turnaround_idx=int(z["turnaround_idx"]))


def _save_cached_route(route: Route, seed: int):
    _DATA_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        _route_cache_path(route.name, seed),
        dense_xy=route.dense_xy, n_dense=route.n_dense,
        spawn=np.asarray(route.spawn), spawn_yaw=route.spawn_yaw,
        turnaround=np.asarray(route.turnaround),
        turnaround_idx=route.turnaround_idx)


def get_route(name: str, seed: int = 7) -> Route:
    if name not in ROUTE_META:
        raise KeyError(name)
    key = (name, seed)
    if key not in _route_cache:
        cached = _load_cached_route(name, seed)
        if cached is not None:
            _route_cache[key] = cached
        else:
            scene = default_scene(seed)
            if seed not in _grid_cache:
                _grid_cache[seed] = build_grid(scene)
            _route_cache[key] = generate_route(name, scene, _grid_cache[seed])
            _save_cached_route(_route_cache[key], seed)
    return _route_cache[key]


def get_routes(names=None, seed: int = 7) -> list[Route]:
    return [get_route(n, seed) for n in (names or ALL_ROUTES)]
