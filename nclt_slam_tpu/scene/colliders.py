"""Procedural forest scene → packed collider arrays.

The reference bakes its scene into USD + ``scene_obstacles.json`` (532
collision prims: 357 shrubs, 130 trees, 28 rocks, 7 roadside trees, 6 houses,
4 barrels — convert_gazebo_to_isaac.py).  We regenerate an equivalent forest
procedurally with a fixed seed and compile it to fixed-size arrays that the
depth raycaster and route generator consume directly:

    SceneColliders(xy (N,2), radius (N,), height (N,), kind (N,), valid (N,))

Everything is padded to ``CAPACITY`` so shapes stay static under jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from nclt_slam_tpu.scene.terrain import ROAD_WPS

CAPACITY = 640

# kind ids
KIND_TREE = 0
KIND_SHRUB = 1
KIND_ROCK = 2
KIND_ROADSIDE_TREE = 3
KIND_HOUSE = 4
KIND_BARREL = 5
KIND_DROP = 6          # runtime-dropped repeat obstacles (cones/props/tent)

# (radius, visual height) per kind — cylinders for raycasting
KIND_GEOM = {
    KIND_TREE: (0.7, 9.0),
    KIND_SHRUB: (0.4, 0.9),
    KIND_ROCK: (0.8, 0.7),
    KIND_ROADSIDE_TREE: (0.4, 7.0),
    KIND_HOUSE: (4.5, 5.5),
    KIND_BARREL: (0.5, 0.9),
}

# Scene extent (same working area as the reference forest)
X_MIN, X_MAX = -105.0, 80.0
Y_MIN, Y_MAX = -50.0, 45.0

# Corner anchors used by routes 04-09; keep them clear when scattering.
CORNERS = [(-90.0, 35.0), (65.0, 35.0), (-90.0, -35.0), (65.0, -35.0)]

HOUSES = [(-5.0, -12.0), (55.0, -14.0), (74.0, 10.0), (-60.0, 20.0),
          (25.0, 25.0), (-80.0, -20.0)]


class SceneColliders(NamedTuple):
    xy: np.ndarray       # (CAPACITY, 2) float32
    radius: np.ndarray   # (CAPACITY,) float32
    height: np.ndarray   # (CAPACITY,) float32
    kind: np.ndarray     # (CAPACITY,) int32
    valid: np.ndarray    # (CAPACITY,) bool

    @property
    def count(self) -> int:
        return int(self.valid.sum())


def _road_dist(x, y):
    """Distance from (x, y) to the road polyline (numpy, build-time only)."""
    p = np.array([x, y])
    a = ROAD_WPS[:-1]
    b = ROAD_WPS[1:]
    ab = b - a
    t = np.clip(((p - a) * ab).sum(-1) / (ab * ab).sum(-1), 0.0, 1.0)
    proj = a + t[:, None] * ab
    return float(np.sqrt(((p - proj) ** 2).sum(-1)).min())


def _corridor_polylines():
    """Carve-out corridors that must stay plannable at 2.4 m inflation: the
    road S-curve, its ±offset verges (routes 02/03), and straight segments
    between every route's spawn/turnaround anchor (routes 04-15).  The
    reference reached the same end by hand-thinning TreeCollision prims."""
    road = ROAD_WPS.astype(np.float64)
    lines = [road, road + np.array([0.0, 26.0]), road + np.array([0.0, -20.0])]
    # routes 01-03 spawn/turnaround points: connect each to the road system
    for pt in [(-80.0, -1.4), (70.5, -2.7), (-84.4, 4.5), (70.4, -2.3),
               (-94.9, -6.0), (69.7, -5.1)]:
        nearest_x = float(np.clip(pt[0], road[0, 0], road[-1, 0]))
        road_pt = (nearest_x, float(np.interp(nearest_x, road[:, 0], road[:, 1])))
        lines.append(np.array([pt, road_pt], np.float64))
        lines.append(np.array([pt, (pt[0], road_pt[1] + 26.0)], np.float64))
    # routes 04-15: carve ONLY the actual spawn->turnaround segments (an
    # all-pairs anchor mesh strips the forest so bare along the corridors
    # that the visual pipeline has nothing left to observe)
    route_pairs = [
        ((-90.0, 35.0), (65.0, -35.0)), ((65.0, 35.0), (-90.0, -35.0)),
        ((-90.0, 35.0), (65.0, 35.0)), ((65.0, -35.0), (-90.0, -35.0)),
        ((-90.0, 35.0), (-90.0, -35.0)), ((65.0, -35.0), (65.0, 35.0)),
        ((-20.0, 30.0), (24.75, -31.69)), ((-90.0, 35.0), (-24.32, -12.61)),
        ((65.0, 35.0), (-20.9, -1.84)), ((-30.0, 20.0), (27.42, -15.53)),
        ((65.0, -35.0), (-0.47, 17.48)), ((-61.5, 8.5), (25.5, -31.55)),
    ]
    for a, b in route_pairs:
        lines.append(np.array([a, b], np.float64))
    return lines


def _dist_to_polyline(pts, line):
    """Min distance from each point in pts (N,2) to polyline line (M,2)."""
    a = line[:-1][None]          # (1, M-1, 2)
    b = line[1:][None]
    p = pts[:, None, :]          # (N, 1, 2)
    ab = b - a
    denom = (ab * ab).sum(-1) + 1e-12
    t = np.clip(((p - a) * ab).sum(-1) / denom, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return np.sqrt(((p - proj) ** 2).sum(-1)).min(-1)


def build_scene(seed: int = 7) -> SceneColliders:
    """Scatter a forest with the reference's composition and placement rules:
    vegetation avoids the road corridor and the corner anchors; shrubs grow
    in clumps; corridors between route anchors are kept clear of vegetation
    so every route remains plannable at 2.4 m inflation (the reference
    post-thinned TreeCollision for the same reason)."""
    rng = np.random.RandomState(seed)
    entries = []  # (x, y, r, h, kind)

    corridors = _corridor_polylines()

    def corridor_dist(x, y):
        p = np.array([[x, y]], np.float64)
        return min(float(_dist_to_polyline(p, ln)[0]) for ln in corridors)

    def clear_of_anchors(x, y, r, margin=4.0):
        return all((x - cx) ** 2 + (y - cy) ** 2 > (r + margin) ** 2
                   for cx, cy in CORNERS)

    def clear_of_existing(x, y, r, margin=1.0):
        for ex, ey, er, _, _ in entries:
            if (x - ex) ** 2 + (y - ey) ** 2 < (r + er + margin) ** 2:
                return False
        return True

    for hx, hy in HOUSES:
        r, h = KIND_GEOM[KIND_HOUSE]
        entries.append((hx, hy, r, h, KIND_HOUSE))

    # vegetation must leave (2.4 m inflation + slack) around every corridor
    CORRIDOR_CLEAR = 3.2

    def placeable(x, y, r, road_min, margin):
        if not (X_MIN + 3 < x < X_MAX - 3 and Y_MIN + 3 < y < Y_MAX - 3):
            return False
        if _road_dist(x, y) < road_min + r:
            return False
        if corridor_dist(x, y) < CORRIDOR_CLEAR + r:
            return False
        if not clear_of_anchors(x, y, r):
            return False
        return clear_of_existing(x, y, r, margin)

    def scatter(n, kind, road_min, margin=1.0, clump=0, max_tries=60):
        r, h = KIND_GEOM[kind]
        placed = 0
        tries = 0
        while placed < n and tries < n * max_tries:
            tries += 1
            x = rng.uniform(X_MIN + 3, X_MAX - 3)
            y = rng.uniform(Y_MIN + 3, Y_MAX - 3)
            if not placeable(x, y, r, road_min, margin):
                continue
            entries.append((x, y, r, h, kind))
            placed += 1
            # clumped growth: satellites tight around the seed plant
            for _ in range(clump and int(rng.randint(0, clump))):
                if placed >= n:
                    break
                ang = rng.uniform(0, 2 * np.pi)
                d = rng.uniform(0.8, 1.8)
                sx, sy = x + d * np.cos(ang), y + d * np.sin(ang)
                if placeable(sx, sy, r, road_min, margin=-2.0 * r):
                    entries.append((sx, sy, r, h, kind))
                    placed += 1
        return placed

    scatter(130, KIND_TREE, road_min=4.0, margin=3.0, clump=2)
    scatter(28, KIND_ROCK, road_min=3.0, margin=2.0)
    scatter(297, KIND_SHRUB, road_min=2.5, margin=0.5, clump=4)
    scatter(4, KIND_BARREL, road_min=2.0, margin=2.0)

    # Verge rocks: small feature-rich litter just OUTSIDE the corridor
    # clearance (r 0.25 -> inflated 2.65 m < placement distance), so the
    # visual pipeline always has nearby texture without hurting
    # plannability.  The reference forest has ground litter everywhere;
    # the corridor carve above would otherwise leave feature deserts.
    n_verge = 120
    placed = 0
    tries = 0
    r_v, h_v = 0.25, 0.45
    while placed < n_verge and tries < n_verge * 60:
        tries += 1
        ln = corridors[int(rng.randint(len(corridors)))]
        seg = int(rng.randint(len(ln) - 1))
        t = rng.uniform()
        p = ln[seg] * (1 - t) + ln[seg + 1] * t
        tang = ln[seg + 1] - ln[seg]
        nrm = np.array([-tang[1], tang[0]])
        nrm = nrm / (np.linalg.norm(nrm) + 1e-9)
        q = p + nrm * rng.uniform(2.9, 4.5) * rng.choice([-1.0, 1.0])
        x, y = float(q[0]), float(q[1])
        if not (X_MIN + 3 < x < X_MAX - 3 and Y_MIN + 3 < y < Y_MAX - 3):
            continue
        if corridor_dist(x, y) < 2.9:
            continue
        if not clear_of_existing(x, y, r_v, margin=0.5):
            continue
        entries.append((x, y, r_v, h_v, KIND_ROCK))
        placed += 1

    # Roadside trees: deliberately near the road edge (visual landmarks for
    # the VIO along routes 01-03), alternating sides; still subject to the
    # corridor clearance so they can't block a spawn connector.
    r, h = KIND_GEOM[KIND_ROADSIDE_TREE]
    for i, x in enumerate(np.linspace(-85.0, 65.0, 7)):
        side = 1.0 if i % 2 == 0 else -1.0
        yr = float(np.interp(x, ROAD_WPS[:, 0], ROAD_WPS[:, 1])) + side * 5.5
        if corridor_dist(float(x), yr) >= CORRIDOR_CLEAR + r:
            entries.append((float(x), yr, r, h, KIND_ROADSIDE_TREE))

    n = len(entries)
    assert n <= CAPACITY, f"scene overflow: {n} > {CAPACITY}"
    xy = np.zeros((CAPACITY, 2), np.float32)
    radius = np.zeros(CAPACITY, np.float32)
    height = np.zeros(CAPACITY, np.float32)
    kind = np.zeros(CAPACITY, np.int32)
    valid = np.zeros(CAPACITY, bool)
    for i, (x, y, rr, hh, kk) in enumerate(entries):
        xy[i] = (x, y)
        radius[i] = rr
        height[i] = hh
        kind[i] = kk
        valid[i] = True
    return SceneColliders(xy, radius, height, kind, valid)


_scene_cache: dict[int, SceneColliders] = {}
_DATA_DIR = __import__("pathlib").Path(__file__).parent / "data"


def default_scene(seed: int = 7) -> SceneColliders:
    if seed not in _scene_cache:
        p = _DATA_DIR / f"scene_seed{seed}.npz"
        if p.is_file():
            z = np.load(p)
            _scene_cache[seed] = SceneColliders(
                xy=z["xy"], radius=z["radius"], height=z["height"],
                kind=z["kind"], valid=z["valid"])
        else:
            _scene_cache[seed] = build_scene(seed)
            p.parent.mkdir(parents=True, exist_ok=True)
            sc = _scene_cache[seed]
            np.savez_compressed(p, xy=sc.xy, radius=sc.radius,
                                height=sc.height, kind=sc.kind, valid=sc.valid)
    return _scene_cache[seed]
