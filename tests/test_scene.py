import numpy as np
import pytest

from nclt_slam_tpu.scene import (
    ALL_ROUTES,
    build_drops,
    default_scene,
    get_route,
    road_y,
    terrain_height,
    terrain_pitch_roll,
)


def test_scene_composition():
    scene = default_scene()
    assert scene.count > 450  # ~530 colliders like the reference scene
    assert scene.valid[: scene.count].all()
    # all inside bounds
    xy = scene.xy[scene.valid]
    assert xy[:, 0].min() >= -105 and xy[:, 0].max() <= 80
    assert xy[:, 1].min() >= -50 and xy[:, 1].max() <= 45


def test_terrain_properties():
    # flattened + sunk on the road centreline
    x = np.linspace(-90, 70, 50)
    y = np.asarray(road_y(x))
    h_road = np.asarray(terrain_height(x, y))
    assert np.all(h_road <= 0.0 + 1e-6)      # road is sunk 6 cm below field
    assert np.all(h_road >= -0.5)
    # off-road terrain has relief
    h_forest = np.asarray(terrain_height(x, y + 30.0))
    assert h_forest.std() > 0.1
    # vectorization: batch eval equals scalar eval
    assert np.allclose(h_forest[3], float(terrain_height(x[3], y[3] + 30.0)))


def test_terrain_pitch_roll_finite():
    p, r = terrain_pitch_roll(np.float32(10.0), np.float32(20.0), np.float32(0.3))
    assert np.isfinite(p) and np.isfinite(r)
    assert abs(float(p)) < 0.5 and abs(float(r)) < 0.5


@pytest.mark.parametrize("name", ["03_south", "04_nw_se", "08_nw_sw"])
def test_route_generation(name):
    route = get_route(name)
    n = route.n_dense
    assert 100 < n <= 768
    pts = route.dense_xy[:n]
    # dense spacing ~0.8 m
    gaps = np.hypot(*np.diff(pts, axis=0).T)
    assert 0.4 < np.median(gaps) < 1.2
    # route is an out-and-back: ends near spawn
    d_end = np.hypot(*(pts[-1] - pts[0]))
    assert d_end < 8.0
    # apex is near the registered turnaround
    apex = pts[route.turnaround_idx]
    d_apex = np.hypot(apex[0] - route.turnaround[0], apex[1] - route.turnaround[1])
    assert d_apex < 6.0
    # clearance: no dense point inside an inflated scene collider
    scene = default_scene()
    oxy = scene.xy[scene.valid]
    orad = scene.radius[scene.valid]
    d = np.hypot(pts[:, None, 0] - oxy[None, :, 0], pts[:, None, 1] - oxy[None, :, 1])
    clear = (d - orad[None, :]).min()
    assert clear > 0.4  # robot half-width


def test_drops_on_route():
    route = get_route("03_south")
    drops = build_drops(route)
    assert drops.valid.sum() >= 5
    # drops sit near the outbound path
    pts = route.dense_xy[: route.turnaround_idx]
    for i in range(len(drops.valid)):
        if not drops.valid[i]:
            continue
        d = np.hypot(pts[:, 0] - drops.xy[i, 0], pts[:, 1] - drops.xy[i, 1]).min()
        assert d < 6.0


def test_terrain_tex_matches_analytic():
    """The baked bilinear texture tracks the analytic field to < 1 cm
    inside its bounds (raycaster fast path accuracy)."""
    import numpy as np

    from nclt_slam_tpu.scene.terrain import terrain_height, terrain_height_tex

    rng = np.random.RandomState(0)
    x = rng.uniform(-135, 135, 20000).astype(np.float32)
    y = rng.uniform(-95, 95, 20000).astype(np.float32)
    a = np.asarray(terrain_height(x, y))
    b = np.asarray(terrain_height_tex(x, y))
    err = np.abs(a - b)
    # worst case ~1 cm right at the piecewise-linear road-kink curvature
    # spikes; p99 is ~0.005 cm.  Depth sensor noise at 2 m is already 1.2 cm.
    assert err.max() < 0.02, f"max tex err {err.max()*100:.2f} cm"
    assert np.percentile(err, 99) < 0.002


def test_road_y_hat_sum_matches_interp():
    """The gather-free hat-function road_y equals np.interp exactly on the
    uniform knot grid (same piecewise-linear function)."""
    import numpy as np

    from nclt_slam_tpu.scene.terrain import ROAD_WPS, road_y

    x = np.linspace(-120, 95, 4001).astype(np.float32)
    a = np.interp(np.clip(x, ROAD_WPS[0, 0], ROAD_WPS[-1, 0]),
                  ROAD_WPS[:, 0], ROAD_WPS[:, 1])
    b = np.asarray(road_y(x))
    np.testing.assert_allclose(b, a, atol=2e-5)
