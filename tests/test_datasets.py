"""Dataset-pipeline components against deterministic mock data (the
reference's generate_mock_sensors pattern, seed 42)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nclt_slam_tpu.datasets.calibration import Calibration, xyzrpy_to_matrix
from nclt_slam_tpu.datasets.loaders import (
    Session,
    generate_mock_session,
    interpolate_sync,
    nearest_sync,
)
from nclt_slam_tpu.datasets.models.place_recognition import (
    embed,
    init_params,
    recall_at_k,
    train_step,
    triplet_loss_hard,
    voxelize,
)
from nclt_slam_tpu.datasets.slam.icp import (
    icp_point_to_point,
    init_local_map,
    local_map_flat,
    local_map_insert,
    remove_ground_ransac,
)
from nclt_slam_tpu.datasets.slam.loop_closure import (
    PoseGraph2D,
    optimize_pose_graph,
    scan_context,
    sc_distance,
)
from nclt_slam_tpu.datasets.utils.gps import lla_to_enu
from nclt_slam_tpu.datasets.utils.imu_utils import (
    estimate_biases,
    imu_preintegration,
    parse_ms25,
)
from nclt_slam_tpu.datasets.utils.point_cloud import voxel_downsample


@pytest.fixture(scope="module")
def mock_session(tmp_path_factory):
    root = tmp_path_factory.mktemp("nclt_mock") / "2012-01-08"
    generate_mock_session(root, duration_s=10.0, seed=42)
    return Session(root)


def test_session_loads_all_streams(mock_session):
    s = mock_session
    for name in ["ms25", "gps_rtk", "odometry", "kvh", "groundtruth"]:
        assert name in s, name
    assert s["groundtruth"].data.shape[1] == 6
    assert len(s["ms25"].t_us) == 500  # 10 s at 50 Hz


def test_nearest_and_interp_sync(mock_session):
    s = mock_session
    ref_t = s["groundtruth"].t_us[::10]
    data, dt, valid = nearest_sync(ref_t, s["ms25"], max_dt_us=100_000)
    assert valid.all()
    assert dt.max() <= 20_000  # 50 Hz stream: <= half period + slack
    interp = interpolate_sync(ref_t, s["odometry"])
    # odometry x grows at ~1.005 m/s * cos(45°)
    v = np.diff(interp[:, 0]) / np.diff(ref_t * 1e-6)
    assert abs(v.mean() - 1.005 * np.cos(np.pi / 4)) < 0.02


def test_gps_enu_matches_groundtruth(mock_session):
    s = mock_session
    gps = s["gps_rtk"]
    lat, lon, alt = gps.data[:, 2], gps.data[:, 3], gps.data[:, 4]
    enu = lla_to_enu(lat, lon, alt, lat[0], lon[0], alt[0])
    # NE heading at 1 m/s: east == north component, ~10 s -> ~7.07 m
    assert abs(enu[-1, 0] - enu[-1, 1]) < 0.1
    assert 6.0 < enu[-1, 0] < 8.0


def test_imu_bias_and_preintegration(mock_session):
    s = mock_session
    mag, accel, gyro = parse_ms25(s["ms25"].data)
    a_bias, g_bias = estimate_biases(accel, gyro)
    assert np.abs(g_bias).max() < 0.01
    assert np.abs(a_bias).max() < 0.1
    # stationary-frame preintegration with gravity-compensated accel:
    out = imu_preintegration(s["ms25"].t_us, accel, gyro,
                             gravity=(0.0, 0.0, -9.81))
    assert out["positions"].shape == (500, 3)
    # z drift should stay small (accel ~ +9.81 vs gravity -9.81)
    assert abs(out["positions"][-1, 2]) < 5.0


def test_calibration_roundtrip():
    cal = Calibration()
    T = cal.body_from("velodyne")
    Ti = cal.sensor_from_body("velodyne")
    assert np.allclose(T @ Ti, np.eye(4), atol=1e-10)
    pts = np.random.RandomState(0).normal(size=(10, 3))
    moved = cal.transform_points("ms25", pts)
    back = (moved - T_ms25()[:3, 3]) @ T_ms25()[:3, :3]
    assert np.allclose(back, pts, atol=1e-8)


def T_ms25():
    return xyzrpy_to_matrix(-0.11, -0.18, -0.71, 0, 0, 0, degrees=True)


def ring_scan(rng, n=256, radius=10.0, noise=0.02):
    ang = rng.uniform(0, 2 * np.pi, n)
    r = radius + rng.normal(0, noise, n)
    z = rng.uniform(0, 2, n)
    return np.stack([r * np.cos(ang), r * np.sin(ang), z], -1)


def test_icp_recovers_known_transform():
    rng = np.random.RandomState(1)
    # structured scene: two walls + scatter
    wall1 = np.stack([np.linspace(2, 12, 80), np.full(80, 3.0),
                      rng.uniform(0, 2, 80)], -1)
    wall2 = np.stack([np.full(80, 10.0), np.linspace(-5, 3, 80),
                      rng.uniform(0, 2, 80)], -1)
    scatter = rng.uniform(-5, 15, (96, 3)) * np.array([1, 1, 0.15])
    dst = np.concatenate([wall1, wall2, scatter]).astype(np.float32)
    th = 0.05
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t_true = np.array([0.3, -0.2, 0.0], np.float32)
    src = (dst - t_true) @ Rz  # so Rz.T @ src + t == dst
    valid = np.ones(len(dst), bool)
    res = jax.jit(lambda s, d: icp_point_to_point(
        s, jnp.asarray(valid), d, jnp.asarray(valid), iters=25))(
        jnp.asarray(src), jnp.asarray(dst))
    moved = np.asarray(src @ np.asarray(res.R).T + np.asarray(res.t))
    err = np.linalg.norm(moved - dst, axis=-1).mean()
    assert err < 0.05, err
    assert float(res.rmse) < 0.05


def test_ground_removal():
    rng = np.random.RandomState(2)
    ground = np.column_stack([rng.uniform(-10, 10, (200, 2)),
                              rng.normal(0.0, 0.02, 200)])
    objects = np.column_stack([rng.uniform(-10, 10, (100, 2)),
                               rng.uniform(0.8, 2.5, 100)])
    pts = jnp.asarray(np.concatenate([ground, objects]), jnp.float32)
    valid = jnp.ones(300, bool)
    new_valid, n, d = remove_ground_ransac(pts, valid, jax.random.PRNGKey(0))
    kept = np.asarray(new_valid)
    assert kept[200:].mean() > 0.9     # objects kept
    assert kept[:200].mean() < 0.1     # ground removed


def test_local_map_ring():
    m = init_local_map(4, 8)
    for i in range(6):
        m = local_map_insert(m, jnp.full((8, 3), float(i)), jnp.ones(8, bool))
    pts, valid = local_map_flat(m)
    assert valid.all()
    # ring keeps the last 4 scans (2..5)
    vals = set(np.unique(np.asarray(pts)))
    assert vals == {2.0, 3.0, 4.0, 5.0}


def test_scan_context_loop_detection():
    rng = np.random.RandomState(3)
    scan_a = ring_scan(rng)
    scan_b = scan_a + rng.normal(0, 0.05, scan_a.shape)  # revisit
    scan_c = ring_scan(rng, radius=5.0)                  # different place
    v = jnp.ones(len(scan_a), bool)
    d_a = scan_context(jnp.asarray(scan_a, jnp.float32), v)
    d_b = scan_context(jnp.asarray(scan_b, jnp.float32), v)
    d_c = scan_context(jnp.asarray(scan_c, jnp.float32), v)
    d_ab, _ = sc_distance(d_a, d_b)
    d_ac, _ = sc_distance(d_a, d_c)
    assert float(d_ab) < float(d_ac)
    # rotation invariance: rotating the scan barely changes the distance
    th = 1.1
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    d_rot = scan_context(jnp.asarray(scan_a @ Rz.T, jnp.float32), v)
    d_rot_dist, shift = sc_distance(d_a, d_rot)
    assert float(d_rot_dist) < 0.15


def test_pose_graph_closes_loop():
    """Square loop with odometry drift; a loop-closure edge fixes it."""
    K = 41
    # GT: square 10 m sides, 1 m steps
    gt = [(0.0, 0.0, 0.0)]
    for k in range(K - 1):
        x, y, th = gt[-1]
        if (k + 1) % 10 == 0:
            th2 = th + np.pi / 2
            gt.append((x, y, th2))
        else:
            gt.append((x + np.cos(th), y + np.sin(th), th))
    gt = np.asarray(gt, np.float32)

    # odometry measurements with yaw-rate bias -> drifted open-loop chain
    rng = np.random.RandomState(4)
    odo = []
    for k in range(K - 1):
        dx = gt[k + 1, :2] - gt[k, :2]
        c, s = np.cos(gt[k, 2]), np.sin(gt[k, 2])
        local = (c * dx[0] + s * dx[1], -s * dx[0] + c * dx[1])
        dth = gt[k + 1, 2] - gt[k, 2]
        odo.append((local[0] + rng.normal(0, 0.02),
                    local[1] + rng.normal(0, 0.02),
                    dth + 0.01))           # yaw bias drifts the chain
    odo = np.asarray(odo, np.float32)

    # open-loop integrate for the initial guess
    poses = [gt[0]]
    for k in range(K - 1):
        x, y, th = poses[-1]
        dx, dy, dth = odo[k]
        poses.append((x + dx * np.cos(th) - dy * np.sin(th),
                      y + dx * np.sin(th) + dy * np.cos(th), th + dth))
    poses = np.asarray(poses, np.float32)
    open_err = np.linalg.norm(poses[-1, :2] - gt[-1, :2])

    L = 4
    loop_i = np.zeros(L, np.int32)
    loop_j = np.zeros(L, np.int32)
    loop_meas = np.zeros((L, 3), np.float32)
    loop_valid = np.zeros(L, bool)
    loop_i[0], loop_j[0] = 0, K - 1       # revisit start exactly
    loop_meas[0] = (0.0, 0.0, gt[-1, 2] - gt[0, 2])
    loop_valid[0] = True

    graph = PoseGraph2D(
        poses=jnp.asarray(poses), odo_meas=jnp.asarray(odo),
        loop_i=jnp.asarray(loop_i), loop_j=jnp.asarray(loop_j),
        loop_meas=jnp.asarray(loop_meas), loop_valid=jnp.asarray(loop_valid))
    opt = np.asarray(jax.jit(lambda g: optimize_pose_graph(g, iters=15))(graph))
    closed_err = np.linalg.norm(opt[-1, :2] - gt[0, :2])
    assert open_err > 0.5                 # drift was real
    assert closed_err < 0.15, (open_err, closed_err)


def test_voxel_downsample():
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.uniform(-5, 5, (500, 3)), jnp.float32)
    valid = jnp.ones(500, bool)
    out, out_valid = voxel_downsample(pts, valid, voxel=1.0, out_cap=512)
    n = int(out_valid.sum())
    assert 100 < n < 500              # genuinely reduced
    # no two kept points share a voxel
    cells = np.floor((np.asarray(out)[np.asarray(out_valid)] + 200) / 1.0)
    keys = {tuple(c) for c in cells}
    assert len(keys) == n


def test_place_recognition_learns():
    rng = np.random.RandomState(6)
    key = jax.random.PRNGKey(0)
    params = init_params(key)
    # 4 places x 4 noisy revisits
    grids, labels = [], []
    bases = [ring_scan(rng, radius=r)
             for r in (6.0, 10.0, 14.0, 18.0)]
    for li, base in enumerate(bases):
        for _ in range(4):
            scan = base + rng.normal(0, 0.1, base.shape)
            grids.append(voxelize(jnp.asarray(scan, jnp.float32),
                                  jnp.ones(len(scan), bool)))
            labels.append(li)
    grids = jnp.stack(grids)
    labels = jnp.asarray(labels)

    step = jax.jit(lambda p, g, l: train_step(p, g, l, lr=3e-3))
    loss0 = float(triplet_loss_hard(embed(params, grids), labels))
    for _ in range(30):
        params, loss = step(params, grids, labels)
    assert float(loss) < loss0

    emb = embed(params, grids)
    r1 = recall_at_k(emb[::4], emb, labels[::4], labels, k=2)
    assert float(r1) > 0.7


def test_velodyne_bin_roundtrip(tmp_path):
    from nclt_slam_tpu.datasets.loaders import load_velodyne_bin, save_velodyne_bin
    rng = np.random.RandomState(7)
    xyz = rng.uniform(-50, 50, (300, 3)).astype(np.float32)
    inten = rng.randint(0, 255, 300)
    p = save_velodyne_bin(tmp_path / "scan.bin", xyz, inten)
    back = load_velodyne_bin(p)
    assert back.shape == (300, 4)
    assert np.abs(back[:, :3] - xyz).max() < 0.005  # quantization step
    assert np.array_equal(back[:, 3].astype(int), inten)


def test_hokuyo_roundtrip(tmp_path):
    from nclt_slam_tpu.datasets.loaders import (
        hokuyo_to_points,
        load_hokuyo_packets,
        save_hokuyo_packets,
    )
    rng = np.random.RandomState(8)
    t = np.arange(5) * 25_000 + 10 ** 15
    ranges = rng.uniform(0.5, 25.0, (5, 1081)).astype(np.float32)
    p = save_hokuyo_packets(tmp_path / "hokuyo.bin", t, ranges)
    t2, r2 = load_hokuyo_packets(p)
    assert np.array_equal(t2, t)
    assert np.allclose(r2, ranges)
    pts, valid = hokuyo_to_points(r2[0])
    assert valid.all()
    assert np.allclose(np.hypot(pts[:, 0], pts[:, 1]), r2[0], atol=1e-4)


def test_euroc_roundtrip(tmp_path):
    from nclt_slam_tpu.io.euroc import export_euroc, load_euroc_groundtruth
    rng = np.random.RandomState(9)
    n = 20
    t = np.arange(n) * 0.1
    xyz = np.cumsum(rng.normal(0, 0.1, (n, 3)), 0)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    root = export_euroc(tmp_path, t, xyz, q,
                        imu_t_s=np.arange(n * 10) * 0.01,
                        imu_gyro=rng.normal(0, 0.1, (n * 10, 3)),
                        imu_accel=rng.normal(0, 1, (n * 10, 3)))
    assert (root / "imu0" / "data.csv").is_file()
    t2, xyz2, q2 = load_euroc_groundtruth(root)
    assert np.allclose(t2, t, atol=1e-6)
    assert np.allclose(xyz2, xyz, atol=1e-5)
    assert np.allclose(np.abs((q2 * q).sum(-1)), 1.0, atol=1e-5)


def test_icp_odometry_pipeline():
    """Scan-to-local-map ICP odometry recovers a driven trajectory in a
    structured synthetic world (the run_week2_icp capability)."""
    from nclt_slam_tpu.datasets.slam.pipeline import run_icp_odometry

    rng = np.random.RandomState(11)
    # world: 60 pillars around a 12 m square path
    pillars = rng.uniform(-20, 20, (60, 2))
    world = []
    for px, py in pillars:
        n = 12
        ang = rng.uniform(0, 2 * np.pi, n)
        world.append(np.column_stack([
            px + 0.3 * np.cos(ang), py + 0.3 * np.sin(ang),
            rng.uniform(0, 3, n)]))
    world = np.concatenate(world)

    # GT: drive a square, scanning at each step
    T_n, N = 16, 256
    gt = []
    x, y, th = 0.0, 0.0, 0.0
    for t in range(T_n):
        gt.append((x, y, th))
        if t % 4 == 3:
            th += np.pi / 2
        else:
            x += 3 * np.cos(th)
            y += 3 * np.sin(th)
    gt = np.asarray(gt)

    scans = np.zeros((T_n, N, 3), np.float32)
    valid = np.zeros((T_n, N), bool)
    for t, (x, y, th) in enumerate(gt):
        rel = world - np.array([x, y, 0.0])
        d = np.hypot(rel[:, 0], rel[:, 1])
        near = np.argsort(d)[:N]
        c, s = np.cos(-th), np.sin(-th)
        pts = rel[near]
        scans[t, :, 0] = c * pts[:, 0] - s * pts[:, 1]
        scans[t, :, 1] = s * pts[:, 0] + c * pts[:, 1]
        scans[t, :, 2] = pts[:, 2]
        valid[t] = d[near] < 25.0
        scans[t] += rng.normal(0, 0.01, (N, 3))

    # odometry prediction: the exact relative motion (like wheel odom)
    odom = np.zeros((T_n, 4, 4), np.float32)
    odom[0] = np.eye(4)
    for t in range(1, T_n):
        ci, si = np.cos(gt[t - 1, 2]), np.sin(gt[t - 1, 2])
        Ri = np.array([[ci, -si], [si, ci]])
        dxy = Ri.T @ (gt[t, :2] - gt[t - 1, :2])
        dth = gt[t, 2] - gt[t - 1, 2]
        odom[t] = np.eye(4)
        odom[t][:2, :2] = [[np.cos(dth), -np.sin(dth)],
                           [np.sin(dth), np.cos(dth)]]
        odom[t][:2, 3] = dxy

    poses, rmses = run_icp_odometry(scans, valid, odom, local_map_scans=8)
    est_xy = poses[:, :2, 3]
    err = np.hypot(*(est_xy - gt[:, :2]).T)
    assert err.max() < 0.5, err
    assert np.asarray(rmses)[1:].max() < 0.2


# ---------------------------------------------------------------------------
# UTM-threshold pair mining (datasets/pairs.py) — the reference's Kaggle
# protocol (nclt_pairs.py:243-330 + dataset_config.yaml:33-39)
# ---------------------------------------------------------------------------


def _two_session_loop(n_per_session=48, radius=60.0, seed=2):
    """Two traversals of the same loop with small lateral offsets — revisit
    distance well inside the 10 m positive threshold, opposite-side poses
    far beyond the 25 m negative threshold."""
    rng = np.random.RandomState(seed)
    coords, session = [], []
    for s in range(2):
        t = np.linspace(0, 2 * np.pi, n_per_session, endpoint=False)
        xy = np.stack([radius * np.cos(t), radius * np.sin(t)], -1)
        xy += rng.normal(0, 1.5, xy.shape)  # per-session GPS/route offset
        coords.append(np.concatenate([xy, np.zeros((n_per_session, 1))], 1))
        session.append(np.full(n_per_session, s))
    return np.concatenate(coords), np.concatenate(session)


def test_mine_pairs_protocol():
    from nclt_slam_tpu.datasets.pairs import (
        NUM_NEGATIVES, mine_pairs, sessions_for_split)

    coords, _ = _two_session_loop()
    pairs = mine_pairs(coords, block=37)  # non-divisor block: seam check
    assert len(pairs.anchor) > 0
    d = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    for a, p, negs in zip(pairs.anchor, pairs.positive, pairs.negatives):
        assert a != p
        assert d[a, p] < 10.0                       # positive inside 10 m
        # the CLOSEST in-threshold pose was chosen
        row = d[a].copy()
        row[a] = np.inf
        assert p == np.argmin(row)
        assert len(set(negs.tolist())) == NUM_NEGATIVES  # w/o replacement
        assert (d[a, negs] > 25.0).all()            # negatives beyond 25 m

    # session-date split registry is disjoint and complete
    tr, va, te = (sessions_for_split(s) for s in ("train", "val", "test"))
    assert len(set(tr) | set(va) | set(te)) == len(tr) + len(va) + len(te)
    with pytest.raises(ValueError):
        sessions_for_split("dev")


def test_place_recognition_on_mined_pairs():
    """Train the dense-voxel encoder on UTM-mined (anchor, positive,
    negatives) triples from a fixed world — the reference's MinkLoc
    training protocol on realistic pairs instead of toy labels — and
    report Recall@1 under the 10 m-positive retrieval definition."""
    from nclt_slam_tpu.datasets.pairs import (
        hard_negatives, mine_pairs, pairs_epoch_batches, triplet_loss_pairs)

    rng = np.random.RandomState(4)
    coords, session = _two_session_loop()
    # fixed world: trees scattered randomly along the loop corridor — every
    # pose sees a unique constellation (no rotational aliasing)
    t = rng.uniform(0, 2 * np.pi, 160)
    r = rng.uniform(48.0, 75.0, 160)
    trees = np.stack([r * np.cos(t), r * np.sin(t)], -1)

    def scan_at(xy):
        rel = trees - xy[None, :2]
        dist = np.hypot(*rel.T)
        near = np.argsort(dist)[:48]
        pts = []
        for n in near:
            z = np.linspace(0.2, 6.0, 6)
            pts.append(np.stack([np.full(6, rel[n, 0]),
                                 np.full(6, rel[n, 1]), z], -1))
        return np.concatenate(pts) + rng.normal(0, 0.15, (48 * 6, 3))

    grids = jnp.stack([
        voxelize(jnp.asarray(scan_at(c[:2]), jnp.float32),
                 jnp.ones(288, bool)) for c in coords])

    pairs = mine_pairs(coords, seed=1)
    params = init_params(jax.random.PRNGKey(3))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def step(p, ost, a, pos, negs):
        def loss_fn(p):
            # one fused embed over anchor|positive|negatives — a single
            # conv batch instead of 7 separate launches
            B = a.shape[0]
            e = embed(p, jnp.concatenate(
                [grids[a], grids[pos], grids[negs.reshape(-1)]], 0))
            return triplet_loss_pairs(
                e[:B], e[B:2 * B], e[2 * B:].reshape(B, -1, e.shape[-1]))
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, ost = opt.update(g, ost)
        return optax.apply_updates(p, upd), ost, loss

    jstep = jax.jit(step)
    losses = []
    for epoch in range(3):
        for a, p, n in pairs_epoch_batches(pairs, batch=16, seed=epoch):
            params, opt_state, loss = jstep(
                params, opt_state, jnp.asarray(a), jnp.asarray(p),
                jnp.asarray(n))
            losses.append(float(loss))

    # retrieval eval: session-1 queries against the session-0 database,
    # success = nearest embedding within the 10 m positive threshold
    emb = embed(params, grids)
    q, db = session == 1, session == 0
    d_emb = jnp.linalg.norm(emb[q][:, None] - emb[db][None], axis=-1)
    nn = np.asarray(jnp.argmin(d_emb, 1))
    geo = np.linalg.norm(coords[q][:, None] - coords[db][None], axis=-1)
    hit = geo[np.arange(q.sum()), nn] < 10.0
    assert losses[-1] < losses[0]
    assert hit.mean() > 0.6, hit.mean()

    # descriptor-space hard-negative mining returns the k nearest
    hn = hard_negatives(emb[:4], jnp.tile(emb[None, 4:20], (4, 1, 1)), k=3)
    dd = np.linalg.norm(np.asarray(emb[:4])[:, None] - np.asarray(emb[4:20])[None], axis=-1)
    for i in range(4):
        assert set(np.asarray(hn[i]).tolist()) == set(np.argsort(dd[i])[:3].tolist())
