import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.dynamics import init_robot, nav_substeps, robot_pose3d
from nclt_slam_tpu.sensors import imu_block, init_imu, render_depth
from nclt_slam_tpu.scene.terrain import terrain_height

CFG = DEFAULT

NO_OBS = (jnp.zeros((8, 2)), jnp.zeros(8), jnp.zeros(8, bool))

# jit once — eager lax.scan re-traces its body on every call otherwise
_nav_substeps = jax.jit(
    lambda s, v, w, oxy, orr, ov, k: nav_substeps(s, v, w, oxy, orr, ov, k, CFG.sim))
_imu_block = jax.jit(
    lambda s, p, q, k: imu_block(s, p, q, 1.0 / 200.0, k, CFG.imu))


def drive(state, cmd_v, cmd_w, ticks, obs=NO_OBS, seed=0):
    key = jax.random.PRNGKey(seed)
    traj = []
    for i in range(ticks):
        key, k = jax.random.split(key)
        state, (pos, quat) = _nav_substeps(
            state, jnp.float32(cmd_v), jnp.float32(cmd_w), *obs, k)
        traj.append((pos, quat))
    return state, traj


def test_straight_drive():
    s0 = init_robot(0.0, 0.0, 0.0)
    s, _ = drive(s0, 0.8, 0.0, 50)  # 5 s
    # after lag settles, ~0.8 m/s for most of 5 s
    assert 3.0 < float(s.xy[0]) < 4.2
    assert abs(float(s.xy[1])) < 0.3
    assert abs(float(s.v) - 0.8) < 0.1


def test_turn_rate():
    s0 = init_robot(0.0, 0.0, 0.0)
    s, _ = drive(s0, 0.0, 0.5, 40)  # 4 s at 0.5 rad/s
    assert abs(float(s.yaw) - 2.0) < 0.3


def test_wedge_against_collider():
    obs = (jnp.array([[1.0, 0.0]] + [[0.0, 0.0]] * 7),
           jnp.array([0.3] + [0.0] * 7),
           jnp.array([True] + [False] * 7))
    s0 = init_robot(0.0, 0.0, 0.0)
    s, _ = drive(s0, 0.8, 0.0, 60, obs=obs)
    # blocked at ~1.0 - 0.3 - 0.4 = 0.3 m
    assert float(s.xy[0]) < 0.45
    assert bool(s.wedged)


def test_pose3d_follows_terrain():
    s = init_robot(10.0, 20.0, 0.3)
    pos, quat = robot_pose3d(s)
    h = float(terrain_height(10.0, 20.0))
    assert abs(float(pos[2]) - (h + 0.13)) < 1e-5
    assert abs(float(jnp.linalg.norm(quat)) - 1.0) < 1e-5


def test_imu_standstill_reads_gravity():
    key = jax.random.PRNGKey(1)
    imu = init_imu(key, CFG.imu)
    pos = jnp.tile(jnp.array([5.0, 5.0, 1.0]), (100, 1))
    quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (100, 1))
    imu, meas = _imu_block(imu, pos, quat, key)
    tail = np.asarray(meas[-40:])
    assert abs(tail[:, 2].mean() - 9.81) < 0.1      # az ~ g
    assert np.abs(tail[:, :2].mean(0)).max() < 0.1  # ax, ay ~ 0
    assert np.abs(tail[:, 3:].mean(0)).max() < 0.05  # gyro ~ 0


def test_imu_gyro_tracks_turn():
    key = jax.random.PRNGKey(2)
    s0 = init_robot(0.0, 0.0, 0.0)
    imu = init_imu(key, CFG.imu)
    state = s0
    gz = []
    for i in range(30):
        key, k1, k2 = jax.random.split(key, 3)
        state, (pos, quat) = _nav_substeps(
            state, jnp.float32(0.3), jnp.float32(0.4), *NO_OBS, k1)
        imu, meas = _imu_block(imu, pos, quat, k2)
        gz.append(np.asarray(meas[:, 5]).mean())
    # settled gyro z should track commanded 0.4 rad/s
    assert abs(np.mean(gz[10:]) - 0.4) < 0.08


def test_depth_render_terrain_and_cylinder():
    obs_xy = jnp.array([[3.0, 0.0]] + [[0.0, 0.0]] * 7)
    obs_r = jnp.array([0.4] + [0.0] * 7)
    base_z = terrain_height(3.0, 0.0) * jnp.ones(8)
    obs_h = jnp.array([5.0] + [0.0] * 7)
    obs_valid = jnp.array([True] + [False] * 7)
    base = jnp.array([0.0, 0.0, float(terrain_height(0.0, 0.0)) + 0.13])
    depth, pts, valid = render_depth(
        base, jnp.float32(0.0), obs_xy, obs_r, base_z, obs_h, obs_valid,
        CFG.camera)
    depth = np.asarray(depth)
    R, C = depth.shape
    # center ray hits the cylinder ~3 m - 0.35 cam offset - 0.4 radius ≈ 2.2
    center = depth[R // 2, C // 2]
    assert 1.8 < center < 2.7
    # bottom rays (looking down) hit terrain closer than top rays
    bottom = depth[-1, C // 2]
    assert 0 < bottom < center
    # world points on the cylinder should be near x=2.6
    p_center = np.asarray(pts[R // 2, C // 2])
    assert abs(p_center[0] - 2.6) < 0.4


def test_depth_vmaps_over_batch():
    obs_xy = jnp.zeros((2, 8, 2))
    obs_r = jnp.zeros((2, 8))
    base_z = jnp.zeros((2, 8))
    obs_h = jnp.zeros((2, 8))
    obs_valid = jnp.zeros((2, 8), bool)
    base = jnp.stack([jnp.array([0.0, 0.0, 1.0]), jnp.array([5.0, 5.0, 1.5])])
    yaw = jnp.array([0.0, 1.0])
    f = jax.vmap(lambda b, y, a, r, z, h, v: render_depth(b, y, a, r, z, h, v, CFG.camera))
    depth, pts, valid = f(base, yaw, obs_xy, obs_r, base_z, obs_h, obs_valid)
    assert depth.shape == (2, CFG.camera.ray_rows, CFG.camera.ray_cols)
    assert bool(jnp.isfinite(depth).all())
