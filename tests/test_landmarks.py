"""Landmark recorder + anchor matcher behavior tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.landmarks import (
    R_NO_CANDIDATES,
    R_PUBLISHED,
    init_store,
    R_CONSISTENCY_FAIL,
    match_tick,
    record_tick,
)
from nclt_slam_tpu.sensors.depth import camera_pose
from nclt_slam_tpu.sensors.features import (
    build_scene_features,
    cross_check_match,
    hamming,
    observe,
)

CFG = DEFAULT


@pytest.fixture(scope="module")
def forest_strip():
    """A strip of tree colliders along a straight path."""
    rng = np.random.RandomState(5)
    N = 24
    xy = np.zeros((N, 2), np.float32)
    for i in range(N):
        xy[i] = (4.0 * i, 4.0 if i % 2 == 0 else -4.0)
        xy[i, 1] += rng.uniform(-1, 1)
    radius = np.full(N, 0.6, np.float32)
    height = np.full(N, 7.0, np.float32)
    base_z = np.zeros(N, np.float32)
    valid = np.ones(N, bool)
    feats = build_scene_features(xy, radius, base_z, height, valid,
                                 CFG.landmarks)
    return feats, jnp.asarray(valid)


def obs_at(feats, obs_valid, x, y, yaw, seed=0):
    base = jnp.array([x, y, 0.5])
    return observe(base, jnp.float32(yaw), feats, obs_valid,
                   jax.random.PRNGKey(seed), CFG.camera, CFG.landmarks)


def test_hamming_and_crosscheck():
    d = jnp.asarray(np.random.RandomState(0).randint(
        0, 2 ** 32, (8, 8), dtype=np.uint64).astype(np.uint32))
    assert int(hamming(d[:1], d[:1])[0, 0]) == 0
    # self cross-check matches identity
    v = jnp.ones(8, bool)
    m_idx, matched = cross_check_match(d, v, d, v)
    assert bool(matched.all())
    assert np.array_equal(np.asarray(m_idx), np.arange(8))


def test_observation_sees_features(forest_strip):
    feats, ov = forest_strip
    obs = obs_at(feats, ov, 0.0, 0.0, 0.0)
    n = int(obs.valid.sum())
    assert n > 10, f"only {n} features observed"
    # all valid points in front of the camera and inside the image
    p = np.asarray(obs.p3d_cam)[np.asarray(obs.valid)]
    assert (p[:, 2] > 0).all()
    uv = np.asarray(obs.uv)[np.asarray(obs.valid)]
    assert (uv[:, 0] >= 0).all() and (uv[:, 0] <= 640 + 2).all()


def test_same_pose_descriptors_rematch(forest_strip):
    feats, ov = forest_strip
    o1 = obs_at(feats, ov, 0.0, 0.0, 0.0, seed=1)
    o2 = obs_at(feats, ov, 0.0, 0.0, 0.0, seed=2)
    m_idx, matched = cross_check_match(o1.desc, o1.valid, o2.desc, o2.valid)
    # most features should re-match despite descriptor noise
    assert int(matched.sum()) > 0.6 * int(o1.valid.sum())


def test_recorder_triggers_every_2m(forest_strip):
    feats, ov = forest_strip
    store = init_store(CFG.landmarks)
    rec = jax.jit(lambda s, o, p, y: record_tick(s, o, p, y, CFG.camera,
                                                 CFG.landmarks))
    for i, x in enumerate(np.arange(0.0, 30.0, 0.5)):
        obs = obs_at(feats, ov, float(x), 0.0, 0.0, seed=i)
        cam_p, _ = camera_pose(jnp.array([x, 0.0, 0.5]), jnp.float32(0.0),
                               CFG.camera)
        store = rec(store, obs, cam_p, jnp.float32(0.0))
    # 30 m at 2 m spacing → ~15 landmarks (allow slack for the >=30-feature gate)
    assert 8 <= int(store.count) <= 16, int(store.count)
    nf = np.asarray(store.n_feats[: int(store.count)])
    assert (nf >= CFG.landmarks.record_min_feats).all()


def test_matcher_anchors_near_teach_pose(forest_strip):
    feats, ov = forest_strip
    store = init_store(CFG.landmarks)
    rec = jax.jit(lambda s, o, p, y: record_tick(s, o, p, y, CFG.camera,
                                                 CFG.landmarks))
    for i, x in enumerate(np.arange(0.0, 40.0, 0.5)):
        obs = obs_at(feats, ov, float(x), 0.0, 0.0, seed=i)
        cam_p, _ = camera_pose(jnp.array([x, 0.0, 0.5]), jnp.float32(0.0),
                               CFG.camera)
        store = rec(store, obs, cam_p, jnp.float32(0.0))
    assert int(store.count) >= 8

    # zero the aliased-anchor bias: this test checks the GEOMETRIC solver
    # (the bias model's distribution is pinned by
    # test_anchor_bias_distribution below)
    lcfg = dataclasses.replace(CFG.landmarks, anchor_bias_median_m=0.0,
                           session_dead_frac=0.0)
    match = jax.jit(lambda s, o, v, h, p, k: match_tick(
        s, o, v, h, p, k, CFG.camera, lcfg))

    # robot actually at (20.4, 0.3); VIO believes (22.0, 1.0) — the anchor
    # should recover a pose near the TRUE one
    true_xy = (20.4, 0.3)
    obs = obs_at(feats, ov, *true_xy, 0.0, seed=99)
    res = match(store, obs, jnp.array([22.0, 1.0]), jnp.float32(0.0),
                jnp.array([22.0, 1.0, 0.5]), jax.random.PRNGKey(7))
    assert bool(res.ok), f"no anchor: reason={int(res.reason)} inl={int(res.n_inliers)} reproj={float(res.reproj):.2f}"
    err = np.hypot(float(res.xy[0]) - true_xy[0], float(res.xy[1]) - true_xy[1])
    assert err < 1.0, f"anchor err {err:.2f} m at {np.asarray(res.xy)}"
    assert float(res.std) <= 0.2 + 1e-6


def test_anchor_bias_distribution():
    """The published-anchor error model must reproduce the reference CSV's
    publish-shift spread — which IS anchor-vs-GT error (the matcher's query
    pose is /tmp/isaac_pose.txt, written as ground truth by
    run_husky_forest.py:1078-1080): median 1.2 m, p90 3.3 m — as the
    marginal over route positions of the persistent bias field + jitter."""
    from nclt_slam_tpu.landmarks.matcher import sample_anchor_bias

    cfg = dataclasses.replace(DEFAULT.landmarks, anchor_gross_p=0.0)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-100, 100, (4000, 2)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    b = jax.vmap(lambda p, k: sample_anchor_bias(p, k, cfg))(xy, keys)
    mags = np.linalg.norm(np.asarray(b), axis=1)
    assert abs(np.median(mags) - cfg.anchor_bias_median_m) < 0.15, \
        np.median(mags)
    assert abs(np.percentile(mags, 90) - cfg.anchor_bias_p90_m) < 0.5, \
        np.percentile(mags, 90)


def test_anchor_bias_persistence():
    """The bias is persistent per landmark (repeat matches differ only by
    the per-attempt jitter) and spatially correlated (nearby landmarks
    carry nearly the same error; far ones decorrelate) — the property that
    keeps CSV-magnitude anchors navigable: a slowly-varying common-mode
    offset instead of a 2 Hz jerk (ADVICE r4 #1)."""
    from nclt_slam_tpu.landmarks.matcher import sample_anchor_bias

    cfg = dataclasses.replace(DEFAULT.landmarks, anchor_gross_p=0.0)
    keys = jax.random.split(jax.random.PRNGKey(2), 256)
    p0 = jnp.array([10.0, -5.0])
    b0 = jax.vmap(lambda k: sample_anchor_bias(p0, k, cfg))(keys)
    b0 = np.asarray(b0)
    # same landmark, different attempts: spread well below the magnitude
    spread = np.linalg.norm(b0 - b0.mean(0), axis=1).mean()
    assert spread < 0.5 * np.linalg.norm(b0.mean(0)), \
        (spread, np.linalg.norm(b0.mean(0)))
    # 2 m away: nearly the same error
    b1 = np.asarray(jax.vmap(lambda k: sample_anchor_bias(
        p0 + jnp.array([2.0, 0.0]), k, cfg))(keys))
    assert np.linalg.norm(b1.mean(0) - b0.mean(0)) < \
        0.5 * np.linalg.norm(b0.mean(0))
    # decorrelation across the field: mean pairwise difference at 100+ m
    # reaches the magnitude scale (not a global constant offset)
    rng = np.random.default_rng(3)
    far = jnp.asarray(rng.uniform(-150, 150, (64, 2)), jnp.float32)
    bf = np.asarray(jax.vmap(lambda p, k: sample_anchor_bias(p, k, cfg))(
        far, jax.random.split(jax.random.PRNGKey(4), 64)))
    assert np.std(np.arctan2(bf[:, 1], bf[:, 0])) > 1.0


def test_anchor_bias_consistency_fail_tail():
    """The combined lognormal+gross model's >5 m mass must land where the
    CSV's consistency_fail rate needs it: ~10 % of PnP-accepted solves
    (4.1 % of all attempts at the CSV's ~42 % accept rate) — band 0.06-0.18
    of published-candidate anchors (ADVICE r4 #3)."""
    from nclt_slam_tpu.landmarks.matcher import sample_anchor_bias

    cfg = DEFAULT.landmarks
    rng = np.random.default_rng(5)
    xy = jnp.asarray(rng.uniform(-100, 100, (8000, 2)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(6), 8000)
    b = jax.vmap(lambda p, k: sample_anchor_bias(p, k, cfg))(xy, keys)
    mags = np.linalg.norm(np.asarray(b), axis=1)
    tail = float((mags > cfg.consistency_m).mean())
    assert 0.06 < tail < 0.18, tail


def test_matcher_no_candidates_far_away(forest_strip):
    feats, ov = forest_strip
    store = init_store(CFG.landmarks)
    # empty store → no candidates
    obs = obs_at(feats, ov, 0.0, 0.0, 0.0)
    res = match_tick(store, obs, jnp.array([500.0, 500.0]), jnp.float32(0.0),
                     jnp.array([500.0, 500.0, 0.5]), jax.random.PRNGKey(0),
                     CFG.camera, CFG.landmarks)
    assert not bool(res.ok)
    assert int(res.reason) == R_NO_CANDIDATES


def test_consistency_gate_drought_relaxation(forest_strip):
    """A correct anchor ~6.5 m from the believed nav pose is rejected by the
    5 m consistency gate (matcher.py:75,388-397 behavior), but accepted once
    the caller widens the gate for anchor drought."""
    feats, ov = forest_strip
    store = init_store(CFG.landmarks)
    rec = jax.jit(lambda s, o, p, y: record_tick(s, o, p, y, CFG.camera,
                                                 CFG.landmarks))
    for i, x in enumerate(np.arange(0.0, 40.0, 0.5)):
        obs = obs_at(feats, ov, float(x), 0.0, 0.0, seed=i)
        cam_p, _ = camera_pose(jnp.array([x, 0.0, 0.5]), jnp.float32(0.0),
                               CFG.camera)
        store = rec(store, obs, cam_p, jnp.float32(0.0))

    # bias off: this test exercises the gate mechanics, not the error model
    lcfg = dataclasses.replace(CFG.landmarks, anchor_bias_median_m=0.0,
                           session_dead_frac=0.0)
    true_xy = (20.4, 0.3)
    believed = jnp.array([26.5, 2.0])     # ~6.4 m nav error
    obs = obs_at(feats, ov, *true_xy, 0.0, seed=99)
    res = match_tick(store, obs, believed, jnp.float32(0.0),
                     jnp.array([26.5, 2.0, 0.5]), jax.random.PRNGKey(7),
                     CFG.camera, lcfg)
    assert not bool(res.ok) and int(res.reason) == R_CONSISTENCY_FAIL

    res2 = match_tick(store, obs, believed, jnp.float32(0.0),
                      jnp.array([26.5, 2.0, 0.5]), jax.random.PRNGKey(7),
                      CFG.camera, lcfg, consistency_extra_m=5.0)
    assert bool(res2.ok)
    err = np.hypot(float(res2.xy[0]) - true_xy[0],
                   float(res2.xy[1]) - true_xy[1])
    assert err < 1.0


def test_block_death_low_discrepancy_per_route():
    """Block death (matcher._block_dead): every along-route window of
    blocks carries a dead fraction within ~1 block of session_dead_frac —
    the property world-keyed cells could not give (per-route publish
    1.2-86 % in r4) — while whole blocks die together (droughts)."""
    import jax.numpy as jnp

    from nclt_slam_tpu.landmarks.matcher import _block_dead

    cfg = CFG.landmarks
    B = cfg.dead_block_landmarks
    for off in (0.05, 0.37, 0.81):
        li = jnp.arange(384)
        dead = np.asarray(_block_dead(li, jnp.float32(off), cfg))
        # per-landmark persistent + block-aligned
        blocks = dead.reshape(-1, B)
        assert (blocks.all(1) | (~blocks).any(1)).all()
        assert (blocks == blocks[:, :1]).all()
        # windows of 20 blocks (a typical route's store span): fraction
        # within 1.5 blocks of the target
        bd = blocks[:, 0]
        for s in range(0, len(bd) - 20):
            frac = bd[s:s + 20].mean()
            assert abs(frac - cfg.session_dead_frac) <= 1.5 / 20 + 1e-6, \
                (off, s, frac)
