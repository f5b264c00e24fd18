"""Batched campaign + multi-device sharding tests (virtual 8-dev CPU mesh)."""

import dataclasses

import jax
import numpy as np
import pytest

from nclt_slam_tpu import config as cfg_mod
from nclt_slam_tpu.eval.metrics import ate_rmse, procrustes_drift_2d, wp_coverage
from nclt_slam_tpu.parallel import route_mesh, sharded_campaign_repeat
from nclt_slam_tpu.rollout.campaign import (
    build_campaign,
    campaign_metrics,
    run_campaign_repeat,
    run_campaign_teach,
    teach_waypoints,
)


def small_cfg():
    base = cfg_mod.gt_localization()
    return base.replace(
        camera=dataclasses.replace(base.camera, ray_cols=16, ray_rows=12,
                                   ray_steps=32),
        map=dataclasses.replace(base.map, resolution=0.4),
        planner=dataclasses.replace(base.planner, window=48, path_len=64),
    )


@pytest.fixture(scope="module")
def mini_campaign():
    cfg = small_cfg()
    data = build_campaign(["01_road", "03_south"], cfg=cfg)
    teach = run_campaign_teach(data, cfg, 600)
    return cfg, data, teach


def test_campaign_teach_batched(mini_campaign):
    cfg, data, teach = mini_campaign
    assert teach.trace.gt_xy.shape[0] == 2
    gt = np.asarray(teach.trace.gt_xy)
    # both routes drove away from spawn
    for i in range(2):
        d = np.hypot(*(gt[i] - gt[i, 0]).T)
        assert d.max() > 20.0


def test_campaign_repeat_and_metrics(mini_campaign):
    cfg, data, teach = mini_campaign
    wps, n_wps = teach_waypoints(data, teach, cfg)
    rep = run_campaign_repeat(data, teach.teach_grid, wps, n_wps, cfg, 700)
    per_route, agg = campaign_metrics(data, rep, wps, n_wps, cfg)
    assert set(per_route) == {"01_road", "03_south"}
    assert agg["routes"] == 2
    for name, m in per_route.items():
        assert m["gt_samples"] == 700
        assert m["path_m"] > 10.0, f"{name} barely moved: {m}"
        assert m["drift_mean"] is not None and m["drift_mean"] < 0.01  # GT mode


def test_sharded_campaign_runs_on_mesh(mini_campaign):
    cfg, data, teach = mini_campaign
    assert len(jax.devices()) == 8
    mesh = route_mesh(8)
    wps, n_wps = teach_waypoints(data, teach, cfg)
    rep = sharded_campaign_repeat(data, teach.teach_grid, wps, n_wps, cfg,
                                  200, mesh=mesh)
    # padded to 8 routes
    assert rep.trace.gt_xy.shape[0] == 8
    gt = np.asarray(rep.trace.gt_xy)
    assert np.isfinite(gt).all()
    # route 0 and its replica pads agree (same inputs, same seed)
    assert np.allclose(gt[2], gt[3])


def test_eval_primitives():
    rng = np.random.RandomState(0)
    gt = np.cumsum(rng.normal(size=(200, 2)), 0)
    # rotated + translated copy should align to ~0 ATE
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    est = gt @ R.T + np.array([5.0, -3.0])
    assert ate_rmse(est, gt) < 1e-4

    # procrustes drift on a reflected trajectory still aligns
    vio = np.column_stack([gt @ R.T * np.array([1, -1]), np.zeros(len(gt))])
    d_max, d_mean = procrustes_drift_2d(vio, gt)
    assert d_mean < 1e-3

    # directional coverage: a GT trace that only drives the outbound leg
    # must NOT credit the return-half WPs (the whole point of the split)
    wps = np.array([[0.0, 0], [4, 0], [8, 0], [12, 0], [8, 0.1], [4, 0.1], [0, 0.1]])
    gt_path = np.column_stack([np.linspace(0, 12, 50), np.zeros(50)])
    v, t, _ = wp_coverage(gt_path, wps, (12.0, 0.0))
    assert t == 7
    assert v == 4  # outbound WPs only


def test_ablation_axis(mini_campaign):
    """Obstacle ablation = extra batch entries with drops masked out."""
    import jax.numpy as jnp

    from nclt_slam_tpu.rollout.campaign import expand_for_ablations

    cfg, data, teach = mini_campaign
    wps, n_wps = teach_waypoints(data, teach, cfg)
    exp, tg, wp, nw, st, labels = expand_for_ablations(
        data, teach.teach_grid, wps, n_wps)
    assert len(labels) == 4
    assert exp.routes.spawn.shape[0] == 4
    # clean entries have all drop slots invalid
    v = np.asarray(exp.scenes_repeat.valid)
    dm = np.asarray(exp.scenes_repeat.drop_mask)
    assert not (v[2:] & dm[2:]).any()
    rep = run_campaign_repeat(exp, tg, wp, nw, cfg, 150)
    assert rep.trace.gt_xy.shape[0] == 4
    assert bool(jnp.isfinite(rep.trace.gt_xy).all())
