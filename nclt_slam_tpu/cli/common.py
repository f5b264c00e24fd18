"""Shared CLI plumbing (mode selection, artefact writing)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from nclt_slam_tpu import config as cfg_mod
from nclt_slam_tpu.io.artifacts import (
    save_landmarks_pkl,
    save_teach_map,
    save_traj_gt,
    save_vio_pose_dense,
)

from nclt_slam_tpu.baselines import stock_nav2

MODES = {
    "ours": cfg_mod.ours,
    "gt": cfg_mod.gt_localization,
    "encoder": cfg_mod.encoder_only,
    "rgbd": cfg_mod.rgbd_no_imu,
    "stock": stock_nav2,
}


def config_for(mode: str, scale: float = 1.0):
    import dataclasses

    cfg = MODES[mode]()
    if scale != 1.0:
        cam = cfg.camera
        cfg = cfg.replace(camera=dataclasses.replace(
            cam,
            ray_cols=max(8, int(cam.ray_cols * scale)),
            ray_rows=max(6, int(cam.ray_rows * scale)),
        ))
    return cfg


def write_teach_artifacts(out_dir, teach, route, cfg):
    """Write the reference teach artefact set from a TeachResult."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    gt = np.asarray(teach.trace.gt_xy)
    yaw = np.asarray(teach.trace.gt_yaw)
    done = np.asarray(teach.trace.done)
    live = ~done
    ts = np.arange(len(gt)) * 0.1

    save_teach_map(np.asarray(teach.teach_grid), out / "teach_map", cfg.map)
    save_landmarks_pkl(teach.store, out / "landmarks.pkl", cfg.camera,
                       cfg.landmarks)
    # vio_pose_dense carries the teach VIO track aligned to GT (what the
    # reference drift monitor writes); with run_vio off it degenerates to
    # GT, like the --use-gt relay
    if cfg.teach.run_vio:
        from nclt_slam_tpu.eval.metrics import procrustes_align_2d
        vio = np.asarray(teach.trace.vio_xy)
        pose_xy = procrustes_align_2d(vio[live], gt[live])
    else:
        pose_xy = gt[live]
    slam = np.column_stack([pose_xy, np.zeros(live.sum()),
                            np.zeros((live.sum(), 2)),
                            np.sin(yaw[live] / 2), np.cos(yaw[live] / 2)])
    save_vio_pose_dense(out / "vio_pose_dense.csv", ts[live], slam, gt[live])
    save_traj_gt(out / "traj_gt.csv", ts[live], gt[live], yaw[live])
    return out


def write_repeat_artifacts(out_dir, rep, cfg):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    gt = np.asarray(rep.trace.gt_xy)
    yaw = np.asarray(rep.trace.gt_yaw)
    nav = np.asarray(rep.trace.nav_xy)
    ts = np.arange(len(gt)) * 0.1
    save_traj_gt(out / "traj_gt.csv", ts, gt, yaw)
    np.savetxt(out / "nav_pose.csv",
               np.column_stack([ts, nav]), delimiter=",",
               header="ts,nav_x,nav_y", comments="")
    return out


def write_metrics(out_dir, metrics: dict):
    p = Path(out_dir) / "metrics.json"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(metrics, indent=2, default=str))
    return p
