"""Reference-format artefact interop.

BASELINE.json requires matching the reference's teach-artefact API:
``landmarks.pkl`` (visual_landmark_recorder.py:313-325 pickle layout),
``teach_map.{pgm,yaml}`` (teach_run_depth_mapper.save: P5 PGM with
0/205/254 trinary, flipped rows, + map-server YAML), 4 m waypoint lists,
``vio_pose_dense.csv`` (vio_drift_monitor writer columns) and
``traj_gt.csv``.  A user of the reference tooling can read our artefacts
and vice versa.
"""

from __future__ import annotations

import csv
import pickle
from pathlib import Path

import numpy as np

from nclt_slam_tpu.config import CameraConfig, Config, LandmarkConfig, MapConfig

BASE_TO_CAM_TRANSLATION = [0.35, 0.0, 0.18]
BASE_TO_CAM_ROT = [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]


# ---------------------------------------------------------------------------
# landmarks.pkl
# ---------------------------------------------------------------------------

def save_landmarks_pkl(store, path, cam: CameraConfig, cfg: LandmarkConfig):
    """LandmarkStore -> the reference pickle layout.  Descriptors are
    re-viewed as the 32-byte-per-feature uint8 rows OpenCV ORB produces."""
    count = int(store.count)
    landmarks = []
    cam_pos = np.asarray(store.cam_pos)
    cam_yaw = np.asarray(store.cam_yaw)
    desc = np.asarray(store.desc)
    p3d = np.asarray(store.p3d_cam)
    uv = np.asarray(store.uv)
    fval = np.asarray(store.feat_valid)
    for i in range(count):
        m = fval[i]
        n = int(m.sum())
        half_yaw = 0.5 * cam_yaw[i]
        pose = (float(cam_pos[i, 0]), float(cam_pos[i, 1]),
                float(cam_pos[i, 2]), 0.0, 0.0,
                float(np.sin(half_yaw)), float(np.cos(half_yaw)))
        landmarks.append({
            "pose": pose,
            "descriptors": desc[i][m].view(np.uint8).reshape(n, -1),
            "keypoints_2d": uv[i][m].astype(np.float32),
            "keypoints_3d_cam": p3d[i][m].astype(np.float32),
            "ts": float(i),
            "n_features": n,
        })
    payload = {
        "intrinsics": {"fx": cam.fx, "fy": cam.fy, "cx": cam.cx,
                       "cy": cam.cy, "width": cam.width,
                       "height": cam.height},
        "base_to_cam_translation": BASE_TO_CAM_TRANSLATION,
        "base_to_cam_rot": BASE_TO_CAM_ROT,
        "landmarks": landmarks,
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return payload


def load_landmarks_pkl(path, cfg: LandmarkConfig):
    """Reference pickle -> LandmarkStore pytree (padded to capacity)."""
    import jax.numpy as jnp

    from nclt_slam_tpu.landmarks.store import init_store

    with open(path, "rb") as f:
        payload = pickle.load(f)
    store = init_store(cfg)
    L, F, W = cfg.max_landmarks, cfg.feats_per_landmark, cfg.desc_words

    cam_pos = np.zeros((L, 3), np.float32)
    cam_yaw = np.zeros(L, np.float32)
    desc = np.zeros((L, F, W), np.uint32)
    p3d = np.zeros((L, F, 3), np.float32)
    uv = np.zeros((L, F, 2), np.float32)
    fval = np.zeros((L, F), bool)
    nf = np.zeros(L, np.int32)

    lms = payload["landmarks"][:L]
    for i, lm in enumerate(lms):
        pose = lm["pose"]
        cam_pos[i] = pose[:3]
        qz, qw = pose[5], pose[6]
        cam_yaw[i] = 2.0 * np.arctan2(qz, qw)
        n = min(int(lm["n_features"]), F)
        d8 = np.asarray(lm["descriptors"][:n], np.uint8)
        desc[i, :n] = d8.reshape(n, -1).view(np.uint32)[:, :W]
        p3d[i, :n] = lm["keypoints_3d_cam"][:n]
        uv[i, :n] = lm["keypoints_2d"][:n]
        fval[i, :n] = True
        nf[i] = n

    import jax

    return store._replace(
        cam_pos=jnp.asarray(cam_pos), cam_yaw=jnp.asarray(cam_yaw),
        desc=jnp.asarray(desc), p3d_cam=jnp.asarray(p3d),
        uv=jnp.asarray(uv), feat_valid=jnp.asarray(fval),
        n_feats=jnp.asarray(nf), count=jnp.int32(len(lms)),
    )


# ---------------------------------------------------------------------------
# teach_map.{pgm,yaml}
# ---------------------------------------------------------------------------

def save_teach_map(trinary, out_prefix, cfg: MapConfig):
    """Trinary occupancy {0 free, 1 unknown, 2 occupied} -> reference PGM
    (0 occupied / 254 free / 205 unknown, top row first) + YAML."""
    grid = np.asarray(trinary)
    img = np.full(grid.shape, 205, np.uint8)
    img[grid == 2] = 0
    img[grid == 0] = 254
    img = np.flipud(img)

    out_prefix = str(out_prefix)
    Path(out_prefix).parent.mkdir(parents=True, exist_ok=True)
    pgm_path = out_prefix + ".pgm"
    with open(pgm_path, "wb") as f:
        f.write(b"P5\n")
        f.write(b"# nclt_slam_tpu teach-run depth map\n")
        f.write(f"{grid.shape[1]} {grid.shape[0]}\n".encode())
        f.write(b"255\n")
        f.write(img.tobytes())

    yaml_path = out_prefix + ".yaml"
    with open(yaml_path, "w") as f:
        f.write(f"image: {pgm_path}\n")
        f.write(f"resolution: {cfg.resolution}\n")
        f.write(f"origin: [{cfg.origin_x}, {cfg.origin_y}, 0.0]\n")
        f.write("occupied_thresh: 0.65\nfree_thresh: 0.25\nnegate: 0\n")
    return pgm_path, yaml_path


def load_teach_map(out_prefix):
    """PGM/YAML -> trinary grid + (resolution, origin)."""
    pgm_path = str(out_prefix) + ".pgm"
    with open(pgm_path, "rb") as f:
        assert f.readline().strip() == b"P5"
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        f.readline()  # maxval
        img = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
    img = np.flipud(img)
    grid = np.ones((h, w), np.int8)
    grid[img == 0] = 2
    grid[img == 254] = 0

    res, origin = None, None
    lines = Path(str(out_prefix) + ".yaml").read_text().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("resolution:"):
            res = float(line.split(":")[1])
        elif line.startswith("origin:"):
            rest = line.split(":", 1)[1].strip()
            if rest.startswith("["):
                origin = [float(v) for v in rest.strip("[]").split(",")]
            else:
                # block-style list (the reference's yaml.safe_dump layout)
                origin = []
                while i + 1 < len(lines) and lines[i + 1].lstrip().startswith("-"):
                    i += 1
                    origin.append(float(lines[i].lstrip()[1:].strip()))
        i += 1
    return grid, res, origin


# ---------------------------------------------------------------------------
# CSV artefacts
# ---------------------------------------------------------------------------

def save_vio_pose_dense(path, ticks_s, slam_xyz_quat, gt_xy):
    """vio_pose_dense.csv with the drift-monitor's exact column layout
    (t_wall, sim_t, vio_x, vio_y, vio_z, qx, qy, qz, qw, gt_x, gt_y) —
    the repeat WP source."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["t_wall", "sim_t", "vio_x", "vio_y", "vio_z",
                    "qx", "qy", "qz", "qw", "gt_x", "gt_y"])
        for t, sp, g in zip(ticks_s, slam_xyz_quat, gt_xy):
            w.writerow([f"{t:.3f}", f"{t:.1f}", *[f"{v:.6f}" for v in sp],
                        f"{g[0]:.6f}", f"{g[1]:.6f}"])
    return path


def load_vio_pose_dense(path):
    gt = []
    with open(path) as f:
        for row in csv.DictReader(f):
            gt.append((float(row["gt_x"]), float(row["gt_y"])))
    return np.asarray(gt, np.float32)


def save_traj_gt(path, ticks_s, gt_xy, gt_yaw=None):
    """traj_gt.csv (ts, x, y[, yaw]) consumed by compute_metrics."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["timestamp", "x", "y", "yaw"])
        yaws = gt_yaw if gt_yaw is not None else np.zeros(len(gt_xy))
        for t, g, y in zip(ticks_s, gt_xy, yaws):
            w.writerow([f"{t:.3f}", f"{g[0]:.6f}", f"{g[1]:.6f}", f"{y:.6f}"])
    return path


def load_traj_gt(path):
    pts = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith(("t", "#")):
                continue
            pts.append((float(row[1]), float(row[2])))
    return np.asarray(pts, np.float32)


def save_tum_trajectory(path, ticks_s, xyz, quat_xyzw):
    """TUM-format trajectory (ts x y z qx qy qz qw) for evo-style tools."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for t, p, q in zip(ticks_s, xyz, quat_xyzw):
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")
    return path


# ---------------------------------------------------------------------------
# checkpoint / resume (scan-carry snapshots — strictly better than the
# reference's artefact-only checkpointing, SURVEY.md §5)
# ---------------------------------------------------------------------------

def save_checkpoint(pytree, path):
    """Pickle a jax pytree (np-converted) for exact mid-rollout resume."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"leaves": [np.asarray(x) for x in leaves],
                     "treedef": treedef}, f)
    return path


def load_checkpoint(path):
    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree_util.tree_unflatten(
        blob["treedef"], [jnp.asarray(x) for x in blob["leaves"]])
