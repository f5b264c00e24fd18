"""Dataset pipelines — the algorithm source-book half of the reference
(SURVEY.md §2.2: NCLT loaders/calibration, LiDAR ICP odometry, loop closure
+ pose-graph optimization, IMU/point-cloud/GPS utilities, place-recognition
scaffold, trajectory evaluation)."""

from nclt_slam_tpu.datasets import calibration, loaders
from nclt_slam_tpu.datasets.slam import icp, loop_closure
from nclt_slam_tpu.datasets.utils import gps, imu_utils, point_cloud

__all__ = [
    "calibration",
    "loaders",
    "icp",
    "loop_closure",
    "gps",
    "imu_utils",
    "point_cloud",
]
