from nclt_slam_tpu.sensors.depth import (
    R_BASE_CAM,
    camera_pose,
    ray_grid,
    render_depth,
    sample_depth_at_pixels,
)
from nclt_slam_tpu.sensors.imu import ImuState, imu_block, imu_step, init_imu

__all__ = [
    "R_BASE_CAM",
    "camera_pose",
    "ray_grid",
    "render_depth",
    "sample_depth_at_pixels",
    "ImuState",
    "imu_block",
    "imu_step",
    "init_imu",
]
