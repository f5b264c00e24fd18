from nclt_slam_tpu.baselines.configs import rgbd_no_imu, stock_nav2

__all__ = ["rgbd_no_imu", "stock_nav2"]
