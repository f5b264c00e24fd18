from nclt_slam_tpu.dynamics.diffdrive import (
    RobotState,
    init_robot,
    nav_substeps,
    robot_pose3d,
    substep,
)

__all__ = ["RobotState", "init_robot", "nav_substeps", "robot_pose3d", "substep"]
