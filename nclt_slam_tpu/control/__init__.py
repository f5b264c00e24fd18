from nclt_slam_tpu.control.pure_pursuit import CtrlState, follower_tick, init_ctrl
from nclt_slam_tpu.control.supervisor import SupervisorState, init_supervisor, supervisor_tick

__all__ = [
    "CtrlState",
    "follower_tick",
    "init_ctrl",
    "SupervisorState",
    "init_supervisor",
    "supervisor_tick",
]
