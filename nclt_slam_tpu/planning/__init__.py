from nclt_slam_tpu.planning.dispatcher import (
    DispatchState,
    dispatch_move,
    dispatch_plan,
    find_detour,
    init_dispatch,
    project_waypoints,
    subsample_waypoints,
)
from nclt_slam_tpu.planning.wavefront import PlanResult, plan_window, plan_world

__all__ = [
    "DispatchState",
    "dispatch_move",
    "dispatch_plan",
    "find_detour",
    "init_dispatch",
    "project_waypoints",
    "subsample_waypoints",
    "PlanResult",
    "plan_window",
    "plan_world",
]
