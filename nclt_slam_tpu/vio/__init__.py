from nclt_slam_tpu.vio.ba import BAProblem, BAResult, solve_ba
from nclt_slam_tpu.vio.preintegration import (
    Preintegrated,
    empty_preint,
    integrate_block,
    propagate,
)
from nclt_slam_tpu.vio.tracker import (
    MAP_CAP,
    VioState,
    emit_slam_pose,
    init_vio,
    vio_frame,
)

__all__ = [
    "BAProblem",
    "BAResult",
    "solve_ba",
    "Preintegrated",
    "empty_preint",
    "integrate_block",
    "propagate",
    "MAP_CAP",
    "VioState",
    "emit_slam_pose",
    "init_vio",
    "vio_frame",
]
