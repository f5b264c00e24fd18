from nclt_slam_tpu.rollout.repeat import (
    RepeatCarry,
    RepeatResult,
    RepeatTrace,
    repeat_step,
    run_repeat,
)
from nclt_slam_tpu.rollout.scene_pack import PackedRoute, PackedScene, pack_route, pack_scene
from nclt_slam_tpu.rollout.teach import (
    TeachCarry,
    TeachResult,
    TeachTrace,
    run_teach,
    teach_step,
)

__all__ = [
    "RepeatCarry",
    "RepeatResult",
    "RepeatTrace",
    "repeat_step",
    "run_repeat",
    "PackedRoute",
    "PackedScene",
    "pack_route",
    "pack_scene",
    "TeachCarry",
    "TeachResult",
    "TeachTrace",
    "run_teach",
    "teach_step",
]
