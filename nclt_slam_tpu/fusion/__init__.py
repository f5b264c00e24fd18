from nclt_slam_tpu.fusion.relay import (
    REGIME_ENCODER,
    REGIME_NO_ANCHOR,
    REGIME_OK,
    REGIME_STRONG,
    FusionState,
    anchor_update,
    fusion_tick,
    init_fusion,
)

__all__ = [
    "REGIME_ENCODER",
    "REGIME_NO_ANCHOR",
    "REGIME_OK",
    "REGIME_STRONG",
    "FusionState",
    "anchor_update",
    "fusion_tick",
    "init_fusion",
]
