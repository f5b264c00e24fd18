from nclt_slam_tpu.landmarks.matcher import (
    R_CONSISTENCY_FAIL,
    R_NO_CANDIDATES,
    R_NO_FEATURES,
    R_NO_PNP_ACCEPT,
    R_PUBLISHED,
    AnchorResult,
    match_tick,
    ransac_pose,
)
from nclt_slam_tpu.landmarks.store import LandmarkStore, init_store, record_tick

__all__ = [
    "R_CONSISTENCY_FAIL",
    "R_NO_CANDIDATES",
    "R_NO_FEATURES",
    "R_NO_PNP_ACCEPT",
    "R_PUBLISHED",
    "AnchorResult",
    "match_tick",
    "ransac_pose",
    "LandmarkStore",
    "init_store",
    "record_tick",
]
