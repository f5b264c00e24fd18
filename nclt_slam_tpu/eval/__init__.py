from nclt_slam_tpu.eval.metrics import (
    average_precision,
    pr_curve,
    aggregate_metrics,
    align_umeyama_2d,
    ate_rmse,
    drift_metrics,
    endpoint_metrics,
    procrustes_drift_2d,
    route_metrics,
    rpe_rmse,
    subsample_wps,
    wp_coverage,
)

__all__ = [
    "average_precision",
    "pr_curve",
    "aggregate_metrics",
    "align_umeyama_2d",
    "ate_rmse",
    "drift_metrics",
    "endpoint_metrics",
    "procrustes_drift_2d",
    "route_metrics",
    "rpe_rmse",
    "subsample_wps",
    "wp_coverage",
]
