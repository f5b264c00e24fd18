from nclt_slam_tpu.analysis.plots import (
    plot_campaign_summary,
    plot_drift,
    plot_route_run,
    plot_trajectory_map,
)

__all__ = [
    "plot_campaign_summary",
    "plot_drift",
    "plot_route_run",
    "plot_trajectory_map",
]
