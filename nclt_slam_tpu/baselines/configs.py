"""Campaign baseline configs — the reference's two ablation stacks.

The reference compares its hybrid T&R stack against (exp 74) stock Nav2
(FollowWaypoints + standard controller, none of the hybrid additions) and
(exp 76) the same pipeline with pure RGB-D ORB-SLAM3 (no IMU) and no
anchors (routes/README.md:153-210).  In our framework both are pure config
points over the same jitted rollout — the ablation axis the reference
needed three separate process stacks for.
"""

from __future__ import annotations

import dataclasses

from nclt_slam_tpu import config as cfg_mod
from nclt_slam_tpu.config import Config, LocalizationMode


def stock_nav2() -> Config:
    """exp 74: genuine stock Nav2 stack, not just flag-disabling.

    - localization: VIO+encoder fusion WITHOUT visual anchors (stock Nav2
      had no matcher process feeding /anchor_correction)
    - controller: RegulatedPurePursuit + BT recovery behaviors
      (control/rpp.py — nav2_stock_params.yaml:26-81) instead of the thesis
      follower; no proximity limiter / anti-spin / wedge recovery
    - dispatcher: FollowWaypoints semantics (stock_follow): one-time
      client-side WP projection (waypoint_follower_client.py:66-163), no
      live reprojection / detour ring / known-obstacle gate / lookahead
      skip, NO per-WP timeout (the reference baseline's stall mode —
      routes/README.md:229-242), no final-WP policy
    """
    base = cfg_mod.ours()
    return base.replace(
        mode=LocalizationMode(use_slam=True, use_anchors=False,
                              use_imu=True, use_gt=False),
        planner=dataclasses.replace(
            base.planner, enable_detour=False, enable_projection=False,
            enable_known_obstacle_gate=False, enable_lookahead_skip=False,
            stock_follow=True, gt_stall_abort=True),
        control=dataclasses.replace(
            base.control, enable_wedge=False, enable_antispin=False,
            enable_prox=False, use_rpp=True),
    )


def rgbd_no_imu() -> Config:
    """exp 76: our pipeline with pure RGB-D VIO (no inertial term); the
    anchor matcher stays on (exp 76's results contain anchor_matches.csv).
    Baseline runs carry the GT-stall watchdog (rerun 2026-04-23 'with
    fixes (same as exp 74)', routes/README.md:188-190)."""
    base = cfg_mod.rgbd_no_imu()
    return base.replace(planner=dataclasses.replace(
        base.planner, gt_stall_abort=True))
