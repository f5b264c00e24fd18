"""Turnaround supervisor (turnaround_supervisor.py:37-77).

Watches the GT pose; once the robot has been > 30 m from the final
(turnaround) point and then comes back within the near radius, it FIREs
once — in the reference that writes /tmp/isaac_remove_obstacles.txt and the
sim despawns the dropped props; here the fire flag simply masks the drop
colliders out of the scene arrays inside the same jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import SupervisorConfig


class SupervisorState(NamedTuple):
    been_far: jax.Array   # () bool
    fired: jax.Array      # () bool


def init_supervisor() -> SupervisorState:
    return SupervisorState(been_far=jnp.array(False), fired=jnp.array(False))


def supervisor_tick(state: SupervisorState, gt_xy, final_xy,
                    cfg: SupervisorConfig) -> SupervisorState:
    d = jnp.linalg.norm(gt_xy - final_xy)
    been_far = state.been_far | (d > cfg.far_dist)
    fire = state.fired | (been_far & (d < cfg.near_radius))
    return SupervisorState(been_far=been_far, fired=fire)
