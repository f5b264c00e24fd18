#!/usr/bin/env python3
"""Benchmark: batched repeat-campaign throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Metric definition (BASELINE.json): env steps/sec/chip on the route batch,
where one env step = one 200 Hz physics substep of one route.  One nav tick
= 20 substeps, and the batch runs all routes simultaneously.

Baseline: the reference runs Isaac at 18-30 % of wall clock on an RTX 3090,
one route at a time (routes/README.md:125) — i.e. ~0.24 x 200 Hz = 48 env
steps/sec aggregate.  vs_baseline = ours / 48.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_routes = int(os.environ.get("BENCH_ROUTES", "15"))
    n_ticks = int(os.environ.get("BENCH_TICKS", "400"))
    teach_ticks = int(os.environ.get("BENCH_TEACH_TICKS", "100"))

    from nclt_slam_tpu import config as cfg_mod
    from nclt_slam_tpu.rollout.campaign import (
        build_campaign,
        run_campaign_repeat,
        run_campaign_teach,
        teach_waypoints,
    )
    from nclt_slam_tpu.scene.routes import ALL_ROUTES

    cfg = cfg_mod.gt_localization()
    names = ALL_ROUTES[:n_routes]
    data = build_campaign(names, cfg=cfg)

    # short teach to produce maps + WPs (not timed)
    teach = jax.jit(lambda d: run_campaign_teach(d, cfg, teach_ticks))(data)
    jax.block_until_ready(teach.teach_grid)
    wps, n_wps = teach_waypoints(data, teach, cfg)

    run = jax.jit(lambda d, g, w, n: run_campaign_repeat(d, g, w, n, cfg,
                                                         n_ticks))
    # compile + warmup
    out = run(data, teach.teach_grid, wps, n_wps)
    jax.block_until_ready(out.trace.gt_xy)

    t0 = time.perf_counter()
    out = run(data, teach.teach_grid, wps, n_wps)
    jax.block_until_ready(out.trace.gt_xy)
    dt = time.perf_counter() - t0

    substeps = cfg.sim.nav_decimation
    env_steps = n_ticks * substeps * len(names)
    steps_per_sec = env_steps / dt

    baseline = 0.24 * 200.0  # reference: 18-30 % of real time, one route
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
