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
    # the recorded headline measures the FULL flagship stack (VIO + anchors
    # + v55 fusion); gt/encoder/rgbd modes remain selectable for comparison
    mode = os.environ.get("BENCH_MODE", "ours")  # ours | gt | encoder | rgbd

    from nclt_slam_tpu import config as cfg_mod
    from nclt_slam_tpu.rollout.campaign import (
        build_campaign,
        run_campaign_repeat,
        run_campaign_teach,
        teach_waypoints,
    )
    from nclt_slam_tpu.scene.routes import ALL_ROUTES

    from nclt_slam_tpu.cli.common import MODES

    cfg = MODES[mode]()
    cfg_teach = cfg_mod.gt_localization()
    names = ALL_ROUTES[:n_routes]
    data = build_campaign(names, cfg=cfg)

    # short teach to produce maps + WPs (not timed)
    teach = run_campaign_teach(data, cfg_teach, teach_ticks)
    jax.block_until_ready(teach.teach_grid)
    wps, n_wps = teach_waypoints(data, teach, cfg)
    stores = None if mode == "gt" else teach.store

    def run():
        return run_campaign_repeat(data, teach.teach_grid, wps, n_wps, cfg,
                                   n_ticks, stores=stores)

    # compile + warmup
    out = run()
    jax.block_until_ready(out.trace.gt_xy if hasattr(out.trace.gt_xy, 'block_until_ready') else jnp.zeros(()))

    t0 = time.perf_counter()
    out = run()
    dt = time.perf_counter() - t0

    substeps = cfg.sim.nav_decimation
    env_steps = n_ticks * substeps * len(names)
    steps_per_sec = env_steps / dt

    # secondary metric: sliding-window BA solves/sec (batched windows)
    ba_rate = _bench_ba()

    baseline = 0.24 * 200.0  # reference: 18-30 % of real time, one route
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
        "extra": {"ba_solves_per_sec": round(ba_rate, 1),
                  "routes": len(names), "ticks": n_ticks, "mode": mode,
                  "wall_s": round(dt, 2)},
    }))


def _bench_ba(batch: int = 64, iters: int = 8):
    """Batched sliding-window BA throughput (10 KF x 128 pts per window)."""
    import numpy as np

    from nclt_slam_tpu import config as cfg_mod
    from nclt_slam_tpu.vio.ba import BAProblem, solve_ba

    cfg = cfg_mod.DEFAULT
    rng = np.random.RandomState(0)
    K, P = cfg.vio.window_kf, cfg.vio.max_points

    def mk(seed):
        r = np.random.RandomState(seed)
        return BAProblem(
            kf_pos=jnp.asarray(np.cumsum(r.normal(0.5, 0.1, (K, 3)), 0),
                               jnp.float32),
            kf_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (K, 1)),
            points=jnp.asarray(r.uniform(2, 14, (P, 3)), jnp.float32),
            obs_uv=jnp.asarray(r.uniform(0, 640, (K, P, 2)), jnp.float32),
            obs_z=jnp.asarray(r.uniform(1, 12, (K, P)), jnp.float32),
            obs_w=jnp.asarray(r.rand(K, P) < 0.4, jnp.float32),
            rel_dp=jnp.asarray(r.normal(0.5, 0.1, (K - 1, 3)), jnp.float32),
            rel_dq=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (K - 1, 1)),
            w_rel=jnp.float32(100.0))

    probs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[mk(s) for s in range(batch)])
    f = jax.jit(jax.vmap(lambda p: solve_ba(
        p, cfg.camera, cfg.vio, iters=iters)))
    out = f(probs)
    jax.block_until_ready(out.kf_pos)
    t0 = time.perf_counter()
    out = f(probs)
    jax.block_until_ready(out.kf_pos)
    return batch / (time.perf_counter() - t0)


if __name__ == "__main__":
    sys.exit(main())
