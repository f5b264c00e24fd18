"""Analysis CLI — renders the thesis-figure set from campaign outputs.

    python -m nclt_slam_tpu.cli.analyze --metrics runs/campaign/metrics.json \
        --out runs/campaign/figures

Also renders the scene/route overview map without any campaign data:

    python -m nclt_slam_tpu.cli.analyze --overview --out figures
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--metrics", default=None,
                    help="campaign metrics.json to summarize")
    ap.add_argument("--overview", action="store_true",
                    help="render the scene + route overview map")
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.overview:
        from nclt_slam_tpu.analysis import plot_trajectory_map
        from nclt_slam_tpu.rollout import pack_scene
        from nclt_slam_tpu.scene import default_scene, get_routes

        scene = pack_scene(default_scene())
        routes = get_routes()
        p = plot_trajectory_map(scene, routes, out / "routes_overview.png",
                                title="all 15 routes over the forest scene")
        print(f"[analyze] {p}")

    if args.metrics:
        from nclt_slam_tpu.analysis import plot_campaign_summary

        blob = json.loads(Path(args.metrics).read_text())
        per_route = blob.get("per_route", blob)
        p = plot_campaign_summary(per_route, out / "campaign_summary.png")
        print(f"[analyze] {p}")
        agg = blob.get("aggregate")
        if agg:
            print(f"[analyze] aggregate: {agg}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
