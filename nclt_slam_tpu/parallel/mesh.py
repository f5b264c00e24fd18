"""Multi-chip scaling: shard the route/ablation batch over a device mesh.

The reference has no distributed story (SURVEY.md §2.4 — its only
parallelism is OS processes + sequential route batches).  Our batch axis is
(route × ablation), which is embarrassingly parallel — so the sharding
design is: one mesh axis ``routes``, batch leading dims sharded over it,
scene constants replicated.  No collectives are needed in the rollout
itself; metrics reductions happen post-hoc.  ICI is therefore only used for
the initial scatter + final gather, which XLA inserts from the shardings —
exactly the scaling-book recipe of "annotate shardings, let XLA insert
collectives".  On a pod, independent campaign replicas (seeds) ride DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nclt_slam_tpu.config import Config


def route_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("routes",))


def pad_batch(tree, multiple: int):
    """Pad every leaf's leading (route) axis up to a multiple so it shards
    evenly; padding replicates the last route (masked out in metrics)."""

    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        fill = jnp.repeat(x[-1:], rem, axis=0)
        return jnp.concatenate([x, fill], axis=0)

    return jax.tree_util.tree_map(pad, tree)


def shard_over_routes(tree, mesh: Mesh):
    """Place each leaf with its leading axis split over the ``routes`` axis."""
    sharding = NamedSharding(mesh, P("routes"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def sharded_campaign_repeat(data, teach_grids, wps, n_wps, cfg: Config,
                            n_ticks: int, mesh: Mesh | None = None):
    """Run the batched repeat campaign with the route axis sharded over the
    mesh.  Works on one chip (degenerate mesh) through a full pod slice."""
    from nclt_slam_tpu.rollout.campaign import run_campaign_repeat

    mesh = mesh or route_mesh()
    n = len(mesh.devices.flat)
    batch = (data.scenes_repeat, data.routes, teach_grids, wps, n_wps)
    batch = pad_batch(batch, n)
    batch = shard_over_routes(batch, mesh)
    scenes, routes, tg, wp, nw = batch

    return run_campaign_repeat(_campaign_view(scenes, routes), tg, wp, nw,
                               cfg, n_ticks)


def _campaign_view(scenes, routes):
    from nclt_slam_tpu.rollout.campaign import CampaignData

    return CampaignData(scenes_teach=scenes, scenes_repeat=scenes,
                        routes=routes, names=[])
