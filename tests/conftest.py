"""Test env: force CPU with an 8-device virtual mesh before JAX initializes.

Multi-chip sharding paths are tested on this virtual mesh (the reference has
no distributed story at all — SURVEY.md §2.4; we test ours anyway).

Note: the axon site hook force-sets ``jax_platforms="axon,cpu"`` via
jax.config at interpreter start, so overriding the env var alone is not
enough — we must update jax.config back to cpu before any backend
initializes.  Every real TPU op here would otherwise round-trip a network
tunnel (~100 ms/op), making the suite uselessly slow.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
