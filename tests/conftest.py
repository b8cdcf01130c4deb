"""Test env: force CPU with an 8-device virtual mesh so multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md section 7 step 7).

Note: the axon sitecustomize sets jax_platforms programmatically at
interpreter start, so the JAX_PLATFORMS env var alone is not enough — we
must update jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact combiner math (ops/lookup_xla.exact_div) needs x64; Engine enables
# this itself, but low-level op tests may run before any Engine exists
jax.config.update("jax_enable_x64", True)
