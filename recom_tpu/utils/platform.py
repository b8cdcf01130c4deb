"""Backend-selection helper for CLI entry points.

On hosts where a sitecustomize-registered remote backend overrides the
JAX_PLATFORMS env var (the axon tunnel), the env var alone does NOT switch
backends — and a dead tunnel hangs backend init forever.  Every CLI main()
calls this before touching jax.
"""

from __future__ import annotations

import os


def honor_cpu_platform() -> None:
    """If JAX_PLATFORMS=cpu is set, force the CPU backend through
    jax.config (must run before any backend initializes)."""
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
