"""Honor an explicit JAX_PLATFORMS request under the axon sitecustomize.

This image's sitecustomize force-sets ``jax_platforms="axon,cpu"`` at
interpreter start — AFTER the environment variable has been read — so
``JAX_PLATFORMS=cpu python -m neat_tpu...`` silently runs against the
tunneled TPU anyway, and hangs forever when the externally-driven tunnel
relay is dead (see .claude/skills/verify). Calling this at a CLI entry
point, before the first backend use, restores the documented env
contract. No-op when the variable is unset.
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        # backends already initialized (e.g. library use mid-process):
        # too late to repoint, leave the active platform alone
        pass
