"""Profiling and debugging hooks.

The reference has no profiler integration (SURVEY.md §5: tqdm only) and
debugs NaNs with pdb-dropping backward hooks (volsdf_train.py:23-48).
TPU-native equivalents:

  * :func:`trace` — context manager around jax.profiler for XLA/TPU traces
    viewable in TensorBoard/Perfetto;
  * :func:`step_timer` — wall-clock section timing; jax dispatch is
    asynchronous, so call :func:`force_sync` on a result INSIDE the block
    to measure execution rather than dispatch (plain block_until_ready can
    return early under the axon tunnel);
  * :func:`enable_nan_debugging` — jax_debug_nans: any NaN produced inside
    a jitted function raises with the offending primitive (the functional
    analogue of the reference's NaN backward hooks).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str, result_holder: Optional[dict] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[name] = dt
    else:
        print(f"[{name}] {dt * 1000:.2f} ms")


def force_sync(x) -> float:
    """Fetch a scalar from a device array, forcing execution to finish."""
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def enable_nan_debugging() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)
