"""Checkpointing: full train-state snapshots with epoch tags.

The reference keeps three parallel .pth dirs (ModelParameters /
OptimizerParameters / SchedulerParameters, reference volsdf_train.py:
252-272) but on resume restores only the model — the optimizer/scheduler
loads are commented out (volsdf_train.py:203,207), silently restarting the
LR schedule. Here one snapshot carries params + optimizer state + step so
resume is exact (the fix SURVEY.md §5 calls for).

Format: a single pickle of the device-fetched pytree per tag under
``checkpoints/`` (``{epoch}.ckpt`` + ``latest.ckpt``), plus a
``ModelParameters/{epoch}.npz`` params-only export kept for tooling parity
with the reference layout (finalization's sweep_ckpt glob).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state, epoch: int) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.device_get(state)
    payload = {"epoch": epoch, "state": host_state}
    for tag in (str(epoch), "latest"):
        with open(osp.join(ckpt_dir, f"{tag}.ckpt"), "wb") as f:
            pickle.dump(payload, f)

    # params-only export in the reference's ModelParameters layout
    mp_dir = osp.join(ckpt_dir, "ModelParameters")
    os.makedirs(mp_dir, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(host_state.params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    for tag in (str(epoch), "latest"):
        np.savez(osp.join(mp_dir, f"{tag}.npz"), **arrays)


def load_checkpoint(ckpt_dir: str, tag: str = "latest") -> Tuple[Any, int]:
    path = osp.join(ckpt_dir, f"{tag}.ckpt")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload["epoch"]


def sweep_checkpoint(expdir: str, checkpoint: str = "latest") -> Optional[str]:
    """Find the timestamp dir containing the requested checkpoint
    (the analogue of reference neat-final-parsing.py:48-72 sweep_ckpt)."""
    from pathlib import Path

    expdir = Path(expdir)
    candidates = sorted(expdir.glob(f"*/checkpoints/{checkpoint}.ckpt"))
    if len(candidates) > 1:
        raise RuntimeError(
            "multiple timestamps contain checkpoint "
            f"{checkpoint}: {[c.parts[-3] for c in candidates]}"
        )
    if not candidates:
        return None
    return str(candidates[0].parent.parent.name)
