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

Durability: every file is written atomically (tmp file in the same
directory + ``os.replace``), so a preemption mid-save can never corrupt an
existing snapshot — the strongest failure the runner's save-on-SIGTERM
contract (runner.py) has to survive. ``load_checkpoint`` additionally
falls back from a truncated/corrupt ``latest.ckpt`` (e.g. one written by a
pre-atomic version, or a torn filesystem) to the newest epoch tag that
unpickles cleanly.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import pickle
import re
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _atomic_write(path: str, write_fn) -> None:
    """Write via a same-directory tmp file + os.replace (atomic on POSIX)."""
    d = osp.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=osp.basename(path) + ".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            write_fn(f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_checkpoint(ckpt_dir: str, state, epoch: int) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.device_get(state)
    payload = {"epoch": epoch, "state": host_state}
    blob = pickle.dumps(payload)
    for tag in (str(epoch), "latest"):
        _atomic_write(
            osp.join(ckpt_dir, f"{tag}.ckpt"), lambda f: f.write(blob)
        )

    # params-only export in the reference's ModelParameters layout
    mp_dir = osp.join(ckpt_dir, "ModelParameters")
    os.makedirs(mp_dir, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(host_state.params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    for tag in (str(epoch), "latest"):
        _atomic_write(
            osp.join(mp_dir, f"{tag}.npz"),
            lambda f: np.savez(f, **arrays),
        )


def _read_ckpt(path: str) -> Tuple[Any, int]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload["epoch"]


def load_checkpoint(ckpt_dir: str, tag: str = "latest") -> Tuple[Any, int]:
    """Load a snapshot; on a corrupt/truncated file, fall back to the
    newest epoch tag that loads cleanly (resume loses at most one save
    interval — the guarantee a mid-write kill must not break)."""
    path = osp.join(ckpt_dir, f"{tag}.ckpt")
    try:
        return _read_ckpt(path)
    except (
        FileNotFoundError,
        pickle.UnpicklingError,
        EOFError,
        ValueError,
        MemoryError,
    ) as e:
        # FileNotFoundError: a kill between the epoch-tag write and the
        # latest-tag write leaves the numeric tag as the newest snapshot
        first_err = e
    # fall back over numeric epoch tags, newest first, skipping the bad one
    epochs = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(\d+)\.ckpt", name)
        if m:
            epochs.append(int(m.group(1)))
    for ep in sorted(epochs, reverse=True):
        cand = osp.join(ckpt_dir, f"{ep}.ckpt")
        if osp.abspath(cand) == osp.abspath(path):
            continue
        try:
            state, epoch = _read_ckpt(cand)
            logger.warning(
                "checkpoint %s is corrupt (%s); resumed from %s instead",
                path, first_err, cand,
            )
            return state, epoch
        except (pickle.UnpicklingError, EOFError, ValueError, MemoryError):
            continue
    raise RuntimeError(
        f"checkpoint {path} is corrupt ({first_err}) and no earlier "
        f"epoch tag in {ckpt_dir} loads cleanly"
    )


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
