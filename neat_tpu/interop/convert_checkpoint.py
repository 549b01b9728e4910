"""CLI: convert a reference .pth checkpoint into a neat_tpu run directory.

Creates <out>/checkpoints/latest.ckpt (+ runconf.conf copy) so that
neat_tpu.wireframe.finalize / evaluation.render_eval consume released
reference checkpoints directly.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil


def main(argv=None):
    from ..utils.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser()
    parser.add_argument("--pth", required=True, help="reference ModelParameters/*.pth")
    parser.add_argument("--conf", required=True, help="matching .conf file")
    parser.add_argument("--out", required=True, help="output run directory")
    parser.add_argument("--epoch", type=int, default=None, help="override epoch tag")
    args = parser.parse_args(argv)

    import torch

    from ..train.config import load_experiment_config
    from ..train.step import init_train_state
    from ..train.checkpoint import save_checkpoint
    from .torch_import import reference_state_to_params

    cfg = load_experiment_config(args.conf)
    payload = torch.load(args.pth, map_location="cpu", weights_only=False)
    state_dict = payload.get("model_state_dict", payload)
    params = reference_state_to_params(state_dict, cfg.model)
    state = init_train_state(params, cfg.learning_rate, cfg.sched_decay_rate, 1)

    epoch = args.epoch
    if epoch is None:
        epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0

    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(osp.join(args.out, "checkpoints"), state, epoch)
    shutil.copy(args.conf, osp.join(args.out, "runconf.conf"))
    print(f"imported {args.pth} (epoch {epoch}) -> {args.out}")


if __name__ == "__main__":
    main()
