"""Auction-vs-Hungarian TRAINING A/B at DTU shapes (VERDICT r3 #6).

The low-contention flagship regime was shown exact (docs/
auction_ablation_r2.md) and the DTU-shaped masked matrices agree at
n_iters=64 in the smoke test, but round 3 never measured whether the two
assignment backends produce equivalent TRAINING at the DTU configuration
(1024 global junctions, DBSCAN proposals — reference
code/model/networks/neat_wfr_rend_c.py:427-433 proposal family,
loss_wfr.py:108 Hungarian). This driver runs the full rehearsal pipeline
twice on the synthetic DTU-convention scene — identical data, seed, and
schedule, differing ONLY in `assignment_method` (auction on-device vs
scipy Hungarian via pure_callback) — then reports:

  * per-arm wall-clock + sustained rays/s (the callback's tunnel
    round-trip cost at DTU shapes is part of the result);
  * final-quarter loss-term means per arm (training equivalence);
  * finalized-wireframe eval_lsr / eval_dtu metrics per arm
    (downstream equivalence);
  * keep-mask agreement / suboptimality on cost matrices captured from
    the trained auction checkpoint (the real-regime operating point,
    via tools/auction_ablation.py).

Usage:
    python tools/auction_ab_dtu.py --workdir /tmp/dtu_ab \
        [--nepoch 200] [--views 49] [--res 1200 1600] \
        [--out docs/auction_ab_dtu_r4.md] [--skip-train]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

CONF_TEMPLATE = """
model {{
    scene_bounding_sphere = 3.0
    feature_vector_size = 256
    dbscan_enabled = True
    field_compute_dtype = bfloat16
    use_median = False
    implicit_network {{
        dims = [256, 256, 256, 256, 256, 256, 256, 256]
        skip_in = [4]
        d_in = 3
        d_out = 1
        multires = 6
        geometric_init = True
        bias = 0.6
        weight_norm = True
        sphere_scale = 20.0
    }}
    rendering_network {{
        dims = [256, 256, 256, 256]
        d_in = 9
        d_out = 3
        mode = idr
        multires_view = 4
        weight_norm = True
    }}
    attraction_network {{
        dims = [256, 256, 256, 256]
        d_in = 9
        d_out = 6
        mode = idr
        weight_norm = True
    }}
    global_junctions {{
        num_junctions = 1024
        dim_hidden = 256
        num_layers = 2
        dim_out = 3
    }}
    density {{
        beta_min = 0.0001
        params_init {{ beta = 0.1 }}
    }}
    ray_sampler {{
        N_samples = 64
        N_samples_eval = 128
        N_samples_extra = 32
        near = 0.0
        eps = 0.1
        beta_iters = 10
        max_total_iters = 5
    }}
}}
loss {{
    rgb_loss = torch.nn.L1Loss
    eikonal_weight = 0.1
    line_weight = 0.01
}}
dataset {{
    data_dir = toy
    img_res = [{res0}, {res1}]
    scan_id = 7
    distance_threshold = 1.0
}}
train {{
    expname = dtu-ab
    dataset_class = datasets.scene_hawp_dataset.SceneDataset
    model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
    loss_class = model.networks.loss_wfr.VolSDFLoss
    learning_rate = 5.0e-4
    num_pixels = 1024
    checkpoint_freq = 100
    plot_freq = 100
    split_n_pixels = 1024
}}
plot {{
    plot_nimgs = 1
    resolution = 100
    grid_boundary = [-1.5, 1.5]
}}
"""

# train.log epoch lines: "<tag> [e/n]: k = v k = v ... (NN,NNN rays/s)"
_METRIC_RE = re.compile(r"(\w+) = ([0-9.eE+-]+)")
_RAYS_RE = re.compile(r"\(([\d,]+) rays/s\)")


def parse_train_log(rundir):
    """Per-epoch metric dicts + rays/s samples from train.log."""
    epochs, rays = [], []
    with open(osp.join(rundir, "train.log")) as f:
        for line in f:
            if "]: " not in line:
                continue
            metrics = dict(
                (k, float(v))
                for k, v in _METRIC_RE.findall(line.split("]: ", 1)[1])
            )
            if metrics:
                epochs.append(metrics)
            m = _RAYS_RE.search(line)
            if m:
                rays.append(float(m.group(1).replace(",", "")))
    return epochs, rays


def run_arm(arm, args, conf_path):
    from tools.rehearse_dtu import main as rehearse_main

    exps = osp.join(args.workdir, f"exps_{arm}")
    t0 = time.time()
    argv = [
        "--scene-root", args.workdir,
        "--conf", conf_path,
        "--scan", "7",
        "--nepoch", str(args.nepoch),
        "--exps", exps,
        "--assignment", arm,
        "--seed", str(args.seed),
    ]
    if args.skip_train:
        argv.append("--skip-train")
    rehearse_main(argv)
    wall = time.time() - t0

    rundirs = sorted(glob.glob(osp.join(exps, "dtu-ab", "7", "*")))
    rundir = rundirs[-1]
    with open(osp.join(rundir, "rehearsal_metrics.json")) as f:
        metrics = json.load(f)
    epochs, rays = parse_train_log(rundir)
    tail = epochs[-max(len(epochs) // 4, 1):]
    tail_means = {
        k: float(np.mean([e[k] for e in tail if k in e]))
        for k in tail[-1]
    }
    return dict(
        arm=arm,
        rundir=rundir,
        wall_s=round(wall, 1),
        rays_per_s=float(np.median(rays)) if rays else float("nan"),
        tail_means=tail_means,
        eval=metrics,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/dtu_ab")
    parser.add_argument("--nepoch", type=int, default=200)
    parser.add_argument("--views", type=int, default=49)
    parser.add_argument("--res", type=int, nargs=2, default=[1200, 1600])
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--capture-steps", type=int, default=8)
    parser.add_argument("--out", default=None)
    parser.add_argument("--skip-train", default=False, action="store_true")
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"])
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    scan_dir = osp.join(args.workdir, "toy", "scan7")
    if not osp.exists(osp.join(scan_dir, "cameras.npz")):
        from neat_tpu.data.synthetic import generate_scene

        print(f"generating DTU-convention scene at {scan_dir} "
              f"({args.views} views @ {args.res})", flush=True)
        generate_scene(scan_dir, n_views=args.views,
                       res=tuple(args.res), convention="dtu")

    conf_path = osp.join(args.workdir, "dtu-ab.conf")
    with open(conf_path, "w") as f:
        f.write(CONF_TEMPLATE.format(res0=args.res[0], res1=args.res[1]))

    arms = [run_arm("auction", args, conf_path),
            run_arm("callback", args, conf_path)]

    # real-regime agreement on matrices captured from the trained
    # auction checkpoint
    from tools.auction_ablation import capture_cost_matrices, evaluate

    mats = capture_cost_matrices(
        arms[0]["rundir"], args.workdir, args.capture_steps
    )
    agreement = evaluate(mats)

    lines = [
        "# Auction vs Hungarian training A/B at DTU shapes",
        "",
        f"synthetic DTU-convention scene: {args.views} views @ "
        f"{args.res[0]}x{args.res[1]}, 1024 global junctions, DBSCAN "
        f"proposals, {args.nepoch} epochs, shared seed {args.seed}; arms "
        "differ only in assignment_method",
        "",
        "## Training",
        "",
        "| arm | wall (s) | rays/s (median) | "
        + " | ".join(sorted(arms[0]["tail_means"])) + " |",
        "|---|---|---|" + "---|" * len(arms[0]["tail_means"]),
    ]
    for a in arms:
        lines.append(
            f"| {a['arm']} | {a['wall_s']} | {a['rays_per_s']:,.0f} | "
            + " | ".join(f"{a['tail_means'][k]:.4f}"
                         for k in sorted(a["tail_means"])) + " |"
        )
    lines += ["", "(loss-term means over the final quarter of epochs)",
              "", "## Finalized-wireframe evals", "",
              "| arm | section | ACC(d2s) | COMP(s2d) | overall |",
              "|---|---|---|---|---|"]
    for a in arms:
        for section, m in a["eval"].items():
            lines.append(
                f"| {a['arm']} | {section} | {m['accuracy_d2s']:.4f} "
                f"| {m['completeness_s2d']:.4f} | {m['overall']:.4f} |"
            )
    livec = [int(m[2].sum()) for m in mats]
    lines += [
        "",
        "## Captured-matrix agreement (trained auction checkpoint, "
        f"{args.capture_steps} steps, live cols {min(livec)}-{max(livec)})",
        "",
        "| n_iters | subopt mean | subopt max | iters (mean/max) | "
        "unassigned | keep-mask agree | median gap |",
        "|---|---|---|---|---|---|---|",
    ] + [
        f"| {r['n_iters']} | {r['subopt_mean']:.2e} | {r['subopt_max']:.2e} "
        f"| {r['iters_mean']:.0f}/{r['iters_max']} | {r['unassigned']:.3f} "
        f"| {r['keep_agree']:.4f} | {r['median_gap']:.2e} |"
        for r in agreement
    ]
    text = "\n".join(lines)
    print(text)
    payload = dict(arms=arms, agreement=agreement)
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n\n```json\n"
                    + json.dumps(payload, indent=1) + "\n```\n")


if __name__ == "__main__":
    main()
