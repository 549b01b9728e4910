"""BMVS / ScanNet rehearsal on synthetic data (mirror of rehearse_dtu.py).

No real BlendedMVS or ScanNet scans exist in this environment; what CAN be
exercised end-to-end before first contact with real data is every
convention-specific code path:

  * bmvs:    DTU-style camera layout at <root>/BlendedMVS/scan{id} driven
             through the SHIPPED confs/bmvs.conf (1024 junctions, DBSCAN
             proposals) — including the reference's fixed-200k-iteration
             rule (volsdf_train.py:152-153: nepochs = 200000 / n_views),
             which this driver asserts fired before capping the rehearsal
             schedule; eval is the mask-less eval-lsr-bmvs.py protocol.
  * scannet: ScanNet layout (pose/*.txt + shared intrinsic.txt) at
             <root>/scans/{id} (reference scannet_hawp_dataset.py:16-95),
             eval per eval-lsr-scannet.py (junction + 32-pt line ACC/COMP,
             no masks).

Usage:
    python tools/rehearse_scene.py --convention bmvs \
        --scene-root /tmp/bmvsrehearse --nepoch 200
    python tools/rehearse_scene.py --convention scannet \
        --scene-root /tmp/scnrehearse --nepoch 200
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from tools.rehearse_dtu import synthetic_gt

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# realistic-shape ScanNet conf (the reference ships no scannet conf file —
# its scannet runs reuse the real-scene hyperparameters; these match
# confs/bmvs.conf with the ScanNet dataset class and resolution)
SCANNET_CONF = """
train {
    expname = scannet-rehearsal
    dataset_class = datasets.scannet_hawp_dataset.SceneDataset
    model_class = model.networks.neat_wfr_rend_a.VolSDFNetwork
    loss_class = model.networks.loss_wfr.VolSDFLoss
    learning_rate = 5.0e-4
    num_pixels = 1024
    checkpoint_freq = 100
    plot_freq = 100
    split_n_pixels = 1024
}
plot {
    plot_nimgs = 1
    resolution = 100
    grid_boundary = [-1.5, 1.5]
}
loss {
    rgb_loss = torch.nn.L1Loss
    eikonal_weight = 0.1
    line_weight = 0.01
}
dataset {
    data_dir = scans
    scan_id = 0
    img_res = [480, 640]
    distance_threshold = 5.0
}
model {
    scene_bounding_sphere = 3.0
    feature_vector_size = 256
    dbscan_enabled = True
    field_compute_dtype = bfloat16
    use_median = False
    global_junctions {
        num_junctions = 1024
        dim_hidden = 256
        num_layers = 2
        dim_out = 3
    }
    implicit_network {
        dims = [256, 256, 256, 256, 256, 256, 256, 256]
        skip_in = [4]
        d_in = 3
        d_out = 1
        multires = 6
        geometric_init = True
        bias = 0.6
        weight_norm = True
        sphere_scale = 20.0
    }
    rendering_network {
        dims = [256, 256, 256, 256]
        d_in = 9
        d_out = 3
        mode = idr
        multires_view = 4
        weight_norm = True
    }
    attraction_network {
        dims = [256, 256, 256, 256]
        d_in = 9
        d_out = 6
        mode = idr
        weight_norm = True
    }
    density {
        beta_min = 0.0001
        params_init { beta = 0.1 }
    }
    ray_sampler {
        N_samples = 64
        N_samples_eval = 128
        N_samples_extra = 32
        near = 0.0
        eps = 0.1
        beta_iters = 10
        max_total_iters = 5
    }
}
"""

CONVENTIONS = {
    # data_dir, scene convention for the generator, default scan id
    "bmvs": ("BlendedMVS", "dtu", 11),
    "scannet": ("scans", "scannet", 0),
}


def ensure_scene(convention, scene_root, scan_id, n_views, res):
    from neat_tpu.data.synthetic import generate_scene

    data_dir, gen_convention, _ = CONVENTIONS[convention]
    scan_dir = osp.join(scene_root, data_dir, f"scan{scan_id}"
                        if convention == "bmvs" else str(scan_id))
    if not osp.exists(scan_dir):
        print(f"generating synthetic {convention} scene at {scan_dir} "
              f"({n_views} views, {res[0]}x{res[1]})", flush=True)
        generate_scene(scan_dir, n_views=n_views, res=res,
                       convention=gen_convention)
    return scan_dir


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--convention", choices=sorted(CONVENTIONS),
                        required=True)
    parser.add_argument("--scene-root", required=True)
    parser.add_argument("--conf", default=None,
                        help="bmvs defaults to the shipped confs/bmvs.conf; "
                        "scannet to the built-in realistic template")
    parser.add_argument("--scan", type=int, default=None)
    parser.add_argument("--nepoch", type=int, default=200,
                        help="rehearsal epoch cap (the BMVS 200k rule is "
                        "asserted, then capped to this)")
    parser.add_argument("--n-views", type=int, default=32)
    parser.add_argument("--res", type=int, nargs=2, default=None)
    parser.add_argument("--exps", default=None)
    parser.add_argument("--vote-ratio", type=float, default=0.0,
                        dest="vote_ratio")
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="pin the jax platform before backend init "
                        "(this image's sitecustomize defaults to the "
                        "tunneled TPU)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    convention = args.convention
    data_dir, _, default_scan = CONVENTIONS[convention]
    scan_id = args.scan if args.scan is not None else default_scan
    res = tuple(args.res) if args.res else (
        (576, 768) if convention == "bmvs" else (480, 640)
    )
    exps = args.exps or osp.join(args.scene_root, "exps")

    scan_dir = ensure_scene(
        convention, args.scene_root, scan_id, args.n_views, res
    )

    conf = args.conf
    if conf is None:
        if convention == "bmvs":
            conf = osp.join(REPO, "confs", "bmvs.conf")
        else:
            conf = osp.join(args.scene_root, "scannet-rehearsal.conf")
            with open(conf, "w") as f:
                f.write(SCANNET_CONF)

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from neat_tpu.train.runner import TrainRunner

    runner = TrainRunner(
        conf=conf,
        data_root=args.scene_root,
        exps_folder=exps,
        scan_id=scan_id,
        nepochs=args.nepoch,
    )
    metrics = {}
    if convention == "bmvs":
        # the fixed-iteration rule must have replaced the CLI epoch count
        rule_nepochs = int(200000 / runner.n_views)
        assert runner.cfg.nepochs == rule_nepochs, (
            runner.cfg.nepochs, rule_nepochs,
        )
        metrics["bmvs_rule_nepochs"] = rule_nepochs
        # rehearsal cap: keep the rule-derived LR schedule (decay_steps
        # already computed from the full rule'd run) but train --nepoch
        runner.cfg = dataclasses.replace(runner.cfg, nepochs=args.nepoch)
    runner.run()
    rundir = runner.rundir
    print(f"rundir: {rundir}", flush=True)

    from neat_tpu.wireframe.finalize import wireframe_recon

    results = wireframe_recon(
        conf=osp.join(rundir, "runconf.conf"),
        checkpoint="latest",
        data_root=args.scene_root,
        vote_ratio=args.vote_ratio,
        verbose=False,
    )
    pred_lines = np.asarray(results["lines3d_wfi_checked"]).reshape(-1, 2, 3)
    print(
        f"finalized: {results['junctions3d_initial'].shape[0]} junctions, "
        f"{pred_lines.shape[0]} wfi_checked lines",
        flush=True,
    )
    npz = osp.join(rundir, "rehearsal_wfi_checked.npz")
    np.savez(npz, lines3d=pred_lines)

    gt_j, _, gt_line_pts = synthetic_gt(scan_dir)

    # mask-less ACC/COMP protocol (eval-lsr-bmvs.py / eval-lsr-scannet.py)
    from neat_tpu.evaluation.eval_lsr import eval_lsr_lines, eval_wfr_junctions

    # junctions and BMVS-style lines score ALL points (eval-wfr-dtu.py:46,
    # eval-lsr-bmvs.py:88-90 — the reference disables the downsample here)
    metrics["junctions"] = eval_wfr_junctions(
        npz, gt_j, downsample_radius=0.0, max_dist=2.0
    )
    metrics["lines"] = eval_lsr_lines(
        npz, gt_line_pts, downsample_radius=0.0, max_dist=2.0
    )
    print(f"eval_lsr junctions: {metrics['junctions']}", flush=True)
    print(f"eval_lsr lines:     {metrics['lines']}", flush=True)

    with open(osp.join(rundir, "rehearsal_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"metrics -> {rundir}/rehearsal_metrics.json", flush=True)


if __name__ == "__main__":
    main()
