"""Auction-vs-Hungarian ablation on REAL training-scale cost matrices.

The training step replaces the reference's mid-step scipy Hungarian
(reference neat_wfr_rend_a.py:473) with an on-device Jacobi auction
(assignment/matching.py). This tool measures, at the flagship training
scale (max_verts x 2R proposals, e.g. 512 x 2048 on ABC), on cost
matrices captured from an actual trained checkpoint and the actual
per-step batch sampling:

  * suboptimality: (auction matched cost - optimal) / optimal;
  * downstream agreement: the training step consumes the assignment only
    through assigned_cost -> median gate -> keep mask and the matched
    proposal targets; report keep-mask agreement and median gap;
  * iterations to converge, vs the n_iters=256 bound.

Usage:
    python tools/auction_ablation.py --rundir <exp rundir> \
        --data_root /root/reference/data [--steps 8] [--out table.md]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def capture_cost_matrices(rundir, data_root, n_steps, checkpoint="latest"):
    import jax
    import jax.numpy as jnp

    from neat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from neat_tpu.train.config import load_experiment_config
    from neat_tpu.train.checkpoint import load_checkpoint
    from neat_tpu.train.step import sample_batch
    from neat_tpu.train.runner import scene_to_device
    from neat_tpu.data.datasets import load_scene_for_config
    from neat_tpu.model.neat import neat_forward
    from neat_tpu.core.camera import project2d

    cfg = load_experiment_config(osp.join(rundir, "runconf.conf"))
    state, epoch = load_checkpoint(osp.join(rundir, "checkpoints"), checkpoint)
    print(f"checkpoint epoch {epoch}, max_verts={cfg.model.max_verts}")

    scene = load_scene_for_config(cfg, data_root)
    scene_dev = scene_to_device(scene)

    import functools

    fwd = jax.jit(
        functools.partial(neat_forward, cfg=cfg.model, training=True)
    )

    mats = []
    for i in range(n_steps):
        rng = jax.random.fold_in(jax.random.PRNGKey(123), i)
        r_batch, r_fwd = jax.random.split(rng)
        inputs, _ = sample_batch(
            r_batch, scene_dev, cfg.num_pixels, scene.img_res[1]
        )
        out = fwd(state.params, inputs, rng=r_fwd)
        # rebuild the proposal cost exactly as neat_forward does
        # (model/neat.py junction-proposal block), INCLUDING the
        # config-dependent proposal construction: the DTU regime
        # (dbscan_enabled, reference neat_wfr_rend_c.py:427-433 family)
        # assigns verts to DBSCAN cluster means under a column validity
        # mask, not to raw endpoints
        endpoints = np.asarray(out["lines3d"]).reshape(-1, 3)
        cm = cfg.model
        if cm.dbscan_enabled:
            from neat_tpu.assignment.clustering import dbscan_cluster_means
            from neat_tpu.fields.mlp import global_junctions_forward

            cluster_input = endpoints
            if cm.dbscan_include_global:
                gj = np.asarray(
                    global_junctions_forward(
                        state.params["junctions"], cm.junctions
                    )
                )
                cluster_input = np.concatenate([endpoints, gj], axis=0)
            proposals, prop_mask = dbscan_cluster_means(
                jnp.asarray(cluster_input), eps=0.01, min_samples=2
            )
            proposals = np.asarray(proposals)
            prop_mask = np.asarray(prop_mask)
        else:
            proposals = endpoints
            prop_mask = np.ones((endpoints.shape[0],), dtype=bool)
        pose = np.asarray(inputs["pose"])
        w2c = np.linalg.inv(pose)
        k3 = np.asarray(inputs["intrinsics"])[:3, :3]
        j2d = np.asarray(
            project2d(
                jnp.asarray(k3),
                jnp.asarray(w2c[:3, :3]),
                jnp.asarray(w2c[:3, 3]),
                jnp.asarray(proposals),
            )
        )
        verts2d = np.asarray(inputs["verts2d"])
        verts_mask = np.asarray(inputs["verts_mask"])
        jcost = np.sqrt(((j2d[None] - verts2d[:, None]) ** 2).sum(-1) + 1e-12)
        mats.append((jcost.astype(np.float32), verts_mask, prop_mask))
        print(
            f"  captured step {i}: cost {jcost.shape}, live rows "
            f"{verts_mask.sum()}, live cols {prop_mask.sum()}"
        )
    return mats


def evaluate(mats, n_iters_list=(32, 64, 128, 256), eps=None):
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from neat_tpu.assignment.matching import auction_assignment

    # scipy optimum per matrix, computed once (identical across n_iters);
    # dead columns (padded DBSCAN proposal slots) are excluded the same
    # way masked_assignment excludes them on device
    optima = []
    for jcost, row_mask, col_mask in mats:
        live = np.nonzero(row_mask)[0]
        livec = np.nonzero(col_mask)[0]
        ri, ci = linear_sum_assignment(jcost[live][:, livec])
        optima.append(
            (live, livec, ri, ci, jcost[live][:, livec][ri, ci].sum())
        )

    rows = []
    for n_iters in n_iters_list:
        subopts, iters_used, keep_agree, med_gaps = [], [], [], []
        unassigned_fracs = []
        for (jcost, row_mask, col_mask), (live, livec, ri, ci, opt_cost) in zip(
            mats, optima
        ):
            col, valid, it = auction_assignment(
                jnp.asarray(jcost),
                jnp.asarray(row_mask),
                jnp.asarray(col_mask),
                n_iters=n_iters,
                eps=eps,
            )
            col, valid, it = np.asarray(col), np.asarray(valid), int(it)

            n_unassigned = int((~valid[live]).sum())
            unassigned_fracs.append(n_unassigned / max(len(live), 1))
            if n_unassigned == 0:
                auc_cost = jcost[live, col[live]].sum()
                subopts.append((auc_cost - opt_cost) / max(opt_cost, 1e-9))
            else:
                # a partial assignment's cost is not comparable to the
                # complete optimum (the auction may hold a cheap column
                # the optimum gives elsewhere); the unassigned column is
                # the operative metric for incomplete runs
                subopts.append(np.nan)
            iters_used.append(it)

            # downstream: keep = cost < median over valid
            def keep_mask(assigned_cost, vmask):
                c = assigned_cost[vmask]
                med = np.sort(c)[max((len(c) - 1) // 2, 0)] if len(c) else 10.0
                keep = np.zeros_like(vmask)
                keep[vmask] = assigned_cost[vmask] < med
                return keep, med

            ac_auction = jcost[np.arange(len(col)), col]
            k_a, med_a = keep_mask(ac_auction, valid)
            ac_opt = np.zeros(jcost.shape[0], dtype=np.float32)
            v_opt = np.zeros(jcost.shape[0], dtype=bool)
            ac_opt[live[ri]] = jcost[live][:, livec][ri, ci]
            v_opt[live[ri]] = True
            k_o, med_o = keep_mask(ac_opt, v_opt)
            keep_agree.append((k_a == k_o)[row_mask].mean())
            med_gaps.append(abs(med_a - med_o))
        rows.append(
            dict(
                n_iters=n_iters,
                subopt_mean=float(np.nanmean(subopts)) if not np.all(np.isnan(subopts)) else float('nan'),
                subopt_max=float(np.nanmax(subopts)) if not np.all(np.isnan(subopts)) else float('nan'),
                iters_mean=float(np.mean(iters_used)),
                iters_max=int(np.max(iters_used)),
                keep_agree=float(np.mean(keep_agree)),
                median_gap=float(np.mean(med_gaps)),
                unassigned=float(np.mean(unassigned_fracs)),
            )
        )
    return rows


def main(argv=None):
    from neat_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser()
    parser.add_argument("--rundir", required=True)
    parser.add_argument("--data_root", default="../data")
    parser.add_argument("--checkpoint", default="latest")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--out", default=None)
    parser.add_argument("--mats", default=None,
                        help="skip capture; analyze matrices saved by --save-mats "
                        "(analysis is CPU-friendly: JAX_PLATFORMS=cpu)")
    parser.add_argument("--save-mats", default=None)
    args = parser.parse_args(argv)

    if args.mats:
        with np.load(args.mats) as z:
            mats = [
                (
                    z[f"cost{i}"],
                    z[f"mask{i}"],
                    z[f"colmask{i}"]
                    if f"colmask{i}" in z
                    else np.ones(z[f"cost{i}"].shape[1], dtype=bool),
                )
                for i in range(z["n"])
            ]
    else:
        mats = capture_cost_matrices(
            args.rundir, args.data_root, args.steps, args.checkpoint
        )
    if args.save_mats:
        np.savez_compressed(
            args.save_mats,
            n=len(mats),
            **{f"cost{i}": m[0] for i, m in enumerate(mats)},
            **{f"mask{i}": m[1] for i, m in enumerate(mats)},
            **{f"colmask{i}": m[2] for i, m in enumerate(mats)},
        )

    def fmt(rows, title):
        lines = [
            title,
            "| n_iters | subopt mean | subopt max | iters used (mean/max) | unassigned | keep-mask agree | median gap |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['n_iters']} | {r['subopt_mean']:.2e} | {r['subopt_max']:.2e} "
                f"| {r['iters_mean']:.0f}/{r['iters_max']} | {r['unassigned']:.3f} "
                f"| {r['keep_agree']:.4f} | {r['median_gap']:.2e} |"
            )
        return "\n".join(lines)

    live = [int(m[1].sum()) for m in mats]
    livec = [int(m[2].sum()) for m in mats]
    table = fmt(
        evaluate(mats),
        f"Real per-step scale (live rows {min(live)}-{max(live)} of "
        f"{mats[0][0].shape[0]}, live cols {min(livec)}-{max(livec)} of "
        f"{mats[0][0].shape[1]} proposals):",
    )

    # contention stress at cluttered-scene vertex counts: replicate the
    # real live rows with ~2 px jitter until k rows are live. Duplicated
    # near-identical rows all want the same columns — the hardest case
    # for a bidding auction — at the densities a real DTU/ScanNet view
    # could produce (HAWP caps out at a few hundred vertices per view).
    rng = np.random.RandomState(0)
    for k_req in (128, 512):
        stress = []
        for jcost, row_mask, col_mask in mats:
            k = min(k_req, jcost.shape[0])
            live_idx = np.nonzero(row_mask)[0]
            if len(live_idx) == 0:
                continue
            reps = live_idx[rng.randint(0, len(live_idx), size=k)]
            cost_k = jcost[reps] + rng.uniform(0, 2.0, size=(k, 1)).astype(
                jcost.dtype
            )
            cost_s = np.full(jcost.shape, 1e4, dtype=jcost.dtype)
            cost_s[:k] = cost_k
            mask_s = np.zeros(jcost.shape[0], dtype=bool)
            mask_s[:k] = True
            stress.append((cost_s, mask_s, col_mask))
        table += "\n\n" + fmt(
            evaluate(stress),
            f"Contention stress ({k_req} jittered-duplicate live rows):",
        )
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
