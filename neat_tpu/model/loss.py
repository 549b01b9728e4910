"""NEAT training loss.

Parity target: reference code/model/networks/loss_wfr.py (VolSDFLoss):
  * bidirectional-endpoint-min line L1, gated at 100px on the uncalibrated
    branch, with the gate reused as a weight on the calibrated branch
    (loss_wfr.py:34-45,57-65);
  * L1 RGB; eikonal (||grad|| - 1)^2 (loss_wfr.py:69-75);
  * total = rgb + eikonal_weight * eik + line_weight * line_calib
    (weights 0.1 / 0.01 per conf);
  * junction losses: L1 cost cdist(j3d) + 0.1*cdist(j2d_calib), Hungarian
    assignment, L1 on matched 3D (x0.1) and calibrated 2D (x0.01) pairs
    (loss_wfr.py:95-131).

Loss-variant family (reference loss_wfr_a/spd/rpd/unnormalize, loss_jc,
loss_ins) is expressed through config flags: ``calibrated_branch`` off
reproduces loss_wfr_a; ``depth_weight`` adds the spd depth term.

All reductions are mask-aware because junction tensors are padded.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..assignment.matching import masked_assignment


@dataclasses.dataclass(frozen=True)
class LossConfig:
    rgb_loss: str = "l1"  # 'l1' | 'mse'
    eikonal_weight: float = 0.1
    line_weight: float = 0.01
    junction_3d_weight: float = 0.1
    junction_2d_weight: float = 0.01
    line_gate_px: float = 100.0
    calibrated_branch: bool = True  # False reproduces loss_wfr_a
    # weight of the calibrated-2D term inside the junction assignment cost:
    # 0.1 = loss_wfr.py:106; the wfr_a/unnormalize variants use 0.01
    junction_cost_2d_scale: float = 0.1
    # 'wfr' = L1 cdist(j3d) + scaled L1 cdist(j2d_calib) cost with L1 pair
    # losses; 'jc' = loss_jc.py:66-68: L2 (p=2) j3d-only cost with a
    # SQUARED-L2 pair loss and no j2d term
    junction_mode: str = "wfr"
    # unnormalize gates its j2d_stat (and jcount) by the <10px PIXEL-space
    # pair distance (loss_wfr_unnormalize.py:102-105,139) instead of
    # loss_wfr's ungated mean / assignment-cost-gated count (loss_wfr.py:
    # 116-126)
    junction_stat_gated: bool = False
    depth_weight: float = 0.0  # >0 adds the loss_wfr_spd depth term
    # 'l1' (loss_wfr_spd) or 'ssi' — the scale-and-shift-invariant monodepth
    # loss of loss_wfr_rpd.py:85-189 (per-batch closed-form scale/shift)
    depth_loss_kind: str = "l1"
    # ssi only: True masks 0-depth pixels out of the (s, t) fit — the
    # repaired mode for SPARSE cue maps where 0 = "no depth" would drag
    # the fit; False = reference parity (loss_wfr_rpd.py:224 passes an
    # all-ones mask even for its sparse depth_colmap targets)
    depth_mask_zeros: bool = False
    assignment_method: str = "auction"


def _line_l1(
    lines2d: jnp.ndarray,
    lines2d_gt: jnp.ndarray,
    lines_weight: jnp.ndarray,
    threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Endpoint-order-min gated line loss (reference loss_wfr.py:34-45).

    lines2d, lines2d_gt: (R, 4); lines_weight: (R,). Returns (scalar loss,
    per-ray detached L1)."""
    swapped = lines2d_gt[:, jnp.asarray([2, 3, 0, 1])]
    d1 = jax.lax.stop_gradient(
        jnp.sum((lines2d - lines2d_gt) ** 2, axis=-1, keepdims=True)
    )
    d2 = jax.lax.stop_gradient(
        jnp.sum((lines2d - swapped) ** 2, axis=-1, keepdims=True)
    )
    target = jnp.where(d1 < d2, lines2d_gt, swapped)
    per_ray = jnp.mean(jnp.abs(lines2d - target), axis=-1)
    labels = (jax.lax.stop_gradient(per_ray) < threshold).astype(lines2d.dtype)
    denom = jnp.maximum(jnp.sum(labels), 1.0)
    total = jnp.sum(per_ray * lines_weight * labels) / denom
    return total, jax.lax.stop_gradient(per_ray)


def scale_shift_invariant_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray = None,
    alpha: float = 0.5,
) -> jnp.ndarray:
    """MiDaS-style scale-and-shift-invariant depth loss (reference
    loss_wfr_rpd.py:20-140): solve the per-batch least-squares (s, t)
    aligning pred to target, then MSE (batch-based reduction divides by
    2M, mse_loss:82-84) + ``alpha`` x a one-scale image-gradient matching
    term on the batch laid out as an image (the reference reshapes the
    1024-ray batch to (1, 32, 32), :222-227, with an all-ones mask).
    pred, target: (N,)."""
    if mask is None:
        mask = jnp.ones_like(pred, dtype=bool)
    m = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    # closed-form 2x2 system for [s, t]
    a00 = jnp.sum(m * pred * pred)
    a01 = jnp.sum(m * pred)
    a11 = n
    b0 = jnp.sum(m * pred * target)
    b1 = jnp.sum(m * target)
    det = a00 * a11 - a01 * a01
    s = jnp.where(det > 1e-9, (a11 * b0 - a01 * b1) / jnp.maximum(det, 1e-9), 1.0)
    t = jnp.where(det > 1e-9, (-a01 * b0 + a00 * b1) / jnp.maximum(det, 1e-9), 0.0)
    aligned = s * pred + t
    total = jnp.sum(m * (aligned - target) ** 2) / (2.0 * n)
    if alpha > 0:
        # batch as an image: square when N is a perfect square (the
        # reference's 1024 -> 32x32), else a single row (x-gradients only)
        n_flat = pred.shape[0]
        side = int(math.isqrt(n_flat))
        shape = (side, side) if side * side == n_flat else (1, n_flat)
        diff = ((aligned - target) * m).reshape(shape)
        m2 = m.reshape(shape)
        gx = jnp.abs(diff[:, 1:] - diff[:, :-1]) * m2[:, 1:] * m2[:, :-1]
        gy = jnp.abs(diff[1:, :] - diff[:-1, :]) * m2[1:, :] * m2[:-1, :]
        total = total + alpha * (jnp.sum(gx) + jnp.sum(gy)) / n
    return total


def neat_loss(
    outputs: Dict[str, jnp.ndarray],
    ground_truth: Dict[str, jnp.ndarray],
    cfg: LossConfig,
) -> Dict[str, jnp.ndarray]:
    """Compute the total loss and its components.

    ground_truth:
      rgb      (R, 3)
      lines2d  (R, 5)  [x1 y1 x2 y2 score]  (score acts as the line weight)
    """
    stats: Dict[str, jnp.ndarray] = {}

    rgb_gt = ground_truth["rgb"].reshape(-1, 3)
    if cfg.rgb_loss == "l1":
        rgb_loss = jnp.mean(jnp.abs(outputs["rgb_values"] - rgb_gt))
    else:
        rgb_loss = jnp.mean((outputs["rgb_values"] - rgb_gt) ** 2)

    if "grad_theta" in outputs:
        g = outputs["grad_theta"]
        eikonal_loss = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
    else:
        eikonal_loss = jnp.asarray(0.0)

    loss = rgb_loss + cfg.eikonal_weight * eikonal_loss

    if "lines2d" in outputs:
        gt5 = ground_truth["lines2d"]
        lines2d_gt, lines_weight = gt5[:, :4], gt5[:, 4]
        lines2d = outputs["lines2d"].reshape(-1, 4)

        l2d_uncalib, per_ray = _line_l1(
            lines2d, lines2d_gt, lines_weight, cfg.line_gate_px
        )
        gate = (per_ray < cfg.line_gate_px).astype(lines2d.dtype)
        stats["count"] = jnp.sum(gate)

        if cfg.calibrated_branch:
            k_inv = jnp.linalg.inv(outputs["K"])
            pts = lines2d_gt.reshape(-1, 2)
            pts_h = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)
            calib = (k_inv @ pts_h.T).T
            calib = calib[:, :2] / calib[:, 2:]
            lines2d_gt_calib = calib.reshape(-1, 4)
            line_loss, _ = _line_l1(
                outputs["lines2d_calib"].reshape(-1, 4),
                lines2d_gt_calib,
                lines_weight * gate,
                cfg.line_gate_px,
            )
        else:
            line_loss = l2d_uncalib

        loss = loss + cfg.line_weight * line_loss
        stats["line_loss"] = line_loss
        stats["l2d_loss"] = l2d_uncalib

    if cfg.depth_weight > 0.0 and "depth" in ground_truth:
        pred = outputs["depth"].reshape(-1)
        gt_d = ground_truth["depth"].reshape(-1)
        if cfg.depth_loss_kind == "ssi":
            depth_loss = scale_shift_invariant_loss(
                pred, gt_d,
                mask=(gt_d > 0) if cfg.depth_mask_zeros else None,
            )
        else:
            # sparse cues use 0 = "no depth available"; the reference spd
            # loss masks them out (loss_wfr_spd.py:49-55)
            valid = gt_d > 0
            n_valid = jnp.sum(valid)
            depth_loss = jnp.where(
                n_valid > 0,
                jnp.sum(jnp.where(valid, jnp.abs(pred - gt_d), 0.0))
                / jnp.maximum(n_valid, 1),
                0.0,
            )
        loss = loss + cfg.depth_weight * depth_loss
        stats["depth_loss"] = depth_loss

    # ----- junction losses -------------------------------------------------
    j3d_loss = jnp.asarray(0.0)
    j2d_loss = jnp.asarray(0.0)
    j2d_stat = jnp.asarray(0.0)
    jcount = jnp.asarray(0.0)
    if "j3d_local" in outputs:
        j3d_local = outputs["j3d_local"]  # (V, 3), detached upstream
        j3d_global = outputs["j3d_global"]  # (J, 3)
        j2d_local = jax.lax.stop_gradient(outputs["j2d_local"])
        j2d_global = jax.lax.stop_gradient(outputs["j2d_global"])
        j2d_local_calib = outputs["j2d_local_calib"]
        j2d_global_calib = outputs["j2d_global_calib"]
        local_mask = outputs["j_local_mask"]

        if cfg.junction_mode == "jc":
            # loss_jc.py:66: p=2 cdist on j3d alone
            cost = jax.lax.stop_gradient(
                jnp.sqrt(
                    jnp.sum(
                        (j3d_local[:, None] - j3d_global[None]) ** 2, axis=-1
                    )
                    + 1e-12
                )
            )
        else:
            cost = jax.lax.stop_gradient(
                jnp.sum(jnp.abs(j3d_local[:, None] - j3d_global[None]), axis=-1)
                + cfg.junction_cost_2d_scale
                * jnp.sum(
                    jnp.abs(j2d_local_calib[:, None] - j2d_global_calib[None]),
                    axis=-1,
                )
            )
        # NaN pairs must not poison the assignment (the unnormalize
        # variant's explicit guard, loss_wfr_unnormalize.py jcost NaN->1e5;
        # harmless elsewhere — healthy runs produce none)
        cost = jnp.nan_to_num(cost, nan=1e5)
        col_idx, valid = masked_assignment(
            cost, local_mask, method=cfg.assignment_method
        )
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        sel = lambda arr: arr[col_idx]

        if cfg.junction_mode == "jc":
            # loss_jc.py:68: squared-L2 pair loss
            pair_l3d = jnp.sum((j3d_local - sel(j3d_global)) ** 2, axis=-1)
        else:
            pair_l3d = jnp.sum(jnp.abs(j3d_local - sel(j3d_global)), axis=-1)
        j3d_loss = jnp.sum(jnp.where(valid, pair_l3d, 0.0)) / n_valid
        pair_l2d = jnp.sum(
            jnp.abs(j2d_local_calib - sel(j2d_global_calib)), axis=-1
        )
        j2d_loss = jnp.sum(jnp.where(valid, pair_l2d, 0.0)) / n_valid
        pair_l2d_u = jnp.sum(jnp.abs(j2d_local - sel(j2d_global)), axis=-1)
        if cfg.junction_stat_gated:
            stat_mask = valid & (pair_l2d_u < 10.0)
            n_stat = jnp.maximum(jnp.sum(stat_mask), 1.0)
            j2d_stat = jnp.sum(jnp.where(stat_mask, pair_l2d_u, 0.0)) / n_stat
            jcount = jnp.sum(stat_mask).astype(jnp.float32)
        else:
            j2d_stat = jnp.sum(jnp.where(valid, pair_l2d_u, 0.0)) / n_valid
            assign_cost = jnp.take_along_axis(
                cost, col_idx[:, None], axis=1
            )[:, 0]
            jcount = jnp.sum(valid & (assign_cost < 10.0)).astype(jnp.float32)

        loss = loss + cfg.junction_3d_weight * j3d_loss + cfg.junction_2d_weight * j2d_loss

    out = {
        "loss": loss,
        "rgb_loss": rgb_loss,
        "eikonal_loss": eikonal_loss,
        "j3d_loss": j3d_loss,
        "j2d_loss": j2d_loss,
        "j2d_stat": j2d_stat,
        "jcount": jcount,
    }
    out.update(stats)
    if "median" in outputs:
        out["median"] = outputs["median"]
    return out
