"""Executed ABC-eval protocol parity against the reference's own script.

Runs the reference's `evaluation/eval-abc.py` main() (the protocol that
defines the headline ABC junction/line precision-recall numbers) on a
crafted prediction set spanning all three thresholds, and checks our
evaluation/eval_abc.py prints the identical LaTeX rows. This pins the whole
protocol executably: the offset_scale.txt scale matrix (eval-abc.py:31-37),
Hungarian junction matching (:45-46), endpoint-order-min line cost
(:86-89), and the precision/recall denominators (:60-62, :99-101).

The reference's DTU/BMVS/ScanNet eval scripts require open3d (absent in
this image), so their executed parity is environment-blocked; their
protocols are unit-tested against these same formulas in test_eval_dtu.py.
"""

import contextlib
import io
import json
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_eval_abc_parity(tmp_path, monkeypatch):
    import torch

    from neat_tpu.evaluation.eval_abc import eval_abc
    from neat_tpu.interop.reference_runtime import load_reference_script

    rs = np.random.RandomState(5)

    # CAD-frame ground truth + a NON-identity offset_scale so the scale
    # path is exercised: x_scaled = x/scale - off  =>  x = (x_scaled+off)*scale
    junctions_gt = rs.uniform(-2.0, 2.0, size=(10, 3))
    edges = np.asarray([[i, (i + 3) % 10] for i in range(10)])
    scan = tmp_path / "scan"
    scan.mkdir()
    with open(scan / "lines.json", "w") as f:
        json.dump(
            {"junctions": junctions_gt.tolist(), "lines": edges.tolist()}, f
        )
    off = np.asarray([0.1, -0.2, 0.3])
    scale = 2.0
    with open(scan / "offset_scale.txt", "w") as f:
        f.write(f"{off[0]} {off[1]} {off[2]} {scale}\n")

    def to_pred_frame(x):
        return (x + off) * scale

    # predictions spanning the three thresholds (0.01/0.02/0.05 of the
    # global scale 1/scale): per-junction noise at 0.3x/1.5x/3x/8x of the
    # tightest threshold, plus spurious detections
    g = 1.0 / scale
    noise_lvls = np.asarray([0.003, 0.015, 0.03, 0.08] * 3)[:10] * g
    jp_cad = junctions_gt + rs.normal(size=(10, 3)) * noise_lvls[:, None] / np.sqrt(3)
    jp = np.concatenate([to_pred_frame(jp_cad), rs.uniform(-1, 1, (3, 3))])

    lines_gt = junctions_gt[edges]
    lp_cad = lines_gt + rs.normal(size=lines_gt.shape) * 0.01 * g
    lp_cad[::2] = lp_cad[::2, ::-1]  # swapped endpoint order must not matter
    lp_cad[1] += 0.2 * g  # one clearly-wrong line
    lp = to_pred_frame(lp_cad.reshape(-1, 3)).reshape(-1, 2, 3)
    lp = np.concatenate([lp, rs.uniform(-1, 1, (2, 2, 3))])

    data = {
        "junctions3d_initial": jp,
        "lines3d_wfi_checked": lp,
    }
    pth = tmp_path / "pred-neat.pth"
    torch.save({k: torch.as_tensor(v) for k, v in data.items()}, pth)

    mod = load_reference_script("evaluation/eval-abc.py", "ref_eval_abc")
    import pdb

    monkeypatch.setattr(pdb, "set_trace", lambda *a, **k: None)
    monkeypatch.setattr(
        sys, "argv", ["eval-abc.py", "--data", str(pth), "--scan", str(scan)]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.main()
    ref_rows = [l for l in buf.getvalue().strip().splitlines() if "&" in l]
    assert len(ref_rows) == 2

    ours = eval_abc(data, str(scan), verbose=False)
    our_j = " & ".join(
        f"{v:.3f}" for v in ours["junction_precision"] + ours["junction_recall"]
    )
    our_l = " & ".join(
        f"{v:.3f}" for v in ours["line_precision"] + ours["line_recall"]
    )
    assert our_j == ref_rows[0]
    assert our_l == ref_rows[1]

    # the crafted set must actually spread across thresholds, or the
    # comparison proves nothing
    vals = ours["junction_precision"] + ours["line_precision"]
    assert len(set(ref_rows[0].split(" & "))) > 1
    assert any(0.0 < v < 1.0 for v in vals)
