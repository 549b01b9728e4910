"""Smoke tests for the sweep/rehearsal drivers (tools/).

These scripts gated the round-2/3 results (vote-gate calibration, DTU
protocol rehearsal) but previously ran untested — a regression in them
would silently invalidate future sweeps. Both run end-to-end on the tiny
synthetic scene in the slow tier.
"""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from neat_tpu.data.synthetic import generate_scene  # noqa: E402
from test_runner import TINY_CONF  # noqa: E402


def test_finalize_sweep_smoke(tmp_path, capsys):
    """Train 1 epoch on the toy ABC-convention scene, then sweep a 2-point
    assembly grid; every grid point must distill once, assemble, score
    with eval_abc, and land in the ranked markdown table."""
    from neat_tpu.train.runner import TrainRunner
    from tools.finalize_sweep import main as sweep_main

    os.makedirs(tmp_path / "toy")
    generate_scene(str(tmp_path / "toy"), n_views=3, res=(48, 48))
    conf = tmp_path / "tiny.conf"
    conf.write_text(TINY_CONF)
    r = TrainRunner(
        conf=str(conf), data_root=str(tmp_path),
        exps_folder=str(tmp_path / "exps"), nepochs=1, max_verts=16,
    )
    r.run()

    out = tmp_path / "sweep.md"
    sweep_main([
        "--conf", osp.join(r.rundir, "runconf.conf"),
        "--scan", str(tmp_path / "toy"),
        "--data_root", str(tmp_path),
        "--vote", "1", "2",
        "--merge-eps", "0.0",
        "--edge-votes", "1",
        "--out", str(out),
    ])
    table = out.read_text().strip().splitlines()
    # header + separator + one row per grid point
    assert len(table) == 2 + 2, table
    assert table[0].startswith("| vote |")
    for row in table[2:]:
        cells = [c.strip() for c in row.strip("|").split("|")]
        assert len(cells) == 10
        float(cells[5]), float(cells[6])  # parsable P/R scores


def test_seed_sweep_smoke(tmp_path, capsys):
    """The multi-seed vote-gate sweep driver: train 1 epoch on the toy
    scene, sweep a 2-point vote grid, and check the report records a
    window (or None), the worst-junction localization margin, and one
    scored row per vote for the run."""
    from neat_tpu.train.runner import TrainRunner
    from tools.seed_sweep import main as sweep_main

    os.makedirs(tmp_path / "toy")
    generate_scene(str(tmp_path / "toy"), n_views=3, res=(48, 48))
    conf = tmp_path / "tiny.conf"
    conf.write_text(TINY_CONF)
    r = TrainRunner(
        conf=str(conf), data_root=str(tmp_path),
        exps_folder=str(tmp_path / "exps"), nepochs=1, max_verts=16,
    )
    r.run()

    out = tmp_path / "seeds.md"
    sweep_main([
        "--exps", str(tmp_path / "exps"),
        "--scan", str(tmp_path / "toy"),
        "--data_root", str(tmp_path),
        "--votes", "1", "2",
        "--out", str(out),
    ])
    text = out.read_text()
    assert "perfect window" in text and "localization margin" in text
    report = json.loads(text.split("```json\n")[1].split("\n```")[0])
    assert len(report) == 1
    (entry,) = report.values()
    assert set(entry) == {"window", "margin", "rows"}
    assert entry["margin"] > 0
    assert [row["vote"] for row in entry["rows"]] == [1, 2]
    for row in entry["rows"]:
        assert set(row) >= {"nj", "nl", "jp", "jr", "lp", "lr", "jmargin"}


@pytest.mark.parametrize("convention", ["bmvs", "scannet"])
def test_rehearse_scene_smoke(tmp_path, convention):
    """The BMVS/ScanNet rehearsal driver covers its convention-specific
    branches on a tiny synthetic scene: BMVS must hit (and record) the
    200k-iteration rule through the DTU-style loader; ScanNet the
    pose/*.txt + intrinsic.txt layout; both end in the mask-less
    eval-lsr ACC/COMP protocol."""
    import glob

    from tools.rehearse_scene import main as rehearse_main

    if convention == "bmvs":
        conf = TINY_CONF.replace(
            "dataset_class = datasets.blender_hawp_dataset.BlenderDataset",
            "dataset_class = datasets.scene_hawp_dataset.SceneDataset",
        ).replace(
            "data_dir = toy",
            "data_dir = BlendedMVS\n    scan_id = 11\n"
            "    distance_threshold = 3.0\n    max_verts = 16",
        )
    else:
        conf = TINY_CONF.replace(
            "dataset_class = datasets.blender_hawp_dataset.BlenderDataset",
            "dataset_class = datasets.scannet_hawp_dataset.SceneDataset",
        ).replace(
            "data_dir = toy",
            "data_dir = scans\n    scan_id = 0\n"
            "    distance_threshold = 3.0\n    max_verts = 16",
        )
    cpath = tmp_path / f"{convention}.conf"
    cpath.write_text(conf)
    rehearse_main([
        "--convention", convention,
        "--scene-root", str(tmp_path),
        "--conf", str(cpath),
        "--nepoch", "1",
        "--n-views", "3",
        "--res", "48", "48",
    ])
    metrics_files = glob.glob(
        str(tmp_path / "exps" / "**" / "rehearsal_metrics.json"),
        recursive=True,
    )
    assert len(metrics_files) == 1
    with open(metrics_files[0]) as f:
        m = json.load(f)
    if convention == "bmvs":
        assert m.pop("bmvs_rule_nepochs") == 200000 // 3
    assert set(m) == {"junctions", "lines"}
    for section in m.values():
        assert set(section) == {"accuracy_d2s", "completeness_s2d", "overall"}
        for v in section.values():
            assert isinstance(v, float), m


def test_rehearse_dtu_smoke(tmp_path):
    """The DTU rehearsal driver (train -> finalize -> eval_lsr -> eval_dtu
    ObsMask path) completes on a tiny DTU-convention synthetic scene and
    writes the metrics artifact."""
    import glob

    from tools.rehearse_dtu import main as rehearse_main

    scan_dir = tmp_path / "toy" / "scan7"
    generate_scene(str(scan_dir), n_views=3, res=(48, 48), convention="dtu")
    conf = TINY_CONF.replace(
        "dataset_class = datasets.blender_hawp_dataset.BlenderDataset",
        "dataset_class = datasets.scene_hawp_dataset.SceneDataset",
    ).replace(
        "data_dir = toy",
        "data_dir = toy\n    scan_id = 7\n    distance_threshold = 3.0\n"
        "    max_verts = 16",
    )
    cpath = tmp_path / "dtu-rehearsal.conf"
    cpath.write_text(conf)
    rehearse_main([
        "--scene-root", str(tmp_path),
        "--conf", str(cpath),
        "--scan", "7",
        "--nepoch", "1",
    ])
    metrics_files = glob.glob(
        str(tmp_path / "exps" / "**" / "rehearsal_metrics.json"),
        recursive=True,
    )
    assert len(metrics_files) == 1
    with open(metrics_files[0]) as f:
        m = json.load(f)
    assert set(m) == {"junctions", "lines", "surface_obsmask"}
    # a 1-epoch model may legitimately finalize to an empty wireframe, in
    # which case the chamfer metrics are inf/nan by convention — the smoke
    # contract is that the driver runs every protocol stage and records
    # float-typed metrics in the documented structure
    for section in m.values():
        assert set(section) == {"accuracy_d2s", "completeness_s2d", "overall"}
        for v in section.values():
            assert isinstance(v, float), m


def test_show_view_overlay(tmp_path):
    """The rend_show headless counterpart: project ray extents, field
    lines, and global junctions for one view and write the overlay PNG
    (reference model/networks/neat_wfr_rend_show.py:457-468)."""
    import dataclasses as dc

    import jax

    from neat_tpu.data.datasets import load_scene_for_config
    from neat_tpu.model.neat import init_neat
    from neat_tpu.train.config import build_experiment_config, parse_hocon
    from neat_tpu.wireframe.debug_tools import show_view

    os.makedirs(tmp_path / "toy")
    generate_scene(str(tmp_path / "toy"), n_views=3, res=(48, 48))
    cfg = build_experiment_config(parse_hocon(TINY_CONF))
    mcfg = dc.replace(
        cfg.model,
        implicit=dc.replace(cfg.model.implicit, dims=(16,) * 4, skip_in=(2,),
                            multires=2),
        junctions=dc.replace(cfg.model.junctions, num_junctions=8,
                             dim_hidden=16),
        max_verts=16,
    )
    scene = load_scene_for_config(cfg, str(tmp_path))
    params = init_neat(jax.random.PRNGKey(0), mcfg)

    png = tmp_path / "show.png"
    res = show_view(params, mcfg, scene, view=0, chunksize=256, n_rays=8,
                    out_path=str(png))
    assert png.exists() and png.stat().st_size > 0
    assert res["rays2d"].shape[1:] == (2, 2)
    assert res["rays2d"].shape[0] == 8
    assert res["lines2d"].shape[1] == 4
    assert res["junctions2d"].shape == (8, 2)
    for v in res.values():
        assert np.isfinite(v).all()


def test_measure_reference_ratio_smoke(capsys):
    """The measured CPU cost anchor behind BASELINE.md's vs_baseline
    footnote: both steps run and the ratios come out positive/finite."""
    if not osp.isdir("/root/reference/code"):
        pytest.skip("reference checkout not present")
    from tools.measure_reference_ratio import main as ratio_main

    ratio_main(["--rays", "32", "--steps", "1"])
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["rays"] == 32
    for key in ("ref_step_s_1thread", "ours_step_s", "ratio_vs_ref_1thread"):
        assert rec[key] > 0, rec


def test_auction_ab_dtu_pure_pieces(tmp_path):
    """The A/B driver's pure pieces: the train.log parser recovers
    per-epoch metrics + rays/s, and the DTU-shaped conf template parses
    into a valid experiment config (1024 junctions, DBSCAN proposals,
    SceneDataset) so both arms train the intended regime."""
    from tools.auction_ab_dtu import CONF_TEMPLATE, parse_train_log
    from neat_tpu.train.config import build_experiment_config, parse_hocon

    log = tmp_path / "train.log"
    log.write_text(
        "2026-01-01 00:00:00,000 train.x INFO: Loading data ...\n"
        "2026-01-01 00:00:01,000 train.x INFO: dtu-ab [0/2]: "
        "loss = 0.5000 psnr = 10.0000 rgb_loss = 0.4000 (10,000 rays/s)\n"
        "2026-01-01 00:00:02,000 train.x INFO: dtu-ab [1/2]: "
        "loss = 0.2500 psnr = 12.0000 rgb_loss = 0.2000 (20,000 rays/s)\n"
    )
    epochs, rays = parse_train_log(str(tmp_path))
    assert len(epochs) == 2 and rays == [10000.0, 20000.0]
    assert epochs[1]["loss"] == 0.25 and epochs[1]["psnr"] == 12.0

    cfg = build_experiment_config(
        parse_hocon(CONF_TEMPLATE.format(res0=60, res1=80))
    )
    assert cfg.model.dbscan_enabled
    assert cfg.model.junctions.num_junctions == 1024
    assert cfg.img_res == (60, 80)
    assert cfg.dataset_kind == "dtu"


def test_geometry_sweep_smoke_and_resume(tmp_path, capsys, monkeypatch):
    """The geometry-sweep driver end-to-end on a tiny scene (train ->
    finalize -> eval_abc -> report), then again with --resume: the second
    invocation must CONTINUE the existing timestamped run (one rundir,
    epochs extended) instead of starting a fresh one — the recovery path
    for a TPU-relay wedge mid-sweep. The production conf template is the
    full-size flagship model (minutes of CPU compile), so the smoke swaps
    in the tiny model with the driver's placeholders."""
    import glob

    import tools.geometry_sweep as gs
    from tools.geometry_sweep import main as sweep_main

    tiny_template = (
        TINY_CONF.replace("{", "{{").replace("}", "}}")
        .replace("expname = tiny", "expname = geom_{geom}")
        .replace("data_dir = toy", "data_dir = {geom}")
        .replace("img_res = [48, 48]", "img_res = [{res}, {res}]")
    )
    monkeypatch.setattr(gs, "CONF_TEMPLATE", tiny_template)

    common = [
        "--workdir", str(tmp_path),
        "--geometries", "tetra",
        "--views", "3",
        "--res", "48",
        "--votes", "1", "1",
        "--out", str(tmp_path / "report.md"),
    ]
    sweep_main(common + ["--nepoch", "1"])
    rundirs = glob.glob(str(tmp_path / "exps" / "geom_tetra" / "*"))
    assert len(rundirs) == 1
    assert "## tetra" in (tmp_path / "report.md").read_text()

    sweep_main(common + ["--nepoch", "2", "--resume"])
    # resume follows the runner's is_continue contract (mirroring the
    # reference volsdf_train.py:83-97): a NEW timestamp dir restoring
    # params+optimizer+schedule from the previous one's checkpoints
    rundirs2 = sorted(glob.glob(str(tmp_path / "exps" / "geom_tetra" / "*")))
    assert len(rundirs2) == 2
    new_run = [d for d in rundirs2 if d not in rundirs][0]
    log = open(osp.join(new_run, "train.log")).read()
    assert "Resumed epoch 1" in log, "must restore from the first run"
    assert "[1/2]" in log and "[0/2]" not in log, \
        "resumed run must continue past the first epoch, not restart"

    # the calibrated-recipe knobs reach wireframe_recon and the header
    sweep_main(common + ["--nepoch", "2", "--skip-train",
                         "--merge-before-vote",
                         "--junction-coords", "vote_mean"])
    report = (tmp_path / "report.md").read_text()
    assert "merge-before-vote True" in report
    assert "junction-coords vote_mean" in report
    assert "## tetra" in report

    # --seed N trains a coexisting _sN run (the seed-sweep driver path)
    # and stamps the seed in the report header
    sweep_main(common + ["--nepoch", "1", "--seed", "7"])
    assert len(glob.glob(str(tmp_path / "exps" / "geom_tetra_s7" / "*"))) == 1
    assert "seed 7" in (tmp_path / "report.md").read_text()


def test_large_batch_ab_pure_pieces(tmp_path):
    """The large-batch A/B driver's pure pieces: write_arm_conf patches
    exactly the (expname, learning_rate, num_pixels) triple into the
    flagship conf — leaving split_n_pixels untouched — and the patched
    text parses into a valid experiment config; median_rays recovers the
    sustained throughput with the compile epoch dropped."""
    from tools.large_batch_ab import median_rays, write_arm_conf
    from neat_tpu.train.config import build_experiment_config, parse_hocon

    path = write_arm_conf(str(tmp_path), "large", 4096, 1.0e-3)
    text = open(path).read()
    cfg = build_experiment_config(parse_hocon(text))
    assert cfg.expname == "lb_large"
    assert cfg.num_pixels == 4096
    assert cfg.learning_rate == 1.0e-3
    # the eval chunk must keep the flagship value (only the train batch
    # scales)
    assert "split_n_pixels = 1024" in text

    log = tmp_path / "train.log"
    log.write_text(
        "t INFO: lb_large [0/3]: loss = 0.5 (204 rays/s)\n"
        "t INFO: lb_large [1/3]: loss = 0.4 (40,000 rays/s)\n"
        "t INFO: lb_large [2/3]: loss = 0.3 (44,000 rays/s)\n"
    )
    assert median_rays(str(tmp_path)) == 42000.0
