"""Experiment runtime: directories, config snapshots, the epoch loop,
logging, checkpoints, junction snapshots.

Reference counterpart: VolSDFTrainRunner (reference code/training/
volsdf_train.py:65-411) and the exp_runner CLI (code/training/
exp_runner.py). Same experiment-directory contract:

    <exps_folder>/<expname>[/<scan_id>]/<timestamp>/
        runconf.conf            frozen config snapshot
        train.log               step/epoch log
        checkpoints/            full-state snapshots (see checkpoint.py)
        junctions/{epoch}.npy   decoded global-junction point clouds
        plots/                  rendered previews / camera figures

TPU redesign of the loop: the jitted step dispatches asynchronously and
metrics stay on device until the end of the epoch (= n_views steps of 1024
rays, matching the reference's one-view-per-step DataLoader), so the chip
never stalls on the host. The BlendedMVS 200k-iteration rule
(volsdf_train.py:152-153) is preserved.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import os.path as osp
import sys
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExperimentConfig, load_experiment_config, dump_hocon
from .step import (
    TrainState,
    init_train_state,
    make_train_multi_step,
    make_train_step,
)
from .checkpoint import save_checkpoint, load_checkpoint
from ..data.datasets import load_scene, SceneData
from ..model.neat import init_neat
from ..fields.mlp import global_junctions_forward


def scene_to_device(scene: SceneData, sharding=None) -> Dict[str, jnp.ndarray]:
    arrays = {
        "rgb": scene.rgb,
        "intrinsics": scene.intrinsics,
        "pose": scene.pose,
        "mask": scene.mask,
        "labels": scene.labels,
        "uv_proj": scene.uv_proj,
        "lines": scene.lines,
        "verts2d": scene.verts2d,
        "verts_mask": scene.verts_mask,
        "support_idx": scene.support_idx,
        "support_count": scene.support_count,
        "depth": scene.depth,
    }
    arrays = {k: v for k, v in arrays.items() if v is not None}
    if sharding is not None:
        from ..parallel.mesh import shard_scene

        return shard_scene(arrays, sharding)
    return {k: jax.device_put(jnp.asarray(v)) for k, v in arrays.items()}


def resolve_parallel_mode(requested: str, model_cfg, n_rays: int, n_dev: int):
    """Pick the multi-chip step mode and whether the pallas kernels must be
    dropped. Returns (mode, disable_pallas).

    shard_map is the pod fast path (per-shard pallas kernels, psum'd grads);
    gspmd is the strict-parity single-global-program path — and GSPMD cannot
    partition an opaque pallas_call, so requesting (or falling back to)
    gspmd with pallas kernels on forces them off rather than letting a real
    pod silently replicate or fail at compile. dual_batch/junction_eikonal
    mix replicated and sharded gradient paths in one reduction and are
    gspmd-only (model/neat.py neat_forward shard_axis gate)."""
    pallas_on = model_cfg.use_pallas_sampler or model_cfg.use_pallas_field
    shardmap_ok = (
        not model_cfg.dual_batch
        and not model_cfg.junction_eikonal
        and n_rays % n_dev == 0
    )
    if requested == "auto":
        requested = "shard_map" if (pallas_on and shardmap_ok) else "gspmd"
    if requested == "shard_map":
        if not shardmap_ok:
            raise ValueError(
                "parallel_mode=shard_map requires n_rays divisible by the "
                f"mesh ({n_rays} % {n_dev} != 0) and no dual_batch/"
                "junction_eikonal variant flags"
            )
        return "shard_map", False
    return "gspmd", pallas_on


class TrainRunner:
    def __init__(
        self,
        conf: str,
        data_root: str = "../data",
        exps_folder: str = "../exps",
        expname_suffix: str = "",
        scan_id: int = -1,
        nepochs: int = 2000,
        batch_rays: Optional[int] = None,
        is_continue: bool = False,
        timestamp: str = "latest",
        checkpoint: str = "latest",
        max_verts: int = 512,
        assignment_method: str = "auction",
        seed: int = 42,
        log_every_epochs: int = 1,
        use_tb: bool = False,
        use_mesh: bool = False,
        do_vis: bool = False,
        gitexp: bool = False,
        field_dtype: Optional[str] = None,
        field_path: Optional[str] = None,
        parallel_mode: str = "auto",
        epoch_scan: bool = False,
    ):
        self.epoch_scan = epoch_scan
        self.do_vis = do_vis
        self.gitexp = gitexp
        # multi-host: every process traces/executes the same global
        # computation, but only process 0 owns the experiment directory
        # (logs, runconf, checkpoints, plots) — the standard SPMD contract
        # (reference is single-process; volsdf_train.py:99-127 writes
        # unconditionally)
        self.is_main = jax.process_index() == 0
        self.cfg = load_experiment_config(
            conf,
            scan_id=scan_id,
            nepochs=nepochs,
            max_verts=max_verts,
            assignment_method=assignment_method,
        )
        if field_dtype is not None:
            self.cfg = dataclasses.replace(
                self.cfg,
                model=dataclasses.replace(
                    self.cfg.model, field_compute_dtype=field_dtype
                ),
            )
        if field_path is not None:
            self.cfg = dataclasses.replace(
                self.cfg,
                model=dataclasses.replace(
                    self.cfg.model,
                    use_pallas_field=field_path != "xla",
                    pallas_field_backward=(
                        field_path if field_path != "xla" else "recompute"
                    ),
                ),
            )
        self.expname = self.cfg.expname + expname_suffix
        if self.cfg.scan_id != -1:
            self.expname = f"{self.expname}/{self.cfg.scan_id}"
        self.data_root = data_root
        self.seed = seed
        self.log_every_epochs = log_every_epochs

        # ----- experiment directories (reference volsdf_train.py:99-127)
        self.expdir = osp.join(exps_folder, self.expname)
        if self.is_main:
            os.makedirs(self.expdir, exist_ok=True)
        old_timestamp = None
        if is_continue and timestamp == "latest":
            stamps = sorted(
                d for d in (
                    os.listdir(self.expdir) if osp.isdir(self.expdir) else ()
                )
                if osp.isdir(osp.join(self.expdir, d))
            )
            old_timestamp = stamps[-1] if stamps else None
        elif is_continue:
            old_timestamp = timestamp
        # multi-host: the resume decision is derived from the local
        # filesystem, so every process must agree on it — otherwise a worker
        # whose disk lacks the experiment dir silently trains from scratch
        # (step=0) while process 0 resumes at step=K, desynchronizing the
        # fold_in(rng, step) stream and the epoch trip counts across the
        # SPMD job. Process 0's decision is broadcast; workers that then
        # cannot read the agreed checkpoint fail loudly below (resume needs
        # exps_folder on a filesystem all hosts share).
        if is_continue and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            buf = np.zeros(64, np.uint8)
            payload = (old_timestamp or "").encode()
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
            buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
            old_timestamp = bytes(buf[buf != 0]).decode() or None
        is_continue = old_timestamp is not None

        self.timestamp = "{:%Y_%m_%d_%H_%M_%S}".format(datetime.now())
        self.rundir = osp.join(self.expdir, self.timestamp)
        self.ckpt_dir = osp.join(self.rundir, "checkpoints")
        self.junctions_dir = osp.join(self.rundir, "junctions")
        self.plots_dir = osp.join(self.rundir, "plots")
        if self.is_main:
            for d in (self.rundir, self.ckpt_dir, self.junctions_dir, self.plots_dir):
                os.makedirs(d, exist_ok=True)

            if self.cfg.raw is not None:
                with open(osp.join(self.rundir, "runconf.conf"), "w") as f:
                    f.write(dump_hocon(self.cfg.raw))

        self.logger = self._make_logger()

        # ----- data
        self.logger.info("Loading data ...")
        self.scene = self._load_scene()
        self.n_views = self.scene.n_images
        self.logger.info(f"Data-set size: {self.n_views}")

        # BlendedMVS fixed-iteration rule (volsdf_train.py:152-153)
        if self.cfg.data_dir == "BlendedMVS":
            self.cfg = dataclasses.replace(
                self.cfg, nepochs=int(200000 / self.n_views)
            )

        self.n_rays = batch_rays or self.cfg.num_pixels
        self.decay_steps = self.cfg.nepochs * self.n_views

        # auto-enable the Pallas fused sampler kernel on TPU backends for
        # the canonical architecture
        from ..ops.fused_sdf import supports_fused_sdf

        backend = jax.devices()[0].platform.lower()
        # the fused kernel targets the TPU Mosaic backend only ('axon' is
        # the tunneled TPU platform of this environment); restricted to the
        # flagship variant — the volsdf-variant graph triggered a SIGILL in
        # the axon AOT compiler's fusion pass during testing
        if (
            supports_fused_sdf(self.cfg.model.implicit)
            and self.cfg.model.model_variant == "neat"
            and backend in ("tpu", "axon")
            # the fused kernel evaluates proposals in bf16; a conf pinning
            # sampler_compute_dtype = float32 asks for strict-parity f32
            # proposals and must keep the XLA path
            and self.cfg.model.sampler_compute_dtype == "bfloat16"
        ):
            self.cfg = dataclasses.replace(
                self.cfg,
                model=dataclasses.replace(self.cfg.model, use_pallas_sampler=True),
            )
            self.logger.info("pallas fused-SDF sampler kernel enabled")
            # fused refinement rounds (ops/fused_round.py) are NOT
            # auto-enabled: measured 3x50-step interleaved on v5e the
            # VMEM-resident round kernel is a consistent small loss vs
            # XLA's fused round block (sampler 9.69 vs 9.40 ms, step
            # 26.60 vs 26.37 ms). Opt in via the conf's
            # ray_sampler.fused_rounds if a future backend flips that.

        # stash-backward fused field main pass: default on TPU for the
        # canonical bf16 configuration (A/B-validated, RESULTS.md round 3);
        # --field_path overrides (xla/recompute/stash), f32 confs keep the
        # strict-parity XLA path
        from ..ops.fused_field import supports_fused_field

        if (
            field_path is None
            and not self.cfg.model.use_pallas_field
            and self.cfg.model.model_variant == "neat"
            and backend in ("tpu", "axon")
            and self.cfg.model.field_compute_dtype == "bfloat16"
            and supports_fused_field(
                self.cfg.model.implicit,
                self.cfg.model.rendering,
                self.cfg.model.attraction,
            )
        ):
            self.cfg = dataclasses.replace(
                self.cfg,
                model=dataclasses.replace(
                    self.cfg.model,
                    use_pallas_field=True,
                    pallas_field_backward="stash",
                ),
            )
            self.logger.info("pallas stashed-backward field kernel enabled")

        # ----- model/optimizer state
        params = init_neat(jax.random.PRNGKey(seed), self.cfg.model)
        self.state = init_train_state(
            params,
            self.cfg.learning_rate,
            self.cfg.sched_decay_rate,
            self.decay_steps,
        )
        self.start_epoch = 0
        if is_continue and old_timestamp is not None:
            old_ckpt = osp.join(self.expdir, old_timestamp, "checkpoints")
            if not osp.isdir(old_ckpt):
                raise FileNotFoundError(
                    f"process {jax.process_index()}: resume checkpoint dir "
                    f"{old_ckpt} is unreadable on this host; multi-host "
                    "resume requires exps_folder on a shared filesystem"
                )
            try:
                self.state, self.start_epoch = load_checkpoint(
                    old_ckpt, checkpoint
                )
                self.logger.info(
                    f"Resumed epoch {self.start_epoch} from {old_ckpt} "
                    "(params + optimizer + schedule restored exactly)"
                )
            except (FileNotFoundError, RuntimeError) as e:
                # a run killed before its first save leaves a rundir with
                # no loadable snapshot; an unattended --resume relaunch
                # (tools/watchdog.py) must start fresh, not crash
                self.logger.warning(
                    f"resume requested but no loadable checkpoint in "
                    f"{old_ckpt} ({e}); starting from scratch"
                )

        # optional TensorBoard scalars (reference --use_tb, volsdf_train.py:237-242);
        # process 0 owns the experiment directory — workers must not recreate
        # their own skewed-timestamp rundirs just to host an event stream
        self.tb_writer = None
        if use_tb and self.is_main:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb_writer = SummaryWriter(osp.join(self.rundir, "logs"))
            except ImportError:
                self.logger.warning("tensorboard unavailable; continuing without")

        # multi-chip: shard the per-pixel scene tables and the ray batch
        # over a 1-D data mesh. Two step modes (make_train_step docstring):
        #   shard_map — the pod fast path: per-shard pallas kernels, psum'd
        #               grads; the default whenever the pallas kernels are
        #               on (GSPMD cannot partition an opaque pallas_call)
        #   gspmd     — one global program with sharding constraints; the
        #               strict-parity path (and the only one for the
        #               dual_batch / junction_eikonal variants)
        data_sharding = None
        mesh = None
        shard_map_mesh = None
        if use_mesh and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh, ray_sharding

            mesh = make_mesh()
            n_dev = len(mesh.devices.flat)
            parallel_mode, disable_pallas = resolve_parallel_mode(
                parallel_mode, self.cfg.model, self.n_rays, n_dev
            )
            if parallel_mode == "shard_map":
                shard_map_mesh = mesh
            else:
                data_sharding = ray_sharding(mesh)
                if disable_pallas:
                    self.cfg = dataclasses.replace(
                        self.cfg,
                        model=dataclasses.replace(
                            self.cfg.model,
                            use_pallas_sampler=False,
                            use_pallas_field=False,
                        ),
                    )
                    self.logger.info(
                        "pallas kernels disabled: GSPMD multi-chip mode "
                        "cannot partition pallas_call (use "
                        "--parallel_mode shard_map for the fused fast path)"
                    )
            self.logger.info(
                f"data-parallel mesh over {n_dev} devices ({parallel_mode})"
            )
        self.mesh = mesh
        self.parallel_mode = parallel_mode if mesh is not None else "single"
        if mesh is not None:
            # replicate model/opt state over the mesh explicitly: under
            # multi-process (DCN) every jit input must be a global array,
            # and single-process this is a no-op placement
            from ..parallel.mesh import replicated_sharding

            self.state = jax.device_put(self.state, replicated_sharding(mesh))
        self.scene_dev = scene_to_device(self.scene, sharding=mesh)
        # epoch_scan: n_views steps inside ONE lax.scan program
        # (make_train_multi_step) — one host dispatch per epoch instead
        # of n_views, numerically equivalent to sequential steps
        # (tests/test_model.py::TestMultiStep). Default OFF: on TPU v5e
        # the scanned flagship step's steady state EQUALS dispatched
        # (~28 ms/step — async dispatch already hides the tunnel
        # latency) and the scan adds a one-time ~32 s second-call
        # stall (docs/perf_round5.md). Opt in where the step body is
        # far smaller than the host round-trip.
        step_kwargs = dict(
            data_sharding=data_sharding,
            shard_map_mesh=shard_map_mesh,
        )
        step_args = (
            self.cfg.model,
            self.cfg.loss,
            self.cfg.learning_rate,
            self.cfg.sched_decay_rate,
            self.decay_steps,
            self.n_rays,
            self.scene.img_res[1],
        )
        if self.epoch_scan:
            self.step_fn = make_train_multi_step(*step_args, **step_kwargs)
        else:
            self.step_fn = make_train_step(*step_args, **step_kwargs)

    # ------------------------------------------------------------------
    def _load_scene(self) -> SceneData:
        from ..data.datasets import load_scene_for_config

        return load_scene_for_config(self.cfg, self.data_root)

    def _make_logger(self):
        logger = logging.getLogger(f"train.{self.timestamp}")
        logger.setLevel(logging.DEBUG)
        logger.handlers.clear()
        fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
        if self.is_main:
            fh = logging.FileHandler(osp.join(self.rundir, "train.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        else:
            # non-main processes keep stdout (prefixed by launcher) but
            # stay quiet below WARNING to avoid N copies of every line
            logger.setLevel(logging.WARNING)
        return logger

    # ------------------------------------------------------------------
    def save(self, epoch: int) -> None:
        if not self.is_main:
            return
        save_checkpoint(self.ckpt_dir, self.state, epoch)

    def _host_params(self):
        """Fetch the (replicated) params to host numpy: process-0-only side
        computations (junction dumps, preview renders) must not launch jit
        work on global arrays spanning other processes' devices."""
        return jax.tree_util.tree_map(np.asarray, self.state.params)

    def dump_junctions(self, epoch: int) -> None:
        if "junctions" not in self.state.params or not self.is_main:
            return
        if jax.process_count() == 1:
            # single-process: run the tiny forward on device and fetch only
            # the (N, 3) result — the dump runs EVERY epoch (reference
            # volsdf_train.py:336-343) and fetching the whole params tree
            # here costs one tunnel round-trip per leaf, which dominated
            # short-epoch training wall-clock
            if not hasattr(self, "_junctions_fwd"):
                self._junctions_fwd = jax.jit(
                    lambda j: global_junctions_forward(
                        j, self.cfg.model.junctions
                    )
                )
            pts = self._junctions_fwd(self.state.params["junctions"])
        else:
            # multi-process: params are global arrays spanning other
            # processes' devices; a process-0-only jit on them would hang,
            # so fetch the subtree and compute on host
            pts = global_junctions_forward(
                jax.tree_util.tree_map(
                    np.asarray, self.state.params["junctions"]
                ),
                self.cfg.model.junctions,
            )
        np.save(
            osp.join(self.junctions_dir, f"{epoch}.npy"), np.asarray(pts)
        )

    def plot_epoch(self, epoch: int) -> None:
        """Render a preview view + junction snapshot figure (the reference
        do_vis path, volsdf_train.py:302-332, headless)."""
        from ..evaluation.render_eval import render_view
        from ..viz.plots import plot_image_grid, plot_wireframe3d

        view = epoch % self.n_views
        host_params = self._host_params()
        out = render_view(
            host_params, self.cfg.model, self.scene, view,
            chunksize=self.cfg.split_n_pixels,
        )
        gt = self.scene.rgb[view].reshape(*self.scene.img_res, 3)
        plot_image_grid(
            osp.join(self.plots_dir, f"rendering_{epoch}_{view}.png"),
            out["rgb"], gt, out.get("normal"),
        )
        if "junctions" in self.state.params:
            pts = np.asarray(
                global_junctions_forward(
                    host_params["junctions"], self.cfg.model.junctions
                )
            )
            plot_wireframe3d(
                osp.join(self.plots_dir, f"junctions_{epoch}.png"),
                np.zeros((0, 2, 3)), junctions=pts, title=f"epoch {epoch}",
            )

    def run(self) -> None:
        """Train; a checkpoint is always written on exit — including
        KeyboardInterrupt/SIGTERM — so crash-and-resume loses at most the
        in-flight epoch (the reference saves only on clean completion)."""
        import signal

        # SIGTERM (preemption, driver kill) must unwind through the
        # finally below; the default handler would skip it
        def _on_term(signum, frame):
            raise SystemExit(128 + signum)

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # non-main thread: keep default behavior
            pass

        # _run_epochs updates _current_epoch as it goes so an interrupt
        # mid-run saves the params' true epoch, not start_epoch
        self._current_epoch = self.start_epoch
        try:
            self._current_epoch = self._run_epochs()
        finally:
            epoch = self._current_epoch
            self.save(epoch)
            self.dump_junctions(epoch)
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

        self.logger.info(f"Training finished after {epoch} epochs")
        if self.gitexp:
            # experiment bookkeeping commits (reference --gitexp,
            # volsdf_train.py:232-235,245-250)
            try:
                import sys

                sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))
                from tools.commit import commit_experiment

                commit_experiment(
                    self.rundir, f"experiment {self.expname}/{self.timestamp}"
                )
            except Exception as e:  # bookkeeping must never kill a run
                self.logger.warning(f"gitexp commit failed: {e}")

    def _run_epochs(self) -> int:
        self.logger.info("training...")
        cfg = self.cfg
        rng = jax.random.PRNGKey(self.seed)

        # camera-rig figure once at start (reference volsdf_train.py:278-296)
        if self.is_main:
            from ..viz.plots import plot_cameras

            plot_cameras(osp.join(self.plots_dir, "cameras.png"), self.scene.pose)

        epoch = self.start_epoch
        for epoch in range(self.start_epoch, cfg.nepochs + 1):
            self._current_epoch = epoch
            if epoch % cfg.checkpoint_freq == 0:
                self.save(epoch)
            # per-epoch junction snapshot (reference volsdf_train.py:336-343)
            self.dump_junctions(epoch)
            if self.do_vis and self.is_main and epoch % cfg.plot_freq == 0 and epoch > 0:
                self.plot_epoch(epoch)

            t0 = time.time()
            # per-step jitted calls dispatch asynchronously; metrics stay on
            # device until the end of the epoch, so the chip never stalls
            rng, sub = jax.random.split(rng)
            epoch_rngs = jax.random.split(sub, self.n_views)
            if self.mesh is not None:
                # under multi-process every jit input must be a global
                # array; single-process this is a free replication
                from ..parallel.mesh import replicated_sharding

                epoch_rngs = jax.device_put(
                    epoch_rngs, replicated_sharding(self.mesh)
                )
            if self.epoch_scan:
                self.state, stacked_dev = self.step_fn(
                    self.state, self.scene_dev, epoch_rngs
                )
            else:
                auxes = []
                for i in range(self.n_views):
                    self.state, aux = self.step_fn(
                        self.state, self.scene_dev, epoch_rngs[i]
                    )
                    auxes.append(aux)
                stacked_dev = {
                    k: jnp.stack([a[k] for a in auxes]) for k in auxes[0]
                }

            if epoch % self.log_every_epochs == 0:
                # one stacked transfer per metric key instead of one per
                # (key, view): per-leaf fetches each pay a tunnel round-trip
                stacked = jax.device_get(stacked_dev)
                means = {
                    k: float(np.mean(v)) for k, v in stacked.items()
                }
                msg = " ".join(f"{k} = {v:.4f}" for k, v in sorted(means.items()))
                rays_s = self.n_views * self.n_rays / max(time.time() - t0, 1e-9)
                self.logger.info(
                    f"{self.expname} [{epoch}/{cfg.nepochs}]: {msg} "
                    f"({rays_s:,.0f} rays/s)"
                )
                if self.tb_writer is not None:
                    for k, v in means.items():
                        self.tb_writer.add_scalar(f"train/{k}", v, epoch)
                    self.tb_writer.add_scalar("train/rays_per_sec", rays_s, epoch)

        return epoch


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="neat_tpu trainer (reference exp_runner.py parity CLI)"
    )
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=1, help="views per step (reference semantics; kept at 1)")
    parser.add_argument("--nepoch", type=int, default=2000)
    parser.add_argument("--expname", type=str, default="")
    parser.add_argument("--scan_id", type=int, default=-1)
    parser.add_argument("--exps_folder", type=str, default="../exps")
    parser.add_argument("--data_root", type=str, default="../data")
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--timestamp", default="latest", type=str)
    parser.add_argument("--checkpoint", default="latest", type=str)
    parser.add_argument("--assignment", default="auction", choices=["auction", "callback"])
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--use_tb", default=False, action="store_true",
                        help="TensorBoard scalar logging (reference --use_tb)")
    parser.add_argument("--mesh", default=False, action="store_true",
                        help="shard the ray batch over all visible devices")
    parser.add_argument("--parallel_mode", default="auto",
                        choices=["auto", "shard_map", "gspmd"],
                        help="multi-chip step mode (with --mesh): shard_map "
                        "runs the pallas-capable fused path per shard with "
                        "psum'd grads (the pod fast path); gspmd compiles "
                        "one global program with sharding constraints "
                        "(strict-parity path; required for dual_batch/"
                        "junction_eikonal). auto picks shard_map whenever "
                        "the pallas kernels are enabled and compatible")
    parser.add_argument("--epoch_scan", default=False, action="store_true",
                        help="run each epoch's n_views steps inside one "
                        "lax.scan program (one host dispatch per epoch; "
                        "numerically equivalent). Off by default: at "
                        "flagship step size async dispatch already hides "
                        "the host latency, so the scan gains nothing and "
                        "pays a one-time rebind stall "
                        "(docs/perf_round5.md)")
    parser.add_argument("--do_vis", default=False, action="store_true",
                        help="render preview plots every plot_freq epochs")
    parser.add_argument("--gitexp", default=False, action="store_true",
                        help="commit runconf/train.log snapshots to git")
    parser.add_argument("--distributed", default=False, action="store_true",
                        help="multi-host: jax.distributed.initialize() before "
                        "building the mesh (DCN via JAX; pair with --mesh)")
    parser.add_argument("--platform", default=None, type=str,
                        choices=["cpu", "tpu", "axon"],
                        help="pin the jax platform before backend init "
                        "(this image's sitecustomize defaults to the "
                        "tunneled TPU; 'cpu' makes a run hermetic)")
    parser.add_argument("--coordinator", default=None, type=str,
                        help="host:port of process 0 for --distributed; "
                        "omit on TPU pods where JAX auto-detects the cluster")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="total process count for --distributed "
                        "(with --coordinator)")
    parser.add_argument("--process_id", default=None, type=int,
                        help="this process's rank for --distributed "
                        "(with --coordinator)")
    parser.add_argument("--field_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="override model.field_compute_dtype (precision "
                        "of the main differentiated field evals)")
    parser.add_argument("--field_path", default=None,
                        choices=["xla", "recompute", "stash"],
                        help="main-pass field implementation: plain XLA, "
                        "pallas fused with in-kernel recompute backward, or "
                        "pallas fused with stashed-residual backward")
    parser.add_argument("--debug_nans", default=False, action="store_true",
                        help="raise on NaN inside jitted code (replaces the "
                        "reference's pdb NaN backward hooks)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        jax.config.update("jax_platforms", args.platform)

    if args.debug_nans:
        from ..utils.profiling import enable_nan_debugging

        enable_nan_debugging()

    if args.distributed:
        if args.coordinator is not None:
            # explicit cluster spec: CPU/GPU clusters and the hermetic
            # 2-process CPU test drive this path
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            # TPU pod: cluster auto-detection
            jax.distributed.initialize()

    runner = TrainRunner(
        conf=args.conf,
        data_root=args.data_root,
        exps_folder=args.exps_folder,
        expname_suffix=args.expname,
        scan_id=args.scan_id,
        nepochs=args.nepoch,
        is_continue=args.is_continue,
        timestamp=args.timestamp,
        checkpoint=args.checkpoint,
        assignment_method=args.assignment,
        seed=args.seed,
        use_tb=args.use_tb,
        use_mesh=args.mesh,
        do_vis=args.do_vis,
        gitexp=args.gitexp,
        field_dtype=args.field_dtype,
        field_path=args.field_path,
        parallel_mode=args.parallel_mode,
        epoch_scan=args.epoch_scan,
    )
    runner.run()


if __name__ == "__main__":
    main()
