"""`python -m neat_tpu` — list the framework's entry points."""

COMMANDS = {
    "train": "neat_tpu.train.runner — train a scene (reference exp_runner)",
    "finalize": "neat_tpu.wireframe.finalize — distill the wireframe",
    "eval-abc": "neat_tpu.evaluation.eval_abc — ABC junction/line P/R",
    "eval-dtu": "neat_tpu.evaluation.eval_dtu — DTU surface ACC/COMP",
    "eval-lsr": "neat_tpu.evaluation.eval_lsr — wireframe ACC/COMP",
    "render": "neat_tpu.evaluation.render_eval — full-view PSNR + mesh",
    "distill": "neat_tpu.wireframe.distill — simple/merge/nms/fuse tools",
    "view": "neat_tpu.viz.viewer — headless wireframe turntable",
    "colmap": "neat_tpu.colmap_tools.convert — SfM -> cameras.npz",
    "synthetic": "neat_tpu.data.synthetic — generate a test scene",
    "monodepth": "neat_tpu.data.monodepth — depth/normal cues",
    "import-ckpt": "neat_tpu.interop.convert_checkpoint — reference .pth import",
    "export-ckpt": "neat_tpu.interop.torch_export — export a run to a reference .pth",
    "debug": "neat_tpu.wireframe.debug_tools — recon/softmax/show probes",
    "analyze": "neat_tpu.evaluation.abc_analysis — GT detectability sweep",
    "colmap-vis": "neat_tpu.colmap_tools.vis — headless model viewer",
}

if __name__ == "__main__":
    print(__doc__)
    for name, desc in COMMANDS.items():
        print(f"  python -m {desc.split(' — ')[0]:42s} {desc.split(' — ')[1]}")
