"""Run the reference PyTorch implementation on CPU for numerical parity.

The reference (code/model/networks/neat_wfr_rend_a.py, model/ray_sampler.py,
model/networks/loss_wfr.py) imports cleanly on CPU torch once a handful of
GPU-era assumptions are stubbed:

  * ``pyhocon.ConfigTree`` — replaced by a dict subclass with the get_*
    accessors the model constructor uses (rend_a:260-315);
  * ``open3d`` / ``trimesh`` / ``skimage`` — imported at module scope but
    unused on the paths under test — empty module stubs;
  * ``Tensor.cuda()`` / ``Module.cuda()`` — pervasive (rend_a:263,442,...)
    — patched to identity so everything stays on CPU.

This module is test/bench infrastructure: it lets the repo's parity claims
(tests/test_reference_parity.py) and the measured implementation-cost ratio
(tools/measure_reference_ratio.py) execute the reference's own code rather
than a re-derivation of it.

Nothing here copies reference code — it only imports and drives it.
"""

from __future__ import annotations

import contextlib
import sys
import types
from typing import Any, Dict, Optional

import numpy as np

REFERENCE_CODE = "/root/reference/code"


class ConfigTree(dict):
    """Minimal pyhocon.ConfigTree lookalike: the reference model constructor
    only uses get_int/get_float/get_bool/get_list/get_string/get_config and
    ``**conf.get_config(...)`` unpacking (rend_a:260-315)."""

    def _get(self, key, default, marker):
        if key in self:
            return self[key]
        if default is marker:
            raise KeyError(key)
        return default

    _MARKER = object()

    def get_int(self, key, default=_MARKER):
        v = self._get(key, default, self._MARKER)
        return v if v is None else int(v)

    def get_float(self, key, default=_MARKER):
        v = self._get(key, default, self._MARKER)
        return v if v is None else float(v)

    def get_bool(self, key, default=_MARKER):
        v = self._get(key, default, self._MARKER)
        return v if v is None else bool(v)

    def get_string(self, key, default=_MARKER):
        v = self._get(key, default, self._MARKER)
        return v if v is None else str(v)

    def get_list(self, key, default=_MARKER):
        v = self._get(key, default, self._MARKER)
        return v if v is None else list(v)

    def get_config(self, key, default=_MARKER):
        v = self._get(key, default, self._MARKER)
        return as_config_tree(v) if isinstance(v, dict) else v

    def get(self, key, default=None):  # pyhocon.get is KeyError-free here
        return self._get(key, default, self._MARKER)


class ConfigFactory:
    """pyhocon.ConfigFactory lookalike backed by the repo's native HOCON
    parser; enough for the reference entry points' module-scope import and
    `ConfigFactory.parse_file(...)` (neat-final-parsing.py:7,349)."""

    @staticmethod
    def parse_file(path: str) -> "ConfigTree":
        from ..train.config import parse_hocon

        with open(path) as f:
            return as_config_tree(parse_hocon(f.read()))


def as_config_tree(d: Dict[str, Any]) -> ConfigTree:
    out = ConfigTree()
    for k, v in d.items():
        out[k] = as_config_tree(v) if isinstance(v, dict) else v
    return out


_installed = False


def install_reference_stubs() -> None:
    """Make ``/root/reference/code`` importable on CPU torch. Idempotent.

    Patches torch.Tensor.cuda / torch.nn.Module.cuda process-wide to
    identity — acceptable in this CPU-only image where .cuda() would raise
    anyway.
    """
    global _installed
    if _installed:
        return
    if "pyhocon" not in sys.modules:
        mod = types.ModuleType("pyhocon")
        mod.ConfigTree = ConfigTree
        mod.ConfigFactory = ConfigFactory
        sys.modules["pyhocon"] = mod
    elif not hasattr(sys.modules["pyhocon"], "ConfigFactory"):
        sys.modules["pyhocon"].ConfigFactory = ConfigFactory
    import importlib.machinery

    for name in ("open3d", "trimesh", "skimage"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a real ModuleSpec so third-party find_spec probes (e.g. the
            # HuggingFace datasets config) don't crash on the stub
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    if REFERENCE_CODE not in sys.path:
        sys.path.insert(0, REFERENCE_CODE)
    _installed = True


def install_dataset_stubs() -> None:
    """Make the reference *dataset* classes importable and runnable on CPU.

    On top of install_reference_stubs(), the dataset loaders
    (code/datasets/blender_hawp_dataset.py:11, scene_hawp_dataset.py:10)
    additionally need:

      * ``skimage.img_as_float32`` — used by rend_util.load_rgb
        (code/utils/rend_util.py:20-23); replicated faithfully for the
        integer dtypes the scene PNGs use;
      * ``hawp.base._C.encodels`` — the lost CUDA rasterizer (SURVEY §2.2
        N1), stubbed with THIS repo's C++ kernel (data/encodels.py). The
        per-pixel closest-line semantics of that kernel were pinned three
        independent ways against shipped artifacts (RESULTS.md §1), so a
        parity run through this stub validates the reference's Python
        post-processing, view filtering, and camera handling against our
        loaders — not the lost kernel itself.

    Idempotent.
    """
    install_reference_stubs()

    skimage = sys.modules["skimage"]
    if not hasattr(skimage, "img_as_float32"):

        def img_as_float32(img):
            img = np.asarray(img)
            if img.dtype == np.uint8:
                return (img / 255.0).astype(np.float32)
            if img.dtype == np.uint16:
                return (img / 65535.0).astype(np.float32)
            return img.astype(np.float32)

        skimage.img_as_float32 = img_as_float32

    if "hawp" not in sys.modules:
        import torch

        from ..data.encodels import encode_line_attraction

        def encodels(lines, height, width, height2, width2, n):
            """(lmap (6,H,W), labels_onehot (N,H,W), unused) — the call
            contract at blender_hawp_dataset.py:96."""
            arr = lines.detach().cpu().numpy().astype(np.float32)
            assert arr.shape[0] == n
            lmap, labels = encode_line_attraction(arr, int(height), int(width))
            onehot = torch.nn.functional.one_hot(
                torch.from_numpy(labels.astype(np.int64)).reshape(-1), int(n)
            )
            # bool, not float: the dataset post-processing multiplies this
            # mask into comparison results and later uses it as a boolean
            # index (blender_hawp_dataset.py:134,146) — float would be
            # rejected by torch advanced indexing
            onehot = onehot.t().reshape(int(n), int(height), int(width)).bool()
            return torch.from_numpy(lmap), onehot, None

        hawp = types.ModuleType("hawp")
        hawp_base = types.ModuleType("hawp.base")
        c_mod = types.ModuleType("hawp.base._C")
        c_mod.encodels = encodels
        hawp_base._C = c_mod
        hawp.base = hawp_base
        sys.modules["hawp"] = hawp
        sys.modules["hawp.base"] = hawp_base
        sys.modules["hawp.base._C"] = c_mod

    if "GPUtil" not in sys.modules:
        gputil = types.ModuleType("GPUtil")
        gputil.getAvailable = lambda *a, **k: [0]
        sys.modules["GPUtil"] = gputil

    # The reference's ``datasets`` directory has no __init__.py and its name
    # collides with the installed HuggingFace ``datasets`` package (a regular
    # package, which beats a namespace-package portion regardless of sys.path
    # order). Register it under the alias ``ref_datasets`` instead; relative
    # imports inside it (.utils.wireframe) resolve against this package.
    if "ref_datasets" not in sys.modules:
        import importlib.machinery
        import os.path as osp

        pkg = types.ModuleType("ref_datasets")
        path = [osp.join(REFERENCE_CODE, "datasets")]
        spec = importlib.machinery.ModuleSpec("ref_datasets", None, is_package=True)
        spec.submodule_search_locations = path
        pkg.__spec__ = spec
        pkg.__path__ = path
        sys.modules["ref_datasets"] = pkg


def load_reference_script(filename: str, alias: str):
    """Import a top-level reference script (dash-named, so not importable by
    module name), e.g. ``neat-final-parsing.py`` — after installing the
    stubs it needs. Idempotent per alias."""
    install_dataset_stubs()
    if alias in sys.modules:
        return sys.modules[alias]
    import importlib.util
    import os.path as osp

    path = osp.join(REFERENCE_CODE, filename)
    spec = importlib.util.spec_from_file_location(alias, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[alias] = module
    spec.loader.exec_module(module)
    return module


def run_reference_script_as_main(filename: str, argv) -> dict:
    """Execute a reference script whose whole body sits under
    ``if __name__ == '__main__':`` (the eval scripts: eval-dtu.py,
    eval-wfr-dtu.py, eval-lsr-*.py) with the given argv, after installing
    the import stubs it needs — including the numpy open3d shim
    (interop/o3d_shim.py). Returns the finished module globals dict so
    callers can read result variables directly (e.g. mean_d2s) instead of
    scraping stdout.

    Uses runpy with run_name='__main__', which temporarily installs the
    script as sys.modules['__main__'] — that also makes eval-dtu.py's
    mp.Pool workers resolve __main__.sample_single_tri under the fork
    start method."""
    import os.path as osp
    import runpy

    install_dataset_stubs()
    from .o3d_shim import install_open3d_stub

    install_open3d_stub()
    old_argv = sys.argv
    sys.argv = [filename] + list(argv)
    try:
        return runpy.run_path(
            osp.join(REFERENCE_CODE, filename), run_name="__main__"
        )
    finally:
        sys.argv = old_argv


def load_model_conf(conf_path: str) -> ConfigTree:
    """Parse a reference HOCON conf with the repo's native parser and return
    the model{} block wrapped for the reference constructor."""
    from ..train.config import parse_hocon

    with open(conf_path) as f:
        tree = parse_hocon(f.read())
    return as_config_tree(tree["model"])


def build_reference_model(
    conf_path: str,
    cls: str = "model.networks.neat_wfr_rend_a.VolSDFNetwork",
    model_overrides: Dict[str, Any] | None = None,
):
    """Instantiate a reference VolSDFNetwork variant from a conf file.

    ``cls`` is the reference class path (default: the canonical rend_a);
    ``model_overrides`` sets dotted model{} keys before construction (e.g.
    ``{"attraction_network.d_in": 6}`` for the rend_b no_view net, whose
    conf must shed the 3 view dims). A ``None`` value DELETES the key —
    some variant constructors reject keys the live confs carry (e.g.
    neat_along_ray's AttractionFieldNetwork takes no ``mode``). Requires
    install_reference_stubs().
    """
    install_reference_stubs()
    import importlib

    conf = load_model_conf(conf_path)
    for path, value in (model_overrides or {}).items():
        node = conf
        parts = path.split(".")
        for p in parts[:-1]:
            node = node[p]
        if value is None:
            node.pop(parts[-1], None)
        else:
            node[parts[-1]] = value
    module_name, cls_name = cls.rsplit(".", 1)
    mod = importlib.import_module(module_name)
    return getattr(mod, cls_name)(conf)


def build_reference_loss(
    cls: str = "model.networks.loss_wfr.VolSDFLoss", **kwargs
):
    """Instantiate a reference VolSDFLoss variant (default loss_wfr.py:16-24);
    ``cls`` picks the ablation class (loss_jc, loss_wfr_unnormalize, ...)."""
    install_reference_stubs()
    import importlib

    module_name, cls_name = cls.rsplit(".", 1)
    mod = importlib.import_module(module_name)

    kwargs.setdefault("rgb_loss", "torch.nn.L1Loss")
    kwargs.setdefault("eikonal_weight", 0.1)
    kwargs.setdefault("line_weight", 0.01)
    return getattr(mod, cls_name)(**kwargs)


class WireframeStub:
    """The two attributes the reference forward touches on input['wireframe']
    (rend_a:428,471): .line_segments() and .vertices."""

    def __init__(self, vertices, segments=None):
        import torch

        self.vertices = torch.as_tensor(np.asarray(vertices))
        self._segments = (
            torch.as_tensor(np.asarray(segments))
            if segments is not None
            else torch.zeros((0, 5))
        )

    def line_segments(self, threshold: float = 0.0):
        return self._segments


# ---------------------------------------------------------------------------
# deterministic shared randomness
# ---------------------------------------------------------------------------
#
# The reference's train-mode forward draws randomness through five sites
# (torch.rand in the sampler init/final draw, torch.randperm for the extra
# samples, torch.randint for the eikonal z index, Tensor.uniform_ for the
# eikonal box points); the repo's forward draws the same five through
# jax.random. For train-mode parity both sides are patched to consume the
# SAME shape-keyed numpy streams, making both forwards deterministic and
# identically distributed draw-for-draw.


class DeterministicDraws:
    def __init__(self, seed: int = 1234):
        self.seed = seed

    def _rs(self, *key) -> np.random.RandomState:
        import zlib

        h = zlib.crc32(repr((self.seed,) + key).encode()) % (2**31 - 1)
        return np.random.RandomState(h)

    def uniform(self, shape) -> np.ndarray:
        shape = tuple(int(s) for s in shape)
        return self._rs("uniform", shape).random_sample(shape)

    def permutation(self, n: int) -> np.ndarray:
        return self._rs("perm", int(n)).permutation(int(n))

    def randint(self, high: int, size: int) -> np.ndarray:
        return self._rs("randint", int(high), int(size)).randint(
            0, int(high), size=int(size)
        )


@contextlib.contextmanager
def patch_torch_rng(draws: DeterministicDraws):
    """Route the reference forward's five random sites through `draws`."""
    import torch

    orig_rand = torch.rand
    orig_randperm = torch.randperm
    orig_randint = torch.randint
    orig_uniform_ = torch.Tensor.uniform_

    def fake_rand(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (list, tuple)):
            shape = tuple(shape[0])
        return torch.as_tensor(draws.uniform(shape)).to(
            kw.get("dtype") or torch.get_default_dtype()
        )

    def fake_randperm(n, **kw):
        return torch.as_tensor(draws.permutation(n)).long()

    def fake_randint(high, size, **kw):
        n = int(np.prod(size)) if len(size) else 1
        return torch.as_tensor(draws.randint(high, n)).long().reshape(size)

    def fake_uniform_(self, a=0.0, b=1.0):
        arr = draws.uniform(tuple(self.shape))
        self.copy_(torch.as_tensor(a + (b - a) * arr).to(self.dtype))
        return self

    torch.rand = fake_rand
    torch.randperm = fake_randperm
    torch.randint = fake_randint
    torch.Tensor.uniform_ = fake_uniform_
    try:
        yield
    finally:
        torch.rand = orig_rand
        torch.randperm = orig_randperm
        torch.randint = orig_randint
        torch.Tensor.uniform_ = orig_uniform_


@contextlib.contextmanager
def patch_jax_rng(draws: DeterministicDraws):
    """Route the repo forward's five random sites through `draws`.

    Patches jax.random.{uniform, permutation, randint}; neat_forward and the
    samplers resolve these at call time, so eager (un-jitted) calls observe
    the patch.
    """
    import jax
    import jax.numpy as jnp

    orig_uniform = jax.random.uniform
    orig_permutation = jax.random.permutation
    orig_randint = jax.random.randint

    def fake_uniform(key, shape=(), dtype=float, minval=0.0, maxval=1.0):
        arr = draws.uniform(shape)
        return jnp.asarray(minval + (maxval - minval) * arr, dtype=dtype)

    def fake_permutation(key, x, axis=0, independent=False):
        if isinstance(x, int):
            return jnp.asarray(draws.permutation(x))
        raise NotImplementedError

    def fake_randint(key, shape, minval, maxval, dtype=jnp.int32):
        assert int(minval) == 0
        n = int(np.prod(shape)) if len(shape) else 1
        return jnp.asarray(
            draws.randint(int(maxval), n).reshape(shape), dtype=dtype
        )

    jax.random.uniform = fake_uniform
    jax.random.permutation = fake_permutation
    jax.random.randint = fake_randint
    try:
        yield
    finally:
        jax.random.uniform = orig_uniform
        jax.random.permutation = orig_permutation
        jax.random.randint = orig_randint
