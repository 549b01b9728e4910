"""Guard the driver contract: bench.py and __graft_entry__ must import and
build their configurations on any backend (their heavy bodies run on TPU)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDriverContract:
    def test_bench_importable(self):
        bench = _load("bench", ROOT / "bench.py")
        assert callable(bench.main)
        from neat_tpu.utils.benchscene import BENCH_N_RAYS

        assert BENCH_N_RAYS == 1024

    @pytest.mark.slow
    def test_graft_entry(self):
        ge = _load("graft_entry", ROOT / "__graft_entry__.py")
        fn, (params, inputs) = ge.entry()
        # jittable: tracing must succeed (no execution needed)
        import jax

        jaxpr = jax.make_jaxpr(fn)(params, inputs)
        assert len(jaxpr.jaxpr.outvars) == 3

    @pytest.mark.slow
    def test_entry_inputs_shapes(self):
        ge = _load("graft_entry", ROOT / "__graft_entry__.py")
        fn, (params, inputs) = ge.entry()
        assert inputs["uv"].shape == (1024, 2)
        assert inputs["verts2d"].shape[0] == inputs["verts_mask"].shape[0]
