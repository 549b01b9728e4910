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


class TestTpuHealthProbe:
    """bench.py's end-to-end TPU health probe: the relay's TCP port can
    stay open while its external peer is wedged (every op hangs), so the
    probe must detect a hung subprocess via timeout — observed live in
    round 4."""

    def test_op_probe_detects_hang(self, monkeypatch):
        import subprocess

        bench = _load("bench", ROOT / "bench.py")

        def fake_run(cmd, timeout=None, capture_output=False):
            raise subprocess.TimeoutExpired(cmd, timeout)

        monkeypatch.setattr(subprocess, "run", fake_run)
        assert bench._tpu_op_completes(timeout_s=0.1, attempts=2,
                                       wait_s=0.0) is False

    def test_op_probe_passes_healthy(self, monkeypatch):
        import subprocess

        bench = _load("bench", ROOT / "bench.py")

        class R:
            returncode = 0

        monkeypatch.setattr(subprocess, "run",
                            lambda *a, **k: R())
        assert bench._tpu_op_completes(timeout_s=0.1, attempts=1) is True


class TestBenchSupervisor:
    """bench.py's measurement subprocess supervisor: a freshly-attached
    client can wedge on its first heavy dispatch even when both health
    probes pass (observed three times on 2026-08-20); the supervisor must
    kill the hung attempt (which itself unwedges the relay) and retry,
    and must surface the child's JSON line on success."""

    def _bench(self, monkeypatch):
        bench = _load("bench", ROOT / "bench.py")
        monkeypatch.setattr(bench, "_tpu_relay_alive", lambda: True)
        monkeypatch.setattr(bench, "_tpu_op_completes", lambda: True)
        return bench

    def test_retries_after_hang_and_echoes_json(self, monkeypatch, capsys):
        import subprocess

        bench = self._bench(monkeypatch)
        calls = []

        def fake_run(cmd, timeout=None, capture_output=False, text=False):
            calls.append(cmd)
            if len(calls) == 1:
                raise subprocess.TimeoutExpired(cmd, timeout)

            class R:
                returncode = 0
                stdout = 'warmup noise\n{"metric": "x", "value": 1}\n'
                stderr = ""

            return R()

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        assert bench._supervise(attempts=3, deadline_s=0.1) == 0
        assert len(calls) == 2 and "--measure" in calls[0]
        assert capsys.readouterr().out.strip() == '{"metric": "x", "value": 1}'

    def test_all_attempts_hung_fails_loudly(self, monkeypatch):
        import subprocess

        bench = self._bench(monkeypatch)

        def fake_run(cmd, timeout=None, capture_output=False, text=False):
            raise subprocess.TimeoutExpired(cmd, timeout)

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        out = bench._supervise(attempts=2, deadline_s=0.1)
        assert isinstance(out, str) and "no measurement attempt" in out
