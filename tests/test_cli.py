"""CLI smoke tests (subprocess, CPU-forced)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from rten_tpu.fmt.model_builder import ModelBuilder
    mb = ModelBuilder()
    g = mb.graph
    x = g.add_value("input", shape=["batch", 8])
    w = g.add_constant("w", np.random.RandomState(0)
                       .randn(8, 4).astype(np.float32))
    y = g.add_operator("MatMul", [x, w], name="mm")
    out = g.add_operator("Softmax", [y], attrs={"axis": -1}, name="sm")
    g.inputs, g.outputs = [x], [out]
    path = tmp_path_factory.mktemp("cli") / "model.rten"
    mb.save(path)
    return str(path)


def _run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # The environment's sitecustomize dials a TPU relay at interpreter
    # start when this var is set — a busy/wedged relay then blocks the
    # subprocess for minutes. CPU-only children must not dial it.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # Generous timeout: a fresh interpreter pays jax import + compile on
    # a weak shared host.
    return subprocess.run(
        [sys.executable, "-m", "rten_tpu.cli", *args],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cli_inspect(model_path):
    proc = _run_cli(model_path, "--inspect")
    assert proc.returncode == 0, proc.stderr
    assert "MatMul" in proc.stdout and "Softmax" in proc.stdout
    assert "Parameters: 32" in proc.stdout


def test_cli_run_with_size(model_path):
    proc = _run_cli(model_path, "--size", "batch=3", "-n", "2")
    assert proc.returncode == 0, proc.stderr
    assert "shape [3, 4]" in proc.stdout
    assert "Run time over 2 iters" in proc.stdout


def test_cli_timing_table(model_path):
    proc = _run_cli(model_path, "--timing", "--size", "batch=2")
    assert proc.returncode == 0, proc.stderr
    assert "TOTAL" in proc.stdout
