"""Smoke tests for the CLI harnesses (tiny shapes, CPU interpret mode)."""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full engine/model runs; default run skips (-m) — CI covers


def run_script(path, *args, timeout=600):
    r = subprocess.run(
        [sys.executable, path, *args],
        capture_output=True, text=True, timeout=timeout,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "."},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def run_cli(mod, *args, timeout=600):
    r = subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, timeout=timeout,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "."},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_gemm_bench_cli():
    out = run_cli("leetcuda_tpu.bench.gemm_bench", "--mnk", "256",
                  "--iters", "2", "--check", "--markdown",
                  "--variants", "sgemm_naive_f32", "--dtype", "float32")
    assert "xla_dot 256x256x256" in out
    assert "| kernel |" in out  # markdown table


def test_attn_bench_cli():
    out = run_cli("leetcuda_tpu.bench.attn_bench", "--B", "1", "--H", "2",
                  "--N", "256", "--D", "64", "--dtype", "float32",
                  "--iters", "2", "--check", "--causal")
    assert "xla_sdpa_ref" in out and "allclose=True" in out


def test_export_stablehlo_cli(tmp_path):
    out = run_cli("tools.export_stablehlo", "--op", "sgemm", "--m", "256",
                  "--n", "256", "--k", "256",
                  "--out", str(tmp_path / "mm"))
    assert "wrote" in out
    mlir = (tmp_path / "mm.mlir").read_text()
    assert "module" in mlir
    manifest = (tmp_path / "mm.manifest").read_text()
    assert "arg f32 256x256" in manifest and "chain 0" in manifest


def test_gen_op_table_cli():
    out = run_cli("tools.gen_op_table")
    assert "Registered kernel inventory" in out
    assert "flash-attn" in out


def test_train_example():
    out = run_script("examples/train.py", "--steps", "2")
    assert "loss" in out and "checkpoint ->" in out


def test_train_example_native_loader(tmp_path):
    out = run_script("examples/train.py", "--steps", "2", "--loader",
                     "--data", str(tmp_path))
    assert "native loader:" in out and "loss" in out


def test_train_example_pipeline(tmp_path):
    import os
    r = subprocess.run(
        [sys.executable, "examples/train.py", "--pp", "2", "--steps", "2",
         "--loader", "--data", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": ".",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "(pp=2)" in r.stdout and "merged pp stages" in r.stdout


def test_serve_example():
    out = run_script("examples/serve.py", "--paged", "--temperature", "0.8")
    assert "request 1:" in out
