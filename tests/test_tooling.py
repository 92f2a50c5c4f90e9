"""Tooling-parity tests: roofline, layout visualizer, markdown reports,
IR dumps, and the layer-norm backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.utils.roofline import roofline, V5E
from leetcuda_tpu.utils.layout_viz import print_grid_walk, print_block_layout
from leetcuda_tpu.bench.report import markdown_table
from leetcuda_tpu.bench.harness import BenchResult


def test_roofline_bounds():
    # 4096^3 bf16 GEMM: intensity ~1365 -> compute-bound on v5e
    M = N = K = 4096
    r = roofline(2.0 * M * N * K, (2 * M * K + 2 * K * N + 2 * M * N),
                 measured_s=0.8e-3, compute_dtype="bfloat16", chip=V5E)
    assert r.bound == "compute"
    assert 0 < r.sol_pct <= 100 or r.sol_pct > 0
    # memcpy-like op: intensity ~0 -> memory-bound
    r2 = roofline(4096.0, 1e9, measured_s=2e-3, chip=V5E)
    assert r2.bound == "memory"
    # floors: 1 GB at 819 GB/s = 1.22 ms -> 61% SOL at 2 ms
    assert abs(r2.sol_pct - 100 * (1e9 / 819e9) / 2e-3) < 1.0


def test_grid_walk_swizzle_order():
    from leetcuda_tpu.gemm.matmul import _swizzled_ij
    ni, nj, group = 4, 8, 2
    out = print_grid_walk(ni, nj,
                          lambda t: _swizzled_ij(t, ni, nj, group))
    # every tile visited exactly once
    steps = sorted(int(s) for s in out.split())
    assert steps == list(range(ni * nj))
    # first group covers columns 0..group-1 for all rows before column group
    rows = [r.split() for r in out.splitlines()]
    first_block = {int(rows[i][j]) for i in range(ni) for j in range(group)}
    assert first_block == set(range(ni * group))


def test_block_layout_lines():
    out = print_block_layout((256, 256), (128, 128))
    assert "step" in out and "[128:256, 128:256]" in out


def test_markdown_table():
    rs = [BenchResult("pallas", 1.0, tflops=150.0),
          BenchResult("xla", 1.2, tflops=125.0)]
    md = markdown_table(rs, baseline_tag="xla")
    assert "| pallas | 1.0000 | 150.00 | - | 1.20x |" in md


def test_dump_ir_stages():
    from leetcuda_tpu.utils.profiling import dump_ir

    def f(x):
        return jnp.sum(x * 2.0)

    irs = dump_ir(f, jnp.ones((8, 128), jnp.float32))
    assert "jaxpr" in irs and "stablehlo" in irs
    assert "stablehlo" in irs["stablehlo"] or "module" in irs["stablehlo"]


def test_layer_norm_backward_matches_autodiff():
    from leetcuda_tpu.ops.layer_norm import layer_norm_trainable, _ln_ref

    rng = np.random.default_rng(0)
    S, K = 64, 256
    x = jnp.asarray(rng.normal(size=(S, K)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(K,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(K,)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(S, K)), jnp.float32)

    def loss_pallas(x, g, b):
        return jnp.sum(layer_norm_trainable(x, g, b) * dy)

    def loss_ref(x, g, b):
        return jnp.sum(_ln_ref(x, g, b) * dy)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, w, name in zip(got, want, "x g b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


@pytest.mark.slow
def test_kernel_track_tiers_check():
    """docs/kernel_track.md companion: every tier's write-it-yourself solution
    must lower for TPU (Mosaic module prints) and match its oracle in
    interpret mode."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "tools/kernel_track_ir.py", "--check"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    assert out.count("Mosaic module") >= 4, out[-2000:]
    assert "tier 4 interpret check" in out
