"""GEMM library tests — the sgemm/hgemm parity bar (BASELINE.json config 1:
"sgemm F32 1024³ checked against matmul reference, CPU-runnable")."""

import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.gemm.matmul import (
    make_matmul, matmul_ref, matmul_tn_ref)
from leetcuda_tpu.gemm.quant import (
    make_matmul_w8a16, make_matmul_i8i8i32, matmul_w8a16_ref,
    quantize_rowwise_int8, quantize_rowwise_fp8)


@pytest.mark.parametrize("M,N,K", [(128, 128, 128), (256, 128, 512),
                                   (200, 136, 264)])
def test_sgemm_f32(M, N, K, rng):
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    mm = make_matmul(block=(128, 128, 128))
    np.testing.assert_allclose(np.asarray(mm(x, y)),
                               np.asarray(matmul_ref(x, y)),
                               atol=1e-3, rtol=1e-3)


def test_sgemm_1024_parity(rng):
    """The BASELINE.json minimum slice: sgemm F32 1024^3 vs matmul, CPU-runnable."""
    x = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.1, jnp.float32)
    mm = make_matmul(block=(512, 512, 512))
    np.testing.assert_allclose(np.asarray(mm(x, y)),
                               np.asarray(x @ y), atol=1e-3, rtol=1e-3)


def test_hgemm_bf16(rng):
    x = jnp.asarray(rng.standard_normal((256, 384)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((384, 256)), jnp.bfloat16)
    mm = make_matmul(block=(128, 128, 128))
    got = np.asarray(mm(x, y), np.float32)
    want = np.asarray(matmul_ref(x, y), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-1, rtol=2e-2)


def test_tn_layout(rng):
    x = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((192, 256)), jnp.float32)  # (N, K)
    mm = make_matmul(block=(128, 128, 128), layout="tn")
    np.testing.assert_allclose(np.asarray(mm(x, y)),
                               np.asarray(matmul_tn_ref(x, y)),
                               atol=1e-3, rtol=1e-3)


def test_block_swizzle_matches_plain(rng):
    x = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    plain = make_matmul(block=(128, 128, 128))
    swz = make_matmul(block=(128, 128, 128), swizzle_group=2)
    np.testing.assert_allclose(np.asarray(swz(x, y)), np.asarray(plain(x, y)),
                               atol=1e-4, rtol=1e-4)


def test_w8a16_dequant(rng):
    x = jnp.asarray(rng.standard_normal((128, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    w_q, scale = quantize_rowwise_int8(w)
    mm = make_matmul_w8a16(block=(128, 128, 128))
    got = np.asarray(mm(x, w_q, scale), np.float32)
    want = np.asarray(matmul_w8a16_ref(x, w_q, scale), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-1, rtol=5e-2)
    # quantization itself is faithful
    w_deq = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    assert np.abs(w_deq - np.asarray(w)).max() < np.abs(np.asarray(w)).max() / 64


def test_w8a16_fp8(rng):
    x = jnp.asarray(rng.standard_normal((128, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    w_q, scale = quantize_rowwise_fp8(w)
    mm = make_matmul_w8a16(block=(128, 128, 128))
    got = np.asarray(mm(x, w_q, scale), np.float32)
    want = np.asarray(matmul_w8a16_ref(x, w_q, scale), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-1, rtol=5e-2)


def test_i8i8i32(rng):
    x = jnp.asarray(rng.integers(-100, 100, (128, 256)), jnp.int8)
    w = jnp.asarray(rng.integers(-100, 100, (256, 128)), jnp.int8)
    mm = make_matmul_i8i8i32(block=(128, 128, 128))
    got = np.asarray(mm(x, w))
    want = np.asarray(x, np.int64) @ np.asarray(w, np.int64)
    np.testing.assert_array_equal(got, want)


def test_swizzled_walk_stays_in_bounds():
    """Grouped grid walk must visit every (i, j) exactly once even when the
    group doesn't divide nj (incl. nj < group) — the out-of-bounds regression
    found by tools/fuzz_gemm.py on hardware."""
    import numpy as np
    from leetcuda_tpu.gemm.matmul import _swizzled_ij

    for ni, nj, group in [(4, 1, 4), (4, 6, 4), (2, 5, 3), (3, 8, 8),
                          (4, 4, 2), (1, 7, 4)]:
        seen = set()
        for t in range(ni * nj):
            i, j = _swizzled_ij(t, ni, nj, group)
            i, j = int(i), int(j)
            assert 0 <= i < ni and 0 <= j < nj, (ni, nj, group, t, i, j)
            seen.add((i, j))
        assert len(seen) == ni * nj, (ni, nj, group)


def test_swizzled_matmul_awkward_shapes(rng):
    """Swizzled matmul at shapes where group doesn't divide the column grid."""
    import jax.numpy as jnp
    from leetcuda_tpu.gemm.matmul import make_matmul, matmul_ref

    for M, N, K, blk, g in [(512, 256, 2048, (128, 256, 256), 4),
                            (256, 640, 384, (128, 128, 128), 4)]:
        a = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.float32)
        b = jnp.asarray(rng.standard_normal((K, N)) * 0.3, jnp.float32)
        got = make_matmul(block=blk, swizzle_group=g)(a, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(matmul_ref(a, b)),
                                   atol=1e-3, rtol=1e-3)


def test_matmul_resident_chain(rng):
    """VMEM-resident chained matmul == lax.scan of dots (the 4096-regime
    kernel, tested at toy size)."""
    from leetcuda_tpu.gemm.matmul import make_matmul_resident, matmul_chain_ref

    M = 256
    a = jnp.asarray(rng.standard_normal((M, M)) / np.sqrt(M), jnp.float32)
    b = jnp.asarray(rng.standard_normal((M, M)) / np.sqrt(M), jnp.float32)
    for reps in (1, 4):
        got = make_matmul_resident(reps=reps, block_m=128)(a, b)
        want = matmul_chain_ref(a, b, reps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_matmul_auto_shape_adaptive(rng):
    """pick_matmul_config (the hgemm.py:198-208 auto-select analog) must
    produce VMEM-feasible configs and matmul_auto must match XLA on skewed,
    non-multiple shapes."""
    from leetcuda_tpu.gemm.matmul import pick_matmul_config, matmul_auto

    for (M, N, K) in [(1024, 1024, 1024), (8192, 1024, 8192),
                      (1024, 8192, 8192), (4096, 14336, 4096),
                      (16384, 16384, 16384), (384, 640, 264),
                      (8192, 8192, 1024)]:
        cfg = pick_matmul_config(M, N, K, jnp.bfloat16)
        bm, bn, bk = cfg["block"]
        assert bm <= M and bn <= N and bk <= K
        vmem = 2 * (bm * bk + bk * bn) * 2 + bm * bn * 4 + bm * bn * 2
        assert vmem <= 100 * 1024 * 1024, (cfg, vmem)
        if K <= 1024:
            # shallow-K rule: whole reduction in one grid step per tile
            # unless VMEM forces a shrink (measured 0.881 -> 0.988 at
            # 8192x8192x1024, TUNE_ROWS.json)
            assert bk == K or not (
                2 * (bm * K + K * bn) * 2 + bm * bn * 6
                <= 100 * 1024 * 1024), cfg
        if bk >= 1024:
            # 4096-row tiles collapse with a >=1024-deep K step
            # (TUNE_ROWS2.json: 0.75-0.90)
            assert bm <= 2048, cfg

    x = jnp.asarray(rng.standard_normal((384, 264)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((264, 640)), jnp.float32)
    got = np.asarray(matmul_auto(x, y))
    want = np.asarray(matmul_ref(x, y))
    np.testing.assert_allclose(got, want, atol=2e-2)
