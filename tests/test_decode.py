"""GEMV + decode attention tests (BASELINE.json config 4: fused decode block)."""

import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.gemm.gemv import make_gemv, make_rms_norm_gemv, gemv_ref
from leetcuda_tpu.attention.decode import (
    make_decode_attention, make_decode_attention_quantized, decode_attention_ref)


def test_gemv(rng):
    x = jnp.asarray(rng.standard_normal(512), jnp.float32)
    w = jnp.asarray(rng.standard_normal((512, 384)), jnp.float32)
    got = np.asarray(make_gemv(block=(128, 128))(x, w))
    np.testing.assert_allclose(got, np.asarray(gemv_ref(x, w)),
                               atol=1e-3, rtol=1e-3)


def test_gemv_bf16(rng):
    x = jnp.asarray(rng.standard_normal(512), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.bfloat16)
    got = np.asarray(make_gemv(block=(256, 128))(x, w), np.float32)
    want = np.asarray(gemv_ref(x, w), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-1, rtol=3e-2)


def test_rms_norm_gemv_fused(rng):
    x = jnp.asarray(rng.standard_normal(512), jnp.float32)
    nw = jnp.asarray(rng.standard_normal(512) * 0.3 + 1.0, jnp.float32)
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    got = np.asarray(make_rms_norm_gemv(block=(128, 128))(x, nw, w))
    xf = np.asarray(x, np.float64)
    xn = xf / np.sqrt((xf ** 2).mean() + 1e-5) * np.asarray(nw, np.float64)
    want = xn @ np.asarray(w, np.float64)
    np.testing.assert_allclose(got.ravel(), want, atol=1e-2, rtol=1e-3)


@pytest.mark.parametrize("Hkv", [4, 1])
def test_decode_attention(Hkv, rng):
    B, H, D, S = 2, 4, 64, 512
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    lengths = jnp.asarray([192, 512], jnp.int32)
    got = np.asarray(make_decode_attention(block_k=128)(q, k, v, lengths))
    want = np.asarray(decode_attention_ref(q, k, v, lengths))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_decode_attention_quantized(rng):
    B, H, Hkv, D, S = 1, 4, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    # per-position symmetric int8 quantization of the caches
    ks = jnp.max(jnp.abs(k), axis=-1) / 127.0   # (B, Hkv, S)
    vs = jnp.max(jnp.abs(v), axis=-1) / 127.0
    kq = jnp.round(k / ks[..., None]).astype(jnp.int8)
    vq = jnp.round(v / vs[..., None]).astype(jnp.int8)
    lengths = jnp.asarray([160], jnp.int32)
    got = np.asarray(make_decode_attention_quantized(block_k=128)(
        q, kq, vq, ks, vs, lengths))  # scales are (B, Hkv, S)
    want = np.asarray(decode_attention_ref(
        q, kq.astype(jnp.float32) * ks[..., None],
        vq.astype(jnp.float32) * vs[..., None], lengths))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_decode_attention_lse(rng):
    """with_lse output merges two halves back to the full result."""
    B, H, D, S = 2, 4, 64, 512
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    lengths = jnp.asarray([300, 512], jnp.int32)
    da = make_decode_attention(block_k=128, with_lse=True)
    half = S // 2
    o1, l1 = da(q, k[:, :, :half], v[:, :, :half],
                jnp.minimum(lengths, half))
    o2, l2 = da(q, k[:, :, half:], v[:, :, half:],
                jnp.maximum(lengths - half, 0))
    m = jnp.maximum(l1, l2)
    w1, w2 = jnp.exp(l1 - m), jnp.exp(l2 - m)
    merged = (w1[..., None] * o1 + w2[..., None] * o2) / (w1 + w2)[..., None]
    want = decode_attention_ref(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_context_parallel_decode(rng):
    """KV sharded over 4 sp shards (+dp=2): CP decode == plain decode."""
    import jax
    from jax.sharding import Mesh
    from leetcuda_tpu.parallel.cp_decode import make_decode_attention_cp

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                axis_names=("dp", "sp"))
    B, H, D, S = 4, 8, 64, 1024
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    lengths = jnp.asarray([100, 256, 700, 1024], jnp.int32)

    fn = make_decode_attention_cp(mesh, block_k=128)
    got = fn(q, k, v, lengths)
    want = decode_attention_ref(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_decode_attention_quantized_window(rng):
    """Sliding window through the quantized decode kernel (int8 cache +
    window now compose; the window masks AND the pre-window DMA is clamped)."""
    B, H, Hkv, D, S = 2, 4, 2, 64, 256
    window = 48
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    ks = jnp.maximum(jnp.max(jnp.abs(k), axis=-1), 1e-8) / 127.0
    vs = jnp.maximum(jnp.max(jnp.abs(v), axis=-1), 1e-8) / 127.0
    kq = jnp.round(k / ks[..., None]).astype(jnp.int8)
    vq = jnp.round(v / vs[..., None]).astype(jnp.int8)
    lengths = jnp.asarray([100, 256], jnp.int32)
    got = make_decode_attention_quantized(block_k=64, window=window)(
        q, kq, vq, ks, vs, lengths)
    want = decode_attention_ref(q, kq.astype(jnp.float32) * ks[..., None],
                                vq.astype(jnp.float32) * vs[..., None],
                                lengths, window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_fused_norm_qkv_rope_matches_unfused(rng):
    """Fused decode entry block (norm->QKV->rope in one kernel) == the
    composed unfused ops (gemm/fused_decode.py)."""
    from leetcuda_tpu.gemm.fused_decode import (
        make_fused_norm_qkv_rope, fused_norm_qkv_rope_ref)

    B, D, H, Hkv, Dh = 4, 256, 4, 2, 64
    X = (H + 2 * Hkv) * Dh
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    nw = jnp.asarray(rng.standard_normal(D) * 0.2 + 1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, X)) / np.sqrt(D), jnp.float32)
    pos = jnp.asarray([0, 5, 100, 31], jnp.int32)
    got = make_fused_norm_qkv_rope(n_heads=H, n_kv_heads=Hkv, head_dim=Dh)(
        x, nw, w, pos)
    want = fused_norm_qkv_rope_ref(x, nw, w, pos, n_heads=H, n_kv_heads=Hkv,
                                   head_dim=Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_decode_step_matches_unfused_params():
    """decode_step with fused wqkv (-> the fused Pallas block) tracks the
    split-projection path to matmul-reduction-order noise."""
    import jax
    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, fuse_params, init_kv_caches,
        decode_step)

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    fused = fuse_params(params)
    toks = jnp.asarray([3, 7], jnp.int32)
    # capacity >= 2048 so the fused Pallas entry block engages (the
    # policy gate in decode_step_impl)
    caches_a = init_kv_caches(cfg, 2, 2048)
    caches_b = init_kv_caches(cfg, 2, 2048)
    lengths = jnp.zeros((2,), jnp.int32)
    la, _ = decode_step(params, toks, caches_a, lengths, cfg)
    lb, _ = decode_step(fused, toks, caches_b, lengths, cfg)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fuzz_decode_family_cpu():
    """Short randomized sweep of the decode/quant/paged/chunk kernels vs
    oracles (tools/fuzz_decode.py CI slice; full run targets the chip)."""
    import pathlib
    import subprocess
    import sys as _sys

    root = pathlib.Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [_sys.executable, str(root / "tools/fuzz_decode.py"), "--iters", "6",
         "--seed", "7", "--cpu"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-500:]
