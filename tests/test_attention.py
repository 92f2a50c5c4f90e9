"""Flash-attention tests — tolerance bar from the reference
(flash_attn_mma.py:465-496: allclose atol 1e-2 vs SDPA, report max/mean diff)."""

import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.attention.flash import (
    make_flash_attention, mha_ref)
from leetcuda_tpu.attention.splitkv import flash_attention_splitkv


def _qkv(rng, B, H, N, D, Hkv=None, dtype=jnp.float32):
    Hkv = Hkv or H
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, Hkv, N, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, Hkv, N, D)), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("D", [64, 128])
def test_flash_matches_sdpa(causal, D, rng):
    q, k, v = _qkv(rng, 1, 2, 256, D)
    fa = make_flash_attention(block_q=128, block_k=128, causal=causal)
    got = np.asarray(fa(q, k, v))
    want = np.asarray(mha_ref(q, k, v, causal=causal))
    diff = np.abs(got - want)
    assert diff.max() < 1e-2 and diff.mean() < 1e-4, (diff.max(), diff.mean())


def test_flash_gqa(rng):
    q, k, v = _qkv(rng, 2, 8, 256, 64, Hkv=2)
    fa = make_flash_attention(block_q=128, block_k=128)
    got = np.asarray(fa(q, k, v))
    want = np.asarray(mha_ref(q, k, v))
    assert np.abs(got - want).max() < 1e-2


def test_flash_longhead_1024(rng):
    """tiling-qk analog: head dim 1024 (reference max via QK fine-grained tiling)."""
    q, k, v = _qkv(rng, 1, 1, 256, 1024)
    fa = make_flash_attention(block_q=128, block_k=128)
    got = np.asarray(fa(q, k, v))
    want = np.asarray(mha_ref(q, k, v))
    assert np.abs(got - want).max() < 2e-2


def test_flash_lse(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 64)
    fa = make_flash_attention(block_q=128, block_k=128, with_lse=True)
    out, lse = fa(q, k, v)
    # oracle lse
    import math
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float64),
                  np.asarray(k, np.float64)) / math.sqrt(64)
    want_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), want_lse, atol=1e-3, rtol=1e-4)


def test_splitkv_matches_full(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 64)
    got = np.asarray(flash_attention_splitkv(q, k, v, num_splits=2,
                                             block_q=128, block_k=128))
    want = np.asarray(mha_ref(q, k, v))
    assert np.abs(got - want).max() < 1e-2


def test_flash_bf16(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 128, dtype=jnp.bfloat16)
    fa = make_flash_attention(block_q=128, block_k=128, causal=True)
    got = np.asarray(fa(q, k, v), np.float32)
    want = np.asarray(mha_ref(q, k, v, causal=True), np.float32)
    assert np.abs(got - want).max() < 5e-2
