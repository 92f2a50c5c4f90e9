"""FA-2 backward kernels vs jnp autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.attention.flash_bwd import make_flash_attention_trainable
from leetcuda_tpu.attention.flash import mha_ref


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("Hkv", [2, 1])
def test_flash_grads_match_autodiff(causal, Hkv, rng):
    B, H, N, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, N, D)) * 0.5, jnp.float32)

    fa = make_flash_attention_trainable(causal=causal, block_q=128, block_k=128)

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(fa(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_ref(q, k, v, causal=causal)))

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr, name in zip(g_pallas, g_ref, "qkv"):
        gp, gr = np.asarray(gp), np.asarray(gr)
        np.testing.assert_allclose(
            gp, gr, atol=2e-3, rtol=1e-2,
            err_msg=f"d{name} mismatch (causal={causal}, Hkv={Hkv})")


@pytest.mark.parametrize("window", [24, 128, 500])
@pytest.mark.parametrize("Hkv", [2, 1])
def test_windowed_grads_match_autodiff(window, Hkv, rng):
    """Sliding-window (Mistral) training: band masking + off-band block
    skipping in both backward passes vs the dense autodiff oracle. window=24
    (band inside one block), 128 (block-aligned), 500 (spans blocks,
    non-aligned); 500 > N/2 also covers near-full bands."""
    B, H, N, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, N, D)) * 0.5, jnp.float32)

    fa = make_flash_attention_trainable(window=window, block_q=128,
                                        block_k=128)

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(fa(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_ref(q, k, v, causal=True, window=window)))

    np.testing.assert_allclose(
        np.asarray(fa(q, k, v)),
        np.asarray(mha_ref(q, k, v, causal=True, window=window)),
        atol=2e-3, rtol=1e-2)
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr, name in zip(g_pallas, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=2e-3, rtol=1e-2,
            err_msg=f"d{name} mismatch (window={window}, Hkv={Hkv})")


def test_mistral_windowed_training():
    """Sliding-window model end-to-end training (previously fenced:
    'the FA-2 custom VJP doesn't implement the band yet'): loss falls."""
    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, make_train_step)

    cfg = tiny_config(sliding_window=24)
    params = init_params(jax.random.key(0), cfg)
    init_opt, step = make_train_step(cfg, learning_rate=1e-3, remat=False)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 64)), jnp.int32)
    opt = init_opt(params)
    losses = []
    for _ in range(5):
        params, opt, loss = step(params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("softcap,causal", [(0.5, True), (0.5, False)])
def test_softcap_grads_match_autodiff(softcap, causal, rng):
    """Capped-logit (Gemma2) backward: the chain rule multiplies by
    1 - (s/cap)^2 computed from the PRE-mask capped score (the post-mask
    -1e30 would make it -inf and 0*inf=NaN). Caps chosen to BITE at this
    score scale so a kernel ignoring softcap fails loudly."""
    B, H, N, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 1, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 1, N, D)) * 0.5, jnp.float32)

    from leetcuda_tpu.attention.flash import mha_ref
    fa = make_flash_attention_trainable(causal=causal, softcap=softcap,
                                        block_q=128, block_k=128)
    # forward bites: capped must differ from uncapped beyond tolerance
    fa_plain = make_flash_attention_trainable(causal=causal, block_q=128,
                                              block_k=128)
    assert float(jnp.max(jnp.abs(fa(q, k, v) - fa_plain(q, k, v)))) > 1e-2

    g_pallas = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(fa(q, k, v))),
                        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(
        mha_ref(q, k, v, causal=causal, softcap=softcap))),
        argnums=(0, 1, 2))(q, k, v)
    for gp, gr, name in zip(g_pallas, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=2e-3, rtol=1e-2,
            err_msg=f"d{name} (softcap={softcap}, causal={causal})")


def test_sink_grads_match_autodiff(rng):
    """Trainable attention sinks: out * sigmoid(lse - sink) differentiates
    through the with_lse FA-2 VJP (the lse cotangent folds into delta).
    Grad parity for q, k, v AND the sinks vs the dense softmax-with-
    appended-logit oracle."""
    B, H, N, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 1, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 1, N, D)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(H) * 0.5, jnp.float32)

    fa = make_flash_attention_trainable(causal=True, with_lse=True,
                                        block_q=128, block_k=128)

    def loss_pallas(q, k, v, s):
        out, lse = fa(q, k, v)
        out = out * jax.nn.sigmoid(lse - s[None, :, None])[..., None]
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v, s):
        import math
        kx = jnp.repeat(k, H, axis=1)
        vx = jnp.repeat(v, H, axis=1)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, kx) / math.sqrt(D)
        mask = jnp.tril(jnp.ones((N, N), bool))
        sc = jnp.where(mask[None, None], sc, -jnp.inf)
        # append the sink logit, softmax, drop it (HF GptOss semantics)
        sink_col = jnp.broadcast_to(s[None, :, None, None], (B, H, N, 1))
        p = jax.nn.softmax(jnp.concatenate([sc, sink_col], -1), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p[..., :-1], vx)
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    for a, b, name in zip(gp, gr, ("q", "k", "v", "sinks")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2, err_msg=name)


def test_sink_model_trains():
    """attn_sinks models train end-to-end now (the r3 inference-only fence
    is gone): loss falls and the sink weights move."""
    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, make_train_step)

    cfg = tiny_config(attn_sinks=True)
    params = init_params(jax.random.key(0), cfg)
    s0 = np.asarray(params["layers"][0]["sinks"])
    init_opt, step = make_train_step(cfg, learning_rate=1e-3, remat=False)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 64)), jnp.int32)
    opt = init_opt(params)
    losses = []
    for _ in range(5):
        params, opt, loss = step(params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert float(np.max(np.abs(
        np.asarray(params["layers"][0]["sinks"]) - s0))) > 1e-6
