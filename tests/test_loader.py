"""Golden-parity test: HF Llama (transformers, torch CPU) vs our forward.

The strongest correctness anchor in the suite — a randomly-initialized
LlamaForCausalLM's logits must be reproduced by models/llama.py running the
converted weights, pinning every convention at once (weight transposes, rope,
rms-norm statistics, GQA expansion, SiLU gate, attention scaling)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from leetcuda_tpu.models.llama import forward, decode_step, init_kv_caches
from leetcuda_tpu.models.loader import config_from_hf, params_from_hf_state_dict

pytestmark = pytest.mark.slow  # full engine/model runs; default run skips (-m) — CI covers


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=True, attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return hf_cfg, model


def test_forward_matches_transformers(hf_model):
    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 16))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()

    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_decode_matches_transformers(hf_model):
    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, hf_cfg.vocab_size, (1, 8))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()

    caches = init_kv_caches(cfg, 1, 128)
    lengths = jnp.zeros((1,), jnp.int32)
    logits = []
    for t in range(8):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        logits.append(np.asarray(lg))
        lengths = lengths + 1
    got = np.stack(logits, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_untied_lm_head(hf_model):
    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    sd = {k: v.clone() for k, v in model.state_dict().items()}
    # detach the head: perturb it so tied-vs-untied actually differs
    sd["lm_head.weight"] = sd["model.embed_tokens.weight"] * 0.5
    params = params_from_hf_state_dict(sd, cfg)
    assert "lm_head" in params

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    tied = forward({k: v for k, v in params.items() if k != "lm_head"},
                   tokens, cfg)
    untied = forward(params, tokens, cfg)
    np.testing.assert_allclose(np.asarray(untied), np.asarray(tied) * 0.5,
                               atol=1e-4, rtol=1e-4)


def test_load_llama_roundtrip(hf_model, tmp_path):
    """save_pretrained -> load_llama reads config.json + safetensors."""
    hf_cfg, model = hf_model
    model.save_pretrained(tmp_path, safe_serialization=True)
    from leetcuda_tpu.models.loader import load_llama

    cfg, params = load_llama(tmp_path, dtype=jnp.float32)
    assert cfg.dim == hf_cfg.hidden_size and cfg.n_layers == 2
    tokens = jnp.asarray([[5, 6, 7]], jnp.int32)
    with torch.no_grad():
        want = model(torch.tensor([[5, 6, 7]])).logits.numpy()
    got = np.asarray(forward(params, tokens, cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_qwen2_golden_parity():
    """Qwen2 = Llama module layout + QKV biases: transformers golden parity."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "bq" in params["layers"][0]  # biases picked up

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    # decode path with biases too
    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_gemma_golden_parity():
    """Gemma: GeGLU + (1+w) RMS-norm + sqrt(D) embed scaling + decoupled
    head_dim — transformers golden parity on forward AND decode."""
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(2)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.rms_offset and cfg.embed_scale and cfg.head_dim == 32
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(6)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=6e-3, rtol=6e-3)


def test_mistral_golden_parity():
    """Mistral = Llama + causal sliding window; parity with the window
    actually active (window < sequence length)."""
    hf_cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=8, tie_word_embeddings=True,
    )
    torch.manual_seed(3)
    hf_cfg._attn_implementation = "eager"  # sliding window needs eager mask
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.sliding_window == 8
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, hf_cfg.vocab_size, (1, 24))  # 24 > window 8
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    # decode path applies the window over the KV cache too
    caches = init_kv_caches(cfg, 1, 128)
    lengths = jnp.zeros((1,), jnp.int32)
    outs = []
    for t in range(24):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_qwen3_golden_parity():
    """Qwen3 = Llama + per-head QK RMS-norm before rope (+ decoupled
    head_dim): transformers golden parity on forward AND decode."""
    hf_cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, attention_bias=False,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(2)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.qk_norm and cfg.head_dim == 32
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "q_norm" in params["layers"][0]

    rng = np.random.default_rng(6)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    # KV-decode path applies the same q/k norms
    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_mixtral_golden_parity():
    """Mixtral = Llama attention + top-2 routed sparse MoE FFN with gates
    renormalized over the selected experts. The loader maps
    block_sparse_moe.{gate,experts.*.w1/w3/w2} and sets capacity to the
    no-drop bound, so logits reproduce transformers exactly."""
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, sliding_window=None,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(3)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.n_experts == 4 and cfg.expert_topk == 2 and cfg.moe_renorm
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "moe" in params["layers"][0]
    assert params["layers"][0]["moe"]["w_gate"].shape == (4, 64, 128)

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    # decode path routes per-token (T=B per call) through the same experts
    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_gemma2_golden_parity():
    """Gemma2 = Gemma + attention/final logit soft caps + decoupled query
    scale + ALTERNATING local/global layers + sandwich (block-output) norms.
    sliding_window=8 < S so the even layer's band actually masks."""
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
        # caps chosen to BITE at random-init logit scale (~1): 50/30 would
        # differ from uncapped by O(s^3/cap^2) ~ 1e-6, making parity vacuous
        attn_logit_softcapping=1.0, final_logit_softcapping=0.5,
        query_pre_attn_scalar=32, sliding_window=8,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(4)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.attn_softcap == 1.0 and cfg.final_softcap == 0.5
    assert cfg.alt_window and cfg.sandwich_norms
    assert cfg.layer_window(0) == 8 and cfg.layer_window(1) is None
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "post_attn_norm" in params["layers"][0]

    rng = np.random.default_rng(8)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)

    # the caps must actually bite: uncapped forward differs beyond tolerance
    import dataclasses
    uncapped = forward(params, jnp.asarray(tokens, jnp.int32),
                       dataclasses.replace(cfg, attn_softcap=None,
                                           final_softcap=None))
    assert float(jnp.max(jnp.abs(uncapped - got))) > 1e-2

    # decode: per-layer window + capped decode kernels reproduce the stream
    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=6e-3, rtol=6e-3)


def test_llama31_rope_scaling_golden_parity():
    """Llama-3.1 rope scaling (wavelength remap): long-frequency bands
    divide by factor, short stay, middle interpolates — transformers golden
    parity on forward AND decode. original_max_position_embeddings is set
    small so all three bands are exercised at D/2=16 frequencies."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, attention_bias=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(5)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 64)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(9)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    # the scaled frequencies must actually differ from the plain ladder
    plain = forward(params, jnp.asarray(tokens, jnp.int32),
                    cfg.__class__(**{**cfg.__dict__, "rope_scaling": None}))
    assert float(jnp.max(jnp.abs(plain - got))) > 1e-3

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_qwen3_moe_golden_parity():
    """Qwen3-MoE = Qwen3 attention (per-head QK norms) + routed experts with
    their own hidden dim (moe_intermediate_size) and norm_topk_prob gate
    renormalization — transformers golden parity on forward AND decode."""
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(6)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.qk_norm and cfg.n_experts == 4 and cfg.moe_renorm
    assert cfg.moe.ffn_dim == 48
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "moe" in params["layers"][0] and "q_norm" in params["layers"][0]
    assert params["layers"][0]["moe"]["w_gate"].shape == (4, 64, 48)

    rng = np.random.default_rng(10)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_gpt_oss_golden_parity():
    """GPT-OSS: YaRN rope scaling + attention SINKS (per-head learned logit
    in the softmax denominator — realized as out * sigmoid(lse - sink) on
    the LSE-carrying kernels) + alternating sliding/full layers + biased
    attention incl. o_proj + clamped-swiglu MoE whose top-k router
    softmaxes over the selected logits only. Transformers golden parity on
    forward AND decode."""
    hf_cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=150000.0, tie_word_embeddings=True,
        num_local_experts=4, num_experts_per_tok=2, sliding_window=8,
        layer_types=["sliding_attention", "full_attention"],
        rope_scaling={"rope_type": "yarn", "factor": 32.0,
                      "beta_fast": 32.0, "beta_slow": 1.0, "truncate": False,
                      "original_max_position_embeddings": 64},
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(7)
    model = transformers.GptOssForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.rope_scaling[0] == "yarn" and cfg.alt_window
    assert cfg.layer_window(0) == 8 and cfg.layer_window(1) is None
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    l0 = params["layers"][0]
    assert "sinks" in l0 and "bo" in l0 and "moe_oss" in l0
    assert l0["moe_oss"]["w_gate_up"].shape == (4, 64, 96)

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)

    # the sinks must bite: zeroed sinks change the logits
    nosink = {**params, "layers": [
        {k: v for k, v in l.items() if k != "sinks"}
        for l in params["layers"]]}
    alt = forward(nosink, jnp.asarray(tokens, jnp.int32), cfg)
    assert float(jnp.max(jnp.abs(alt - got))) > 1e-3

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=6e-3, rtol=6e-3)


def test_olmo2_golden_parity():
    """OLMo-2: post-norm-only blocks (no input norms; outputs normalize
    before their residual adds) + RMS q/k norms over the FLAT projections
    (H*Dh lanes, pre-reshape/pre-rope) — transformers golden parity on
    forward AND decode. All structure-driven: no new config switches."""
    hf_cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(9)
    model = transformers.Olmo2ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert not cfg.qk_norm  # flat norms are structural, not the Qwen3 kind
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    l0 = params["layers"][0]
    assert "attn_norm" not in l0 and "post_attn_norm" in l0
    assert l0["q_norm"].shape == (4 * 16,)  # flat, not per-head

    rng = np.random.default_rng(12)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_glm4_golden_parity():
    """GLM-4: partial rotary (half the head dim, with GLM's pair-interleaved
    per-lane frequencies), sandwich norms under GLM names
    (post_self_attn/post_mlp), QKV biases and a fused gate_up projection —
    transformers golden parity on forward AND decode."""
    hf_cfg = transformers.Glm4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, pad_token_id=0,
        partial_rotary_factor=0.5, attention_bias=True,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(10)
    model = transformers.Glm4ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.glm_rope_dim == 8  # head_dim 16 * 0.5
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    l0 = params["layers"][0]
    assert "post_attn_norm" in l0 and "w_gate_up" in l0 and "bq" in l0

    rng = np.random.default_rng(13)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)


def test_save_llama_hf_roundtrip(tmp_path):
    """HF EXPORT: a model trained here saves as config.json +
    model.safetensors that transformers loads directly; the reloaded
    LlamaForCausalLM reproduces our logits (the inverse golden test)."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.models.loader import save_llama

    cfg = tiny_config()  # dense llama-style
    params = init_params(jax.random.key(14), cfg)
    d = save_llama(tmp_path / "export", params, cfg)

    model = transformers.AutoModelForCausalLM.from_pretrained(
        str(d), torch_dtype=torch.float32).eval()
    rng = np.random.default_rng(14)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))
    ours = np.asarray(forward(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params),
        jnp.asarray(tokens, jnp.int32), cfg))
    with torch.no_grad():
        theirs = model(torch.from_numpy(tokens)).logits.numpy()
    # bf16 storage round-trip bounds the tolerance
    np.testing.assert_allclose(theirs, ours, atol=5e-2, rtol=5e-2)

    # and load_llama reads our own export back (full circle)
    from leetcuda_tpu.models.loader import load_llama
    cfg2, params2 = load_llama(d, dtype=jnp.float32)
    back = np.asarray(forward(params2, jnp.asarray(tokens, jnp.int32), cfg2))
    np.testing.assert_allclose(back, ours, atol=5e-2, rtol=5e-2)


def test_smollm3_golden_parity():
    """SmolLM3: every no_rope_layer_interval-th layer attends WITHOUT rope
    (NoPE) — transformers golden parity on forward AND decode with
    interval=2 so half the layers exercise the bare path."""
    hf_cfg = transformers.SmolLM3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True,
        no_rope_layer_interval=2, use_sliding_window=False,
        attention_bias=False, pad_token_id=0,
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(11)
    model = transformers.SmolLM3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.nope_interval == 2
    assert cfg.layer_rope(0) and not cfg.layer_rope(1)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(15)
    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens, jnp.int32), cfg))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    caches = init_kv_caches(cfg, 2, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    outs = []
    for t in range(12):
        lg, caches = decode_step(params, jnp.asarray(tokens[:, t], jnp.int32),
                                 caches, lengths, cfg)
        outs.append(np.asarray(lg))
        lengths = lengths + 1
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-3, rtol=5e-3)
