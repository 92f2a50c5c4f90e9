"""MLA (multi-head latent attention) — models/mla.py.

The load-bearing claim is the weight-absorption identity: the decode path
(MQA over the latent cache through the UNCHANGED Pallas decode kernel,
W_uk folded into queries, W_uv applied after) must equal the expanded
multi-head attention at every position.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.models.mla import (MLAConfig, init_mla_params,
                                     mla_prefill, mla_decode_step,
                                     kv_bytes_per_token)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = MLAConfig(dim=128, n_heads=4, kv_lora_rank=64,
                    qk_nope_head_dim=32, qk_rope_head_dim=16,
                    v_head_dim=32, dtype=jnp.float32)
    params = init_mla_params(jax.random.key(0), cfg)
    return cfg, params


def test_absorbed_decode_matches_expanded(setup):
    """Prefill the full (S + T) sequence with the expanded form (oracle);
    then prefill S and decode T absorbed-MQA steps — outputs must match
    per position."""
    cfg, params = setup
    B, S, T = 2, 12, 5
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.5, (B, S + T, cfg.dim)),
        cfg.dtype)

    y_full, _ = mla_prefill(params, x, cfg)                  # oracle
    y_pre, cache = mla_prefill(params, x[:, :S], cfg, max_seq=S + T)
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_full[:, :S]),
                               atol=2e-4, rtol=2e-4)

    lengths = jnp.full((B,), S, jnp.int32)
    for t in range(T):
        y_t, cache = mla_decode_step(params, x[:, S + t], cache, lengths,
                                     cfg, block_k=8)
        np.testing.assert_allclose(
            np.asarray(y_t), np.asarray(y_full[:, S + t]),
            atol=5e-4, rtol=5e-4, err_msg=f"step {t}")
        lengths = lengths + 1


def test_ragged_lengths(setup):
    """Per-sequence lengths: each row's decode must match its own-position
    oracle (row 0 at position 6, row 1 at position 10)."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 16, cfg.dim)), cfg.dtype)
    lens = np.array([6, 10])

    y_full, cache = mla_prefill(params, x, cfg)  # cache holds all 16 positions
    x_t = jnp.stack([x[0, lens[0]], x[1, lens[1]]])
    y_t, _ = mla_decode_step(params, x_t, cache, jnp.asarray(lens,
                                                             jnp.int32),
                             cfg, block_k=8)
    # row b's decode at position lens[b] == prefill output there (the cache
    # row beyond lens[b] is ignored by the length mask, then overwritten)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(y_t[b]), np.asarray(y_full[b, lens[b]]),
            atol=5e-4, rtol=5e-4, err_msg=f"row {b}")


def test_cache_compression_ratio():
    """Latent cache vs expanded-MHA cache (K at qk_head_dim + V at v_head_dim
    per head): 8.9x at the default 16 heads, 17.8x at 32."""
    cfg = MLAConfig()  # defaults: H=16, dv=128, dc=512, dn=128, dr=64
    mla, mha = kv_bytes_per_token(cfg)
    assert abs(mha / mla - 16 * (192 + 128) / 576) < 1e-6, (mla, mha)
    big = MLAConfig(n_heads=32)
    mla, mha = kv_bytes_per_token(big)
    assert mha / mla > 17.0, (mla, mha)


def test_mla_model_decode_matches_prefill():
    """Full mini-LM: step-decode logits reproduce the prefill logits at each
    position, and whole-loop generate matches stepwise greedy."""
    from leetcuda_tpu.models.mla import (MLAModelConfig, init_mla_model,
                                         mla_model_prefill,
                                         mla_model_decode_step, mla_generate)

    cfg = MLAModelConfig(dim=128, n_heads=4, kv_lora_rank=64,
                         qk_nope_head_dim=32, qk_rope_head_dim=16,
                         v_head_dim=32, vocab_size=64, n_layers=2,
                         ffn_dim=256, dtype=jnp.float32)
    params = init_mla_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    B, S, T = 2, 10, 4
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S + T)), jnp.int32)

    logits_full, _ = mla_model_prefill(params, toks, cfg)
    _, caches = mla_model_prefill(params, toks[:, :S], cfg, max_seq=S + T)
    lengths = jnp.full((B,), S, jnp.int32)
    for t in range(T):
        lg, caches = mla_model_decode_step(params, toks[:, S + t], caches,
                                           lengths, cfg)
        np.testing.assert_allclose(np.asarray(lg),
                                   np.asarray(logits_full[:, S + t]),
                                   atol=2e-3, rtol=2e-3, err_msg=f"t={t}")
        lengths = lengths + 1

    # greedy generate: scan path == argmax chain over the prefill oracle
    gen = mla_generate(params, cfg, toks[:, :S], max_new=3)
    assert gen.shape == (B, 3)
    want0 = int(jnp.argmax(logits_full[0, S - 1]))
    assert int(gen[0, 0]) == want0


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_quantized_latent_cache(setup, quant):
    """int8/fp8 latent rows (per-position scales through the shared-KV
    quantized kernel): decode tracks the f32 expanded oracle within
    quantization tolerance, and the streams stay finite."""
    from leetcuda_tpu.models.mla import mla_prefill, mla_decode_step

    cfg, params = setup
    B, S, T = 2, 12, 4
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 0.5, (B, S + T, cfg.dim)),
        cfg.dtype)
    y_full, _ = mla_prefill(params, x, cfg)
    _, cache = mla_prefill(params, x[:, :S], cfg, max_seq=S + T, quant=quant)
    assert isinstance(cache, tuple) and cache[0].shape[-1] == cfg.latent_dim

    lengths = jnp.full((B,), S, jnp.int32)
    for t in range(T):
        y_t, cache = mla_decode_step(params, x[:, S + t], cache, lengths,
                                     cfg, block_k=8)
        ref = np.asarray(y_full[:, S + t])
        err = np.abs(np.asarray(y_t) - ref).max()
        assert np.isfinite(np.asarray(y_t)).all()
        assert err < 0.12, (t, err)  # |y| ~ O(1); int8 row quant ~1% err
        lengths = lengths + 1


def test_mla_tp_decode_matches_single_device(setup):
    """(dp=2, tp=2) MLA: per-head projections sharded, latent cache
    replicated on tp — decode output matches the single-device run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from leetcuda_tpu.models.mla import (mla_prefill, mla_decode_step,
                                         shard_mla_params)
    from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig

    cfg, params = setup
    B, S = 4, 12
    x = jnp.asarray(np.random.default_rng(6).normal(0, 0.5, (B, S + 1,
                                                             cfg.dim)),
                    cfg.dtype)
    _, cache = mla_prefill(params, x[:, :S], cfg, max_seq=S + 4)
    lengths = jnp.full((B,), S, jnp.int32)
    y_ref, _ = mla_decode_step(params, x[:, S], cache, lengths, cfg,
                               block_k=8)

    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=2), devices=jax.devices()[:4])
    sh_params = shard_mla_params(params, cfg, mesh)
    xs = jax.device_put(x[:, S], NamedSharding(mesh, P("dp", None)))
    cache_sh = jax.device_put(cache, NamedSharding(
        mesh, P("dp", None, None, None)))
    y_tp, _ = mla_decode_step(sh_params, xs, cache_sh,
                              jax.device_put(lengths,
                                             NamedSharding(mesh, P("dp"))),
                              cfg, block_k=8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


def test_deepseek_v2_golden_parity():
    """transformers DeepseekV2ForCausalLM (random-init tiny, dense layers)
    vs our MLA model through load_deepseek_v2: prefill logits match, and
    the absorbed latent-cache decode continues the HF stream."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers.models.deepseek_v2")
    from transformers.models.deepseek_v2 import (DeepseekV2Config,
                                                 DeepseekV2ForCausalLM)
    from leetcuda_tpu.models.mla import (load_deepseek_v2,
                                         mla_model_prefill,
                                         mla_model_decode_step)

    hf_cfg = DeepseekV2Config(
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=96,
        q_lora_rank=None, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, first_k_dense_replace=2,
        attention_bias=False, rope_scaling=None, use_cache=False)
    torch.manual_seed(0)
    hf = DeepseekV2ForCausalLM(hf_cfg).eval()

    B, S, T = 2, 12, 3
    toks = np.random.default_rng(8).integers(0, 96, (B, S + T))
    with torch.no_grad():
        want = hf(torch.tensor(toks)).logits.float().numpy()

    params, cfg = load_deepseek_v2(hf)
    got, _ = mla_model_prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)

    # absorbed decode continues the stream HF computed
    _, caches = mla_model_prefill(params, jnp.asarray(toks[:, :S],
                                                      jnp.int32), cfg,
                                  max_seq=S + T)
    lengths = jnp.full((B,), S, jnp.int32)
    for t in range(T):
        lg, caches = mla_model_decode_step(
            params, jnp.asarray(toks[:, S + t], jnp.int32), caches,
            lengths, cfg)
        np.testing.assert_allclose(np.asarray(lg), want[:, S + t],
                                   atol=3e-3, rtol=3e-3, err_msg=f"t={t}")
        lengths = lengths + 1


def test_deepseek_v2_moe_golden_parity():
    """MoE layers (greedy top-k routing + shared expert): layer 0 dense,
    layer 1 MoE — prefill logits and the absorbed decode continuation
    match HF."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers.models.deepseek_v2")
    from transformers.models.deepseek_v2 import (DeepseekV2Config,
                                                 DeepseekV2ForCausalLM)
    from leetcuda_tpu.models.mla import (load_deepseek_v2,
                                         mla_model_prefill,
                                         mla_model_decode_step)

    hf_cfg = DeepseekV2Config(
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=96,
        q_lora_rank=None, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, attention_bias=False,
        rope_scaling=None, use_cache=False,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=2, first_k_dense_replace=1, moe_layer_freq=1,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0)
    torch.manual_seed(1)
    hf = DeepseekV2ForCausalLM(hf_cfg).eval()
    assert any("mlp.experts.0" in k for k in hf.state_dict()), \
        "HF config did not produce MoE layers — test setup wrong"

    B, S, T = 2, 10, 2
    toks = np.random.default_rng(9).integers(0, 96, (B, S + T))
    with torch.no_grad():
        want = hf(torch.tensor(toks)).logits.float().numpy()

    params, cfg = load_deepseek_v2(hf)
    assert cfg.is_moe_layer(1) and not cfg.is_moe_layer(0)
    got, _ = mla_model_prefill(params, jnp.asarray(toks, jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)

    _, caches = mla_model_prefill(params, jnp.asarray(toks[:, :S],
                                                      jnp.int32), cfg,
                                  max_seq=S + T)
    lengths = jnp.full((B,), S, jnp.int32)
    for t in range(T):
        lg, caches = mla_model_decode_step(
            params, jnp.asarray(toks[:, S + t], jnp.int32), caches,
            lengths, cfg)
        np.testing.assert_allclose(np.asarray(lg), want[:, S + t],
                                   atol=3e-3, rtol=3e-3, err_msg=f"t={t}")
        lengths = lengths + 1


def test_mla_model_trains():
    """DeepSeek-style MLA model training: loss falls through the latent
    attention AND the MoE layers (router gates get gradients)."""
    from leetcuda_tpu.models.mla import (
        MLAModelConfig, init_mla_model, make_mla_train_step, mla_loss_fn)

    cfg = MLAModelConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, ffn_dim=96,
        n_routed_experts=4, num_experts_per_tok=2, moe_ffn_dim=48,
        n_shared_experts=1, first_k_dense=1,
        dtype=jnp.float32)
    params = init_mla_model(jax.random.key(0), cfg)
    init_opt, step = make_mla_train_step(cfg, learning_rate=2e-3)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 24)), jnp.int32)

    # router gradient actually flows
    g = jax.grad(mla_loss_fn)(params, toks, cfg)
    moe_layer = g["layers"][1]  # layer 0 is dense (first_k_dense_replace=1)
    assert "moe" in moe_layer or "router" in str(moe_layer.keys())

    opt = init_opt(params)
    losses = []
    for _ in range(6):
        params, opt, loss = step(params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_mla_paged_latent_matches_slot():
    """Paged latent cache == slot latent cache, with a SHUFFLED page table
    (physical pages out of order) and a capacity that doesn't divide the
    page size budget evenly."""
    from leetcuda_tpu.models.mla import (
        MLAConfig, init_mla_params, mla_prefill, mla_decode_step,
        init_paged_latent_cache)
    from leetcuda_tpu.attention.paged import _dus_pool

    cfg = MLAConfig(dim=128, n_heads=4, kv_lora_rank=64, qk_nope_head_dim=32,
                    qk_rope_head_dim=16, v_head_dim=32, dtype=jnp.float32)
    params = init_mla_params(jax.random.key(0), cfg)
    B, S0, page, pmax = 2, 12, 8, 6
    x = jnp.asarray(np.random.default_rng(0).normal(0, 0.5, (B, S0 + 4,
                                                             cfg.dim)),
                    cfg.dtype)
    _, slot_cache = mla_prefill(params, x[:, :S0], cfg, max_seq=48)
    lengths = jnp.full((B,), S0, jnp.int32)

    # paged: copy the prefix latents into shuffled physical pages
    rng = np.random.default_rng(1)
    table = rng.permutation(B * pmax).reshape(B, pmax).astype(np.int32)
    pool = init_paged_latent_cache(cfg, B * pmax + 1, page)
    # remap: logical page p of seq b -> physical table[b, p]
    for b in range(B):
        for p in range((S0 + page - 1) // page):
            n = min(page, S0 - p * page)
            pool = pool.at[table[b, p], :, :n].set(
                slot_cache[b, :, p * page:p * page + n])
    table = jnp.asarray(table)

    pc, sc = pool, slot_cache
    for t in range(4):
        y_ref, sc = mla_decode_step(params, x[:, S0 + t], sc, lengths, cfg,
                                    block_k=8)
        y_pg, pc = mla_decode_step(params, x[:, S0 + t], pc, lengths, cfg,
                                   page_table=table)
        np.testing.assert_allclose(np.asarray(y_pg), np.asarray(y_ref),
                                   atol=2e-4, rtol=2e-4, err_msg=f"t={t}")
        lengths = lengths + 1


def test_mla_paged_quantized_matches_slot_quantized():
    """int8 paged latent == int8 slot latent (same quantizer both sides)."""
    from leetcuda_tpu.models.mla import (
        MLAConfig, init_mla_params, mla_prefill, mla_decode_step,
        init_paged_latent_cache)

    cfg = MLAConfig(dim=128, n_heads=4, kv_lora_rank=64, qk_nope_head_dim=32,
                    qk_rope_head_dim=16, v_head_dim=32, dtype=jnp.float32)
    params = init_mla_params(jax.random.key(2), cfg)
    B, S0, page, pmax = 2, 8, 8, 4
    x = jnp.asarray(np.random.default_rng(2).normal(0, 0.5, (B, S0 + 3,
                                                             cfg.dim)),
                    cfg.dtype)
    _, (rows, scales) = mla_prefill(params, x[:, :S0], cfg, max_seq=32,
                                    quant="int8")
    lengths = jnp.full((B,), S0, jnp.int32)

    table = np.arange(B * pmax).reshape(B, pmax).astype(np.int32)
    pool, spool = init_paged_latent_cache(cfg, B * pmax + 1, page,
                                          quant="int8")
    for b in range(B):
        for p in range((S0 + page - 1) // page):
            n = min(page, S0 - p * page)
            pool = pool.at[table[b, p], :, :n].set(
                rows[b, :, p * page:p * page + n])
            spool = spool.at[table[b, p], :, :n].set(
                scales[b, :, p * page:p * page + n])
    table = jnp.asarray(table)

    pc, sc = (pool, spool), (rows, scales)
    for t in range(3):
        y_ref, sc = mla_decode_step(params, x[:, S0 + t], sc, lengths, cfg,
                                    block_k=8)
        y_pg, pc = mla_decode_step(params, x[:, S0 + t], pc, lengths, cfg,
                                   page_table=table)
        np.testing.assert_allclose(np.asarray(y_pg), np.asarray(y_ref),
                                   atol=2e-4, rtol=2e-4, err_msg=f"t={t}")
        lengths = lengths + 1


def test_mla_paged_tp_mesh():
    """Paged latent decode under a (dp, tp) mesh: the pool is shared across
    dp shards; heads shard on tp. Parity vs single-device paged."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig
    from leetcuda_tpu.models.mla import (
        MLAConfig, init_mla_params, mla_prefill, mla_decode_step,
        init_paged_latent_cache, shard_mla_params)

    cfg = MLAConfig(dim=128, n_heads=4, kv_lora_rank=64, qk_nope_head_dim=32,
                    qk_rope_head_dim=16, v_head_dim=32, dtype=jnp.float32)
    params = init_mla_params(jax.random.key(3), cfg)
    B, S0, page, pmax = 4, 8, 8, 3
    x = jnp.asarray(np.random.default_rng(3).normal(0, 0.5, (B, S0 + 1,
                                                             cfg.dim)),
                    cfg.dtype)
    _, slot_cache = mla_prefill(params, x[:, :S0], cfg, max_seq=16)
    lengths = jnp.full((B,), S0, jnp.int32)
    table = np.arange(B * pmax).reshape(B, pmax).astype(np.int32)
    pool = init_paged_latent_cache(cfg, B * pmax + 1, page)
    for b in range(B):
        pool = pool.at[table[b, 0], :, :S0].set(slot_cache[b, :, :S0])
    table = jnp.asarray(table)

    y_ref, _ = mla_decode_step(params, x[:, S0], pool, lengths, cfg,
                               page_table=table)
    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=2), devices=jax.devices()[:4])
    y_tp, _ = mla_decode_step(
        shard_mla_params(params, cfg, mesh),
        jax.device_put(x[:, S0], NamedSharding(mesh, P("dp", None))),
        jax.device_put(pool, NamedSharding(mesh, P(None, None, None, None))),
        jax.device_put(lengths, NamedSharding(mesh, P("dp"))),
        cfg, mesh=mesh,
        page_table=jax.device_put(table, NamedSharding(mesh, P("dp", None))))
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


def test_mla_model_paged_decode_matches_slot():
    """Whole-model paged latent decode (per-layer pools, one shared block
    table) emits the same greedy stream as slot caches."""
    from leetcuda_tpu.models.mla import (
        MLAModelConfig, init_mla_model, mla_model_prefill,
        mla_model_decode_step, init_paged_latent_cache)

    cfg = MLAModelConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, ffn_dim=96,
        dtype=jnp.float32)
    params = init_mla_model(jax.random.key(5), cfg)
    B, S0, page, pmax = 2, 8, 8, 4
    toks = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.vocab_size, (B, S0)), jnp.int32)
    logits, slot_caches = mla_model_prefill(params, toks, cfg, max_seq=32)
    cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    lengths = jnp.full((B,), S0, jnp.int32)

    table_np = np.arange(B * pmax).reshape(B, pmax).astype(np.int32)
    pools = []
    for sc in slot_caches:
        pool = init_paged_latent_cache(cfg, B * pmax + 1, page)
        for b in range(B):
            pool = pool.at[table_np[b, 0], :, :S0].set(sc[b, :, :S0])
        pools.append(pool)
    table = jnp.asarray(table_np)

    cur_p, lengths_p = cur, lengths
    sc, pc = slot_caches, pools
    stream_s, stream_p = [], []
    for _ in range(5):
        lg_s, sc = mla_model_decode_step(params, cur, sc, lengths, cfg)
        lg_p, pc = mla_model_decode_step(params, cur_p, pc, lengths_p, cfg,
                                         page_table=table)
        cur = jnp.argmax(lg_s, axis=-1).astype(jnp.int32)
        cur_p = jnp.argmax(lg_p, axis=-1).astype(jnp.int32)
        stream_s.append(np.asarray(cur))
        stream_p.append(np.asarray(cur_p))
        lengths, lengths_p = lengths + 1, lengths_p + 1
    np.testing.assert_array_equal(np.stack(stream_p), np.stack(stream_s))
