"""LoRA: zero-init equivalence, adapter-only training, merge, quantized base."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.models.llama import (
    tiny_config, init_params, forward, quantize_params)
from leetcuda_tpu.models.lora import (
    add_lora, lora_params, set_lora_params, merge_lora, make_lora_train_step)

pytestmark = pytest.mark.slow  # full engine/model run; default skips, CI (--runslow) covers



def setup():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 32)), jnp.int32)
    return cfg, params, tokens


def test_zero_init_matches_base():
    cfg, params, tokens = setup()
    lp = add_lora(params, jax.random.key(1), rank=4)
    np.testing.assert_allclose(np.asarray(forward(lp, tokens, cfg)),
                               np.asarray(forward(params, tokens, cfg)),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_adapter_training_moves_loss_base_frozen():
    cfg, params, tokens = setup()
    lp = add_lora(params, jax.random.key(1), rank=4)
    ad = lora_params(lp)
    init_opt, step = make_lora_train_step(cfg, learning_rate=1e-2)
    s = init_opt(ad)
    losses = []
    for _ in range(5):
        ad, s, loss = step(ad, s, lp, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # base weights untouched
    np.testing.assert_array_equal(
        np.asarray(lp["layers"][0]["wq"]["w"]),
        np.asarray(params["layers"][0]["wq"]))


def test_merge_matches_adapted_forward():
    cfg, params, tokens = setup()
    lp = add_lora(params, jax.random.key(1), rank=4)
    ad = lora_params(lp)
    # give the adapters non-trivial values
    ad = jax.tree_util.tree_map(lambda x: x + 0.01, ad)
    lp = set_lora_params(lp, ad)
    merged = merge_lora(lp)
    np.testing.assert_allclose(np.asarray(forward(merged, tokens, cfg)),
                               np.asarray(forward(lp, tokens, cfg)),
                               atol=2e-4, rtol=2e-4)


def test_qlora_quantized_base_trains():
    cfg, params, tokens = setup()
    qbase = quantize_params(params, dtype="int8")
    lp = add_lora(qbase, jax.random.key(1), rank=4)
    ad = lora_params(lp)
    init_opt, step = make_lora_train_step(cfg, learning_rate=1e-2)
    s = init_opt(ad)
    losses = []
    for _ in range(4):
        ad, s, loss = step(ad, s, lp, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_engine_serves_lora_adapters():
    """The engine serves adapted weights transparently; with non-zero
    adapters, generation matches the merged-weight model exactly."""
    from leetcuda_tpu.engine import Engine, EngineConfig

    cfg, params, _ = setup()
    lp = add_lora(params, jax.random.key(2), rank=4)
    ad = jax.tree_util.tree_map(lambda x: x + 0.02, lora_params(lp))
    lp = set_lora_params(lp, ad)

    prompt = list(np.random.default_rng(7).integers(0, cfg.vocab_size, 9))
    e1 = Engine(lp, cfg, EngineConfig(slots=1, max_seq=128,
                                      prefill_bucket=16))
    e2 = Engine(merge_lora(lp), cfg, EngineConfig(slots=1, max_seq=128,
                                                  prefill_bucket=16))
    (a,) = e1.run([prompt], max_new=6).values()
    (b,) = e2.run([prompt], max_new=6).values()
    assert a == b


def test_multi_lora_engine_serving():
    """MULTI-TENANT LoRA: three independently trained adapters over one
    base, stacked, served in ONE engine — each request routes to its own
    adapter and must emit exactly that adapter's solo greedy stream."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.models.lora import add_lora, merge_lora, stack_lora
    from leetcuda_tpu.engine import Engine, EngineConfig
    from test_engine import solo_greedy

    cfg = tiny_config()
    base = init_params(jax.random.key(0), cfg)
    # three adapters with DIFFERENT random B (so they produce different
    # streams; B=0 init would make all tenants identical)
    singles = []
    for i in range(3):
        p = add_lora(base, jax.random.key(10 + i), rank=4)
        for layer in p["layers"]:
            for name, w in layer.items():
                if isinstance(w, dict) and "A" in w:
                    w["B"] = jax.random.normal(
                        jax.random.fold_in(jax.random.key(20 + i),
                                           hash(name) % 1000),
                        w["B"].shape, jnp.float32) * 0.05
        singles.append(p)
    stacked = stack_lora(singles)

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (6, 9, 12)]
    eng = Engine(stacked, cfg, EngineConfig(slots=4, max_seq=128,
                                            prefill_bucket=16))
    uids = [eng.submit(p, max_new=6, adapter_id=i)
            for i, p in enumerate(prompts)]
    while eng.waiting or eng.active or eng.filling:
        eng.step()
    for i, (uid, prompt) in enumerate(zip(uids, prompts)):
        want = solo_greedy(merge_lora(singles[i]), cfg, prompt, 6)
        got = eng.finished[uid].generated
        assert got == want, (i, got, want)


def test_multi_lora_composed_serving():
    """The r2-verdict 'no fences' standard one layer up: multi-LoRA x paged
    x prefix-cache x chunked prefill x SPECULATIVE in one engine, each
    tenant emitting exactly its adapter's solo greedy stream. Also checks
    the trie namespace: one shared prompt served under two adapters must
    NOT share prefix pages (adapted wk/wv make the KV tenant-specific),
    while a repeat under the SAME adapter may adopt them."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.models.lora import add_lora, merge_lora, stack_lora
    from leetcuda_tpu.engine import Engine, EngineConfig
    from test_engine import solo_greedy

    cfg = tiny_config()
    base = init_params(jax.random.key(0), cfg)
    singles = []
    for i in range(2):
        p = add_lora(base, jax.random.key(10 + i), rank=4)
        for layer in p["layers"]:
            for name, w in layer.items():
                if isinstance(w, dict) and "A" in w:
                    w["B"] = jax.random.normal(
                        jax.random.fold_in(jax.random.key(20 + i),
                                           hash(name) % 1000),
                        w["B"].shape, jnp.float32) * 0.05
        singles.append(p)
    stacked = stack_lora(singles)
    d_cfg = tiny_config(n_layers=1, dim=128, n_heads=2, n_kv_heads=1,
                        ffn_dim=256)
    d_params = init_params(jax.random.key(99), d_cfg)

    rng = np.random.default_rng(3)
    shared = list(rng.integers(0, cfg.vocab_size, 40))  # > 2 pages
    eng = Engine(stacked, cfg, EngineConfig(
        slots=2, max_seq=128, prefill_bucket=16, paged=True, page_size=16,
        prefix_cache=True, prefill_chunk=32, spec_k=2),
        draft=(d_params, d_cfg))
    want = [solo_greedy(merge_lora(singles[i]), cfg, shared, 6)
            for i in range(2)]

    # serial: each request sees the previous one's published prefix pages
    for i, aid in enumerate([0, 1, 0]):
        uid = eng.submit(shared, max_new=6, adapter_id=aid)
        while eng.waiting or eng.active or eng.filling:
            eng.step()
        got = eng.finished[uid].generated
        assert got == want[aid], (i, aid, got, want[aid])
    # the third request (adapter 0 repeat) adopted adapter-0 pages
    assert eng.pm.hits > 0
