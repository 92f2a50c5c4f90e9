"""Paged-attention tests: block-table indirection == contiguous-cache oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.attention.decode import decode_attention_ref
from leetcuda_tpu.attention.paged import (
    make_paged_attention, paged_append, PageManager)


def build_paged(rng, B, Hkv, lengths, page, D, num_pages):
    """Random contiguous caches scattered into shuffled physical pages."""
    S_max = max(lengths)
    S_pad = -(-S_max // page) * page
    k = jnp.asarray(rng.standard_normal((B, Hkv, S_pad, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S_pad, D)), jnp.float32)

    k_pages = jnp.zeros((num_pages, Hkv, page, D), jnp.float32)
    v_pages = jnp.zeros((num_pages, Hkv, page, D), jnp.float32)
    P_max = S_pad // page
    table = np.zeros((B, P_max), np.int32)
    phys = rng.permutation(np.arange(1, num_pages))  # shuffled pool, 0 = null
    n = 0
    for b in range(B):
        for i in range(-(-lengths[b] // page)):
            p = int(phys[n]); n += 1
            table[b, i] = p
            k_pages = k_pages.at[p].set(k[b, :, i * page:(i + 1) * page])
            v_pages = v_pages.at[p].set(v[b, :, i * page:(i + 1) * page])
    return k, v, k_pages, v_pages, jnp.asarray(table)


@pytest.mark.parametrize("page", [16, 64])
def test_paged_matches_contiguous(page, rng):
    B, H, Hkv, D = 3, 8, 2, 64
    lengths = [30, 128, 77]
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k, v, kp, vp, table = build_paged(rng, B, Hkv, lengths, page, D,
                                      num_pages=32)
    lens = jnp.asarray(lengths, jnp.int32)
    got = make_paged_attention()(q, kp, vp, table, lens)
    want = decode_attention_ref(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_paged_append_and_attend(rng):
    """Token-by-token appends through the PageManager reproduce contiguous
    decode attention at every step (incl. page-boundary crossings)."""
    B, H, Hkv, D, page = 2, 4, 2, 64, 16
    steps = 40  # crosses 2 page boundaries
    pm = PageManager(num_pages=16, page_size=page, max_pages_per_seq=4,
                     n_slots=B)
    kp = jnp.zeros((16, Hkv, page, D), jnp.float32)
    vp = jnp.zeros((16, Hkv, page, D), jnp.float32)
    kc = jnp.zeros((B, Hkv, steps + page, D), jnp.float32)
    vc = jnp.zeros((B, Hkv, steps + page, D), jnp.float32)
    fn = make_paged_attention()

    lengths = jnp.zeros((B,), jnp.int32)
    for t in range(steps):
        k_t = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_t = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        for b in range(B):
            assert pm.ensure(b, t)
        kp, vp = paged_append(kp, vp, k_t, v_t, pm.device_table, lengths)
        bidx = jnp.arange(B)
        kc = kc.at[bidx, :, lengths].set(k_t)
        vc = vc.at[bidx, :, lengths].set(v_t)
        lengths = lengths + 1

        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        got = fn(q, kp, vp, pm.device_table, lengths)
        want = decode_attention_ref(q, kc, vc, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3, err_msg=f"step {t}")


def test_page_manager_oom_and_release():
    pm = PageManager(num_pages=4, page_size=8, max_pages_per_seq=4, n_slots=2)
    assert pm.ensure(0, 0) and pm.ensure(0, 15)   # 2 pages
    assert pm.ensure(1, 7)                         # 3rd page
    assert not pm.ensure(1, 8)                     # pool (3 usable) exhausted
    pm.release(0)
    assert pm.ensure(1, 8)                         # freed pages reusable

@pytest.mark.slow
def test_paged_engine_matches_solo():
    """Paged engine (ample pool) == solo decode tokens."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.engine import Engine, EngineConfig
    from test_engine import solo_greedy

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    rng2 = np.random.default_rng(0)
    prompts = [list(rng2.integers(0, cfg.vocab_size, n)) for n in (5, 12, 9)]

    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16))
    got = eng.run(prompts, max_new=6)
    for uid, prompt in zip(sorted(got), prompts):
        assert got[uid] == solo_greedy(params, cfg, prompt, 6), uid


@pytest.mark.slow
def test_paged_engine_preemption():
    """A pool too small for all sequences forces recompute preemption; every
    request must still produce exactly its solo tokens."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.engine import Engine, EngineConfig
    from test_engine import solo_greedy

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    rng2 = np.random.default_rng(1)
    prompts = [list(rng2.integers(0, cfg.vocab_size, 12)) for _ in range(3)]

    # 2 slots x (12 prompt + 24 new) needs ~3 pages each at page=16; give a
    # pool of 5 usable pages so two concurrent sequences collide mid-flight
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        num_pages=6))
    got = eng.run(prompts, max_new=24)
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(params, cfg, prompt, 24)
        assert got[uid] == want, (uid, got[uid], want)


def test_paged_quantized_matches_dequantized(rng):
    """int8 page pools + scale pools == attention over dequantized pages."""
    from leetcuda_tpu.attention.paged import make_paged_attention

    B, H, Hkv, D, page = 2, 4, 2, 64, 32
    lengths = [50, 96]
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    _, _, kp, vp, table = build_paged(rng, B, Hkv, lengths, page, D,
                                      num_pages=16)

    def quant(pages):
        amax = jnp.max(jnp.abs(pages), axis=-1)            # (N, Hkv, page)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        pq = jnp.round(pages / sc[..., None]).astype(jnp.int8)
        return pq, sc

    kq, ks = quant(kp)
    vq, vs = quant(vp)
    lens = jnp.asarray(lengths, jnp.int32)
    got = make_paged_attention(quantized=True)(q, kq, vq, ks, vs, table, lens)
    want = make_paged_attention()(
        q, kq.astype(jnp.float32) * ks[..., None],
        vq.astype(jnp.float32) * vs[..., None], table, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_paged_int8_engine_matches_slot_int8_engine():
    """Paged + int8 KV == slot-cache + int8 KV (same per-token scale
    granularity => identical numerics), exercising the full north-star combo:
    quantized weights + quantized paged KV + continuous batching."""
    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, quantize_params)
    from leetcuda_tpu.engine import Engine, EngineConfig

    cfg = tiny_config()
    params = quantize_params(init_params(jax.random.key(0), cfg),
                             dtype="int8")
    rng2 = np.random.default_rng(4)
    prompts = [list(rng2.integers(0, cfg.vocab_size, n)) for n in (7, 13)]

    eng_slot = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, kv_quant="int8"))
    eng_paged = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, kv_quant="int8",
        paged=True, page_size=16))
    a = eng_slot.run(prompts, max_new=6)
    b = eng_paged.run(prompts, max_new=6)
    assert list(a.values()) == list(b.values())


def test_paged_window_matches_contiguous(rng):
    """Sliding window through the paged kernel == windowed contiguous oracle
    (the Mistral + paged-serving combination; ADVICE r1 high)."""
    B, H, Hkv, D, page = 2, 4, 2, 64, 16
    lengths = [70, 128]
    window = 32
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k, v, kp, vp, table = build_paged(rng, B, Hkv, lengths, page, D,
                                      num_pages=32)
    lens = jnp.asarray(lengths, jnp.int32)
    got = make_paged_attention(window=window)(q, kp, vp, table, lens)
    want = decode_attention_ref(q, k, v, lens, window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_paged_window_quantized(rng):
    """window x quantized pages compose."""
    B, H, Hkv, D, page = 1, 4, 2, 64, 32
    lengths = [96]
    window = 40
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    _, _, kp, vp, table = build_paged(rng, B, Hkv, lengths, page, D,
                                      num_pages=8)

    def quant(pages):
        sc = jnp.maximum(jnp.max(jnp.abs(pages), axis=-1), 1e-8) / 127.0
        return jnp.round(pages / sc[..., None]).astype(jnp.int8), sc

    kq, ks = quant(kp)
    vq, vs = quant(vp)
    lens = jnp.asarray(lengths, jnp.int32)
    got = make_paged_attention(quantized=True, window=window)(
        q, kq, vq, ks, vs, table, lens)
    # the oracle path indexes pages positionally: rebuild contiguous from table
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    kc = jnp.stack([jnp.concatenate([kd[p] for p in np.asarray(table[b])],
                                    axis=1) for b in range(B)])
    vc = jnp.stack([jnp.concatenate([vd[p] for p in np.asarray(table[b])],
                                    axis=1) for b in range(B)])
    want = decode_attention_ref(q, kc, vc, lens, window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_windowed_paged_engine_matches_solo():
    """A Mistral-style config (sliding_window) served paged must emit exactly
    the solo decode tokens once context exceeds the window (the silent
    divergence ADVICE r1 flagged)."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.engine import Engine, EngineConfig
    from test_engine import solo_greedy

    cfg = tiny_config(sliding_window=24)
    params = init_params(jax.random.key(0), cfg)
    rng2 = np.random.default_rng(5)
    prompts = [list(rng2.integers(0, cfg.vocab_size, n)) for n in (20, 30)]

    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16))
    got = eng.run(prompts, max_new=12)  # contexts reach 32/42 > window
    for uid, prompt in zip(sorted(got), prompts):
        assert got[uid] == solo_greedy(params, cfg, prompt, 12), uid


def test_engine_paged_oom_raises_when_unservable():
    """A prompt that can never fit the pool raises instead of livelocking
    (ADVICE r1: Engine.run spin with zero active slots)."""
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.engine import Engine, EngineConfig

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=64, paged=True, page_size=16,
        num_pages=3))  # 2 usable pages; a 64-token prefill needs 4
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="pages"):
        eng.run([list(range(1, 40))], max_new=4)
