"""Bounded chunked prefill: long prompts stream in over ticks without
stalling decode; outputs stay token-exact vs whole-prompt admission."""

import jax
import numpy as np
import pytest

from leetcuda_tpu.models.llama import tiny_config, init_params
from leetcuda_tpu.engine import Engine, EngineConfig
from test_engine import solo_greedy


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    return cfg, init_params(jax.random.key(0), cfg)


def test_chunked_prefill_token_exact(setup):
    """A 70-token prompt at prefill_chunk=16 takes ~5 fill ticks; tokens
    must equal the solo oracle."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, cfg.vocab_size, 70))
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=16))
    got = eng.run([prompt], max_new=6)
    assert list(got.values())[0] == solo_greedy(params, cfg, prompt, 6)


def test_chunked_prefill_decode_interleaves(setup):
    """While a long prompt streams in, an already-active short request keeps
    decoding every tick (the latency property chunked prefill buys)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    short = list(rng.integers(0, cfg.vocab_size, 5))
    long = list(rng.integers(0, cfg.vocab_size, 80))
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=16))
    u_short = eng.submit(short, max_new=12)
    eng.step()   # short active (its 5-token prompt = one fill tick)
    u_long = eng.submit(long, max_new=4)
    progress = []
    while eng.waiting or eng.active or eng.filling:
        out = eng.step()
        if eng.filling:
            # the short request produced a token on this same tick
            progress.append(u_short in out)
    assert progress and all(progress), progress
    assert eng.finished[u_short].generated == solo_greedy(params, cfg,
                                                          short, 12)
    assert eng.finished[u_long].generated == solo_greedy(params, cfg,
                                                         long, 4)


def test_chunked_prefill_with_prefix_cache(setup):
    """prefill_chunk x prefix_cache: the adopted prefix skips fill ticks."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    common = list(rng.integers(0, cfg.vocab_size, 48))  # 3 pages
    p1 = common + list(rng.integers(0, cfg.vocab_size, 10))
    p2 = common + list(rng.integers(0, cfg.vocab_size, 7))
    eng = Engine(params, cfg, EngineConfig(
        slots=1, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=16, prefix_cache=True))
    got = eng.run([p1, p2], max_new=5)
    assert eng.stats()["prefix_pages_hit"] == 3
    outs = list(got.values())
    assert outs[0] == solo_greedy(params, cfg, p1, 5)
    assert outs[1] == solo_greedy(params, cfg, p2, 5)


def test_chunked_prefill_stall_raises(setup):
    """A pool that can never hold the prompt raises instead of spinning."""
    cfg, params = setup
    eng = Engine(params, cfg, EngineConfig(
        slots=1, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=16, num_pages=3))  # 2 usable pages
    with pytest.raises(RuntimeError, match="stall|pages"):
        eng.run([list(range(1, 60))], max_new=4)


def test_two_filling_slots_unaligned_budget(setup):
    """Regression (ADVICE r2 high): when a finishing slot's final chunk
    leaves a non-bucket-multiple budget remainder, the next filling slot
    must NOT consume it raw — an unaligned n_filled makes its next chunk's
    page-aligned writes clobber already-filled tokens. Two concurrent fills
    where A's final chunk is 8 tokens (budget 32, bucket 16) force the case:
    B would get t_real=24."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    pa = list(rng.integers(0, cfg.vocab_size, 40))  # chunks 32 then final 8
    pb = list(rng.integers(0, cfg.vocab_size, 64))
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=32))
    got = eng.run([pa, pb], max_new=6)
    outs = list(got.values())
    assert outs[0] == solo_greedy(params, cfg, pa, 6)
    assert outs[1] == solo_greedy(params, cfg, pb, 6)
    # filling bases stayed page-aligned throughout (the property the fix
    # restores); n_filled is gone by now, but token-exactness above is the
    # observable: pre-fix, B's output is corrupted.


def test_suffix_admission_is_bounded(setup, monkeypatch):
    """Regression (ADVICE r2 medium): prefix-cache suffix admission must cap
    tokens per chunk call (VMEM scratch scales with H*T). With the cap
    monkeypatched to one bucket, a 100-token suffix takes multiple calls and
    stays token-exact."""
    import leetcuda_tpu.engine.engine as eng_mod
    cfg, params = setup
    monkeypatch.setattr(eng_mod, "_SUFFIX_T_CAP", 16)
    rng = np.random.default_rng(4)
    common = list(rng.integers(0, cfg.vocab_size, 32))  # 2 pages
    p1 = common + list(rng.integers(0, cfg.vocab_size, 100))
    eng = Engine(params, cfg, EngineConfig(
        slots=1, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefix_cache=True))
    eng.run([common + [1, 2, 3]], max_new=2)     # publish the prefix
    got = eng.run([p1], max_new=5)
    assert eng.stats()["prefix_pages_hit"] == 2
    assert list(got.values())[0] == solo_greedy(params, cfg, p1, 5)


def test_register_prefix_miss_count_exact(setup):
    """Regression (ADVICE r2 low): prefix_pages_prefilled counts only pages
    actually published fresh, not pages that chained through existing
    canonical entries."""
    cfg, params = setup
    rng = np.random.default_rng(5)
    common = list(rng.integers(0, cfg.vocab_size, 48))  # 3 pages
    eng = Engine(params, cfg, EngineConfig(
        slots=1, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefix_cache=True))
    eng.run([common + [7]], max_new=2)
    first = eng.stats()["prefix_pages_prefilled"]
    assert first == 3  # 48/16 fresh pages published
    # identical prompt again: all 3 adopt, zero fresh publishes
    eng.run([common + [9]], max_new=2)
    assert eng.stats()["prefix_pages_prefilled"] == first
