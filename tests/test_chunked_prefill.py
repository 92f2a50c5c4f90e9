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
