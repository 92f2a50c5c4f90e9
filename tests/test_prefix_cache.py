"""Automatic prefix caching: refcounted page trie + suffix-only (chunked)
prefill. Oracle: token-exactness vs the no-cache engine / solo decode —
caching must be invisible in the output stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.attention.paged import PageManager
from leetcuda_tpu.models.llama import tiny_config, init_params
from leetcuda_tpu.engine import Engine, EngineConfig
from test_engine import solo_greedy


# --- PageManager unit tests ---------------------------------------------------------

def test_trie_match_adopt_release():
    pm = PageManager(num_pages=16, page_size=4, max_pages_per_seq=8,
                     n_slots=2, prefix_cache=True)
    prompt = list(range(10))           # 2 full pages + 2 tokens
    assert pm.ensure(0, 9)             # 3 pages
    pm.register_prefix(0, prompt)
    assert len(pm.trie) == 2

    # same prompt matches both full pages; strict-prefix rule: a prompt of
    # exactly 8 tokens may only adopt 1 page (one token must prefill)
    assert len(pm.match_prefix(prompt)) == 2
    assert len(pm.match_prefix(list(range(8)))) == 1
    assert len(pm.match_prefix([99] + list(range(1, 10)))) == 0
    # divergence after one page matches one page
    assert len(pm.match_prefix([0, 1, 2, 3, 99, 5, 6, 7, 8])) == 1

    pages = pm.match_prefix(prompt)
    pm.adopt(1, pages)
    assert pm.refs[pages[0]] == 2      # owner + adopter
    pm.release(0)
    assert pm.refs[pages[0]] == 1      # still held by slot 1
    pm.release(1)
    assert pm.refs[pages[0]] == 0      # cached, reclaimable, NOT freed
    assert pages[0] not in pm.free
    assert len(pm.match_prefix(prompt)) == 2  # still matchable


def test_trie_eviction_under_pressure():
    pm = PageManager(num_pages=4, page_size=4, max_pages_per_seq=4,
                     n_slots=1, prefix_cache=True)  # 3 usable pages
    pm.ensure(0, 7)                    # 2 pages
    pm.register_prefix(0, list(range(8)))
    pm.release(0)                      # both cached, reclaimable
    # new request needs 3 pages: 1 free + 2 evicted from the trie
    assert pm.ensure(0, 11)
    assert len(pm.used[0]) == 3
    assert len(pm.match_prefix(list(range(9)))) == 0  # chain evicted
    pm.release(0)
    assert len(pm.free) == 3           # private pages drain to the pool


def test_evicted_parent_never_falsely_matches():
    """After eviction, a physical id reuse must not resurrect a stale chain
    (uid-keyed trie)."""
    pm = PageManager(num_pages=3, page_size=2, max_pages_per_seq=2,
                     n_slots=1, prefix_cache=True)  # 2 usable
    pm.ensure(0, 3)
    pm.register_prefix(0, [1, 2, 3, 4])
    pm.release(0)
    # evict both by allocating fresh, register DIFFERENT content
    pm.ensure(0, 3)
    pm.register_prefix(0, [7, 8, 9, 10])
    pm.release(0)
    assert len(pm.match_prefix([1, 2, 3, 4, 5])) == 0
    assert len(pm.match_prefix([7, 8, 9, 10, 11])) == 2


# --- engine integration -------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    return cfg, init_params(jax.random.key(0), cfg)


def _engine(cfg, params, **kw):
    base = dict(slots=2, max_seq=256, prefill_bucket=16, paged=True,
                page_size=16, prefix_cache=True)
    base.update(kw)
    return Engine(params, cfg, EngineConfig(**base))


def test_prefix_hit_same_prompt_token_exact(setup):
    """Second identical prompt adopts the cached pages and emits exactly the
    solo tokens (suffix-only chunked prefill)."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, cfg.vocab_size, 40))  # 2 full pages + 8

    eng = _engine(cfg, params)
    eng.run([prompt], max_new=6)
    assert eng.stats()["prefix_pages_hit"] == 0
    got = eng.run([prompt], max_new=6)          # re-run: prefix cached
    assert eng.stats()["prefix_pages_hit"] == 2  # both full pages adopted
    want = solo_greedy(params, cfg, prompt, 6)
    assert list(got.values())[0] == want


@pytest.mark.slow  # top-8 wall-time: default tier stays <6 min (CI --runslow covers it)
def test_prefix_hit_partial_overlap(setup):
    """Shared system-prompt style: 32 common tokens, different tails."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    common = list(rng.integers(0, cfg.vocab_size, 32))  # exactly 2 pages
    tails = [list(rng.integers(0, cfg.vocab_size, n)) for n in (9, 21)]

    eng = _engine(cfg, params, slots=1)  # serialize admissions
    outs = eng.run([common + t for t in tails], max_new=5)
    # second request adopted the 2 common pages
    assert eng.stats()["prefix_pages_hit"] == 2
    for (uid, got), tail in zip(sorted(outs.items()), tails):
        assert got == solo_greedy(params, cfg, common + tail, 5), uid


@pytest.mark.slow  # top-8 wall-time: default tier stays <6 min (CI --runslow covers it)
def test_prefix_cache_quantized_and_window(setup):
    """prefix caching x int8 KV x sliding window compose; oracle = the
    no-cache paged engine with identical numerics."""
    cfg0, params0 = setup
    cfg = tiny_config(sliding_window=24)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    common = list(rng.integers(0, cfg.vocab_size, 32))
    prompts = [common + list(rng.integers(0, cfg.vocab_size, n))
               for n in (5, 11)]

    eng = _engine(cfg, params, slots=1, kv_quant="int8")
    plain = Engine(params, cfg, EngineConfig(
        slots=1, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8"))
    got = eng.run(prompts, max_new=6)
    want = plain.run(prompts, max_new=6)
    assert eng.stats()["prefix_pages_hit"] == 2
    assert list(got.values()) == list(want.values())


@pytest.mark.slow  # top-8 wall-time: default tier stays <6 min (CI --runslow covers it)
def test_prefix_cache_survives_slot_churn(setup):
    """Many requests over few slots: frees/adoptions interleave; every
    output exact, no page leaks."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    common = list(rng.integers(0, cfg.vocab_size, 16))  # 1 page
    prompts = [common + list(rng.integers(0, cfg.vocab_size, int(n)))
               for n in rng.integers(3, 20, 6)]
    eng = _engine(cfg, params, num_pages=30)
    got = eng.run(prompts, max_new=4)
    assert eng.stats()["prefix_pages_hit"] >= 4  # later requests all hit
    for (uid, g), p in zip(sorted(got.items()), prompts):
        assert g == solo_greedy(params, cfg, p, 4), uid
    held = sum(len(v) for v in eng.pm.used.values())
    assert held == 0


def test_page_manager_fuzz_invariants():
    """500-op randomized interleaving holds the allocator invariants
    (tools/fuzz_pages.py, short CI slice)."""
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tools.fuzz_pages import run
    run(500, seed=42)
