"""Property-based fuzzer for the PageManager prefix-caching state machine.

Random interleavings of ensure/adopt/register/release against two invariants
that must hold after EVERY operation:

1. conservation: every page is in exactly one of {free, reserved-null,
   held-by-slots and/or cached}; refcount == number of slots holding it;
   refcount-0 cached pages are exactly the reclaimable set.
2. semantic: match_prefix returns pages whose registered token chunks chain
   from the root and equal the query's prefix (checked against a shadow
   model that remembers what tokens were registered where).

The host-side analog of tools/fuzz_attention.py / fuzz_gemm.py (which fuzz
kernels): serving correctness lives or dies on this allocator.

    python tools/fuzz_pages.py [--iters 2000] [--seed 0]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import numpy as np

from leetcuda_tpu.attention.paged import PageManager


def check_invariants(pm: PageManager, n_pages: int):
    held = {}
    for slot, pages in pm.used.items():
        for p in pages:
            held[p] = held.get(p, 0) + 1
    for p, n in held.items():
        assert pm.refs.get(p, 0) == n, (p, n, pm.refs.get(p))
        assert p != 0, "null page held"
    for p, n in pm.refs.items():
        if n > 0:
            assert held.get(p, 0) == n, (p, n)
        else:
            assert p in pm.reclaimable, p
            assert p in pm.trie_inv, p
    for p in pm.reclaimable:
        assert pm.refs.get(p) == 0 and p in pm.trie_inv, p
    for p in pm.trie_inv:
        assert pm.trie[pm.trie_inv[p]] == p
        assert p not in pm.free, f"page {p} cached AND free"
    # conservation: free + held + cached-only covers every non-null page once
    seen = set(pm.free)
    assert len(seen) == len(pm.free), "duplicate free pages"
    for p in held:
        assert p not in seen, f"page {p} held AND free"
        seen.add(p)
    for p in pm.trie_inv:
        seen.add(p)
    assert seen <= set(range(1, n_pages)), seen - set(range(1, n_pages))


def run(iters: int, seed: int, verbose: bool = False):
    rng = np.random.default_rng(seed)
    N_PAGES, PS, SLOTS = 12, 4, 3
    pm = PageManager(N_PAGES, PS, max_pages_per_seq=8, n_slots=SLOTS,
                     prefix_cache=True)
    prompts = {}  # slot -> tokens (what the slot's pages represent)
    # a small prompt universe so prefixes actually collide
    universe = [list(rng.integers(0, 5, int(n)))
                for n in rng.integers(5, 25, 8)]

    for it in range(iters):
        op = rng.choice(["admit", "grow", "release"])
        free_slots = [s for s in range(SLOTS) if not pm.used[s]]
        busy_slots = [s for s in range(SLOTS) if pm.used[s]]
        if op == "admit" and free_slots:
            slot = int(rng.choice(free_slots))
            toks = list(universe[int(rng.integers(len(universe)))])
            pages = pm.match_prefix(toks)
            # semantic check vs shadow: matched pages must spell the prefix
            for j, p in enumerate(pages):
                key = pm.trie_inv[p]
                assert key[1] == tuple(toks[j * PS:(j + 1) * PS]), (
                    f"iter {it}: match returned wrong tokens")
            assert len(pages) * PS < len(toks), "strict-prefix violated"
            pm.adopt(slot, pages)
            if pm.ensure(slot, len(toks) - 1):
                pm.register_prefix(slot, toks,
                                   skip_pages=len(pages))
                prompts[slot] = toks
            else:
                pm.release(slot)   # admission failed: roll back
                prompts.pop(slot, None)
        elif op == "grow" and busy_slots:
            slot = int(rng.choice(busy_slots))
            cur = len(pm.used[slot]) * PS
            if cur < 8 * PS:
                pm.ensure(slot, cur)  # one more page (may fail: fine)
        elif op == "release" and busy_slots:
            slot = int(rng.choice(busy_slots))
            pm.release(slot)
            prompts.pop(slot, None)
        check_invariants(pm, N_PAGES)

    for s in range(SLOTS):
        pm.release(s)
    check_invariants(pm, N_PAGES)
    # final drain: everything not cached is free
    assert len(pm.free) + len(pm.trie_inv) == N_PAGES - 1
    print(f"fuzz_pages: {iters} ops, invariants held "
          f"(final: {len(pm.free)} free, {len(pm.trie_inv)} cached)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rounds", type=int, default=5,
                    help="independent seeds to run")
    args = ap.parse_args()
    for r in range(args.rounds):
        run(args.iters, args.seed + r)


if __name__ == "__main__":
    main()
