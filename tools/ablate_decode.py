"""Decode-step time decomposition — where a decode token's microseconds go.

Measures, in one session with the two-length scan-difference method:

  full   — the real decode_step (norm -> QKV -> rope -> append -> attend ->
           wo -> MLP per layer + head),
  rest   — the same step with cache attention REPLACED BY ZEROS at trace
           time (projection/norm/rope/append/head costs only),
  floors — the weight-streaming floor (param bytes / HBM) and the KV floor
           (valid-prefix bytes / HBM) for comparison.

attention_share = full - rest (additive on a single serial TensorCore: there
is no cross-op overlap to destroy). This reproduces r1's "decode rest at 76%
of weight floor / attention at 45% of its floor" accounting as a committed,
rerunnable script (PERF.md methodology).

    python tools/ablate_decode.py [--ctx 2048] [--batch 8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import leetcuda_tpu.models.llama as L
    from leetcuda_tpu.models.llama import (
        ModelConfig, init_params, fuse_params, init_kv_caches)
    from leetcuda_tpu.utils.roofline import detect_chip

    cfg = ModelConfig()
    params = fuse_params(init_params(jax.random.key(0), cfg))
    B, S = args.batch, args.ctx
    # cache capacity MUST stay 1024-divisible: _pick_bk falls back to tiny
    # KV blocks otherwise (S_max=2176 -> bk=128 -> 5x slower attention;
    # measured by an earlier run of this very script)
    S_max = ((S + 128 + 1023) // 1024) * 1024
    caches = init_kv_caches(cfg, B, S_max)
    lengths = jnp.full((B,), S, jnp.int32)
    toks = jnp.zeros((B,), jnp.int32)

    def scan_steps(n, attend):
        """n chained decode steps in one jit; ``attend`` False stubs the
        cache attention with zeros AT TRACE TIME (the ablation)."""
        def build():
            @jax.jit
            def run(params, toks, caches, lengths):
                def body(carry, _):
                    t, c, ln = carry
                    lg, c = L.decode_step_impl(params, t, c, ln, cfg)
                    nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                    return (nxt, c, ln + 1), None

                (t, c, ln), _ = jax.lax.scan(body, (toks, caches, lengths),
                                             None, length=n)
                return t

            return run

        if attend:
            return build()
        real = L._cache_attend

        def stub(q, cache, lengths, **kw):
            # NOT zeros: dot(zeros, w) constant-folds and XLA then DCEs the
            # whole QKV projection chain, making "rest" beat the weight
            # floor (observed). Scaling q keeps every projection live while
            # skipping the attention kernel and its cache reads.
            return q * jnp.asarray(1e-6, q.dtype)

        with mock.patch.object(L, "_cache_attend", stub):
            fn = build()
            # trace INSIDE the patch so the stub is baked into the jaxpr
            fn.lower(params, toks, caches, lengths)
        assert L._cache_attend is real
        return fn

    def timed(fn, n):
        out = fn(params, toks, caches, lengths)
        np.asarray(out)  # compile + settle
        best = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(params, toks, caches, lengths))
            best = min(best, time.perf_counter() - t0)
        return best

    LO, HI = 8, 40
    rows = {}
    for name, attend in (("full", True), ("rest (attention stubbed)", False)):
        f_lo, f_hi = scan_steps(LO, attend), scan_steps(HI, attend)
        per = (timed(f_hi, HI) - timed(f_lo, LO)) / (HI - LO)
        rows[name] = per
        print(f"{name:>26}: {per * 1e6:8.1f} us/step "
              f"({B / per:,.0f} tok/s)", flush=True)

    attn = rows["full"] - rows["rest (attention stubbed)"]
    chip = detect_chip()
    wbytes = sum(np.prod(v.shape) * v.dtype.itemsize
                 for v in jax.tree_util.tree_leaves(params))
    kv_bytes = 2 * B * cfg.n_kv_heads * S * cfg.head_dim * 2
    w_floor = wbytes / (chip.hbm_gbps * 1e9)
    kv_floor = kv_bytes / (chip.hbm_gbps * 1e9)
    per_layer = attn / cfg.n_layers
    print(f"\nattention+append share: {attn * 1e6:.1f} us/step = "
          f"{per_layer * 1e6:.1f} us/layer "
          f"(per-layer KV-read floor {kv_floor * 1e6:.1f} us; the remainder "
          f"is kernel fixed cost + append — compare against the ISOLATED "
          f"kernel time at this shape, not the floor)")
    print(f"rest: {rows['rest (attention stubbed)'] * 1e6:.1f} us/step "
          f"(weight floor {w_floor * 1e6:.1f} us -> "
          f"{100 * w_floor / rows['rest (attention stubbed)']:.0f}% of floor)"
          )
    print("NOTE: 'rest' excludes appends too (they feed only the stubbed "
          "attention and get DCE'd); the share line carries both.")


if __name__ == "__main__":
    main()
