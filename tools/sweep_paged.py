"""Decompose the paged-attention gap (VERDICT r4 #3): the shipped multi-page
kernel measured no better than one-page-per-step (66.4 vs 63.9 us at the MLA
duel shape), so WHERE does block-table serving lose to the contiguous
kernel's 14 us?

Sweep: pages_per_step G x page size, plus the contiguous shared-KV kernel as
the floor. If bigger pages close the gap but G doesn't, the cost is per-DMA
granularity/latency; if neither moves it, it's per-grid-step fixed cost
(index maps + accumulator rescale), and the honest fix is fewer, bigger
steps — i.e. page size is the lever serving systems must set (vLLM's own
default moved 16 -> 128 for the same reason).

    python tools/sweep_paged.py [--b 8] [--s 2048] [--out PAGED_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="PAGED_SWEEP.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from leetcuda_tpu.bench.harness import run_benchmark, perturb_floor_ms
    from leetcuda_tpu.attention.decode import make_decode_attention
    from leetcuda_tpu.attention.paged import make_paged_attention
    from leetcuda_tpu.models.mla import MLAConfig

    cfg = MLAConfig(n_heads=args.heads)
    B, H, S, Dlat = args.b, args.heads, args.s, cfg.latent_dim
    sm = 1.0 / (cfg.qk_head_dim ** 0.5)
    rng = np.random.default_rng(0)

    lat = jnp.asarray(rng.normal(0, 0.3, (B, 1, S, Dlat)), jnp.bfloat16)
    q_lat = jnp.asarray(rng.normal(0, 0.3, (B, H, Dlat)), jnp.bfloat16)
    lengths = jnp.full((B,), S, jnp.int32)
    nbytes = B * S * Dlat * 2

    rows = {"contiguous": (make_decode_attention(sm_scale=sm, shared_kv=True),
                           (q_lat, lat, lengths))}

    for page in [128, 256, 512]:
        pmax = S // page
        table = jnp.asarray(
            np.arange(B * pmax, dtype=np.int32).reshape(B, pmax))
        pool = jnp.asarray(
            np.asarray(lat, np.float32).transpose(0, 2, 1, 3)
            .reshape(B * pmax, page, 1, Dlat).transpose(0, 2, 1, 3),
            jnp.bfloat16)
        for G in [1, 2, 4, 8]:
            if G > pmax:
                continue
            rows[f"page{page}_G{G}"] = (
                make_paged_attention(sm_scale=sm, shared_kv=True,
                                     pages_per_step=G),
                (q_lat, pool, table, lengths))

    # correctness gate against the contiguous kernel
    want = np.asarray(rows["contiguous"][0](*rows["contiguous"][1]),
                      np.float32)
    alive = {}
    for name, (fn, a) in rows.items():
        got = np.asarray(fn(*a), np.float32)
        err = float(np.abs(got - want).max())
        if err > 2e-2:
            print(f"  {name}: MISMATCH {err:.3e} — excluded", flush=True)
            continue
        alive[name] = (fn, a)

    best = {n: 1e30 for n in alive}
    perturbed = False
    for _ in range(args.reps):  # interleaved
        for name, (fn, a) in alive.items():
            r = run_benchmark(fn, *a, iters=args.iters, head=False)
            best[name] = min(best[name], r.mean_ms)
            perturbed |= r.perturbed
    # decode output (B,H,D) chains back into q, so normally no perturb pass
    # is paid — subtract the floor only if one actually was
    corr = perturb_floor_ms(q_lat, iters=args.iters) if perturbed else 0.0

    out_rows = {}
    for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
        ms_c = max(ms - corr, 1e-6)
        out_rows[name] = {"us": round(ms_c * 1e3, 1),
                          "gbps": round(nbytes / ms_c / 1e6, 1)}
        print(f"  {name:>16}: {ms_c * 1e3:8.1f} us  "
              f"{out_rows[name]['gbps']:7.1f} GB/s", flush=True)

    with open(args.out, "w") as f:
        json.dump({"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                   "shape": {"B": B, "H": H, "S": S, "Dlat": Dlat},
                   "iters": args.iters, "perturb_corr_ms": round(corr, 4),
                   "rows": out_rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
