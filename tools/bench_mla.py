"""MLA latent-cache decode vs expanded-MHA decode — the memory-bound duel.

The claim to verify on-chip: decode attention is KV-bandwidth-bound, so the
latent cache's 8.9x byte reduction (B, 1, S, 576 vs B, 8kv, S, 128 K+V at
the DeepSeek-V2 ratios) should show up as a near-proportional kernel-time
reduction at long context, minus the absorbed-projection overhead.

    python tools/bench_mla.py [--b 8] [--s 2048] [--iters 100]

Rows: shared-KV latent kernel (bf16 + int8 + PAGED pool), the equivalent
GQA kernel (Hkv=8, D=128, bf16 + int8), each with achieved GB/s vs the
valid-prefix byte count, interleaved best-of-3.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.attention.decode import (
        make_decode_attention, make_decode_attention_quantized)
    from leetcuda_tpu.models.mla import MLAConfig, _quantize_latent

    cfg = MLAConfig(n_heads=args.heads)
    B, H, S = args.b, args.heads, args.s
    Dlat, Hkv, Dh = cfg.latent_dim, 8, 128
    rng = np.random.default_rng(0)

    lat = jnp.asarray(rng.normal(0, 0.3, (B, 1, S, Dlat)), jnp.bfloat16)
    q_lat = jnp.asarray(rng.normal(0, 0.3, (B, H, Dlat)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.3, (B, Hkv, S, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 0.3, (B, Hkv, S, Dh)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(0, 0.3, (B, H, Dh)), jnp.bfloat16)
    lengths = jnp.full((B,), S, jnp.int32)
    lat_q8, lat_s = _quantize_latent(lat, "int8")
    sm = 1.0 / (cfg.qk_head_dim ** 0.5)

    rows = {
        "mla_latent_bf16": (
            make_decode_attention(sm_scale=sm, shared_kv=True),
            (q_lat, lat, lengths), B * S * Dlat * 2),
        "mla_latent_int8": (
            make_decode_attention_quantized(sm_scale=sm, shared_kv=True),
            (q_lat.astype(jnp.float32), lat_q8, lat_s, lengths),
            B * S * (Dlat + 4)),
        "gqa_bf16": (
            make_decode_attention(),
            (q, k, v, lengths), B * Hkv * S * Dh * 2 * 2),
    }

    def q8(c):
        s = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=-1) / 127.0
        qq = jnp.clip(jnp.round(c.astype(jnp.float32) / s[..., None]),
                      -127, 127).astype(jnp.int8)
        return qq, s.astype(jnp.float32)

    kq, ks = q8(k)
    vq, vs = q8(v)
    rows["gqa_int8"] = (make_decode_attention_quantized(),
                        (q, kq, vq, ks, vs, lengths),
                        B * Hkv * S * (Dh + 4) * 2)

    # paged latent pool: same bytes as the slot latent + table indirection —
    # the cost of block-table serving should be ~the page-chase overhead
    from leetcuda_tpu.attention.paged import make_paged_attention

    PAGE = 128
    if S % PAGE == 0:  # paged row needs whole pages; skip at odd --s
        pmax = S // PAGE
        table_np = np.arange(B * pmax, dtype=np.int32).reshape(B, pmax)
        pool = jnp.asarray(
            np.asarray(lat, np.float32).transpose(0, 2, 1, 3)
            .reshape(B * pmax, PAGE, 1, Dlat).transpose(0, 2, 1, 3),
            jnp.bfloat16)
        rows["mla_latent_paged"] = (
            make_paged_attention(sm_scale=sm, shared_kv=True),
            (q_lat, pool, jnp.asarray(table_np), lengths), B * S * Dlat * 2)
        # the r4 one-page-per-step baseline (DMA-latency-bound, 283 GB/s)
        rows["mla_paged_1pp"] = (
            make_paged_attention(sm_scale=sm, shared_kv=True,
                                 pages_per_step=1),
            (q_lat, pool, jnp.asarray(table_np), lengths), B * S * Dlat * 2)

    print(f"B={B} H={H} S={S} latent D={Dlat} vs GQA Hkv={Hkv} Dh={Dh}")
    results = {}
    for rep in range(3):  # interleaved best-of-3
        for name, (fn, a, nbytes) in rows.items():
            r = run_benchmark(fn, *a, iters=args.iters, flops=1.0)
            best = max(results.get(name, (0.0, nbytes))[0],
                       1e3 / r.mean_ms)
            results[name] = (best, nbytes)
    base = None
    for name, (rate, nbytes) in results.items():
        us = 1e6 / rate
        gbs = nbytes * rate / 1e9
        note = ""
        if name == "mla_latent_bf16":
            base = us
        elif base and name.startswith("gqa"):
            note = f"  ({us / base:.2f}x the latent kernel's time)"
        print(f"  {name:18s} {us:8.1f} us/step  {gbs:7.1f} GB/s{note}")


if __name__ == "__main__":
    main()
