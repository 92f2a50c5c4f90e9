"""Decode tokens/s benchmark — the BASELINE.json north-star measurement.

Runs a ~0.8B-param Llama-style model (the default ModelConfig) through the
whole-loop-in-one-jit greedy generator at three quantization points:

    bf16 weights / bf16 KV        (baseline)
    int8 weights / bf16 KV        (weight-only fused dequant; int8 because v5e
                                   emulates fp8 casts in software — see main())
    int8 weights / int8 KV        (the north-star quantized config)

Decode is weight-bandwidth-bound, so the roofline is
tokens/s ≈ batch · HBM_BW / bytes(weights + KV-read per token); the printed
"%SOL" column is measured/roofline against v5e's ~819 GB/s.

Usage: python -m leetcuda_tpu.bench.decode_bench [--batch 8] [--new 128]
       [--prompt 128] [--layers 16] [--dim 2048]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.llama import (
    ModelConfig, init_params, quantize_params, fuse_params, init_kv_caches)
from leetcuda_tpu.engine.engine import make_generate_scan

HBM_GBPS = 819.0  # v5e


def param_bytes(tree):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def bench_one(tag, params, cfg, B, S, max_new, kv_quant, reps=3,
              return_sol=False):
    """Two-point measurement: time generate at max_new and at max_new//4 and
    difference them — prefill cost and constant overheads cancel, leaving the
    pure decode rate.

    ``return_sol``: also return the speed-of-light fraction. A draw > 1.0 is
    PROOF the measurement broke (a tunnel stall landed in the short arm and
    the difference collapsed) — callers should exclude it from medians
    (r5 cert sessions produced 134%-of-SOL draws under daytime congestion).
    """
    max_seq = ((S + max_new + 1023) // 1024) * 1024  # enables the 1024 decode block
    prompts = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)),
        jnp.int32)
    n_lo = max(max_new // 4, 1)

    def timed(n):
        go = make_generate_scan(cfg, n)

        def run():
            caches = init_kv_caches(cfg, B, max_seq, quant=kv_quant)
            toks, _ = go(params, prompts, caches)  # final caches dropped
            np.asarray(jax.device_get(toks))  # fence through the tunnel

        run()  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        return best

    t_hi, t_lo = timed(max_new), timed(n_lo)
    toks_per_s = B * (max_new - n_lo) / max(t_hi - t_lo, 1e-9)
    # roofline: every decode step streams the weights once; plus the valid KV
    # prefix read per step (context matters at long S)
    wbytes = param_bytes(params)
    kv_elem_bytes = 1 if kv_quant else jnp.dtype(cfg.dtype).itemsize
    kv_bytes = (2 * B * cfg.n_kv_heads * (S + max_new // 2) * cfg.head_dim
                * kv_elem_bytes)
    step_floor_s = (wbytes + kv_bytes) / (HBM_GBPS * 1e9)
    sol = B / step_floor_s  # tokens/s at speed-of-light
    print(f"{tag:>28}: {toks_per_s:>9.1f} tok/s decode "
          f"({toks_per_s / B:>7.1f}/seq, weights {wbytes/1e9:.2f} GB, "
          f"KV/step {kv_bytes/1e6:.0f} MB, {100 * toks_per_s / sol:.0f}% of "
          f"HBM SOL; prefill {t_lo - (t_hi - t_lo) / 3:.3f}s)", flush=True)
    if return_sol:
        return toks_per_s, toks_per_s / sol
    return toks_per_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    args = ap.parse_args()

    cfg = ModelConfig(dim=args.dim, n_layers=args.layers)
    params = init_params(jax.random.key(0), cfg)
    B, S, N = args.batch, args.prompt, args.new
    print(f"model: dim={cfg.dim} layers={cfg.n_layers} heads={cfg.n_heads} "
          f"kv={cfg.n_kv_heads} ffn={cfg.ffn_dim}  B={B} S={S} new={N}")

    bench_one("bf16 weights / bf16 KV", params, cfg, B, S, N, None)
    fused = fuse_params(params)
    bench_one("bf16 fused-qkv/gateup", fused, cfg, B, S, N, None)
    # int8 is the performant quantized path on v5e: the VPU casts int8->bf16
    # natively, while fp8 (e4m3) conversion is software-emulated until v6e —
    # measured 10x slower at identical bytes. fp8 stays available for v6e+.
    qparams = quantize_params(params, dtype="int8")
    bench_one("int8 weights / bf16 KV", qparams, cfg, B, S, N, None)
    qfused = quantize_params(fused, dtype="int8")
    bench_one("int8 fused / bf16 KV", qfused, cfg, B, S, N, None)
    bench_one("int8 fused / int8 KV", qfused, cfg, B, S, N, "int8")


if __name__ == "__main__":
    main()
