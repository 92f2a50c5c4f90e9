"""One-command benchmark report: every headline number in a single session
(within-run numbers are comparable; the axon tunnel drifts across sessions).

    python tools/bench_all.py [--out PERF_RUN.json]

Writes a JSON report: GEMM (Pallas vs XLA at 4096/8192), flash attention
fwd+bwd at three head dims, decode attention kernel, end-to-end decode
tokens/s (bf16 + int8), training MFU.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PERF_RUN.json")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.core.runtime import on_tpu

    report = {"device": str(jax.devices()[0]), "on_tpu": on_tpu(),
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}

    def best(fn, *a, flops, iters, reps=3):
        return max(run_benchmark(fn, *a, iters=iters, flops=flops).tflops
                   for _ in range(reps))

    # --- GEMM ----------------------------------------------------------------
    from leetcuda_tpu.gemm.matmul import hgemm, matmul_ref

    gemm = {}
    for n in ([4096] if args.quick else [4096, 8192]):
        a = jax.random.normal(jax.random.key(0), (n, n),
                              jnp.float32).astype(jnp.bfloat16)
        b = jax.random.normal(jax.random.key(1), (n, n),
                              jnp.float32).astype(jnp.bfloat16)
        fl = 2.0 * n ** 3
        it = 150 if n == 4096 else 50
        gemm[f"bf16_{n}"] = {
            "pallas_tflops": round(best(hgemm, a, b, flops=fl, iters=it), 1),
            "xla_tflops": round(best(jax.jit(matmul_ref), a, b, flops=fl,
                                     iters=it), 1)}
        del a, b
    report["gemm"] = gemm
    print("gemm:", gemm, flush=True)

    # --- flash attention -----------------------------------------------------
    from leetcuda_tpu.attention.flash import (
        make_flash_attention, flash_attention_ref)
    from leetcuda_tpu.attention.flash_bwd import make_flash_attention_trainable

    fa_rep = {}
    for (B, H, N, D, causal) in [(1, 8, 8192, 64, True),
                                 (1, 8, 4096, 128, True),
                                 (1, 8, 4096, 512, False)]:
        ks = jax.random.split(jax.random.key(2), 3)
        q, k, v = (jax.random.normal(kk, (B, H, N, D), jnp.float32)
                   .astype(jnp.bfloat16) for kk in ks)
        fl = 4.0 * B * H * N * N * D * (0.5 if causal else 1.0)
        fa = make_flash_attention(causal=causal)
        ref = jax.jit(lambda q, k, v: flash_attention_ref(q, k, v,
                                                          causal=causal))
        entry = {
            "pallas_tflops": round(best(fa, q, k, v, flops=fl, iters=100), 1),
            "xla_sdpa_tflops": round(best(ref, q, k, v, flops=fl, iters=30),
                                     1)}
        if D == 128 and not args.quick:
            fat = make_flash_attention_trainable(causal=causal)
            g = jax.jit(jax.grad(
                lambda q: jnp.sum(fat(q, k, v).astype(jnp.float32))))
            entry["bwd_tflops"] = round(
                best(g, q, flops=fl * 3.5, iters=50), 1)
        fa_rep[f"B{B}H{H}N{N}D{D}{'c' if causal else ''}"] = entry
        del q, k, v
    report["flash_attention"] = fa_rep
    print("flash:", fa_rep, flush=True)

    # --- decode end-to-end ---------------------------------------------------
    from leetcuda_tpu.models.llama import (
        ModelConfig, init_params, quantize_params, fuse_params)
    from leetcuda_tpu.bench.decode_bench import bench_one

    cfg = ModelConfig()
    params = init_params(jax.random.key(0), cfg)
    dec = {"bf16": round(bench_one("bf16", params, cfg, 8, 128, 96, None), 0)}
    q8 = quantize_params(fuse_params(params), dtype="int8")
    dec["int8_int8kv"] = round(
        bench_one("int8+int8kv", q8, cfg, 8, 128, 96, "int8"), 0)
    report["decode_tok_s"] = dec
    del q8

    # --- training ------------------------------------------------------------
    if not args.quick:
        from leetcuda_tpu.models.llama import make_train_step
        import numpy as _np

        init_opt, step = make_train_step(cfg, learning_rate=1e-4)
        p = jax.tree_util.tree_map(jnp.copy, params)
        s = init_opt(p)
        tokens = jnp.asarray(_np.random.default_rng(0).integers(
            0, cfg.vocab_size, (8, 2048)), jnp.int32)
        p, s, l = step(p, s, tokens); float(l)
        t0 = time.perf_counter()
        for _ in range(10):
            p, s, l = step(p, s, tokens)
        float(l)
        tps = 8 * 2048 * 10 / (time.perf_counter() - t0)
        n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
        fpt = 6 * n_par + 3 * 2 * 2 * cfg.n_layers * cfg.n_heads \
            * cfg.head_dim * 2048 / 2
        report["train"] = {"tok_s": round(tps, 0),
                           "mfu_pct": round(100 * tps * fpt / 197e12, 1)}
        del p, s

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    sys.exit(main())
