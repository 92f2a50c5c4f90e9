"""Attack the two sub-0.95 GEMM sweep rows with DIFFERENT ALGORITHMS, not a
10th tile config (VERDICT r4 #6).

Rows: Llama-MLP 4096x14336x4096 (0.936 across the whole 9-config tile
family, TUNE_ROWS2.json) and resident-square 3072^3 (0.932). Candidates:

- auto: the shipped pick_matmul_config tiles (the plateau being attacked)
- nsplit: two (M, N/2, K) kernels + XLA concat epilogue — halves the f32
  accumulator footprint per kernel and doubles grid-level parallelism
- ksplit: two (M, N, K/2) kernels + one (M, N) add — trades an extra output
  pass for fully-independent reduction streams
- wide-n / tall-m: tiles outside the 9-config family ((2048, 3584, 512),
  (4096, 1792, 512)) probing whether the plateau is tile-family exhaustion
- xla: the jitted dot baseline

Paired protocol: each rep measures all candidates interleaved; the headline
is the best-of-N per candidate against the same-session XLA row. Appends to
MLP_DUEL.json.

    python tools/duel_mlp_split.py [--reps 3] [--shapes mlp cube]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--shapes", nargs="*", default=["mlp", "cube"])
    ap.add_argument("--out", default="MLP_DUEL.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leetcuda_tpu.bench.harness import run_benchmark, perturb_floor_ms
    from leetcuda_tpu.gemm.matmul import (make_matmul, matmul_auto,
                                          pick_matmul_config)

    shapes = {"mlp": (4096, 14336, 4096), "cube": (3072, 3072, 3072)}
    report_rows = []

    for sname in args.shapes:
        M, N, K = shapes[sname]
        key = jax.random.PRNGKey(0)
        x = jax.block_until_ready(
            (jax.random.normal(key, (M, K), jnp.float32) / K ** 0.5
             ).astype(jnp.bfloat16))
        w = jax.block_until_ready(
            (jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
             / K ** 0.5).astype(jnp.bfloat16))

        half_n, half_k = N // 2, K // 2
        mm_half_n = make_matmul(
            **pick_matmul_config(M, half_n, K, jnp.bfloat16))
        mm_half_k = make_matmul(
            **pick_matmul_config(M, N, half_k, jnp.bfloat16))

        @jax.jit
        def nsplit(x, w):
            return jnp.concatenate(
                [mm_half_n(x, w[:, :half_n]), mm_half_n(x, w[:, half_n:])],
                axis=1)

        @jax.jit
        def ksplit(x, w):
            a = mm_half_k(x[:, :half_k], w[:half_k])
            b = mm_half_k(x[:, half_k:], w[half_k:])
            return (a.astype(jnp.float32) + b.astype(jnp.float32)).astype(a.dtype)

        cands = {
            "xla": jax.jit(lambda x, w: x @ w),
            "auto": jax.jit(matmul_auto),
            "nsplit": nsplit,
            "ksplit": ksplit,
            "wide_n": make_matmul(block=(2048, 3584, 512)),
            "tall_m": make_matmul(block=(4096, 1792, 512)),
        }

        # correctness gate first (no unbenchmarked OR unverified candidates)
        want = jax.device_get(x.astype(jnp.float32)[:64] @ w.astype(jnp.float32))
        alive = {}
        for name, fn in cands.items():
            try:
                got = jax.device_get(fn(x, w)[:64]).astype("float32")
                err = float(abs(got - want).max())
                assert err < 0.1, err
                alive[name] = fn
            except Exception as e:  # noqa: BLE001
                print(f"  {sname}/{name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

        fl = 2.0 * M * N * K
        iters = max(6, int(2.5e13 / fl))
        best = {n: 1e30 for n in alive}
        perturbed = False
        for _ in range(args.reps):
            for name, fn in alive.items():
                r = run_benchmark(fn, x, w, iters=iters, head=False)
                best[name] = min(best[name], r.mean_ms)
                perturbed |= r.perturbed
        # only subtract the perturb pass when one was actually paid: these
        # GEMM shapes chain through w (out shape == w shape), so there is no
        # perturb — subtracting anyway put XLA's cube row over the MXU peak
        corr = perturb_floor_ms(x, iters=iters) if perturbed else 0.0
        row = {"shape": [M, N, K], "iters": iters, "reps": args.reps,
               "perturb_corr_ms": round(corr, 4), "tflops": {}, "ratio": {}}
        xla_ms = best["xla"] - corr
        for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
            ms_c = ms - corr
            row["tflops"][name] = round(fl / ms_c / 1e9, 1)
            row["ratio"][name] = round(xla_ms / ms_c, 3)
            print(f"  {sname} {name:>7}: {ms_c:8.3f} ms "
                  f"{row['tflops'][name]:7.1f} GFLOPS/ms "
                  f"ratio {row['ratio'][name]:.3f}", flush=True)
        report_rows.append(row)

    line = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "rows": report_rows}
    with open(args.out, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(f"appended {args.out}")


if __name__ == "__main__":
    main()
