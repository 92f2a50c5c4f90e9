"""Publish the GEMM parity curve — the reference's full-sweep evidence
(/root/reference/kernels/hgemm/hgemm.py:440-1110 sweeps MNK 256->12800+ with
per-size cuBLAS rows; README.md:157-186 claims parity across the curve, not at
two points). VERDICT r2 #2.

Each row duels the shape-adaptively configured Pallas matmul
(gemm.matmul.pick_matmul_config) against XLA dot with the interleaved
best-of-5 protocol (within-run alternation; spread quantifies tunnel drift).
Square sizes whose working set fits v5e's 128 MB VMEM are additionally timed
with the *resident* protocol (chained two-length probe vs lax.scan of dots) —
the regime XLA actually reaches in a chained timing loop at those sizes; the
streaming duel there carries a regime note instead of a parity claim.

    python tools/gemm_sweep.py --out PERF_SWEEP.json [--quick] [--plot]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")


SQUARE = [1024, 2048, 3072, 4096, 6144, 8192, 12288, 16384]
NONSQUARE = [
    (8192, 1024, 8192),   # skinny-N (large-batch MLP down-proj shape class)
    (1024, 8192, 8192),   # skinny-M (decode-batch up-proj)
    (8192, 8192, 1024),   # shallow-K (attention-output class)
    (4096, 14336, 4096),  # Llama-70B MLP aspect, non-pow2 N
]


def stats(xs):
    xs = sorted(xs)
    return {"best": round(xs[-1], 1), "median": round(xs[len(xs) // 2], 1),
            "spread_pct": round(100 * (xs[-1] - xs[0]) / max(xs[-1], 1e-9), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PERF_SWEEP.json")
    ap.add_argument("--quick", action="store_true",
                    help="3 square + 1 non-square rows, 3 reps")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.gemm.matmul import (
        pick_matmul_config, make_matmul, make_matmul_resident,
        matmul_chain_ref, matmul_ref)

    squares = args.sizes or (SQUARE[:3] if args.quick else SQUARE)
    nonsq = [] if args.sizes else (NONSQUARE[:1] if args.quick else NONSQUARE)
    reps = 3 if args.quick else 5
    dtype = jnp.bfloat16
    rows = []

    def operands(M, N, K):
        a = jax.random.normal(jax.random.key(0), (M, K),
                              jnp.float32).astype(dtype)
        b = jax.random.normal(jax.random.key(1), (K, N),
                              jnp.float32).astype(dtype)
        return a, b

    def stream_duel(M, N, K):
        cfg = pick_matmul_config(M, N, K, dtype)
        pal = make_matmul(**cfg)
        xla = jax.jit(matmul_ref)
        a, b = operands(M, N, K)
        fl = 2.0 * M * N * K
        iters = max(10, min(800, int(150e12 / fl)))
        tp, tx = [], []
        for _ in range(reps):  # interleaved
            tp.append(run_benchmark(pal, a, b, iters=iters, flops=fl).tflops)
            tx.append(run_benchmark(xla, a, b, iters=iters, flops=fl).tflops)
        return cfg, tp, tx

    def resident_duel(n):
        """Two-length chained probe: per-dot = (t_hi - t_lo)/(hi - lo)."""
        a, b = operands(n, n, n)
        a = (a.astype(jnp.float32) / (n ** 0.5)).astype(dtype)
        per_dot_est = 2 * n ** 3 / 150e12
        LO = 16
        HI = LO + max(32, min(4096, int(0.25 / per_dot_est)))
        bm = min(1024, n)

        def mkprobe(fn):
            g = jax.jit(
                lambda a, b: jnp.sum(fn(a, b)[:1, :8].astype(jnp.float32)))
            float(g(a, b))
            return g

        probes = {
            "xla_lo": mkprobe(functools.partial(matmul_chain_ref, reps=LO)),
            "xla_hi": mkprobe(functools.partial(matmul_chain_ref, reps=HI)),
            "pal_lo": mkprobe(make_matmul_resident(reps=LO, block_m=bm)),
            "pal_hi": mkprobe(make_matmul_resident(reps=HI, block_m=bm)),
        }
        best = {k: 1e30 for k in probes}
        for _ in range(reps):
            for k, g in probes.items():
                t0 = time.perf_counter()
                float(g(a, b))
                best[k] = min(best[k], time.perf_counter() - t0)
        per_x = (best["xla_hi"] - best["xla_lo"]) / (HI - LO)
        per_p = (best["pal_hi"] - best["pal_lo"]) / (HI - LO)
        return (round(2 * n ** 3 / per_p / 1e12, 1),
                round(2 * n ** 3 / per_x / 1e12, 1),
                round(per_x / per_p, 3))

    VMEM = 128 * 1024 * 1024

    for n in squares:
        resident = 3 * n * n * jnp.dtype(dtype).itemsize <= VMEM
        cfg, tp, tx = stream_duel(n, n, n)
        row = {"M": n, "N": n, "K": n,
               "config": {"block": list(cfg["block"]),
                          "swizzle_group": cfg["swizzle_group"]},
               "stream": {"pallas": stats(tp), "xla": stats(tx),
                          "ratio": round(max(tp) / max(tx), 3)}}
        if resident:
            p, x, r = resident_duel(n)
            row["resident"] = {"pallas_tflops": p, "xla_tflops": x,
                               "ratio": r}
            if r < 0.95:
                row["resident"]["note"] = (
                    "resident chain below bar at this size: the chunked "
                    "kernel pays one (block_m,K) scratch fill + drain per "
                    "chunk, a fixed cost that shrinks relative to reps*K "
                    "work as n grows — the tuned flagship point is 4096^3 "
                    "(0.998, RESIDENT_ABLATE.json)")
            row["stream"]["note"] = (
                "working set fits VMEM: XLA holds operands resident in the "
                "chained loop while pallas streams HBM per call — parity "
                "claim for this size is the resident row")
        row["ratio"] = row.get("resident", row["stream"])["ratio"]
        rows.append(row)
        print(json.dumps(row), flush=True)

    for (M, N, K) in nonsq:
        cfg, tp, tx = stream_duel(M, N, K)
        row = {"M": M, "N": N, "K": K,
               "config": {"block": list(cfg["block"]),
                          "swizzle_group": cfg["swizzle_group"]},
               "stream": {"pallas": stats(tp), "xla": stats(tx),
                          "ratio": round(max(tp) / max(tx), 3)},
               "ratio": round(max(tp) / max(tx), 3)}
        if (M, N, K) == (4096, 14336, 4096) and row["ratio"] < 0.95:
            row["note"] = (
                "known plateau (TUNE_ROWS2.json): 0.935-0.938 across the "
                "whole 9-config tile family incl. traffic-optimal bm=M — "
                "residual is Mosaic kernel-internal, not tiling")
        rows.append(row)
        print(json.dumps(row), flush=True)

    import jax as _j
    out = {"device": str(_j.devices()[0]),
           "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
           "protocol": ("interleaved best-of-%d chained-scan duels; "
                        "resident rows use the two-length probe" % reps),
           "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: {len(rows)} rows, "
          f"min ratio {min(r['ratio'] for r in rows)}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        sq = [r for r in rows if r["M"] == r["N"] == r["K"]]
        xs = [r["M"] for r in sq]
        pal = [r.get("resident", {}).get("pallas_tflops") or
               r["stream"]["pallas"]["best"] for r in sq]
        xla = [r.get("resident", {}).get("xla_tflops") or
               r["stream"]["xla"]["best"] for r in sq]
        fig, ax = plt.subplots(figsize=(9, 5))
        ax.plot(xs, pal, "-o", label="pallas (auto-config)")
        ax.plot(xs, xla, "--o", label="XLA dot")
        ax.set_xscale("log", base=2)
        ax.set_xticks(xs, [str(x) for x in xs])
        ax.set_xlabel("M = N = K (bf16)")
        ax.set_ylabel("TFLOPS")
        ax.set_title("GEMM sweep, TPU v5e (resident protocol where "
                     "working set fits VMEM)")
        ax.grid(alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig("docs/gemm_sweep.png", dpi=120)
        print("plot -> docs/gemm_sweep.png")


if __name__ == "__main__":
    main()
