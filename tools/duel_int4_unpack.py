"""Duel the int4 unpack strategies at the decode weight-stream shape
(VERDICT r3 #2 follow-through): the int4 decode deficit is VPU-unpack-bound
— measured 280 GB/s packed vs int8's 690 GB/s byte stream (r2), which
predicts int4/int8 decode ≈ 0.68 and r4 measured ≈ 0.74 on an idle host.

Rows (interleaved best-of-N, chained-scan timing):
  w8a16            — int8 weight stream (the bar: ~690 GB/s)
  w4a16 bits       — i32-widen bit-op unpack (the r2/r3 shipped path)
  w4a16 floor      — f32 floored-division unpack (fewer VPU passes)
  w4a16 floor f32  — floor unpack + f32 dots (decode-size M: skip bf16 casts)

Each row reports packed-GB/s (bytes actually streamed) and bf16-equivalent
GB/s (what the stream would cost unquantized) — the number to compare to
int8's 690.

    python tools/duel_int4_unpack.py [--m 8] [--k 2048] [--n 5632]
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
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--n", type=int, default=5632)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="INT4_UNPACK_DUEL.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.gemm.quant import (
        make_matmul_w4a16, make_matmul_w8a16, matmul_w4a16_ref,
        quantize_groupwise_int4, quantize_rowwise_int8)

    M, K, N = args.m, args.k, args.n
    w = jax.random.normal(jax.random.key(0), (K, N), jnp.float32) * 0.05
    x = (jax.random.normal(jax.random.key(1), (M, K), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    packed, s4 = quantize_groupwise_int4(w, group=128)
    w8, s8 = quantize_rowwise_int8(w)
    w8 = jnp.asarray(w8)

    rows = {
        "w8a16": (make_matmul_w8a16(), (x, w8, s8), K * N * 1.0),
        "w4a16_bits": (make_matmul_w4a16(), (x, packed, s4), K * N / 2.0),
        "w4a16_floor": (make_matmul_w4a16(unpack="floor"),
                        (x, packed, s4), K * N / 2.0),
        "w4a16_floor_f32": (make_matmul_w4a16(unpack="floor",
                                              compute_dtype=jnp.float32),
                            (x, packed, s4), K * N / 2.0),
    }

    # numeric gate first
    import numpy as np
    want = np.asarray(matmul_w4a16_ref(x, packed, s4), np.float32)
    for name, (fn, a, _) in rows.items():
        got = np.asarray(fn(*a), np.float32)
        ref = want if name.startswith("w4") else np.asarray(
            jnp.dot(x.astype(jnp.float32),
                    w8.astype(jnp.float32) * s8[None, :]), np.float32)
        d = np.abs(got - ref).max()
        bar = 5e-2 + 5e-2 * np.abs(ref).max()
        print(f"{name}: max|diff|={d:.3e} (bar {bar:.3e}) "
              f"{'OK' if d <= bar else 'FAIL'}", flush=True)
        assert d <= bar, name

    best = {k: 1e30 for k in rows}
    for _ in range(args.reps):  # interleaved
        for name, (fn, a, _) in rows.items():
            r = run_benchmark(fn, *a, iters=args.iters)
            best[name] = min(best[name], r.mean_ms)

    report = {"device": str(jax.devices()[0]), "M": M, "K": K, "N": N,
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
              "host_load_1m": round(os.getloadavg()[0], 2), "rows": {}}
    for name, (_, _, nbytes) in rows.items():
        ms = best[name]
        report["rows"][name] = {
            "ms": round(ms, 4),
            "packed_gbps": round(nbytes / ms / 1e6, 1),
            "bf16_equiv_gbps": round(K * N * 2.0 / ms / 1e6, 1)}
        print(f"{name:>16}: {ms:7.4f} ms  {report['rows'][name]['packed_gbps']:6.1f} GB/s packed  "
              f"({report['rows'][name]['bf16_equiv_gbps']:7.1f} bf16-equiv)",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
