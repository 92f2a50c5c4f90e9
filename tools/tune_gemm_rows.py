"""Empirical config tuner for the sub-0.95 gemm_sweep rows (VERDICT r3 #3).

For each target shape, times a menu of (block, swizzle) configs against the
XLA dot bar with the interleaved protocol and prints the winner — the data
that decides how pick_matmul_config's rules change (rules are encoded from
measurements, not modeled; reference analog: hgemm.py's per-shape swizzle
stride table was tuned the same way).

    python tools/tune_gemm_rows.py [--shapes M,N,K ...] [--out TUNE_ROWS.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

sys.path.insert(0, ".")


DEFAULT_SHAPES = [
    (8192, 8192, 1024),   # shallow-K: 0.881 in PERF_SWEEP r3
    (4096, 14336, 4096),  # Llama MLP: 0.935
    (8192, 1024, 8192),   # skinny-N control (was 1.0+)
    (8192, 8192, 8192),   # flagship control: does lower-traffic 4096x2048
                          # beat the proven (2048,2048,512) here too?
]


def candidates(M, N, K, isz=2):
    """Config menu: the current pick + traffic-minimizing and K-resident
    variants. Filtered to the ~100MB VMEM budget."""
    from leetcuda_tpu.gemm.matmul import pick_matmul_config

    cur = pick_matmul_config(M, N, K)
    menu = {"current": (tuple(cur["block"]), cur["swizzle_group"])}

    edges = [512, 1024, 1536, 2048, 3072, 4096]
    bks = sorted({min(512, K), min(1024, K), min(2048, K)})
    for bm, bn, bk in itertools.product(edges, edges, bks):
        if bm > M or bn > N:
            continue
        # padding waste cap: don't bother with tiles wasting >12% MACs
        pm = -(-M // bm) * bm
        pn = -(-N // bn) * bn
        if pm * pn > 1.12 * M * N:
            continue
        vmem = 2 * (bm * bk + bk * bn) * isz + bm * bn * 4 + bm * bn * isz
        if vmem > 100 * 1024 * 1024:
            continue
        # traffic heuristic keeps the menu small: only tiles within 1.6x of
        # the minimum re-read traffic among candidates
        menu[f"b{bm}x{bn}x{bk}"] = ((bm, bn, bk), None)

    # prune by re-read traffic to <=8 non-current entries
    def traffic(blk):
        bm, bn, bk = blk
        return (-(-N // bn)) * M * K + (-(-M // bm)) * K * N

    keep = sorted((k for k in menu if k != "current"),
                  key=lambda k: (traffic(menu[k][0]),
                                 -menu[k][0][0] * menu[k][0][1]))[:8]
    out = {"current": menu["current"]}
    for k in keep:
        out[k] = menu[k]
    # swizzled twin of the best-traffic candidate
    blk, _ = out[keep[0]]
    ni, nj = -(-M // blk[0]), -(-N // blk[1])
    if ni >= 2 and nj >= 8:
        out[keep[0] + "_swz4"] = (blk, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=None,
                    help="M,N,K triples; default = the sub-bar r3 rows")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default="TUNE_ROWS.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.gemm.matmul import make_matmul, matmul_ref

    shapes = ([tuple(map(int, s.split(","))) for s in args.shapes]
              if args.shapes else DEFAULT_SHAPES)
    report = {"device": str(jax.devices()[0]),
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"), "rows": []}

    for (M, N, K) in shapes:
        a = jax.random.normal(jax.random.key(0), (M, K),
                              jnp.float32).astype(jnp.bfloat16)
        b = jax.random.normal(jax.random.key(1), (K, N),
                              jnp.float32).astype(jnp.bfloat16)
        fl = 2.0 * M * N * K
        iters = max(10, min(400, int(150e12 / fl)))
        menu = candidates(M, N, K)
        fns = {"xla": jax.jit(matmul_ref)}
        for name, (blk, swz) in menu.items():
            fns[name] = make_matmul(block=blk, swizzle_group=swz)

        best = {k: 0.0 for k in fns}
        for rep in range(args.reps):  # interleaved: drift hits all rows
            for name, fn in fns.items():
                try:
                    r = run_benchmark(fn, a, b, iters=iters, flops=fl)
                    best[name] = max(best[name], r.tflops or 0.0)
                except Exception as e:  # noqa: BLE001 — config may not compile
                    # r4 observed the FIRST pallas compile after the big XLA
                    # jit intermittently failing through the tunnel; retry
                    # once before declaring the config dead
                    if rep == 0 and best.get(name) == 0.0:
                        try:
                            r = run_benchmark(fn, a, b, iters=iters,
                                              flops=fl)
                            best[name] = max(best[name], r.tflops or 0.0)
                            continue
                        except Exception as e2:  # noqa: BLE001
                            e = e2
                    print(f"  {name}: {type(e).__name__}: {str(e)[:180]}",
                          flush=True)
                    best.pop(name, None)
                    fns[name] = None
            fns = {k: v for k, v in fns.items() if v is not None}

        xla = best["xla"]
        # numeric gate: every surviving config must match XLA on-device
        want = fns["xla"](a, b)
        for name in list(fns):
            if name == "xla":
                continue
            d = float(jnp.max(jnp.abs((fns[name](a, b) - want)
                                      .astype(jnp.float32))))
            # scale-aware bar: outputs are O(sqrt(K)) with standard-normal
            # inputs, so an absolute tolerance misreads bf16 accumulation-
            # order noise as failure (r4 first cut dropped healthy bk=512
            # configs at |diff|=0.5 on |ref|~100)
            bar = 1e-2 * float(jnp.max(jnp.abs(want.astype(jnp.float32))))
            if d > bar:
                print(f"  {name}: NUMERIC FAIL max|diff|={d:.3e} "
                      f"(bar {bar:.3e})", flush=True)
                best.pop(name, None)
        del want

        row = {"M": M, "N": N, "K": K, "xla_tflops": round(xla, 1),
               "configs": {}}
        print(f"\n=== {M}x{N}x{K}  (xla {xla:.1f} TFLOPS) ===", flush=True)
        for name in sorted(best, key=lambda k: -best[k]):
            if name == "xla":
                continue
            blk, swz = menu[name]
            row["configs"][name] = {
                "block": list(blk), "swizzle_group": swz,
                "tflops": round(best[name], 1),
                "ratio": round(best[name] / xla, 3)}
            print(f"  {name:>22}: {best[name]:7.1f} TFLOPS  "
                  f"ratio {best[name] / xla:.3f}", flush=True)
        report["rows"].append(row)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
