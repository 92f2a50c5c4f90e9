"""Measure the fp8 north-star decode config end-to-end (VERDICT r3 #1 tail):
fp8-weight + fp8-KV Llama decode tok/s in paired draws against the int8 row.

Context: BASELINE.json names fp8 weight-only + fp8 KV as a north-star config
(the reference's fp8 rungs: kernels/hgemm fp8 paths, block_all_reduce fp8
reductions). v5e fp8 (e4m3) has no hardware cast; r4 measured the software-
emulated Mosaic cast at 0.166x the int8 row. r5 replaced that cast with
integer bit surgery (core.runtime.e4m3_bits_to_f32) in the weight matmul
and the quantized-KV decode kernel, so the EXPECTED result is now parity
with int8 (identical bytes moved). On native-fp8 chips the same config
gains the cast-free MXU path too.

Protocol = tools/diagnose_int4.py: interleaved paired draws so tunnel drift
cancels in the per-draw ratio; two-point token-count measurement inside each
draw so prefill/compile constants cancel; idle-host guard (1-CPU host).

    python tools/measure_fp8_decode.py [--draws 5] [--out FP8_DECODE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=5)
    ap.add_argument("--out", default="FP8_DECODE.json")
    args = ap.parse_args()

    import jax

    from leetcuda_tpu.bench.decode_bench import bench_one
    from leetcuda_tpu.models.llama import (
        ModelConfig, init_params, quantize_params, fuse_params)

    cfg = ModelConfig()  # flagship 0.8B config, same as bench_all/diagnose_int4
    params = fuse_params(init_params(jax.random.key(0), cfg))
    q8 = quantize_params(params, dtype="int8")
    qf8 = quantize_params(params, dtype="fp8")
    del params

    report = {"device": str(jax.devices()[0]),
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
              "draws": args.draws, "sections": {},
              "host_load_1m": round(os.getloadavg()[0], 2),
              "host_cpus": os.cpu_count()}
    if report["host_load_1m"] > 1.5:
        print(f"WARNING: host load {report['host_load_1m']} — rerun idle",
              flush=True)

    for S in [128]:
        rows = {"fp8": [], "int8": []}
        sols = {"fp8": [], "int8": []}
        for d in range(args.draws):
            for k, qp, kvq in [("fp8", qf8, "fp8"), ("int8", q8, "int8")]:
                t, sf = bench_one(f"{k} S={S} draw{d}", qp, cfg, 8, S, 96,
                                  kvq, reps=1, return_sol=True)
                rows[k].append(round(t, 1))
                sols[k].append(round(sf, 3))

        # exclude physically-impossible pairs (>105% of HBM speed-of-light:
        # a tunnel stall collapsed the two-point difference)
        valid = [i for i in range(args.draws)
                 if sols["fp8"][i] <= 1.05 and sols["int8"][i] <= 1.05]
        sec = {"sol_frac": sols,
               "invalid_pairs": [i for i in range(args.draws)
                                 if i not in valid]}
        for k, xs in rows.items():
            s = sorted(xs[i] for i in valid)
            sec[k] = {"draws": xs}
            if s:  # medians only over VALID pairs — never the broken draws
                sec[k].update(
                    spread_pct=round(100 * (s[-1] - s[0]) / s[-1], 1),
                    median=s[len(s) // 2])
        ratios = [round(rows["fp8"][i] / rows["int8"][i], 3) for i in valid]
        sec["fp8_over_int8_per_draw"] = ratios
        sec["ratio_median"] = (sorted(ratios)[len(ratios) // 2]
                               if ratios else None)
        report["sections"][f"S{S}"] = sec
        print(f"S={S}: {json.dumps(sec)}", flush=True)

    r = report["sections"]["S128"]["ratio_median"]
    ratios = report["sections"]["S128"]["fp8_over_int8_per_draw"]
    noisy = (len(ratios) >= 2
             and (max(ratios) - min(ratios)) / max(ratios) > 0.5)
    if r is None:
        report["verdict"] = (
            "NO VALID DRAWS: every pair exceeded the SOL validity bound — "
            "the session was too turbulent to measure; rerun on a quiet "
            "tunnel")
    elif noisy:
        # paired ratios spanning >50% carry no information even after SOL
        # filtering (sub-SOL stalls inflate single arms): refuse a headline
        report["verdict"] = (
            f"SESSION TOO NOISY for a headline: valid paired ratios span "
            f"{min(ratios)}-{max(ratios)} (median {r}); prior quiet-session "
            "medians (1.006/0.817/0.880) remain the citable numbers")
    else:
        report["verdict"] = (
            f"fp8-weight+fp8-KV decode = {r}x the int8 row on v5e "
            f"(r5: e4m3 now decodes by integer bit surgery — "
            "core.runtime.e4m3_bits_to_f32 — instead of the software-emulated "
            "cast that made r4's row 0.166x; at identical bytes moved, parity "
            "with int8 is the expected ceiling on cast-free hardware)")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("verdict:", report["verdict"])


if __name__ == "__main__":
    main()
