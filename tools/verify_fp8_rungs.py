"""On-chip verification of the fp8 rungs (VERDICT r2 #5): drive the
quantized-cache decode rungs and the e4m3 weight-dequant GEMM through Mosaic
on the real TPU against their dequantized oracles, then time the fp8 vs int8
cast cost at identical bytes (the emulation caveat, measured not asserted).

    python tools/verify_fp8_rungs.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip timing rows")
    ap.add_argument("--out", default="FP8_VERIFY.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import leetcuda_tpu.attention.decode  # noqa: F401 (registers rungs)
    import leetcuda_tpu.gemm.quant  # noqa: F401
    from leetcuda_tpu.core.registry import OPS
    from leetcuda_tpu.core.testing import make_args

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    report = {"device": str(jax.devices()[0]),
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"), "rungs": {}}

    for name in ["decode_attn_int8kv", "decode_attn_fp8kv",
                 "hgemm_w8a16_dequant_fp8", "hgemm_w8a16_dequant"]:
        spec = OPS[name]
        a = make_args(spec, rng)
        got = jax.block_until_ready(spec.fn(*a))
        want = spec.ref(*a)
        d = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
        ok = d <= spec.atol + spec.rtol * scale
        print(f"{name}: max|diff|={d:.4e} (atol {spec.atol}, ref max "
              f"{scale:.2f}) -> {'OK' if ok else 'FAIL'}", flush=True)
        report["rungs"][name] = {"max_diff": round(d, 6), "ok": bool(ok)}
        assert ok, name

    if not args.quick:
        # emulation-cost row: cast fp8->bf16 vs int8->bf16 at identical bytes.
        # Operands must exceed VMEM (128 MB) or the chained timing scan holds
        # them resident and the row reads pure dispatch (the r4 first cut
        # measured a nonsense 2.5e9 "GB/s" from a 16 MB resident array).
        from leetcuda_tpu.bench.harness import run_benchmark
        n = 16384  # 256 MB at 1 byte/elem: HBM-streaming regime
        xi8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
        xf8 = jnp.asarray(rng.standard_normal((n, n)),
                          jnp.float8_e4m3fn)
        cast = jax.jit(lambda x: x.astype(jnp.bfloat16) * 2.0)
        nb = n * n * 3.0  # 1 byte read + 2 written
        r8 = run_benchmark(cast, xi8, iters=20, bytes=nb)
        rf = run_benchmark(cast, xf8, iters=20, bytes=nb)
        report["cast_gbps"] = {"int8_to_bf16": round(r8.gbps or 0, 1),
                               "fp8_e4m3_to_bf16": round(rf.gbps or 0, 1),
                               "fp8_slowdown_x": round(
                                   rf.mean_ms / r8.mean_ms, 2)}
        print("cast:", report["cast_gbps"], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
