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
        # emulation-cost row: the REAL decode kernel on an int8 vs fp8 cache
        # at identical bytes — the cast rides inside the kernel, and the
        # bf16 q input gives the timing harness a perturbable operand. (Two
        # earlier cuts measured a raw `astype` and got TB/s nonsense: int-
        # only inputs defeat the harness's anti-hoisting perturbation, and
        # sub-VMEM arrays go resident in the chained scan.)
        from leetcuda_tpu.bench.harness import run_benchmark
        from leetcuda_tpu.attention.decode import (
            make_decode_attention_quantized)

        B, Hkv, S, D, group = 8, 4, 16384, 128, 8  # K+V = 128 MB/dtype
        q = jnp.asarray(rng.standard_normal((B, Hkv * group, D)) * 0.3,
                        jnp.bfloat16)
        kv = rng.standard_normal((B, Hkv, S, D)).astype("float32")
        sc = jnp.ones((B, Hkv, S), jnp.float32)
        lengths = jnp.full((B,), S, jnp.int32)
        fn = make_decode_attention_quantized(block_k=1024)
        nbytes = 2 * B * Hkv * S * D  # K+V bytes actually streamed
        rows = {}
        for tag, dt in [("int8", jnp.int8), ("fp8_e4m3", jnp.float8_e4m3fn)]:
            cq = jnp.asarray(kv, dt) if dt != jnp.int8 else jnp.asarray(
                kv.clip(-127, 127).round(), jnp.int8)
            r = min(run_benchmark(fn, q, cq, cq, sc, sc, lengths,
                                  iters=50, bytes=nbytes).mean_ms
                    for _ in range(3))
            rows[tag] = {"ms": round(r, 4),
                         "cache_gbps": round(nbytes / r / 1e6, 1)}
        rows["fp8_over_int8_time"] = round(
            rows["fp8_e4m3"]["ms"] / rows["int8"]["ms"], 2)
        report["decode_cache_duel"] = rows
        print("decode cache duel:", rows, flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
