"""Publish the VPU-corpus ladder ON CHIP (VERDICT r3 #9): per-rung measured
time + bandwidth for the elementwise / activation / reduce / softmax /
layer-norm / rms-norm (+ transpose / dot-product / rope) ladders, each duel
against its jitted XLA oracle on identical operands.

This is the analog of the reference's per-op harness output (every op dir
prints measured ms vs the torch baseline; kernels/elementwise/
elementwise.py:28-67, nvidia-nsight/README.md:33-39) — the last parity
surface that had correctness oracles but no committed numbers.

Shapes are sized for the HBM-streaming regime: each operand >= 128 MB so a
chained timing scan cannot go VMEM-resident (bench gotcha: <=64 MB arrays
show fake >1 TB/s). Bandwidth = (input+output bytes) / time; the v5e roof
is ~819 GB/s.

    python tools/vpu_ladder.py [--families activation ...] [--quick]
        [--out VPU_LADDER.json]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import importlib
import json
import time

FAMILIES = ["elementwise", "activation", "reduce", "softmax", "layer-norm",
            "rms-norm", "transpose", "dot-product", "rope"]

MODULES = ["ops.elementwise", "ops.activations", "ops.reduce", "ops.softmax",
           "ops.layer_norm", "ops.rms_norm", "ops.rope", "ops.transpose",
           "ops.dot_product"]


_ARG_CACHE: dict = {}


def _dev_randn(shape, dtype, scale=1.0, lo=None, hi=None):
    """Operands are generated ON DEVICE and cached by (shape, dtype, scale):
    host-side numpy + a 256 MB host->device push per rung crawls through the
    axon tunnel (the r4 first attempt sat at 5% CPU for 10 min on rung 1)."""
    import jax
    import jax.numpy as jnp

    k = (shape, jnp.dtype(dtype).name, scale, lo, hi)
    if k not in _ARG_CACHE:
        key = jax.random.PRNGKey(len(_ARG_CACHE))
        if lo is not None:
            x = jax.random.randint(key, shape, lo, hi, jnp.int32)
        else:
            x = jax.random.normal(key, shape, jnp.float32) * scale
        _ARG_CACHE[k] = jax.block_until_ready(x.astype(dtype))
    return _ARG_CACHE[k]


def bench_args(spec, rng, quick=False):
    """Large-shape operands per family (make_args' tiny shapes measure
    dispatch, not bandwidth). Dtype rules mirror core/testing.make_args."""
    import jax.numpy as jnp

    tags = set(spec.tags)
    fam = spec.family
    dt = jnp.float32
    if "f16" in tags or any(t.startswith("f16") for t in tags):
        dt = jnp.float16
    if "bf16" in tags or any(t.startswith("bf16") for t in tags):
        dt = jnp.bfloat16

    def randn(shape, dtype=dt, scale=1.0):
        return _dev_randn(shape, dtype, scale)

    K = 8192
    div = 2 if quick else 1

    def rows(dtype):  # keep every operand >= 128 MB (64 MB on --quick)
        isz = jnp.dtype(dtype).itemsize
        return 8192 * max(1, 4 // isz) // div

    if fam == "elementwise":
        return (randn((rows(dt), K)), randn((rows(dt), K)))
    if fam == "activation":
        return (randn((rows(dt), K)),)
    if fam == "reduce":
        suffix = spec.name.replace("block_all_reduce_sum_", "")
        edt = {"f32_f32": jnp.float32, "f32x4_f32": jnp.float32,
               "f16_f16": jnp.float16, "f16_f32": jnp.float16,
               "bf16_bf16": jnp.bfloat16, "bf16_f32": jnp.bfloat16,
               "i8_i32": jnp.int8}.get(suffix)
        if edt is None:
            edt = jnp.float8_e4m3fn if "e4m3" in suffix else jnp.float8_e5m2
        if edt == jnp.int8:
            return (_dev_randn((rows(edt), K), jnp.int8, lo=-8, hi=8),)
        return (_dev_randn((rows(edt), K), edt, 0.1),)
    if fam == "softmax":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((4 * rows(d), 2048), d),)
    if fam == "layer-norm":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((2 * rows(d), 4096), d), randn((4096,), d, 0.5),
                randn((4096,), d, 0.5))
    if fam == "rms-norm":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((2 * rows(d), 4096), d), randn((4096,), d, 0.5))
    if fam == "transpose":
        return (randn((8192 // div, 8192), jnp.float32),)
    if fam == "dot-product":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((rows(d), K), d, 0.1), randn((rows(d), K), d, 0.1))
    if fam == "rope":
        # 128-lane pairs layout; 256k rows = 128 MB f32
        return (randn((262144 // div, 128), jnp.float32),)
    return None


def io_bytes(fn, args):
    import jax

    out = jax.eval_shape(fn, *args)
    n = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(out))
    n += sum(x.size * x.dtype.itemsize for x in args)
    return float(n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="halve shapes + reps (still HBM-regime at bf16)")
    ap.add_argument("--out", default="VPU_LADDER.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    for m in MODULES:
        importlib.import_module(f"leetcuda_tpu.{m}")
    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.core.registry import OPS

    fams = args.families or FAMILIES
    rng = np.random.default_rng(0)
    reps = 2 if args.quick else 3
    report = {"device": str(jax.devices()[0]),
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
              "hbm_roof_gbps": 819.0, "rungs": {}, "families": {}}

    names = [n for n in sorted(OPS) if OPS[n].family in fams]
    print(f"{len(names)} rungs across {fams}", flush=True)
    for name in names:
        spec = OPS[name]
        try:
            a = bench_args(spec, rng, quick=args.quick)
            if a is None:
                continue
            nbytes = io_bytes(spec.fn, a)
            # >=20 scan steps: at 5 the rpc-floor subtraction noise rivals
            # the measurement (an XLA reduce row read over the HBM roof)
            iters = max(20, min(100, int(3e9 * (1 if args.quick else 2)
                                         / nbytes)))
            best_p = best_x = 1e30
            ref = jax.jit(spec.ref)
            for _ in range(reps):  # interleaved: same tunnel state
                rp = run_benchmark(spec.fn, *a, iters=iters, bytes=nbytes,
                                   head=False)
                rx = run_benchmark(ref, *a, iters=iters, bytes=nbytes,
                                   head=False)
                best_p = min(best_p, rp.mean_ms)
                best_x = min(best_x, rx.mean_ms)
            row = {"family": spec.family,
                   "ms": round(best_p, 4), "xla_ms": round(best_x, 4),
                   "gbps": round(nbytes / best_p / 1e6, 1),
                   "xla_gbps": round(nbytes / best_x / 1e6, 1),
                   "ratio_vs_xla": round(best_x / best_p, 3),
                   "pct_hbm_roof": round(nbytes / best_p / 1e6 / 8.19, 1)}
            report["rungs"][name] = row
            print(f"  {name:>44}: {row['ms']:8.3f} ms  {row['gbps']:7.1f} "
                  f"GB/s ({row['pct_hbm_roof']:5.1f}% roof)  vs XLA "
                  f"{row['ratio_vs_xla']:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            report["rungs"][name] = {"family": spec.family,
                                     "error": f"{type(e).__name__}: "
                                              f"{str(e)[:120]}"}
            print(f"  {name:>44}: ERROR {type(e).__name__}", flush=True)
        if len(report["rungs"]) % 10 == 0:  # survive a stage timeout
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)

    for fam in fams:
        rows = [r for r in report["rungs"].values()
                if r["family"] == fam and "ratio_vs_xla" in r]
        errs = [1 for r in report["rungs"].values()
                if r["family"] == fam and "error" in r]
        if rows:
            ratios = sorted(r["ratio_vs_xla"] for r in rows)
            report["families"][fam] = {
                "rungs": len(rows), "errors": len(errs),
                "median_ratio_vs_xla": ratios[len(ratios) // 2],
                "worst_ratio_vs_xla": ratios[0],
                "best_gbps": max(r["gbps"] for r in rows)}
    print(json.dumps(report["families"], indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    bad = sum(1 for r in report["rungs"].values() if "error" in r)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
