"""Export a jitted op as StableHLO + manifest for the C++ PJRT bench runner.

Counterpart of native/pjrt_bench.cc — together they are the TPU analog of the
reference's standalone C++ benchmark bins (/root/reference/kernels/hgemm/
makefile:10-17 + utils/utils.h perf_gemm): compile once from Python (where the
Pallas kernel and its Mosaic payload are lowered), then drive the executable
from pure C++ over the PJRT C API.

Usage:
    python tools/export_stablehlo.py --op hgemm --m 4096 --n 4096 --k 4096 \
        --out /tmp/hgemm
    ./native/pjrt_bench /opt/axon/libaxon_pjrt.so /tmp/hgemm.mlir \
        /tmp/hgemm.manifest 50
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_DTYPE_NAMES = {
    jnp.dtype(jnp.float32): "f32",
    jnp.dtype(jnp.bfloat16): "bf16",
    jnp.dtype(jnp.float16): "f16",
    jnp.dtype(jnp.int32): "s32",
    jnp.dtype(jnp.int8): "s8",
}


def export(fn, args, out_prefix: str, flops: float | None = None):
    """Lower jit(fn)(*args) to StableHLO text + write the runner manifest."""
    lowered = jax.jit(fn).lower(*args)
    mlir_path = f"{out_prefix}.mlir"
    with open(mlir_path, "w") as f:
        f.write(lowered.as_text())

    manifest_path = f"{out_prefix}.manifest"
    out0 = jax.tree_util.tree_leaves(jax.eval_shape(fn, *args))[0]
    chain_idx = next(
        (i for i, a in enumerate(args)
         if tuple(a.shape) == tuple(out0.shape) and a.dtype == out0.dtype),
        None)
    with open(manifest_path, "w") as f:
        for a in args:
            shape = "x".join(str(d) for d in a.shape)
            f.write(f"arg {_DTYPE_NAMES[jnp.dtype(a.dtype)]} {shape}\n")
        if flops:
            f.write(f"flops {flops}\n")
        if chain_idx is not None:
            # runner feeds output 0 back into this arg each iteration,
            # serializing executions (the chained-scan timing methodology)
            f.write(f"chain {chain_idx}\n")
        copts = _compile_options_bytes()
        if copts is not None:
            copts_path = f"{out_prefix}.copts.pb"
            with open(copts_path, "wb") as cf:
                cf.write(copts)
            f.write(f"copts {copts_path}\n")
    return mlir_path, manifest_path


def _compile_options_bytes():
    try:
        from jax._src.lib import xla_client

        return xla_client.CompileOptions().SerializeAsString()
    except Exception:
        return None


def scanned(fn, chain_idx: int, length: int):
    """Wrap fn in a lax.scan chaining output->args[chain_idx] — the python
    harness's timing loop baked into the exported module, so one PJRT execute
    covers `length` iterations (essential through the axon relay, where each
    execute RPC costs ~10 ms)."""
    import jax.numpy as jnp  # noqa: F811

    def wrapped(*args):
        def body(carry, _):
            new_args = list(args)
            new_args[chain_idx] = carry
            return fn(*new_args), None

        out, _ = jax.lax.scan(body, args[chain_idx], None, length=length)
        return out

    return wrapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="hgemm",
                    choices=["hgemm", "sgemm", "xla_dot", "flash_attn"])
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--scan", type=int, default=0,
                    help="bake an N-iteration chained timing loop into the "
                         "module (recommended through the axon relay)")
    ap.add_argument("--oracle", action="store_true",
                    help="also export {out}_oracle.mlir — the XLA reference "
                         "with the same signature, for pjrt_bench --check")
    ap.add_argument("--inject-bug", action="store_true",
                    help="scale the op's output by 1.05 (proves --check "
                         "fails on a real numerics bug; 5%% is ~13 bf16 ulps "
                         "— anything much smaller drowns in output rounding)")
    ap.add_argument("--out", default="/tmp/pjrt_bench_export")
    args = ap.parse_args()

    def maybe_buggy(fn):
        if not args.inject_bug:
            return fn
        return lambda *a: fn(*a) * 1.05

    M, N, K = args.m, args.n, args.k
    if args.op in ("hgemm", "sgemm", "xla_dot"):
        from leetcuda_tpu.gemm.matmul import hgemm, sgemm, matmul_ref

        dt = jnp.float32 if args.op == "sgemm" else jnp.bfloat16
        fn = maybe_buggy({"hgemm": hgemm, "sgemm": sgemm,
                          "xla_dot": jax.jit(matmul_ref)}[args.op])
        oracle_fn = jax.jit(matmul_ref)
        a = jnp.zeros((M, K), dt)
        b = jnp.zeros((K, N), dt)
        flops = 2.0 * M * N * K
        if args.scan:
            assert M == N == K, "--scan chaining needs square GEMM"
            fn = scanned(fn, 0, args.scan)
            flops *= args.scan
        paths = export(fn, (a, b), args.out, flops=flops)
        if args.oracle:
            paths += export(oracle_fn, (a, b), f"{args.out}_oracle")
    else:
        from leetcuda_tpu.attention.flash import (
            make_flash_attention, flash_attention_ref)

        B, H, S, D = 1, 8, args.n, 128
        fa = maybe_buggy(make_flash_attention(causal=True))
        q = jnp.zeros((B, H, S, D), jnp.bfloat16)
        flops = 2.0 * 2 * B * H * S * S * D / 2  # causal half
        fn = fa
        if args.scan:
            fn = scanned(fa, 0, args.scan)  # chain out -> q
            flops *= args.scan
        paths = export(fn, (q, q, q), args.out, flops=flops)
        if args.oracle:
            import functools
            paths += export(jax.jit(functools.partial(flash_attention_ref,
                                                      causal=True)),
                            (q, q, q), f"{args.out}_oracle")

    print("wrote", *paths)


if __name__ == "__main__":
    main()
