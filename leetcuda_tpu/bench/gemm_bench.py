"""GEMM benchmark CLI — analog of the reference's hgemm.py
(/root/reference/kernels/hgemm/hgemm.py:19-178 flags; :440-1110 sweep loop;
:364-419 TFLOPS plots with top-k filtering; :282-304 best-so-far "+x%").

    python -m leetcuda_tpu.bench.gemm_bench --mnk 1024 2048 4096 --plot
    python -m leetcuda_tpu.bench.gemm_bench --sweep 1024 8192 1024 --variants hgemm_mma_stages_block_swizzle
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.bench.harness import Session, run_benchmark
from leetcuda_tpu.bench.report import markdown_table
from leetcuda_tpu.core.registry import OPS
from leetcuda_tpu.utils.roofline import roofline
import leetcuda_tpu.gemm.matmul  # noqa: F401  (registers the variants)
from leetcuda_tpu.gemm.matmul import matmul_ref, matmul_tn_ref


class Pool:
    """Pre-allocated max-size operand pool, sliced per shape — the
    reference's buffer hygiene (hgemm.py:440-452: allocate MAX once, slice
    per MNK, so the sweep never reallocates device memory). ``fill``
    supports the structured-input debug modes (flash_attn_mma.py
    --no-rand-q / --range-k analogs): rand | ones | ramp."""

    def __init__(self, max_m, max_n, max_k, dtype, fill="rand", seed=0):
        ka, kb = jax.random.split(jax.random.key(seed))
        if fill == "rand":
            self.a = jax.random.normal(ka, (max_m, max_k),
                                       jnp.float32).astype(dtype)
            self.b = jax.random.normal(kb, (max_k, max_n),
                                       jnp.float32).astype(dtype)
        elif fill == "ones":
            self.a = jnp.ones((max_m, max_k), dtype)
            self.b = jnp.ones((max_k, max_n), dtype)
        else:  # ramp: row-major position / size, the --range-k analog
            self.a = (jnp.arange(max_m * max_k, dtype=jnp.float32)
                      .reshape(max_m, max_k) / (max_m * max_k)).astype(dtype)
            self.b = (jnp.arange(max_k * max_n, dtype=jnp.float32)
                      .reshape(max_k, max_n) / (max_k * max_n)).astype(dtype)
        self._slice = jax.jit(
            lambda x, m, n: x[:m, :n], static_argnums=(1, 2))

    def get(self, M, N, K):
        return self._slice(self.a, M, K), self._slice(self.b, K, N)


def _spread(tflops_list):
    xs = sorted(t for t in tflops_list if t)
    if not xs:
        return ""
    spread = 100.0 * (xs[-1] - xs[0]) / xs[-1] if len(xs) > 1 else 0.0
    return (f" median {xs[len(xs) // 2]:.1f} best {xs[-1]:.1f} "
            f"spread {spread:.1f}%")


def bench_size(M, N, K, variants, dtype, iters, session, check=False,
               pool=None, repeats=1):
    if pool is None:
        pool = Pool(M, N, K, dtype)
    a, b_nn = pool.get(M, N, K)
    b_tn = b_nn.T.copy()
    flops = 2.0 * M * N * K
    byts = (M * K + K * N + M * N) * jnp.dtype(dtype).itemsize

    results = []
    for name in variants:
        if name == "auto":
            # shape-adaptive config (pick_matmul_config — the hgemm.py
            # auto-select analog); tag carries the chosen block for the log.
            # _auto_fn is the production matmul_auto path, lru-cached.
            from leetcuda_tpu.gemm.matmul import pick_matmul_config, _auto_fn
            acfg = pick_matmul_config(M, N, K, dtype)
            fn = _auto_fn(M, N, K, jnp.dtype(dtype).name, "nn")
            tn, atol, rtol = False, 2e-2, 2e-2
            disp = (f"auto{acfg['block']}"
                    + (f"/swz{acfg['swizzle_group']}"
                       if acfg["swizzle_group"] else ""))
        else:
            spec = OPS[name]
            fn, tn = spec.fn, "tn" in spec.tags
            atol, rtol, disp = spec.atol, spec.rtol, name
        b = b_tn if tn else b_nn
        reps = [run_benchmark(fn, a, b,
                              tag=f"{disp} {M}x{N}x{K}", iters=iters,
                              flops=flops, bytes=byts,
                              session=session if i == 0 else None)
                for i in range(repeats)]
        if repeats > 1:
            print(f"    {disp}:{_spread([r.tflops for r in reps])}")
        results.append(max(reps, key=lambda r: r.tflops or 0))
        if check:
            ref = (matmul_tn_ref if tn else matmul_ref)(a, b)
            err = float(jnp.max(jnp.abs(
                (fn(a, b) - ref).astype(jnp.float32))))
            print(f"  {disp}: max|diff| vs XLA = {err:.5f} "
                  f"(atol {atol})")
            assert err <= atol + rtol * float(
                jnp.max(jnp.abs(ref.astype(jnp.float32)))), name
    xla_ref = matmul_ref if not all(
        v != "auto" and "tn" in OPS[v].tags for v in variants) \
        else matmul_tn_ref
    xla_jit = jax.jit(xla_ref)  # hoisted: keep one fn identity across
    # repeats so the harness's timed-scan cache hits (fn-identity-keyed)
    reps = [run_benchmark(xla_jit, a,
                          b_nn if xla_ref is matmul_ref else b_tn,
                          tag=f"xla_dot {M}x{N}x{K}", iters=iters,
                          flops=flops, bytes=byts,
                          session=session if i == 0 else None)
            for i in range(repeats)]
    if repeats > 1:
        print(f"    xla_dot:{_spread([r.tflops for r in reps])}")
    results.append(max(reps, key=lambda r: r.tflops or 0))
    best = max((x for x in results if x.tflops), key=lambda x: x.tflops)
    print(" ", roofline(flops, byts, best.mean_ms / 1e3,
                        compute_dtype=dtype))
    return results


def plot(all_results, path, topk):
    import collections
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = collections.defaultdict(list)  # variant -> [(mnk, tflops)]
    for mnk, results in all_results:
        for r in results:
            name = r.tag.rsplit(" ", 1)[0]
            if r.tflops:
                series[name].append((mnk, r.tflops))
    ranked = sorted(series.items(),
                    key=lambda kv: -max(t for _, t in kv[1]))
    fig, ax = plt.subplots(figsize=(10, 6))
    for name, pts in ranked[:topk]:
        xs, ys = zip(*sorted(pts))
        style = "--" if name.startswith("xla") else "-"
        ax.plot(xs, ys, style, marker="o", label=name)
    ax.set_xlabel("M=N=K")
    ax.set_ylabel("TFLOPS")
    ax.set_title(f"GEMM sweep ({jax.devices()[0].device_kind})")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    print(f"plot -> {path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mnk", type=int, nargs="*", default=None,
                    help="square sizes to run (default: 2048 4096 8192)")
    ap.add_argument("--m", type=int, nargs="*", default=None,
                    help="non-square: M values (zipped with --n/--k; a "
                         "single value broadcasts — hgemm.py --M analog)")
    ap.add_argument("--n", type=int, nargs="*", default=None)
    ap.add_argument("--k", type=int, nargs="*", default=None)
    ap.add_argument("--sweep", type=int, nargs=3, metavar=("LO", "HI", "STEP"),
                    help="sweep M=N=K over a range (reference-style)")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="registered gemm op names, or 'auto' for the shape-adaptive config (default: bf16 ladder)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=1,
                    help="timing repeats per variant; >1 reports "
                         "median/best/spread (variance protocol)")
    ap.add_argument("--fill", choices=("rand", "ones", "ramp"),
                    default="rand",
                    help="structured inputs for debugging (--no-rand/"
                         "--range-k analogs)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-prealloc", action="store_true",
                    help="allocate per size instead of slicing one "
                         "max-size pool")
    ap.add_argument("--check", action="store_true",
                    help="verify numerics vs XLA per size")
    ap.add_argument("--plot", nargs="?", const="/tmp/gemm_tflops.png",
                    default=None, help="save a TFLOPS curve PNG")
    ap.add_argument("--topk", type=int, default=8)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    if args.m or args.n or args.k:
        ms, ns, ks = (args.m or [4096]), (args.n or [4096]), (args.k or [4096])
        L = max(len(ms), len(ns), len(ks))
        bc = lambda xs: xs * L if len(xs) == 1 else xs  # noqa: E731
        shapes = list(zip(bc(ms), bc(ns), bc(ks)))
    elif args.sweep:
        shapes = [(n, n, n) for n in range(args.sweep[0], args.sweep[1] + 1,
                                           args.sweep[2])]
    else:
        shapes = [(n, n, n) for n in (args.mnk or [2048, 4096, 8192])]
    variants = args.variants or [
        n for n, s in OPS.items()
        if s.family == "gemm" and "f16" in s.tags]
    dtype = jnp.dtype(args.dtype)

    pool = None
    if not args.no_prealloc:
        pool = Pool(max(m for m, _, _ in shapes),
                    max(n for _, n, _ in shapes),
                    max(k for _, _, k in shapes), dtype,
                    fill=args.fill, seed=args.seed)

    session = Session()
    all_results = []
    for (M, N, K) in shapes:
        print(f"--- M={M} N={N} K={K} ---")
        shape_pool = pool or Pool(M, N, K, dtype, fill=args.fill,
                                  seed=args.seed)
        all_results.append(
            (max(M, N, K),
             bench_size(M, N, K, variants, dtype, args.iters, session,
                        check=args.check, pool=shape_pool,
                        repeats=args.repeats)))
    print(session.summary())
    if args.markdown:
        flat = [r for _, rs in all_results for r in rs]
        print(markdown_table(flat))
    if args.plot:
        plot(all_results, args.plot, args.topk)


if __name__ == "__main__":
    main()
