"""Chase the last ~4 points of the resident-chain GEMM (VERDICT r2 #3:
pallas 184.7 vs XLA 190 TFLOPS at 4096-cubed resident = 0.972x; target
>=0.97 median / >=189 TFLOPS, or a decomposition naming the residual).

Candidates measured here, all element-exact vs matmul_chain_ref:
  base      — make_matmul_resident(block_m=1024): grid (M/bm, reps), whole-B
              resident, per-rep dot (bm,K)x(K,N) -> cast -> scratch store.
  bm2048    — wider row chunk: half the grid steps, bigger dots; VMEM ~112 MB
              (B 32 + a 16 + cur 16 + out 16 + f32 dot intermediate 32) — may
              not fit; measured if it compiles.
  pingpong  — N-chunked rep with parity-alternating scratches: per (i, r, j)
              new[:, j] = cast(dot(old, B[:, j])). Finer stores let the cast/
              store of chunk j overlap the MXU on chunk j+1, at the cost of
              re-reading `old` per j (VMEM-resident, so free bandwidth-wise).
  parsem    — base kernel but with ("parallel", "arbitrary") dimension
              semantics: tells Mosaic the i-chunks are independent.

Each candidate times with the interleaved two-length probe (per-dot =
(t_hi - t_lo)/(hi - lo)) against the XLA scan bar, then prints the table and
appends a JSON line to RESIDENT_ABLATE.json.

    python tools/ablate_resident.py [--n 4096] [--probe 16 80] [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.gemm.matmul import make_matmul_resident, matmul_chain_ref


def make_resident_pingpong(*, reps: int, block_m: int = 1024,
                           block_n: int = 1024, vmem_limit_mb: int = 100):
    """Variant: N-chunked reps with parity ping-pong scratches.

    Grid (M/bm, reps, N/bn), j innermost. Rep r reads the chunk state from
    scratch A (r even) or B (r odd) and writes the other — the (bm, bn)
    stores land as j advances, so Mosaic can overlap chunk j's cast/store
    with chunk j+1's dot instead of one bulk (bm, N) epilogue per rep.
    """

    def kernel(a_ref, b_ref, o_ref, cur_a, cur_b):
        r = pl.program_id(1)
        j = pl.program_id(2)
        nj = pl.num_programs(2)

        @pl.when((r == 0) & (j == 0))
        def _():
            cur_a[:] = a_ref[:]

        even = r % 2 == 0
        bn_ = cur_a.shape[1] // nj

        def body(src, dst):
            c = jnp.dot(src[:], b_ref[:, pl.ds(j * bn_, bn_)],
                        preferred_element_type=jnp.float32
                        ).astype(dst.dtype)
            dst[:, pl.ds(j * bn_, bn_)] = c

            @pl.when(r == reps - 1)
            def _():
                o_ref[:, pl.ds(j * bn_, bn_)] = c

        @pl.when(even)
        def _():
            body(cur_a, cur_b)

        @pl.when(jnp.logical_not(even))
        def _():
            body(cur_b, cur_a)

    @jax.jit
    def fn(a, b):
        M, K = a.shape
        K2, N = b.shape
        assert K == K2 and K == N
        ni = cdiv(M, block_m)
        nj = cdiv(N, block_n)
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), a.dtype),
            grid=(ni, reps, nj),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, r, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i, r, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, N), lambda i, r, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_m, K), a.dtype),
                            pltpu.VMEM((block_m, K), a.dtype)],
            interpret=interpret_default(),
            **params,
        )(a, b)

    return fn


def make_resident_dual(*, reps: int, block_m: int = 512,
                       vmem_limit_mb: int = 100):
    """Candidate `dual`: TWO independent row-chains per grid step.

    Within one chain, dot r+1 depends on the cast/store of dot r, so the MXU
    idles during each epilogue (the r3 decomposition of the 0.93-0.96
    ceiling). Interleaving two independent chains in one body gives Mosaic's
    scheduler an epilogue to run *under* the other chain's dot."""
    two = 2 * block_m

    def kernel(a_ref, b_ref, o_ref, cur):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            cur[:] = a_ref[:]

        c0 = jnp.dot(cur[:block_m], b_ref[:],
                     preferred_element_type=jnp.float32).astype(o_ref.dtype)
        c1 = jnp.dot(cur[block_m:], b_ref[:],
                     preferred_element_type=jnp.float32).astype(o_ref.dtype)
        cur[:block_m] = c0
        cur[block_m:] = c1

        @pl.when(r == reps - 1)
        def _():
            o_ref[:block_m] = c0
            o_ref[block_m:] = c1

    @jax.jit
    def fn(a, b):
        M, K = a.shape
        ni = cdiv(M, two)
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, K), a.dtype),
            grid=(ni, reps),
            in_specs=[
                pl.BlockSpec((two, K), lambda i, r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, K), lambda i, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((two, K), lambda i, r: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((two, K), a.dtype)],
            interpret=interpret_default(),
            **params,
        )(a, b)

    return fn


def make_resident_njin(*, reps: int, block_m: int = 1024, nsl: int = 4,
                       vmem_limit_mb: int = 110):
    """Candidate `njin`: N sliced INSIDE the body with ping-pong scratches.

    Per rep, new[:, j] = cast(dot(old, B[:, j])) for nsl static slices — the
    cast/store of slice j is independent of the dot of slice j+1 (both read
    `old`, write disjoint slices of `new`), so epilogues overlap the MXU
    without the grid-level window churn that sank the r3 `pingpong`
    candidate (0.675: j in the GRID re-fetched windows per step)."""

    def kernel(a_ref, b_ref, o_ref, cur_a, cur_b):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            cur_a[:] = a_ref[:]

        K = cur_a.shape[1]
        bn_ = K // nsl

        def body(src, dst):
            for j in range(nsl):
                c = jnp.dot(src[:], b_ref[:, j * bn_:(j + 1) * bn_],
                            preferred_element_type=jnp.float32
                            ).astype(dst.dtype)
                dst[:, j * bn_:(j + 1) * bn_] = c

                @pl.when(r == reps - 1)
                def _(c=c, j=j):
                    o_ref[:, j * bn_:(j + 1) * bn_] = c

        @pl.when(r % 2 == 0)
        def _():
            body(cur_a, cur_b)

        @pl.when(r % 2 == 1)
        def _():
            body(cur_b, cur_a)

    @jax.jit
    def fn(a, b):
        M, K = a.shape
        ni = cdiv(M, block_m)
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, K), a.dtype),
            grid=(ni, reps),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, K), lambda i, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, K), lambda i, r: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_m, K), a.dtype),
                            pltpu.VMEM((block_m, K), a.dtype)],
            interpret=interpret_default(),
            **params,
        )(a, b)

    return fn


def make_resident_parsem(*, reps: int, block_m: int = 1024,
                         vmem_limit_mb: int = 100):
    """base kernel with parallel i semantics (candidate `parsem`)."""
    import leetcuda_tpu.gemm.matmul as mm

    def kernel(a_ref, b_ref, o_ref, cur):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            cur[:] = a_ref[:]

        c = jnp.dot(cur[:], b_ref[:],
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
        cur[:] = c

        @pl.when(r == reps - 1)
        def _():
            o_ref[:] = c

    @jax.jit
    def fn(a, b):
        M, K = a.shape
        ni = cdiv(M, block_m)
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, a.shape[1]), a.dtype),
            grid=(ni, reps),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, r: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, K), lambda i, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, K), lambda i, r: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_m, K), a.dtype)],
            interpret=interpret_default(),
            **params,
        )(a, b)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--probe", type=int, nargs=2, default=(16, 80))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sessions", type=int, default=1,
                    help="independent interleaved measurement sessions; the "
                         "headline is the MEDIAN per-session paired ratio "
                         "with its spread (VERDICT r4 #5b: one session's "
                         "0.998 vs the prior day's 0.936 is not a claim)")
    ap.add_argument("--check", action="store_true",
                    help="verify each candidate vs matmul_chain_ref first")
    args = ap.parse_args()
    n = args.n
    LO, HI = args.probe

    a = (jax.random.normal(jax.random.key(0), (n, n), jnp.float32)
         / np.sqrt(n)).astype(jnp.bfloat16)
    b = (jax.random.normal(jax.random.key(1), (n, n), jnp.float32)
         / np.sqrt(n)).astype(jnp.bfloat16)

    def builders(reps):
        # bm2048 dropped: r3 measured it VMEM-infeasible (whole-B 32MB +
        # double-buffered 2048-row windows + 32MB register spills > 128MB,
        # logs/r3_resident.log); pingpong dropped: measured 0.675 (grid-level
        # j re-fetched windows per step). dual/njin attacked the epilogue-
        # overlap residual; r4 verdicts (RESIDENT_ABLATE.json 01:52): dual
        # variants VMEM-infeasible on chip (compile-helper OOM), njin 0.911
        # (finer stores cost more than they hide) — and `parsem` at 0.998x
        # made the chase moot: parallel-i semantics is now the factory
        # default in make_matmul_resident.
        out = {
            "xla": jax.jit(functools.partial(matmul_chain_ref, reps=reps)),
            "base": make_matmul_resident(reps=reps, block_m=1024),
            "parsem": make_resident_parsem(reps=reps, block_m=1024),
            "dual": make_resident_dual(reps=reps, block_m=512),
            "dual1k": make_resident_dual(reps=reps, block_m=1024,
                                         vmem_limit_mb=120),
            "njin": make_resident_njin(reps=reps, block_m=1024, nsl=4),
        }
        return out

    if args.check:
        want = np.asarray(matmul_chain_ref(a, b, 3), np.float32)
        for name, fn in builders(3).items():
            if name == "xla":
                continue
            try:
                got = np.asarray(fn(a, b), np.float32)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"  {name}: FAILED to compile/run: {e}", flush=True)
                continue
            d = np.abs(got - want).max()
            print(f"  {name}: max|diff| vs chain_ref = {d:.2e}", flush=True)
            assert d < 2e-2, (name, d)

    probes = {}
    for name, mk in [("lo", LO), ("hi", HI)]:
        for cand, fn in builders(mk).items():
            g = jax.jit(
                lambda a, b, f=fn: jnp.sum(f(a, b)[:1, :8].astype(jnp.float32)))
            try:
                float(g(a, b))
                probes[(cand, name)] = g
            except Exception as e:  # noqa: BLE001
                print(f"  {cand}/{name}: compile failed: {type(e).__name__}",
                      flush=True)

    fl = 2 * n ** 3
    sessions = []
    for si in range(args.sessions):
        best = {k: 1e30 for k in probes}
        for _ in range(args.reps):                  # interleaved best-of-N
            for k, g in probes.items():
                t0 = time.perf_counter()
                float(g(a, b))
                best[k] = min(best[k], time.perf_counter() - t0)

        results = {}
        for cand in ["xla", "base", "parsem", "dual", "dual1k", "njin"]:
            if (cand, "lo") in best and (cand, "hi") in best:
                per = (best[(cand, "hi")] - best[(cand, "lo")]) / (HI - LO)
                results[cand] = round(fl / per / 1e12, 1)
        xla = results.get("xla")
        print(f"\nresident {n}^3, probe ({LO},{HI}), best-of-{args.reps}"
              f" (session {si + 1}/{args.sessions}):")
        for cand, tf in sorted(results.items(), key=lambda kv: -kv[1]):
            ratio = f"  ratio {tf / xla:.3f}" if xla and cand != "xla" else ""
            print(f"  {cand:>9}: {tf:7.1f} TFLOPS{ratio}")
        sessions.append(results)

    line = {"n": n, "probe": [LO, HI], "reps": args.reps,
            "tflops": sessions[-1], "sessions": sessions,
            "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    if len(sessions) > 1:
        ratios = sorted(s["parsem"] / s["xla"] for s in sessions
                        if s.get("xla") and s.get("parsem"))
        if ratios:
            line["parsem_ratio_median"] = round(ratios[len(ratios) // 2], 3)
            line["parsem_ratio_spread"] = [round(ratios[0], 3),
                                           round(ratios[-1], 3)]
            print(f"\nparsem paired ratio over {len(ratios)} sessions: "
                  f"median {line['parsem_ratio_median']}, "
                  f"spread {line['parsem_ratio_spread']}")
    with open("RESIDENT_ABLATE.json", "a") as f:
        f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
