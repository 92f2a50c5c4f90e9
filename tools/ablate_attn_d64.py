"""D=64 flash-attention ceiling ablation — reproduces PERF.md's claim that the
57-vs-197 TFLOPS gap at head dim 64 is structural, and attacks it once.

The claim (r1 PERF.md, now reproducible): at D=64 the two MXU dots of the FA
inner loop contract (S = Q·Kᵀ) or output (O += P·V) over only 64 of the MXU's
128 systolic rows/lanes, so even a kernel that does NOTHING but those two dots
— no softmax, no masking, no online rescale — cannot exceed ~63 TFLOPS on
v5e. The full kernel's ~57 is therefore ~90% of its own ceiling; the deficit
vs the 197 bf16 peak is the shape, not the implementation.

Counter-move measured here (--wide): pack TWO KV tiles per S dot —
S = Q · [K_j | K_{j+1}]ᵀ is one (Bq, 64) x (64, 2Bk) pass instead of two
(Bq, 64) x (64, Bk) passes, halving the number of weight-load phases the
64-deep contraction pays. P·V keeps its bk-deep contraction (already full).
The result is recorded either way (VERDICT r1 #5); the reference's analogous
claim ships with its harness (kernels/flash-attn/README.md:19-22).

Run:  python tools/ablate_attn_d64.py [--n 8192] [--iters 100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import interpret_default


def _two_dots_kernel(block_q, block_k, q_ref, k_ref, v_ref, o_ref, acc_sc):
    """ONLY the two MXU dots of the FA loop — the compute ceiling probe."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (Bq, Bk): contract 64
    acc_sc[:] += jax.lax.dot_general(
        s.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (Bq, D): contract Bk

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = acc_sc[:].astype(o_ref.dtype)


def _two_dots_wide_kernel(block_q, block_k, q_ref, k_ref, v_ref, o_ref,
                          acc_sc):
    """Counter-move: one S dot across a DOUBLE-width KV tile (k_ref holds 2Bk
    rows), halving the weight-load phases of the 64-deep contraction."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[0]
    k = k_ref[0]          # (2Bk, D)
    v = v_ref[0]          # (2Bk, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (Bq, 2Bk)
    acc_sc[:] += jax.lax.dot_general(
        s.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = acc_sc[:].astype(o_ref.dtype)


def make_two_dots(block_q=512, block_k=512, wide=False):
    kernel = _two_dots_wide_kernel if wide else _two_dots_kernel
    kmul = 2 if wide else 1

    @jax.jit
    def fn(q, k, v):
        BH, N, D = q.shape
        bq, bk = block_q, block_k * kmul
        grid = (BH, N // bq, N // bk)
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            functools.partial(kernel, bq, bk),
            out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, qi, ki: (b, ki, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki: (b, qi, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
            interpret=interpret_default(),
            **params,
        )(q, k, v)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()

    from leetcuda_tpu.bench.harness import run_benchmark, Session
    from leetcuda_tpu.attention.flash import make_flash_attention

    B, H, N, D = 1, 8, args.n, args.d
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B * H, N, D), jnp.float32)
               .astype(jnp.bfloat16) for kk in ks)
    # non-causal FLOPs model: the ablation kernels do the full N^2 sweep
    fl = 4.0 * B * H * N * N * D
    sess = Session()

    run_benchmark(make_two_dots(), q, k, v, flops=fl, iters=args.iters,
                  tag=f"two_dots_only D={D} (ceiling)", session=sess)
    run_benchmark(make_two_dots(wide=True), q, k, v, flops=fl,
                  iters=args.iters,
                  tag=f"two_dots 2x-wide-KV D={D} (counter-move)",
                  session=sess)

    fa = make_flash_attention(causal=False)
    q4, k4, v4 = (x.reshape(B, H, N, D) for x in (q, k, v))
    run_benchmark(fa, q4, k4, v4, flops=fl, iters=args.iters,
                  tag=f"full flash D={D}", session=sess)

    # --- causal composition (VERDICT r2 #6): the two-phase grid lets the
    # wide-KV counter-move (a win on raw dots, a loss on masked-everywhere
    # causal) apply to off-diagonal tiles only.
    flc = fl / 2
    for tag, kw in [
        ("causal baseline (1024,1024)", dict(causal=True)),
        ("causal wide-KV (1024,2048)",
         dict(causal=True, block_q=1024, block_k=2048)),
        ("causal two-phase wide-KV (1024,2048)",
         dict(causal=True, block_q=1024, block_k=2048, two_phase=True)),
        ("causal two-phase (1024,1024)",
         dict(causal=True, two_phase=True)),
    ]:
        run_benchmark(make_flash_attention(**kw), q4, k4, v4, flops=flc,
                      iters=args.iters, tag=f"{tag} D={D}", session=sess)

    print(sess.summary())
    print("\nReading: the two-dots ceiling is what the D=64 MXU shapes allow;"
          "\nfull flash / ceiling = softmax+rescale overhead;"
          "\nwide-KV vs plain = effect of halving S-dot weight-load phases.")


if __name__ == "__main__":
    main()
