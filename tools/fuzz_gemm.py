"""Randomized GEMM fuzz — random (M, N, K) incl. non-multiples of the block
sizes (exercising the ragged-K masking path), dtypes, layouts, swizzle.

    python tools/fuzz_gemm.py [--iters 20] [--seed 0]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leetcuda_tpu.gemm.matmul import (
        make_matmul, matmul_ref, matmul_tn_ref)

    rng = np.random.default_rng(args.seed)
    fails = 0
    for it in range(args.iters):
        M = int(rng.choice([8, 128, 200, 512, 1000, 2048]))
        N = int(rng.choice([128, 256, 640, 1024, 2048]))
        K = int(rng.choice([128, 384, 1000, 2048]))
        dt = jnp.bfloat16 if rng.random() < 0.5 else jnp.float32
        layout = "tn" if rng.random() < 0.3 else "nn"
        swz = int(rng.choice([2, 4])) if rng.random() < 0.3 else None
        blk = tuple(int(rng.choice([128, 256, 512])) for _ in range(3))

        a = jnp.asarray(rng.standard_normal((M, K)) * 0.3,
                        jnp.float32).astype(dt)
        b_shape = (N, K) if layout == "tn" else (K, N)
        b = jnp.asarray(rng.standard_normal(b_shape) * 0.3,
                        jnp.float32).astype(dt)
        tag = f"{layout} {M}x{N}x{K} {dt.__name__ if hasattr(dt,'__name__') else dt} blk{blk} swz{swz}"
        try:
            got = make_matmul(block=blk, layout=layout, swizzle_group=swz)(a, b)
            ref = (matmul_tn_ref if layout == "tn" else matmul_ref)(a, b)
            atol = 3e-2 if dt == jnp.bfloat16 else 1e-3
            scale = max(1.0, float(jnp.max(jnp.abs(ref.astype(jnp.float32)))))
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            assert err <= atol * scale, f"err {err:.4f} vs {atol * scale:.4f}"
            print(f"  ok   {tag} (err {err:.4f})")
        except Exception as e:
            fails += 1
            print(f"  FAIL {tag}: {type(e).__name__}: {str(e)[:160]}")
    print(f"fuzz: {args.iters - fails} ok, {fails} failed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
