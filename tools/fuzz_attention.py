"""Randomized attention fuzz — random (B, H, Hkv, N, D, causal/window/blocks)
configs checked against the SDPA oracle, on whatever backend is active
(run plain for the real chip; JAX_PLATFORMS=cpu for interpret mode).

    python tools/fuzz_attention.py [--iters 20] [--seed 0]
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

    from leetcuda_tpu.attention.flash import (
        make_flash_attention, make_flash_attention_ragged, mha_ref)
    from leetcuda_tpu.attention.decode import (
        make_decode_attention, decode_attention_ref)

    rng = np.random.default_rng(args.seed)
    fails = 0
    for it in range(args.iters):
        kind = rng.choice(["flash", "ragged", "decode"])
        B = int(rng.choice([1, 2, 4]))
        Hkv = int(rng.choice([1, 2, 4]))
        H = Hkv * int(rng.choice([1, 2, 4]))
        D = int(rng.choice([64, 128, 256]))
        dt = jnp.bfloat16

        def randn(shape):
            return jnp.asarray(rng.standard_normal(shape),
                               jnp.float32).astype(dt)

        try:
            if kind == "decode":
                S = int(rng.choice([256, 512, 1024]))
                q = randn((B, H, D))
                k = randn((B, Hkv, S, D))
                v = randn((B, Hkv, S, D))
                lengths = jnp.asarray(rng.integers(1, S + 1, (B,)), jnp.int32)
                bk = int(rng.choice([128, 256, 512]))
                win = (int(rng.choice([64, 128]))
                       if rng.random() < 0.3 else None)
                got = make_decode_attention(block_k=bk, window=win)(
                    q, k, v, lengths)
                want = decode_attention_ref(q, k, v, lengths, window=win)
                tag = f"decode B{B} H{H}/{Hkv} S{S} D{D} bk{bk} win{win}"
            else:
                N = int(rng.choice([256, 512, 1024]))
                bq = int(rng.choice([64, 128, 256]))
                bk = int(rng.choice([64, 128, 256]))
                q = randn((B, H, N, D))
                k = randn((B, Hkv, N, D))
                v = randn((B, Hkv, N, D))
                if kind == "ragged":
                    lengths = jnp.asarray(rng.integers(1, N + 1, (B,)),
                                          jnp.int32)
                    got = make_flash_attention_ragged(
                        block_q=bq, block_k=bk, causal=True)(q, k, v, lengths)
                    tag = f"ragged B{B} H{H}/{Hkv} N{N} D{D} b{bq}x{bk}"
                    for b in range(B):
                        L = int(lengths[b])
                        want = mha_ref(q[b:b + 1, :, :L], k[b:b + 1, :, :L],
                                       v[b:b + 1, :, :L], causal=True)
                        np.testing.assert_allclose(
                            np.asarray(got[b:b + 1, :, :L], np.float32),
                            np.asarray(want, np.float32),
                            atol=2.5e-2, rtol=2.5e-2)
                    print(f"  ok   {tag}")
                    continue
                causal = bool(rng.random() < 0.5)
                win = (int(rng.choice([64, 128]))
                       if causal and rng.random() < 0.3 else None)
                got = make_flash_attention(block_q=bq, block_k=bk,
                                           causal=causal, window=win)(q, k, v)
                want = mha_ref(q, k, v, causal=causal or bool(win),
                               window=win)
                tag = (f"flash B{B} H{H}/{Hkv} N{N} D{D} b{bq}x{bk} "
                       f"causal={causal} win={win}")
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=2.5e-2, rtol=2.5e-2)
            print(f"  ok   {tag}")
        except AssertionError as e:
            fails += 1
            print(f"  FAIL {tag}: {str(e)[:200]}")
        except Exception as e:
            fails += 1
            print(f"  FAIL {kind} it={it}: {type(e).__name__}: "
                  f"{str(e)[:160]}")
    print(f"fuzz: {args.iters - fails} ok, {fails} failed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
