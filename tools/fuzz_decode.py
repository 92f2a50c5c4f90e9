"""Randomized fuzzer for the decode-attention kernel family.

Covers what the fixed-shape tests cannot: random (B, H, Hkv, D, S) incl.
NON-block-dividing cache sizes (the clipped-edge-block path), random ragged
lengths (incl. 1 and S), sliding windows, int8-quantized caches, paged pools
with shuffled block tables, and chunk attention (speculative-verify shapes) —
each against its jnp oracle. Runs on the chip by default (Mosaic compile
path; CPU interpret with JAX_PLATFORMS=cpu).

    python tools/fuzz_decode.py [--iters 20] [--seed 0]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides JAX_PLATFORMS env, and a downed tunnel "
                         "hangs device init — CI must not depend on it)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from leetcuda_tpu.attention.decode import (
        make_decode_attention, make_decode_attention_quantized,
        decode_attention_ref)
    from leetcuda_tpu.attention.paged import make_paged_attention
    from leetcuda_tpu.attention.chunk import (
        make_chunk_attention, chunk_attention_ref)

    rng = np.random.default_rng(args.seed)
    ok = failed = 0
    for it in range(args.iters):
        B = int(rng.choice([1, 2, 4, 8]))
        Hkv = int(rng.choice([1, 2, 4]))
        group = int(rng.choice([1, 2, 4]))
        H = Hkv * group
        D = int(rng.choice([64, 128]))
        # incl. NON-8-multiple capacities: the partial edge block's padded
        # KV rows poisoned the accumulator via 0*NaN until the
        # p/v_blk zeroing fix (decode.py/chunk.py; found by the MLA tests)
        S = int(rng.choice([256, 640, 1024, 2176, 1152, 3072, 333, 1021]))
        bk = int(rng.choice([128, 256, 512, 1024]))
        window = int(rng.choice([0, 64, 500]))
        softcap = float(rng.choice([0.0, 0.5]))  # capped-logit path; 0.5
        # bites at fuzz score scale (30-50 would be numerically invisible)
        mode = rng.choice(["plain", "quant", "paged", "chunk",
                           "paged_shared"])
        lengths = jnp.asarray(rng.integers(1, S + 1, (B,)), jnp.int32)
        dt = jnp.bfloat16
        q = jnp.asarray(rng.standard_normal((B, H, D)), dt)
        k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), dt)
        v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), dt)
        w = window or None
        cap = softcap or None
        tag = (f"{mode} B{B} H{H}/{Hkv} D{D} S{S} bk{bk} win{window} "
               f"cap{softcap} "
               f"len{list(np.asarray(lengths))[:3]}")
        try:
            if mode == "plain":
                got = make_decode_attention(block_k=bk, window=w,
                                            softcap=cap)(
                    q, k, v, lengths)
                want = decode_attention_ref(q, k, v, lengths, window=w,
                                            softcap=cap)
            elif mode == "quant":
                kf = k.astype(jnp.float32)
                vf = v.astype(jnp.float32)
                ks = jnp.maximum(jnp.max(jnp.abs(kf), -1), 1e-8) / 127.0
                vs = jnp.maximum(jnp.max(jnp.abs(vf), -1), 1e-8) / 127.0
                kq = jnp.round(kf / ks[..., None]).astype(jnp.int8)
                vq = jnp.round(vf / vs[..., None]).astype(jnp.int8)
                got = make_decode_attention_quantized(block_k=bk, window=w,
                                                      softcap=cap)(
                    q, kq, vq, ks, vs, lengths)
                want = decode_attention_ref(
                    q, (kq.astype(jnp.float32) * ks[..., None]).astype(dt),
                    (vq.astype(jnp.float32) * vs[..., None]).astype(dt),
                    lengths, window=w, softcap=cap)
            elif mode == "paged":
                page = int(rng.choice([64, 128]))
                P_max = -(-S // page)
                npages = B * P_max + 1
                kp = jnp.zeros((npages, Hkv, page, D), dt)
                vp = jnp.zeros((npages, Hkv, page, D), dt)
                table = np.zeros((B, P_max), np.int32)
                perm = rng.permutation(np.arange(1, npages))
                S_pad = P_max * page
                kpad = jnp.zeros((B, Hkv, S_pad, D), dt).at[
                    :, :, :S].set(k)
                vpad = jnp.zeros((B, Hkv, S_pad, D), dt).at[
                    :, :, :S].set(v)
                n = 0
                for b in range(B):
                    for i in range(P_max):
                        p = int(perm[n]); n += 1
                        table[b, i] = p
                        kp = kp.at[p].set(kpad[b, :, i * page:(i + 1) * page])
                        vp = vp.at[p].set(vpad[b, :, i * page:(i + 1) * page])
                got = make_paged_attention(window=w, softcap=cap)(
                    q, kp, vp, jnp.asarray(table), lengths)
                want = decode_attention_ref(q, k, v, lengths, window=w,
                                            softcap=cap)
            elif mode == "paged_shared":
                # MLA-style: ONE pool is both K and V (latent cache)
                page = int(rng.choice([64, 128]))
                P_max = -(-S // page)
                npages = B * P_max + 1
                kp = jnp.zeros((npages, Hkv, page, D), dt)
                table = np.zeros((B, P_max), np.int32)
                perm = rng.permutation(np.arange(1, npages))
                S_pad = P_max * page
                kpad = jnp.zeros((B, Hkv, S_pad, D), dt).at[
                    :, :, :S].set(k)
                n = 0
                for b in range(B):
                    for i in range(P_max):
                        p = int(perm[n]); n += 1
                        table[b, i] = p
                        kp = kp.at[p].set(kpad[b, :, i * page:(i + 1) * page])
                got = make_paged_attention(window=w, softcap=cap,
                                           shared_kv=True)(
                    q, kp, jnp.asarray(table), lengths)
                want = decode_attention_ref(q, k, k, lengths, window=w,
                                            softcap=cap)
            else:  # chunk
                T = int(rng.choice([2, 4, 8]))
                base = jnp.asarray(
                    rng.integers(0, S - T + 1, (B,)), jnp.int32)
                qc = jnp.asarray(rng.standard_normal((B, H, T, D)), dt)
                got = make_chunk_attention(block_k=bk, window=w,
                                           softcap=cap)(
                    qc, k, v, base)
                want = chunk_attention_ref(qc, k, v, base, window=w,
                                           softcap=cap)
            err = float(jnp.max(jnp.abs(
                jnp.asarray(got, jnp.float32) - jnp.asarray(want,
                                                            jnp.float32))))
            ref = float(jnp.max(jnp.abs(jnp.asarray(want, jnp.float32))))
            if err <= 2e-2 + 2e-2 * ref:
                ok += 1
                print(f"  ok   {tag} (err {err:.4f})", flush=True)
            else:
                failed += 1
                print(f"  FAIL {tag}: err {err:.4f} vs ref {ref:.4f}",
                      flush=True)
        except Exception as e:
            failed += 1
            print(f"  FAIL {tag}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    print(f"fuzz_decode: {ok} ok, {failed} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
