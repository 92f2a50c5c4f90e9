"""Canonical test inputs per op family — shared by the CPU registry sweep
(tests/test_ops_registry.py) and the on-hardware sweep (tools/hw_sweep.py)."""

from __future__ import annotations

import jax.numpy as jnp


def make_args(spec, rng):
    """Construct canonical inputs per family/tags."""
    S, K = 64, 256
    fam = spec.family
    tags = set(spec.tags)
    dt = jnp.float32
    if "f16" in tags or any(t.startswith("f16") for t in tags):
        dt = jnp.float16
    if "bf16" in tags or any(t.startswith("bf16") for t in tags):
        dt = jnp.bfloat16

    def randn(shape, dtype=dt, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype=dtype)

    if fam == "elementwise":
        return (randn((S, K)), randn((S, K)))
    if fam == "activation":
        return (randn((S, K)),)
    if fam == "reduce":
        suffix = spec.name.replace("block_all_reduce_sum_", "")
        edt = {
            "f32_f32": jnp.float32, "f32x4_f32": jnp.float32,
            "f16_f16": jnp.float16, "f16_f32": jnp.float16,
            "bf16_bf16": jnp.bfloat16, "bf16_f32": jnp.bfloat16,
            "i8_i32": jnp.int8,
        }.get(suffix)
        if edt is None and hasattr(jnp, "float8_e4m3fn"):
            edt = jnp.float8_e4m3fn if "e4m3" in suffix else jnp.float8_e5m2
        if edt == jnp.int8:
            return (jnp.asarray(rng.integers(-8, 8, (S, K)), jnp.int8),)
        return (jnp.asarray(rng.standard_normal((S, K)) * 0.1, edt),)
    if fam == "dot-product":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((S, K), d, 0.1), randn((S, K), d, 0.1))
    if fam in ("softmax",):
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((S, K), d),)
    if fam == "layer-norm":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((S, K), d), randn((K,), d, 0.5), randn((K,), d, 0.5))
    if fam == "rms-norm":
        d = jnp.float16 if "f16" in spec.name else jnp.float32
        return (randn((S, K), d), randn((K,), d, 0.5))
    if fam == "rope":
        return (randn((S, 128), jnp.float32),)
    if fam == "embedding":
        d = (jnp.bfloat16 if "bf16" in spec.name
             else jnp.float16 if "f16" in spec.name else jnp.float32)
        idx = jnp.asarray(rng.integers(0, 104, (32,)), jnp.int32)
        if "tiled" in tags:  # serving layout: (V, D/128, 128)
            return (idx, randn((104, 2, 128), d))
        table = randn((104, 128), d)  # rows must be a multiple of 8 (HBM tiling)
        return (idx, table)
    if fam == "histogram":
        return (jnp.asarray(rng.integers(0, 128, (S, 128)), jnp.int32),)
    if fam == "transpose":
        return (randn((S, K), jnp.float32),)
    if fam == "gemm":
        d = jnp.bfloat16 if "f16" in tags else jnp.float32
        a = randn((128, 256), d, 0.3)
        b = (randn((128, 256), d, 0.3) if "tn" in tags
             else randn((256, 128), d, 0.3))
        return (a, b)
    if fam == "gemm-quant":
        import numpy as _np
        x = randn((64, 256), jnp.bfloat16, 0.3)
        if "int4" in tags:
            from leetcuda_tpu.gemm.quant import quantize_groupwise_int4
            w = randn((256, 128), jnp.float32, 0.3)
            packed, scales = quantize_groupwise_int4(w, group=128)
            return (x, packed, scales)
        if "a8w8" in tags:
            xi = jnp.asarray(rng.integers(-8, 8, (64, 256)), jnp.int8)
            w = jnp.asarray(rng.integers(-8, 8, (256, 128)), jnp.int8)
            return (xi, w)
        if "fp8" in tags:
            from leetcuda_tpu.gemm.quant import quantize_rowwise_fp8
            w = randn((256, 128), jnp.float32, 0.3)
            wq, scale = quantize_rowwise_fp8(w)
            return (x, wq, scale)
        wq = jnp.asarray(rng.integers(-127, 127, (256, 128)), jnp.int8)
        scale = jnp.asarray(_np.abs(rng.standard_normal((128,))) * 0.01 + 1e-3,
                            jnp.float32)
        return (x, wq, scale)
    if fam == "gemv":
        d = jnp.bfloat16 if spec.name.startswith("hgemv") else jnp.float32
        return (randn((256,), d, 0.3), randn((256, 128), d, 0.3))
    if fam == "flash-attn":
        B, H, N, D = 1, 2, 256, 64
        return (randn((B, H, N, D), jnp.bfloat16, 0.5),
                randn((B, H, N, D), jnp.bfloat16, 0.5),
                randn((B, H, N, D), jnp.bfloat16, 0.5))
    if fam == "attention-utils":
        T, H, D = 16, 4, 64
        po = randn((T, H, D), jnp.float32)
        so = randn((T, H, D), jnp.float32)
        plse = randn((T, H), jnp.float32)
        slse = randn((T, H), jnp.float32)
        return (po, plse, so, slse)
    return None




def _extra_args(spec, rng):
    """Families added in r2 (chunk verify, fused decode block, resident
    chain)."""
    import numpy as np

    def randn(shape, dtype=jnp.float32, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype=dtype)

    if spec.family == "chunk-attn":
        B, H, Hkv, T, S, D = 2, 4, 2, 4, 256, 64
        q = randn((B, H, T, D), jnp.float32, 0.5)
        k = randn((B, Hkv, S, D), jnp.float32, 0.5)
        v = randn((B, Hkv, S, D), jnp.float32, 0.5)
        base = jnp.asarray([100, 200], jnp.int32)
        return (q, k, v, base)
    if spec.family == "fused-decode":
        B, D, H, Hkv, Dh = 4, 256, 4, 2, 64
        x = randn((B, D), jnp.float32)
        nw = jnp.asarray(rng.standard_normal(D) * 0.2 + 1, jnp.float32)
        if "rope" in spec.tags:
            w = randn((D, (H + 2 * Hkv) * Dh), jnp.float32,
                      1 / np.sqrt(D))
            pos = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
            return (x, nw, w, pos)
        w = randn((D, 512), jnp.float32, 1 / np.sqrt(D))
        return (x, nw, w)
    if spec.family == "decode-attn-quant":
        B, H, Hkv, S, D = 2, 4, 2, 256, 64
        q = randn((B, H, D), jnp.float32, 0.5)
        k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        if "fp8" in spec.tags:
            qdt, qmax = jnp.float8_e4m3fn, 448.0
        else:
            qdt, qmax = jnp.int8, 127.0
        def q_cache(c):
            amax = np.maximum(np.abs(c).max(axis=-1), 1e-8)  # (B, Hkv, S)
            s = amax / qmax
            cq = c / s[..., None]
            if qdt == jnp.int8:
                cq = np.clip(np.round(cq), -127, 127)
            return (jnp.asarray(cq, qdt), jnp.asarray(s, jnp.float32))
        kq, ks = q_cache(k)
        vq, vs = q_cache(v)
        lengths = jnp.asarray([100, 200], jnp.int32)
        return (q, kq, vq, ks, vs, lengths)
    if spec.family == "decode-attn-shared":
        # MLA-style latent cache: one (B, 1, S, D) operand is both K and V;
        # odd S covers the partial-edge-block path
        B, H, S, D = 2, 8, 333, 576
        q = randn((B, H, D), jnp.float32, 0.3)
        lengths = jnp.asarray([100, 333], jnp.int32)
        if {"int8", "fp8"} & set(spec.tags):
            # the production quantizer IS the test-arg quantizer — one site
            from leetcuda_tpu.models.mla import _quantize_latent

            c = randn((B, 1, S, D), jnp.float32, 0.3)
            quant = "fp8" if "fp8" in spec.tags else "int8"
            cq, s = _quantize_latent(c, quant)
            return (q, cq, s, lengths)
        cache = randn((B, 1, S, D), jnp.float32, 0.3)
        return (q, cache, lengths)
    if spec.family == "decode-attn-softcap":
        B, H, Hkv, S, D = 2, 4, 2, 256, 64
        q = randn((B, H, D), jnp.float32, 0.5)
        k = randn((B, Hkv, S, D), jnp.float32, 0.5)
        v = randn((B, Hkv, S, D), jnp.float32, 0.5)
        return (q, k, v, jnp.asarray([100, 200], jnp.int32))
    if spec.family == "gemm-grouped":
        # 2 row tiles of bm=128, 4 expert panels; tiles pick experts 0 and 2
        lhs = randn((256, 128), jnp.bfloat16, 0.3)
        rhs = randn((4, 128, 128), jnp.bfloat16, 0.3)
        return (lhs, rhs, jnp.asarray([0, 2], jnp.int32))
    if spec.family == "gemm-resident":
        M = 128
        a = randn((M, M), jnp.bfloat16, 1 / np.sqrt(M))
        b = randn((M, M), jnp.bfloat16, 1 / np.sqrt(M))
        return (a, b)
    return None


_base_make_args = make_args


def make_args(spec, rng):  # noqa: F811 — extend the family table
    out = _base_make_args(spec, rng)
    return out if out is not None else _extra_args(spec, rng)
