"""Quantized weight matmuls — the BASELINE.json north-star fused-dequant path.

The reference corpus stops at fp16/bf16/fp8 *reductions* (block_all_reduce.cu) and
the north star extends the GEMM library with weight-only INT8/FP8: weights stored
quantized in HBM (halving/quartering weight bandwidth — the usual decode
bottleneck), dequantized *inside* the matmul kernel right after the DMA, so the
MXU still computes in bf16/f32. Per-output-channel scales are applied once to the
f32 accumulator on the last K step (exact for channel-wise quantization).

Also int8×int8 with i32 accumulation (the MXU's native int8 path, 2× bf16 peak).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op


def quantize_rowwise_int8(w, axis: int = 0):
    """Symmetric per-channel int8 quantization of w (K, N) along ``axis``.

    Returns (w_q int8, scale f32 per output column). axis=0 scales each column
    (output channel) by its own max — the weight-only decode convention.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.reshape(-1)


def quantize_rowwise_fp8(w, axis: int = 0, dtype=None):
    """Per-channel FP8-e4m3 quantization (max-scaled to e4m3 range ±448)."""
    dtype = dtype or jnp.float8_e4m3fn
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 448.0
    w_q = (w.astype(jnp.float32) / scale).astype(dtype)
    return w_q, scale.reshape(-1)


from leetcuda_tpu.core.runtime import e4m3_bits_to_f32 as _e4m3_bits_to_f32


def _wq_mm_kernel(compute_dtype, fp8_bits, x_ref, w_ref, s_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fused dequant: cast the quantized block up right after its DMA.
    # Mosaic has no direct fp8->bf16 cast (tools/lower_sweep.py caught the
    # on-chip failure from a CPU session) — fp8 legalizes via f32
    w = w_ref[:]
    if fp8_bits:
        # raw e4m3 bytes arrive bitcast as int8; decode with integer ops
        w = _e4m3_bits_to_f32(w.astype(jnp.int32))
    elif jnp.issubdtype(w.dtype, jnp.floating) and w.dtype.itemsize == 1:
        w = w.astype(jnp.float32)
    w = w.astype(compute_dtype)
    acc_ref[:] += jnp.dot(x_ref[:].astype(compute_dtype), w,
                          preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # per-output-channel scale applied once to the f32 accumulator
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def make_matmul_w8a16(
    *,
    block: tuple[int, int, int] = (512, 1024, 512),
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    fp8_bits: bool = False,
):
    """x (M, K) bf16 @ dequant(w_q (K, N) int8/fp8, scale (N,)) -> (M, N).

    ``fp8_bits``: decode e4m3 weights with integer bit surgery instead of the
    software-emulated fp8 cast (see _e4m3_bits_to_f32) — the weights stream
    into the kernel bitcast as int8.

    Differentiable wrt x (custom VJP: dx = (g·s) @ w_qᵀ via XLA) — quantized
    weights are frozen (QLoRA-style adapters train through this)."""

    @jax.jit
    def fn(x, w_q, scale):
        M, K = x.shape
        K2, N = w_q.shape
        assert K == K2
        if fp8_bits:
            w_q = jax.lax.bitcast_convert_type(w_q, jnp.int8)
        bm, bn, bk = block
        bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
        assert K % bk == 0, "quantized matmul requires K divisible by block K"
        odt = out_dtype or x.dtype
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            )
        return pl.pallas_call(
            functools.partial(_wq_mm_kernel, compute_dtype, fp8_bits),
            out_shape=jax.ShapeDtypeStruct((M, N), odt),
            grid=(cdiv(M, bm), cdiv(N, bn), cdiv(K, bk)),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * 2,
                transcendentals=0,
            ),
            interpret=interpret_default(),
            **params,
        )(x, w_q, scale.reshape(1, N))

    @jax.custom_vjp
    def op(x, w_q, scale):
        return fn(x, w_q, scale)

    def op_fwd(x, w_q, scale):
        # zero-size token carries x's dtype (residuals must be JAX types)
        return fn(x, w_q, scale), (w_q, scale, jnp.zeros((0,), x.dtype))

    def op_bwd(res, g):
        w_q, scale, xtok = res
        xdt = xtok.dtype
        gs = g.astype(jnp.float32) * scale.astype(jnp.float32)[None, :]
        dx = jax.lax.dot_general(
            gs.astype(compute_dtype), w_q.astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xdt)
        # frozen quantized weights: zero/float0 cotangents
        dw = (np.zeros((), jax.dtypes.float0)
              if jnp.issubdtype(w_q.dtype, jnp.integer)
              else jnp.zeros_like(w_q))
        return dx, dw, jnp.zeros_like(scale)

    op.defvjp(op_fwd, op_bwd)
    return op


def _i8_mm_kernel(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def make_matmul_i8i8i32(*, block: tuple[int, int, int] = (512, 1024, 1024)):
    """Native int8×int8→int32 MXU matmul (2× bf16 throughput on v5e)."""

    @jax.jit
    def fn(x, w):
        M, K = x.shape
        K2, N = w.shape
        assert K == K2
        bm, bn, bk = block
        bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
        assert K % bk == 0, "int8 matmul requires K divisible by block K"
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            )
        return pl.pallas_call(
            _i8_mm_kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            grid=(cdiv(M, bm), cdiv(N, bn), cdiv(K, bk)),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            interpret=interpret_default(),
            **params,
        )(x, w)

    return fn


def matmul_w8a16_ref(x, w_q, scale):
    w = w_q.astype(jnp.float32) * scale.astype(jnp.float32)[None, :]
    return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)


def _wq_flops(x, w_q, scale):
    return float(2 * x.shape[0] * x.shape[1] * w_q.shape[1])


register_op(
    "hgemm_w8a16_dequant",
    ref=matmul_w8a16_ref, flops=_wq_flops,
    atol=5e-2, rtol=5e-2, family="gemm-quant", tags=("int8", "weight-only"),
)(make_matmul_w8a16())

register_op(
    # e4m3 weights through the same fused-dequant kernel (the cast-up after
    # DMA is dtype-generic). On v5e fp8 casts are software-emulated (~10x an
    # int8 widen — PERF.md quantization table) but the rung must exist and
    # compile through Mosaic on-chip; reference analog: fp8 reduce rungs as
    # first-class bound ops (block_all_reduce.cu:873-894).
    "hgemm_w8a16_dequant_fp8",
    ref=matmul_w8a16_ref, flops=_wq_flops,
    atol=8e-2, rtol=8e-2, family="gemm-quant", tags=("fp8", "weight-only"),
)(make_matmul_w8a16())

register_op(
    # e4m3 decoded by INTEGER BIT SURGERY instead of the software-emulated
    # cast (VERDICT r4 #4: the fp8 north star was parked at 0.166x int8
    # "software-cast-bound" without dueling a bit-decode rung). f32 dots:
    # at decode-sized M the MXU is idle, skipping the bf16 cast passes.
    "hgemm_w8a16_dequant_fp8_bits",
    ref=matmul_w8a16_ref, flops=_wq_flops,
    atol=8e-2, rtol=8e-2, family="gemm-quant",
    tags=("fp8", "weight-only", "bits-decode", "f32-dots"),
)(make_matmul_w8a16(fp8_bits=True, compute_dtype=jnp.float32))

register_op(
    "hgemm_w8a8_i32",
    ref=lambda x, w: jnp.dot(x.astype(jnp.int32), w.astype(jnp.int32)),
    flops=lambda x, w: float(2 * x.shape[0] * x.shape[1] * w.shape[1]),
    atol=0, rtol=0, family="gemm-quant", tags=("int8", "a8w8"),
)(make_matmul_i8i8i32())


# --- int4 weight-only (w4a16): 2x the weight bandwidth of int8 ---------------------

def quantize_groupwise_int4(w, group: int = 128):
    """Symmetric int4 quantization of w (K, N) with per-(K-group, column)
    scales. Returns (packed (K/2, N) int8, scales (K/group, N) f32).

    Packing is SPLIT-HALVES, not interleaved: packed[i] holds original row i
    in the low nibble and row i + K/2 in the high nibble, so the kernel
    unpacks with two arithmetic shifts and needs NO sublane interleave (a
    (bk/2, 2, bn) -> (bk, bn) reshape would relayout across sublanes).

    The low nibble is stored BIASED (+8, i.e. unsigned in [0,16)): the kernel
    then recovers it with one subtract (bit path: and+sub, no xor trick) and,
    in the f32 floored-division unpack, as an exact remainder — while the
    high nibble stays two's-complement so the signed byte value is exactly
    16*hi + lo_biased and floor(byte/16) recovers hi."""
    K, N = w.shape
    assert K % (2 * group) == 0, (K, group)
    wf = w.astype(jnp.float32)
    g = wf.reshape(K // group, group, N)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(K, N)
    lo = (q[: K // 2] + 8) & 0xF
    hi = q[K // 2:] << 4
    return (lo | hi).astype(jnp.int8), scale[:, 0, :]


def dequantize_int4(packed, scales, group: int = 128):
    """Inverse of quantize_groupwise_int4 (reference/VJP path)."""
    Kh, N = packed.shape
    K = 2 * Kh
    lo = (packed & 0xF) - 8              # biased low nibble
    hi = jnp.right_shift(packed, 4)      # sign-extended high nibble
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # (K, N)
    s = jnp.repeat(scales.astype(jnp.float32), group, axis=0)  # (K, N)
    return q * s


def _w4_mm_kernel(compute_dtype, unpack, x_lo_ref, x_hi_ref, w_ref, s_lo_ref,
                  s_hi_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if unpack == "floor":
        # f32 floored-division unpack (r4, chasing the 280 GB/s VPU cap of
        # the bit path): signed byte = 16*hi + lo_b with lo_b in [0,16)
        # (BIASED low nibble, see quantize_groupwise_int4), hi in [-8,8),
        # and floor(byte/16) = hi holds for NEGATIVE bytes too under floored
        # division — so ONE native i8->f32 cast + mul + floor + 2 fma
        # (5 VPU passes) replaces widen/and/sub/shift + two i32->bf16
        # casts (7 passes). Dots run in f32 when compute_dtype says so
        # (decode-sized M: MXU is idle anyway; skips 2 more cast passes).
        w32 = w_ref[:].astype(jnp.float32)          # native i8->f32 cast
        hi_f = jnp.floor(w32 * 0.0625)              # == floored /16
        lo_f = w32 - 16.0 * hi_f - 8.0              # un-bias in the fma
        lo = lo_f.astype(compute_dtype)
        hi = hi_f.astype(compute_dtype)
    else:
        # bit-op unpack WITHOUT int8 shifts (Mosaic cannot legalize
        # arith.shli on i8 vectors): widen to i32, then and+sub for the
        # biased low nibble and one arithmetic shift for the signed high
        wp = w_ref[:].astype(jnp.int32)             # (bk, bn)
        lo = (jnp.bitwise_and(wp, 15) - 8).astype(compute_dtype)  # x-lo rows
        hi = jnp.right_shift(wp, 4).astype(compute_dtype)  # rows K/2+k..
    a = jnp.dot(x_lo_ref[:].astype(compute_dtype), lo,
                preferred_element_type=jnp.float32)
    b = jnp.dot(x_hi_ref[:].astype(compute_dtype), hi,
                preferred_element_type=jnp.float32)
    # group == block_k: one scale row per (half, step), folded past the dots
    acc_ref[:] += (a * s_lo_ref[0].astype(jnp.float32)
                   + b * s_hi_ref[0].astype(jnp.float32))

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def make_matmul_w4a16(
    *,
    block_n: int = 1024,
    block_m: int = 512,
    group: int = 128,
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    unpack: str = "floor",
):
    """x (M, K) bf16 @ dequant(packed (K/2, N) int4-pairs, scales
    (K/group, N)) -> (M, N). block_k == group (one scale row per step);
    differentiable wrt x like make_matmul_w8a16 (frozen weights).
    ``unpack``: "floor" (f32 floored division — measured 389 GB/s packed vs
    "bits" 335 at the decode shape, and 599 with compute_dtype=f32;
    INT4_UNPACK_DUEL.json) or "bits" (i32 widen + bit ops, the r2/r3 path,
    kept as a registered rung)."""
    assert unpack in ("bits", "floor")
    bk = group

    @jax.jit
    def fn(x, packed, scales):
        M, K = x.shape
        Kh, N = packed.shape
        assert K == 2 * Kh and scales.shape == (K // group, N), (
            x.shape, packed.shape, scales.shape)
        assert (K // 2) % bk == 0
        bm, bn = min(block_m, M), min(block_n, N)
        half_groups = (K // 2) // group
        odt = out_dtype or x.dtype
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            )
        return pl.pallas_call(
            functools.partial(_w4_mm_kernel, compute_dtype, unpack),
            out_shape=jax.ShapeDtypeStruct((M, N), odt),
            grid=(cdiv(M, bm), cdiv(N, bn), (K // 2) // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),     # x cols [0, K/2)
                pl.BlockSpec(
                    (bm, bk),
                    lambda i, j, k, hg=half_groups: (i, k + hg),
                    memory_space=pltpu.VMEM),              # x cols [K/2, K)
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),     # packed block
                # scales go in as (G, 1, N): a (1, 1, bn) block keeps the
                # last-two dims Mosaic-legal (1 == array dim, bn | 128)
                pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),     # lo-half scales
                pl.BlockSpec(
                    (1, 1, bn),
                    lambda i, j, k, hg=half_groups: (k + hg, 0, j),
                    memory_space=pltpu.VMEM),              # hi-half scales
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=M * K * x.dtype.itemsize + K * N // 2 + M * N * 2,
                transcendentals=0,
            ),
            interpret=interpret_default(),
            **params,
        )(x, x, packed, scales.reshape(-1, 1, N), scales.reshape(-1, 1, N))

    @jax.custom_vjp
    def op(x, packed, scales):
        return fn(x, packed, scales)

    def op_fwd(x, packed, scales):
        return fn(x, packed, scales), (packed, scales,
                                       jnp.zeros((0,), x.dtype))

    def op_bwd(res, g):
        packed, scales, xtok = res
        w = dequantize_int4(packed, scales, group)        # (K, N) f32
        dx = jax.lax.dot_general(
            g.astype(jnp.float32), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xtok.dtype)
        return (dx, np.zeros((), jax.dtypes.float0),
                jnp.zeros_like(scales))

    op.defvjp(op_fwd, op_bwd)
    return op


def matmul_w4a16_ref(x, packed, scales, group: int = 128):
    w = dequantize_int4(packed, scales, group)
    return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)


register_op(
    "hgemm_w4a16_dequant",
    ref=matmul_w4a16_ref, flops=_wq_flops,
    atol=5e-2, rtol=5e-2, family="gemm-quant", tags=("int4", "weight-only"),
)(make_matmul_w4a16())

register_op(
    # the r2/r3 bit-op unpack, kept as a ladder rung: i32 widen + and/sub/
    # shift. Measured 335 GB/s packed vs floor's 389/599 (r4 duel,
    # INT4_UNPACK_DUEL.json) — superseded as the default by "floor"
    "hgemm_w4a16_dequant_bits",
    ref=matmul_w4a16_ref, flops=_wq_flops,
    atol=5e-2, rtol=5e-2, family="gemm-quant",
    tags=("int4", "weight-only", "bits-unpack"),
)(make_matmul_w4a16(unpack="bits"))

register_op(
    # decode-shape specialization: f32 dots skip the two bf16 cast passes —
    # at small M the MXU is idle so f32 rate is free (599 GB/s packed,
    # 1.7x the int8 row at M=8, K=2048, N=5632)
    "hgemm_w4a16_dequant_floor_f32",
    ref=matmul_w4a16_ref, flops=_wq_flops,
    atol=5e-2, rtol=5e-2, family="gemm-quant",
    tags=("int4", "weight-only", "floor-unpack", "f32-dots"),
)(make_matmul_w4a16(unpack="floor", compute_dtype=jnp.float32))
