"""GEMV kernels — analog of /root/reference/kernels/{sgemv,hgemv}/.

The reference grades matvec by K-tiling strategy (warp-per-row k32, vectorized
k128_f32x4, two-rows-per-warp k16; sgemv.cu:32-91, hgemv.cu:34-94). A batch-1
matvec on TPU is pure HBM bandwidth: read W (K, N) once at ~819 GB/s. The kernel
maps K-chunks to the sequential grid dim (the k32/k128/k16 ladder becomes the
block_k choice), accumulates x·W partials in an f32 VMEM scratch, and fuses
optional epilogues — the decode-path trick (BASELINE.json config 4: fused
rms-norm + gemv), which saves a full activation round-trip per layer.

x is (1, K) (sublane dim 1 is legal when it equals the array dim); W is (K, N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op


def _gemv_kernel(epilogue, x_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)  # (1, bk)
    w = w_ref[:].astype(jnp.float32)  # (bk, bn)
    acc_ref[:] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out = acc_ref[:]
        if epilogue is not None:
            out = epilogue(out)
        o_ref[:] = out.astype(o_ref.dtype)


def make_gemv(*, block: tuple[int, int] = (512, 1024), epilogue=None,
              out_dtype=None):
    """gemv(x (1|K,), W (K, N)) -> (1, N). block = (block_k, block_n)."""

    @jax.jit
    def fn(x, w):
        x2 = x.reshape(1, -1)
        K, N = w.shape
        bk, bn = min(block[0], K), min(block[1], N)
        assert K % bk == 0, "gemv requires K divisible by block_k"
        odt = out_dtype or x.dtype
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            )
        return pl.pallas_call(
            functools.partial(_gemv_kernel, epilogue),
            out_shape=jax.ShapeDtypeStruct((1, N), odt),
            grid=(cdiv(N, bn), cdiv(K, bk)),
            in_specs=[
                pl.BlockSpec((1, bk), lambda n, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda n, k: (0, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
            interpret=interpret_default(),
            **params,
        )(x2, w)

    return fn


def _rms_gemv_kernel(eps, K, x_ref, w_ref, nw_ref, o_ref, acc_ref):
    """Fused rms-norm(x)·W: the norm is recomputed per grid step from the (cheap,
    VMEM-resident) x block — trading a few VPU flops for not materializing the
    normalized activation in HBM."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)          # (1, K) — whole row resident
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps)
    bk = w_ref.shape[0]
    # slice on the refs (Mosaic supports pl.ds on refs, not on values)
    xk = (x_ref[:, pl.ds(k * bk, bk)].astype(jnp.float32) * inv
          * nw_ref[:, pl.ds(k * bk, bk)].astype(jnp.float32))
    acc_ref[:] += jax.lax.dot_general(
        xk, w_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def make_rms_norm_gemv(*, block: tuple[int, int] = (512, 1024), eps: float = 1e-5,
                       out_dtype=None):
    """Fused rms_norm(x, norm_w) @ W — the decode epilogue block."""

    @jax.jit
    def fn(x, norm_w, w):
        x2 = x.reshape(1, -1)
        K, N = w.shape
        bk, bn = min(block[0], K), min(block[1], N)
        assert K % bk == 0
        odt = out_dtype or x.dtype
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            )
        return pl.pallas_call(
            functools.partial(_rms_gemv_kernel, eps, K),
            out_shape=jax.ShapeDtypeStruct((1, N), odt),
            grid=(cdiv(N, bn), cdiv(K, bk)),
            in_specs=[
                pl.BlockSpec((1, K), lambda n, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda n, k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda n, k: (0, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
            interpret=interpret_default(),
            **params,
        )(x2, w, norm_w.reshape(1, -1))

    return fn


def gemv_ref(x, w):
    return (x.reshape(1, -1).astype(jnp.float32)
            @ w.astype(jnp.float32)).astype(x.dtype)


def _gemv_flops(x, w):
    return float(2 * w.size)


def _gemv_bytes(x, w):
    return float(w.size * w.dtype.itemsize)


# ladder: block_k rungs mirroring sgemv k32/k128/k16 + hgemv variants
for _name, _blk in [
    ("sgemv_k32_f32", (256, 512)),
    ("sgemv_k128_f32x4", (1024, 512)),
    ("sgemv_k16_f32", (128, 512)),
    ("hgemv_k32_f16", (256, 1024)),
    ("hgemv_k128_f16x4", (1024, 1024)),
    ("hgemv_k16_f16", (128, 1024)),
]:
    register_op(
        _name,
        ref=gemv_ref, flops=_gemv_flops, bytes=_gemv_bytes,
        atol=3e-2, rtol=3e-2, family="gemv", tags=(_name.split("_")[1],),
    )(make_gemv(block=_blk))

gemv = make_gemv()
hgemv = make_gemv(block=(1024, 1024))
rms_norm_gemv = make_rms_norm_gemv()
