"""Full-array reductions — analog of /root/reference/kernels/reduce/block_all_reduce.cu.

The reference builds a 20-entry matrix of (element dtype × accumulator dtype) sum
reductions (f32/f32x4, f16→f16/f32, bf16→bf16/f32, fp8_e4m3/e5m2→f16, i8→i32;
block_all_reduce.cu:23-753) out of warp/block shuffle primitives + atomicAdd. On TPU
there are no warps or atomics: a reduction is (1) a VPU partial-reduce of each VMEM
block and (2) accumulation across sequential grid steps into a revisited output
block — the grid is executed in order, so the output block acts as the accumulator
(the TPU-native replacement for atomicAdd of per-block partials).

Accumulation always happens in the accumulator dtype (f32 for float inputs, i32 for
int8), mirroring the reference's elem-vs-acc dtype matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import (cdiv, interpret_default, min_tile,
                                       upcast_for_vpu)
from leetcuda_tpu.core.registry import register_op


def _block_mask(shape, nj, bounds, fill, x):
    """Zero/neutral-fill the out-of-bounds padding of a boundary block.

    Pallas pads a partial block with whatever the DMA drags in, so a
    reduction over a non-divisible (S, K) accumulated garbage (advisor r4:
    (300,1500) f32 sum off by ~4e5). Same iota-vs-bound idiom as the
    attention kernels' ragged tails.
    """
    S, K = bounds
    bs, bk = shape
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, bk), 0) + (i // nj) * bs
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, bk), 1) + (i % nj) * bk
    return jnp.where((rows < S) & (cols < K), x, fill)


def _reduce_sum_kernel(nj, bounds, x_ref, o_ref, acc_ref):
    # Vector accumulator: each grid step does a SUBLANE-only reduce of its
    # block into a (1, bk) lane vector — cheap on the VPU — and the single
    # expensive cross-lane reduce runs once at the last step. The original
    # (1,1) revisited-output accumulator cross-lane-reduced every step and
    # measured 275 GB/s vs XLA's ~800 (r4 VPU ladder).
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # e4m3 inputs bypass Mosaic's software-emulated cast via bit surgery
    # (measured 80 GB/s vs 750+ for every other dtype, logs/r5_vpu.log)
    x = upcast_for_vpu(x_ref[:], acc_ref.dtype)
    if bounds is not None:  # only traced for non-divisible shapes
        x = _block_mask(x_ref.shape, nj, bounds, 0, x)
    acc_ref[:] = acc_ref[:] + jnp.sum(x, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = jnp.sum(acc_ref[:], keepdims=True).astype(o_ref.dtype)


def _kernel_acc_dtype(acc_dtype):
    """Mosaic has no float16 compute on TPU — an f16 accumulator rung runs its
    in-kernel accumulation in f32 there (cast back outside); interpret mode
    keeps true f16 (tools/hw_sweep.py found the hard compile failure)."""
    from leetcuda_tpu.core.runtime import on_tpu

    if jnp.dtype(acc_dtype) == jnp.float16 and on_tpu():
        return jnp.float32
    return acc_dtype


def _vmem_params():
    """Multi-MB blocks + compute temps exceed the 16 MB default scoped-vmem
    limit once double-buffered (the r4 dot_prod_f16x8_pack_f32 'HTTP 500'
    was this OOM inside the remote-compile helper); v5e has 128 MB."""
    if interpret_default():
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def make_block_all_reduce_sum(acc_dtype, *, block: tuple[int, int] = (512, 2048)):
    """Sum-reduce a 2-D array to a scalar, accumulating in ``acc_dtype``.

    Default block measured on chip at 737 GB/s = 1.17x XLA's own reduce
    (logs/r5_explore.log)."""

    @jax.jit
    def fn(x):
        assert x.ndim == 2
        S, K = x.shape
        bs, bk = min(block[0], S), min(block[1], K)
        grid = (cdiv(S, bs) * cdiv(K, bk),)
        nj = cdiv(K, bk)
        kdt = _kernel_acc_dtype(acc_dtype)
        bounds = None if (S % bs == 0 and K % bk == 0) else (S, K)
        out = pl.pallas_call(
            functools.partial(_reduce_sum_kernel, nj, bounds),
            out_shape=jax.ShapeDtypeStruct((1, 1), kdt),
            grid=grid,
            in_specs=[pl.BlockSpec((bs, bk), lambda i: (i // nj, i % nj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, bk), kdt)],
            interpret=interpret_default(),
            **_vmem_params(),
        )(x)
        return out[0, 0].astype(acc_dtype)

    return fn


def _reduce_max_kernel(nj, bounds, x_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, -jnp.inf)

    x = x_ref[:].astype(acc_ref.dtype)
    if bounds is not None:
        x = _block_mask(x_ref.shape, nj, bounds, -jnp.inf, x)
    acc_ref[:] = jnp.maximum(acc_ref[:], jnp.max(x, axis=0, keepdims=True))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = jnp.max(acc_ref[:], keepdims=True).astype(o_ref.dtype)


def make_block_all_reduce_max(acc_dtype, *, block: tuple[int, int] = (512, 2048)):
    @jax.jit
    def fn(x):
        S, K = x.shape
        bs, bk = min(block[0], S), min(block[1], K)
        nj = cdiv(K, bk)
        kdt = _kernel_acc_dtype(acc_dtype)
        bounds = None if (S % bs == 0 and K % bk == 0) else (S, K)
        out = pl.pallas_call(
            functools.partial(_reduce_max_kernel, nj, bounds),
            out_shape=jax.ShapeDtypeStruct((1, 1), kdt),
            grid=(cdiv(S, bs) * nj,),
            in_specs=[pl.BlockSpec((bs, bk), lambda i: (i // nj, i % nj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, bk), kdt)],
            interpret=interpret_default(),
            **_vmem_params(),
        )(x)
        return out[0, 0].astype(acc_dtype)

    return fn


def _sum_ref_factory(acc_dtype):
    def ref(x):
        return jnp.sum(x.astype(acc_dtype))
    return ref


def _reduce_flops(x):
    return float(x.size)


def _reduce_bytes(x):
    return float(x.size * x.dtype.itemsize)


# (name suffix, element dtype, accumulator dtype, atol) — the reference's matrix.
# fp8 rungs are gated on dtype availability in this jax build.
_MATRIX = [
    ("f32_f32", jnp.float32, jnp.float32, 1e-3),
    ("f32x4_f32", jnp.float32, jnp.float32, 1e-3),   # wide-block rung
    ("f16_f16", jnp.float16, jnp.float16, 5e-1),
    ("f16_f32", jnp.float16, jnp.float32, 5e-1),
    ("bf16_bf16", jnp.bfloat16, jnp.bfloat16, 8.0),
    ("bf16_f32", jnp.bfloat16, jnp.float32, 4.0),
    ("i8_i32", jnp.int8, jnp.int32, 0),
]
try:
    _MATRIX += [
        ("fp8_e4m3_f16", jnp.float8_e4m3fn, jnp.float16, 16.0),
        ("fp8_e5m2_f16", jnp.float8_e5m2, jnp.float16, 32.0),
    ]
except AttributeError:  # pragma: no cover
    pass

for _suffix, _edt, _adt, _atol in _MATRIX:
    _blk = (1024, 2048) if "x4" in _suffix else (512, 2048)
    register_op(
        f"block_all_reduce_sum_{_suffix}",
        ref=_sum_ref_factory(_adt),
        flops=_reduce_flops,
        bytes=_reduce_bytes,
        atol=float(_atol),
        rtol=1e-2,
        family="reduce",
        tags=(_suffix,),
    )(make_block_all_reduce_sum(_adt, block=_blk))

block_all_reduce_sum_f32 = make_block_all_reduce_sum(jnp.float32)
block_all_reduce_max_f32 = make_block_all_reduce_max(jnp.float32)
