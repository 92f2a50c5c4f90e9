"""Dot product — analog of /root/reference/kernels/dot-product/dot_product.cu.

The reference grades dot-product across f32/f32x4/f16_f32/f16x2_f32/f16x8_pack_f32
(dot_product.cu:35-167), each a fused multiply + warp/block tree-reduce + atomicAdd.
The TPU version fuses the elementwise product into the same vector-accumulator
reduction used by ``ops.reduce``: each ordered grid step sublane-reduces its block's
products into a (1, bk) f32 VMEM scratch vector, and the one expensive cross-lane
reduce runs once at the last step before writing the (1,1) output — always
accumulating in f32 like the reference's ``_f32`` rungs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op


def _dot_kernel(nj, bounds, x_ref, y_ref, o_ref, acc_ref):
    # Same vector-accumulator shape as ops/reduce.py: sublane-only reduce per
    # step into a (1, bk) f32 lane vector, one cross-lane reduce at the end.
    from leetcuda_tpu.ops.reduce import _block_mask

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    prod = x * y
    if bounds is not None:  # non-divisible (S, K): zero the block padding
        prod = _block_mask(x_ref.shape, nj, bounds, 0, prod)
    acc_ref[:] = acc_ref[:] + jnp.sum(prod, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = jnp.sum(acc_ref[:], keepdims=True)


def make_dot_product(*, block: tuple[int, int] = (512, 2048)):
    from leetcuda_tpu.ops.reduce import _vmem_params

    @jax.jit
    def fn(x, y):
        assert x.ndim == 2
        S, K = x.shape
        bs, bk = min(block[0], S), min(block[1], K)
        nj = cdiv(K, bk)
        bounds = None if (S % bs == 0 and K % bk == 0) else (S, K)
        out = pl.pallas_call(
            functools.partial(_dot_kernel, nj, bounds),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid=(cdiv(S, bs) * nj,),
            in_specs=[
                pl.BlockSpec((bs, bk), lambda i: (i // nj, i % nj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bs, bk), lambda i: (i // nj, i % nj),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, bk), jnp.float32)],
            interpret=interpret_default(),
            **_vmem_params(),
        )(x, y)
        return out[0, 0]

    return fn


def _dot_ref(x, y):
    return jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32))


def _dot_flops(x, y):
    return float(2 * x.size)


def _dot_bytes(x, y):
    return float(2 * x.size * x.dtype.itemsize)


for _suffix, _blk, _atol in [
    ("f32", (256, 1024), 1e-1),
    ("f32x4", (512, 2048), 1e-1),
    ("f16_f32", (256, 1024), 2.0),
    ("f16x2_f32", (512, 2048), 2.0),
    ("f16x8_pack_f32", (1024, 2048), 2.0),
]:
    register_op(
        f"dot_prod_{_suffix}",
        ref=_dot_ref,
        flops=_dot_flops,
        bytes=_dot_bytes,
        atol=_atol,
        rtol=1e-2,
        family="dot-product",
        tags=(_suffix,),
    )(make_dot_product(block=_blk))

dot_product = make_dot_product()
