"""Matrix transpose — analog of /root/reference/kernels/mat-transpose/.

The reference's 14 CUDA kernels + 4 CuTe kernels (mat_transpose.cu:29-300) grade
coalescing strategies: col2row vs row2col global access order, shared-memory staging,
bank-conflict-free padding, and diagonal-block grid scheduling. TPUs have no shared
memory banks — the analog concerns are (a) the in-VMEM relayout (sublane↔lane
rotation, done by the VPU when we write ``x.T``) and (b) the *grid iteration order*
over tiles, which controls HBM access locality exactly like the reference's
block-diagonal scheduling. Variants:

- ``col2row``: row-major tile order (reads stream along rows of x)
- ``row2col``: column-major tile order (writes stream along rows of out)
- ``diagonal``: diagonal tile order (mat_transpose.cu's "diagonal-block" kernel) —
  spreads reads and writes across both DRAM address streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op


def _transpose_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def make_transpose(*, block: tuple[int, int] = (256, 256), order: str = "col2row"):
    """transpose(x): (S, K) -> (K, S) with a chosen tile iteration order."""

    @jax.jit
    def fn(x):
        S, K = x.shape
        bs, bk = min(block[0], S), min(block[1], K)
        ni, nj = cdiv(S, bs), cdiv(K, bk)

        if order == "col2row":
            def x_map(i, j):
                return (i, j)
        elif order == "row2col":
            def x_map(i, j):
                return (j, i)
        elif order == "diagonal":
            # diagonal-block scheduling: tile (i, (i + j) % nj)
            def x_map(i, j):
                return (i, (i + j) % nj)
        else:
            raise ValueError(order)

        if order == "row2col":
            grid = (nj, ni)
            in_spec = pl.BlockSpec((bs, bk), x_map, memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((bk, bs), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)
        else:
            grid = (ni, nj)
            in_spec = pl.BlockSpec((bs, bk), x_map, memory_space=pltpu.VMEM)
            if order == "diagonal":
                out_spec = pl.BlockSpec((bk, bs), lambda i, j: ((i + j) % nj, i),
                                        memory_space=pltpu.VMEM)
            else:
                out_spec = pl.BlockSpec((bk, bs), lambda i, j: (j, i),
                                        memory_space=pltpu.VMEM)

        from leetcuda_tpu.ops.reduce import _vmem_params

        return pl.pallas_call(
            _transpose_kernel,
            out_shape=jax.ShapeDtypeStruct((K, S), x.dtype),
            grid=grid,
            in_specs=[in_spec],
            out_specs=out_spec,
            interpret=interpret_default(),
            **_vmem_params(),
        )(x)

    return fn


def _t_ref(x):
    return x.T


def _t_bytes(x):
    return float(2 * x.size * x.dtype.itemsize)


for _name, _order, _blk in [
    ("mat_transpose_f32_col2row2d", "col2row", (256, 256)),
    ("mat_transpose_f32_row2col2d", "row2col", (256, 256)),
    ("mat_transpose_f32_diagonal2d", "diagonal", (256, 256)),
    ("mat_transpose_f32x4_col2row2d", "col2row", (1024, 1024)),
    ("mat_transpose_f32x4_row2col2d", "row2col", (1024, 1024)),
    ("mat_transpose_f32x4_shared_col2row2d", "col2row", (128, 128)),
    ("mat_transpose_f32x4_shared_row2col2d", "row2col", (128, 128)),
    ("mat_transpose_f32x4_shared_bcf_col2row2d", "col2row", (128, 256)),
    ("mat_transpose_f32x4_shared_bcf_row2col2d", "row2col", (256, 128)),
    ("mat_transpose_cute_reg", "col2row", (128, 128)),
    ("mat_transpose_cute_smem", "col2row", (128, 256)),
    ("mat_transpose_cute_smem_swizzled", "diagonal", (128, 128)),
]:
    register_op(
        _name,
        ref=_t_ref, bytes=_t_bytes,
        atol=0.0, rtol=0.0, family="transpose", tags=(_order,),
    )(make_transpose(block=_blk, order=_order))

mat_transpose = make_transpose()
