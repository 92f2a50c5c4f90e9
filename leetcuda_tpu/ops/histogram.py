"""Histogram — analog of /root/reference/kernels/histogram/histogram.cu.

Reference (histogram.cu:18-27): ``atomicAdd(&hist[a[i]], 1)`` (i32 / i32x4 rungs).
TPU has no atomics; the idiomatic replacement is one-hot accumulation on the VPU:
each grid step compares its value block against the bin iota, reduces the boolean
cube, and accumulates into a revisited (1, bins) output block (grid steps execute
sequentially, so the output block is a race-free accumulator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default, round_up
from leetcuda_tpu.core.registry import register_op


def _histogram_kernel_2d(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]                      # (bs, bk) int32
    bins = o_ref.shape[1]
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bins), 2)
    onehot = (x[:, :, None] == bin_ids).astype(jnp.int32)  # (bs, bk, bins)
    o_ref[:] += jnp.sum(onehot, axis=(0, 1))[None, :]


def make_histogram(num_bins: int, *, block: tuple[int, int] = (8, 128)):
    """histogram(x): x (S, K) int32 with values in [0, num_bins) -> (num_bins,) i32."""

    @jax.jit
    def fn(x):
        assert x.ndim == 2
        S, K = x.shape
        bs, bk = min(block[0], S), min(block[1], K)
        nj = cdiv(K, bk)
        out = pl.pallas_call(
            _histogram_kernel_2d,
            out_shape=jax.ShapeDtypeStruct((1, num_bins), jnp.int32),
            grid=(cdiv(S, bs) * nj,),
            in_specs=[pl.BlockSpec((bs, bk), lambda i: (i // nj, i % nj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, num_bins), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret_default(),
        )(x)
        return out[0]

    return fn


def _hist_ref_factory(num_bins):
    def ref(x):
        return jnp.bincount(x.reshape(-1), length=num_bins).astype(jnp.int32)
    return ref


BINS = 128  # registry instantiation bin count (tests use this)

for _suffix, _blk in [("i32", (8, 128)), ("i32x4", (32, 128))]:
    register_op(
        f"histogram_{_suffix}",
        ref=_hist_ref_factory(BINS),
        atol=0.0, rtol=0.0, family="histogram", tags=(_suffix,),
    )(make_histogram(BINS, block=_blk))

histogram = make_histogram
