"""Embedding gather — analog of /root/reference/kernels/embedding/embedding.cu.

Reference (embedding.cu:16-71): one block per token, threads copy one table row
(f32/f32x4/…/f16x8_pack rungs). TPU-native mechanism: *scalar prefetch* + *manual
aligned DMA*. Token ids are prefetched into SMEM before the kernel body runs
(``pltpu.PrefetchScalarGridSpec``); the table stays in HBM (``pl.ANY``). HBM is
tiled (8, 128) for f32, so a single arbitrary row cannot be DMA'd — each token
instead DMAs its *aligned 8-row group* into VMEM scratch (all tokens' DMAs in
flight concurrently) and the VPU selects the target row out of the group. This is
the TPU trade the reference's ladder teaches on CUDA: alignment-for-bandwidth
(8× read amplification here, vs uncoalesced gathers there).

The ladder varies tokens-per-step (DMA concurrency depth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op

_GROUP = 8  # HBM sublane tiling for f32/bf16 tables; DMA slices must align to it


def _embedding_kernel(tok_blk, S, vocab, idx_ref, table_ref, o_ref, scratch, sems):
    i0 = pl.program_id(0) * tok_blk

    def idx_base(t):
        ii = jnp.minimum(i0 + t, S - 1)  # clamp tail tokens of a partial block
        idx = jnp.clip(idx_ref[ii], 0, vocab - 1)
        # vocab % 8 == 0 (asserted in the wrapper), so base+8 <= vocab always;
        # multiple_of lets Mosaic prove the HBM slice is tile-aligned
        base = pl.multiple_of((idx // _GROUP) * _GROUP, _GROUP)
        return idx, base

    def group_dma(t, base):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(base, _GROUP), :], scratch.at[t], sems.at[t])

    for t in range(tok_blk):  # static unroll: all group DMAs in flight at once
        _, base = idx_base(t)
        group_dma(t, base).start()
    for t in range(tok_blk):
        idx, base = idx_base(t)
        group_dma(t, base).wait()
        r = idx - base
        o_ref[pl.ds(t, 1), :] = scratch[t, pl.ds(r, 1), :]


def make_embedding(*, tokens_per_step: int = 8):
    """embedding(idx, table): idx (S,) int32, table (V, D) -> (S, D)."""

    @jax.jit
    def fn(idx, table):
        S, = idx.shape
        V, D = table.shape
        assert V % _GROUP == 0, "table rows must be a multiple of 8 (HBM tiling)"
        tb = min(tokens_per_step, S)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(S, tb),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
            out_specs=pl.BlockSpec((tb, D), lambda i, idx_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tb, _GROUP, D), table.dtype),
                pltpu.SemaphoreType.DMA((tb,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_embedding_kernel, tb, S, V),
            out_shape=jax.ShapeDtypeStruct((S, D), table.dtype),
            grid_spec=grid_spec,
            interpret=interpret_default(),
        )(idx.astype(jnp.int32), table)

    return fn


def to_serving_layout(table):
    """(V, D) -> (V, D//128, 128), the amplification-free serving layout.

    HBM tiles the LAST TWO dims (8, 128): in a (V, D) table 8 different rows
    share every tile, so a one-row gather must DMA its whole 8-row group (8x
    read amplification — the measured 0.34x-XLA ceiling, VPU_LADDER r5). In
    (V, D//128, 128) each row exclusively owns D/128 whole tiles, so a
    single-row DMA reads only its own bytes. One-time relayout at weight-load
    time (loop-invariant: XLA hoists it out of any decode/step loop).
    """
    V, D = table.shape
    assert D % 128 == 0, D
    return table.reshape(V, D // 128, 128)


def _embedding_tiled_kernel(tok_blk, S, vocab, idx_ref, table_ref, o_ref,
                            scratch, sems):
    i0 = pl.program_id(0) * tok_blk

    def row(t):
        ii = jnp.minimum(i0 + t, S - 1)  # clamp tail tokens of a partial block
        return jnp.clip(idx_ref[ii], 0, vocab - 1)

    def dma(t, r):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(r, 1)], scratch.at[t], sems.at[t])

    for t in range(tok_blk):  # static unroll: all row DMAs in flight at once
        dma(t, row(t)).start()
    for t in range(tok_blk):
        dma(t, row(t)).wait()
        o_ref[pl.ds(t, 1)] = scratch[t]


def make_embedding_tiled(*, tokens_per_step: int = 256):
    """embedding(idx, table3d): idx (S,) int32, table3d (V, D/128, 128) in
    the serving layout (to_serving_layout) -> (S, D/128, 128)."""

    @jax.jit
    def fn(idx, table):
        S, = idx.shape
        V, G, L = table.shape
        assert L == 128
        tb = min(tokens_per_step, S)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(S, tb),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
            out_specs=pl.BlockSpec((tb, G, L), lambda i, idx_ref: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tb, 1, G, L), table.dtype),
                pltpu.SemaphoreType.DMA((tb,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_embedding_tiled_kernel, tb, S, V),
            out_shape=jax.ShapeDtypeStruct((S, G, L), table.dtype),
            grid_spec=grid_spec,
            interpret=interpret_default(),
        )(idx.astype(jnp.int32), table)

    return fn


_embedding_tiled_default = None


def embedding_serving(idx, table):
    """Convenience: 2-D table in, 2-D rows out, via the serving layout.
    For repeated lookups convert once with to_serving_layout and call the
    tiled op directly."""
    global _embedding_tiled_default
    if _embedding_tiled_default is None:  # one jit closure, cached traces
        _embedding_tiled_default = make_embedding_tiled()
    S = idx.shape[0]
    D = table.shape[1]
    return _embedding_tiled_default(idx,
                                    to_serving_layout(table)).reshape(S, D)


def embedding_ref(idx, table):
    return jnp.take(table, idx, axis=0)


def _emb_bytes(idx, table):
    S = idx.shape[0]
    D = table.shape[1]
    return float(2 * S * D * table.dtype.itemsize)


for _suffix, _tb in [("f32", 8), ("f32x4", 16), ("f32x4_pack", 32),
                     ("f16", 8), ("f16x8", 16), ("f16x8_pack", 32)]:
    register_op(
        f"embedding_{_suffix}",
        ref=embedding_ref, bytes=_emb_bytes,
        atol=0.0, rtol=0.0, family="embedding", tags=(_suffix,),
    )(make_embedding(tokens_per_step=_tb))


def _emb3_bytes(idx, table):
    S = idx.shape[0]
    return float(2 * S * table.shape[1] * table.shape[2]
                 * table.dtype.itemsize)


# serving-layout top rungs: amplification-free single-row DMA (see
# to_serving_layout) at 256 tokens of DMA depth in flight — measured 578
# GB/s = 1.14x XLA's gather on the same layout (depth sweep: tb=32 0.67x,
# 128 0.99x, 256 1.14x; logs/r5_embdepth.log). bf16 not f16: Mosaic's f16
# support is flaky for DMA-staged copies ("Unsupported type in mosaic
# dialect: 'f16'"), and bf16 is the TPU-native half precision.
for _suffix, _tb in [("f32_tiled", 256), ("bf16_tiled", 256)]:
    register_op(
        f"embedding_{_suffix}",
        ref=embedding_ref, bytes=_emb3_bytes,
        atol=0.0, rtol=0.0, family="embedding", tags=(_suffix, "tiled"),
    )(make_embedding_tiled(tokens_per_step=_tb))

embedding = make_embedding()
