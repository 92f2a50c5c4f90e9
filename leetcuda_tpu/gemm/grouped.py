"""Grouped matmul (gmm) — variable-size expert GEMMs in one kernel launch.

MoE's compute pattern: rows of ``lhs`` are grouped by expert (contiguously),
each group multiplying its own ``rhs[g]``:

    out[o_g : o_g + s_g] = lhs[o_g : o_g + s_g] @ rhs[g]

The capacity-based MoE (models/moe.py) pads every expert to a fixed C and can
use a plain batched matmul; gmm removes the capacity limit — **dropless** MoE
routes every token, groups are whatever the router produced.

TPU-native design: the M-grid walks row tiles; a scalar-prefetched
``tile_group`` array (host-computed from group offsets) tells each tile which
expert's rhs panel to DMA — the BlockSpec index_map chases it, so switching
experts between tiles costs nothing. Constraint: group boundaries must be
block_m-aligned; ``pad_group_sizes``/callers guarantee it by padding each
group's rows up (zero rows contribute zero — they're sliced away after).
Reference prior art: the megablox/MegaBlocks gmm design (arXiv:2211.15841).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default


def _gmm_kernel(nk, tile_group_ref, lhs_ref, rhs_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(lhs_ref[:], rhs_ref[0],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def make_gmm(*, block: tuple[int, int, int] = (128, 128, 512)):
    """gmm(lhs (T, K), rhs (G, K, N), tile_group (T/bm,)) -> (T, N).

    ``tile_group[i]``: the expert owning row tile i (every tile must lie
    inside one group — see tile_groups_from_sizes)."""
    bm, bn, bk = block

    @jax.jit
    def fn(lhs, rhs, tile_group):
        T, K = lhs.shape
        G, K2, N = rhs.shape
        assert K == K2 and T % bm == 0, (lhs.shape, rhs.shape, bm)
        bn_, bk_ = min(bn, N), min(bk, K)
        nk = cdiv(K, bk_)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // bm, cdiv(N, bn_), nk),
            in_specs=[
                pl.BlockSpec((bm, bk_), lambda i, j, k, tg: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk_, bn_), lambda i, j, k, tg: (tg[i], k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn_), lambda i, j, k, tg: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn_), jnp.float32)],
        )
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            )
        return pl.pallas_call(
            functools.partial(_gmm_kernel, nk),
            out_shape=jax.ShapeDtypeStruct((T, N), lhs.dtype),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * T * N * K,
                bytes_accessed=(T * K + T * N) * lhs.dtype.itemsize
                + G * K * N * rhs.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret_default(),
            **params,
        )(tile_group.astype(jnp.int32), lhs, rhs)

    return fn


def pad_group_sizes(group_sizes, bm: int):
    """Round each group's row count up to a multiple of bm (padding rows are
    zeros appended per group by the caller's scatter). Returns padded sizes."""
    return ((group_sizes + bm - 1) // bm) * bm


def tile_groups_from_sizes(padded_sizes, bm: int, num_tiles: int):
    """(G,) bm-aligned sizes -> (num_tiles,) expert id per row tile."""
    ends = jnp.cumsum(padded_sizes // bm)
    tiles = jnp.arange(num_tiles)
    return jnp.searchsorted(ends, tiles, side="right").astype(jnp.int32)


def gmm_ref(lhs, rhs, group_sizes):
    """Oracle: loop over groups (host sizes)."""
    sizes = np.asarray(group_sizes)
    out = []
    o = 0
    for g, s in enumerate(sizes):
        out.append(lhs[o:o + s] @ rhs[g])
        o += s
    return jnp.concatenate(out, axis=0)


def gmm_tile_ref(lhs, rhs, tile_group, bm: int = 128):
    """Per-row-tile oracle matching make_gmm's signature (gmm_ref takes
    group sizes; the registry needs ref(args) == fn(args))."""
    tiles = np.asarray(tile_group)
    return jnp.concatenate(
        [lhs[i * bm:(i + 1) * bm] @ rhs[int(g)] for i, g in enumerate(tiles)],
        axis=0)


from leetcuda_tpu.core.registry import register_op  # noqa: E402

register_op(
    # the MoE dropless workhorse (models/moe.py moe_ffn_dropless): row tiles
    # DMA their own expert's panel via scalar-prefetch index maps
    "grouped_gemm_scalar_prefetch",
    ref=gmm_tile_ref,
    flops=lambda lhs, rhs, tg: float(2 * lhs.shape[0] * lhs.shape[1]
                                     * rhs.shape[2]),
    atol=2e-2, rtol=2e-2,
    family="gemm-grouped", tags=("bf16", "moe"),
)(make_gmm(block=(128, 128, 512)))
