"""Ring attention (context parallelism) and Ulysses — SURVEY.md §5's long-context
layer, built exactly as planned there: the Pallas flash-attention kernel +
``jax.lax.ppermute`` KV rotation over the ICI ring + the merge-attn-states
LSE combination (the reference only ships the combine primitive and blog links,
README.md:494,499 — here they're first-class).

Both run under ``shard_map`` on the mesh's "sp" axis with sequence-sharded
(B, H, N/P, D) inputs, testable on the 8-device virtual CPU mesh.

Causal ring attention needs no dynamic-mask kernel: each ring step holds a KV
chunk that is globally *before* (full attention), *at* (causal attention), or
*after* (skip) the local Q chunk — a 3-way select over static kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from leetcuda_tpu.attention.flash import make_flash_attention
from leetcuda_tpu.ops.merge_attn_states import merge_attn_states_ref

_NEG_INF = -1e30


def _merge(o1, l1, o2, l2):
    """LSE-weighted merge on (B, H, Nloc, D) outs and (B, H, Nloc) lses —
    the merge-attn-states math, vectorized inline (stays inside shard_map)."""
    m = jnp.maximum(l1, l2)
    w1 = jnp.exp(l1 - m)
    w2 = jnp.exp(l2 - m)
    denom = w1 + w2
    out = (o1.astype(jnp.float32) * (w1 / denom)[..., None]
           + o2.astype(jnp.float32) * (w2 / denom)[..., None])
    return out.astype(o1.dtype), m + jnp.log(denom)


def ring_attention(q, k, v, mesh: Mesh, *, causal: bool = False,
                   axis: str = "sp", block_q: int | None = None,
                   block_k: int | None = None, sm_scale=None):
    """Exact attention over sequence-sharded q/k/v (B, H, N, D), N split on
    ``axis``. KV chunks rotate around the ring; each step's partial attention is
    LSE-merged. Peak memory per chip: O(N/P) — the blockwise-parallel/ring
    transformer recipe.
    """
    fa_full = make_flash_attention(with_lse=True, block_q=block_q,
                                   block_k=block_k, sm_scale=sm_scale)
    fa_causal = make_flash_attention(with_lse=True, causal=True,
                                     block_q=block_q, block_k=block_k,
                                     sm_scale=sm_scale)
    n_dev = mesh.shape[axis]

    def local(q, k, v):
        me = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        # step 0: own chunk — diagonal, causal iff requested
        out, lse = (fa_causal if causal else fa_full)(q, k, v)

        kc, vc = k, v
        for r in range(n_dev - 1):
            # rotate: after step r we hold the chunk of shard (me - r - 1) mod P
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            src = jax.lax.rem(me - r - 1 + n_dev, n_dev)
            o_s, l_s = fa_full(q, kc, vc)
            if causal:
                use = (src < me)  # strictly-past chunks attend fully; future skip
                m_o, m_l = _merge(out, lse, o_s, l_s)
                out = jnp.where(use, m_o, out)
                lse = jnp.where(use, m_l, lse)
            else:
                out, lse = _merge(out, lse, o_s, l_s)
        return out

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, axis, None),) * 3,
                   out_specs=P(None, None, axis, None), check_vma=False)
    return jax.jit(fn)(q, k, v)


def ulysses_attention(q, k, v, mesh: Mesh, *, causal: bool = False,
                      axis: str = "sp", block_q: int | None = None,
                      block_k: int | None = None, sm_scale=None):
    """DeepSpeed-Ulysses: all-to-all reshard seq-sharded -> head-sharded, run
    full-sequence attention on the local head subset, reshard back. One
    all-to-all each way instead of P-1 ring hops; requires H % P == 0."""
    fa = make_flash_attention(causal=causal, block_q=block_q, block_k=block_k,
                              sm_scale=sm_scale)
    n_dev = mesh.shape[axis]

    def local(q, k, v):
        def seq2head(x):
            # (B, H, Nloc, D) -> (B, H/P, N, D)
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        def head2seq(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        o = fa(seq2head(q), seq2head(k), seq2head(v))
        return head2seq(o)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, axis, None),) * 3,
                   out_specs=P(None, None, axis, None), check_vma=False)
    return jax.jit(fn)(q, k, v)
