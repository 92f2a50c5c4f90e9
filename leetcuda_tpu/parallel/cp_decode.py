"""Context-parallel decode — flash-decoding across chips.

For contexts too large for one chip's HBM (or to cut per-step KV read time),
the KV cache shards along the SEQUENCE dim over the "sp" axis. Each shard runs
the decode-attention kernel on its local slice with its local valid length and
emits (partial_out, lse); the exact merge is the LSE-weighted combination —
the very semantics of ``ops/merge_attn_states.py`` (the reference carries the
same primitive for this exact purpose, SURVEY.md §5 long-context notes), here
expressed with psums so XLA fuses it into two small collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from leetcuda_tpu.attention.decode import make_decode_attention


def make_decode_attention_cp(mesh: Mesh, axis: str = "sp", *,
                             block_k: int = 1024, sm_scale=None):
    """fn(q, k_cache, v_cache, lengths) -> (B, H, D) with the caches sharded
    P(None, None, "sp", None) (sequence dim). q/lengths replicated on the
    axis; batch may additionally shard on "dp"."""
    da = make_decode_attention(block_k=block_k, sm_scale=sm_scale,
                               with_lse=True)
    n_shards = mesh.shape[axis]

    def local(q, k, v, lengths):
        S_loc = k.shape[2]
        idx = jax.lax.axis_index(axis)
        # this shard holds global positions [idx*S_loc, (idx+1)*S_loc)
        llen = jnp.clip(lengths - idx * S_loc, 0, S_loc)
        out, lse = da(q, k, v, llen)  # empty shards: lse ~ -1e30 -> weight 0
        m = jax.lax.pmax(lse, axis)
        w = jnp.exp(lse - m)  # (B, H)
        num = jax.lax.psum(w[..., None] * out.astype(jnp.float32), axis)
        den = jax.lax.psum(w, axis)
        return (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)

    in_specs = (P("dp", None, None), P("dp", None, axis, None),
                P("dp", None, axis, None), P("dp"))
    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=P("dp", None, None), check_vma=False)
    return jax.jit(fn)
