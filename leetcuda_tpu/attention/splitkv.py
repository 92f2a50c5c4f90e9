"""Split-KV attention (flash-decoding) — composes the flash kernel's LSE output
with ops.merge_attn_states, the reference's merge-attn-states primitive
(/root/reference/kernels/openai-triton/merge-attn-states/, arXiv:2501.01005 §2.2).

When Nq is small (decode) and Nkv huge, a single kernel invocation has too little
grid parallelism; splitting KV into S chunks computes S partial attentions in
parallel and LSE-merges them — exactly the reference's split-kv family
(flash_attn_mma_split_kv.cu) rebuilt from two TPU-native parts. The same merge is
the combine step of ring attention in ``leetcuda_tpu.parallel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from leetcuda_tpu.attention.flash import make_flash_attention
from leetcuda_tpu.ops.merge_attn_states import merge_attn_states


def flash_attention_splitkv(q, k, v, *, num_splits: int = 2,
                            block_q: int = 128, block_k: int = 256,
                            sm_scale=None):
    """Non-causal split-KV attention. q (B,H,Nq,D); k,v (B,Hkv,Nkv,D)."""
    B, H, Nq, D = q.shape
    Nkv = k.shape[2]
    assert Nkv % num_splits == 0
    chunk = Nkv // num_splits
    fa = make_flash_attention(block_q=block_q, block_k=min(block_k, chunk),
                              with_lse=True, sm_scale=sm_scale)

    def flat(o):  # (B,H,Nq,D) -> (B*Nq, H, D) token-major for the merge kernel
        return o.transpose(0, 2, 1, 3).reshape(B * Nq, H, D)

    def flat_lse(l):  # (B,H,Nq) -> (B*Nq, H)
        return l.transpose(0, 2, 1).reshape(B * Nq, H)

    merged_o = None
    merged_l = None
    for s in range(num_splits):
        ks = k[:, :, s * chunk:(s + 1) * chunk]
        vs = v[:, :, s * chunk:(s + 1) * chunk]
        o_s, lse_s = fa(q, ks, vs)
        o_s, lse_s = flat(o_s), flat_lse(lse_s)
        if merged_o is None:
            merged_o, merged_l = o_s, lse_s
        else:
            merged_o, merged_l = merge_attn_states(merged_o, merged_l, o_s, lse_s)

    return merged_o.reshape(B, Nq, H, D).transpose(0, 2, 1, 3)
