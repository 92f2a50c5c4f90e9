"""Chunked decode attention — T query tokens per sequence against the KV cache.

This is the speculative-verify / chunked-prefill kernel: each sequence advances
T = k+1 positions in ONE pass (the target model's weights stream once per chunk
instead of once per token — the whole point of speculative decoding). It is the
decode kernel (attention/decode.py) generalized from 1 query row per head to T,
which also makes it the better MXU shape: the M dim grows from the GQA group
size to group*T.

Semantics: query row t of sequence b sits at position ``base_lengths[b] + t``
and attends cache cols < base + t + 1 (full prefix + causal-within-chunk), with
an optional Mistral sliding window (cols >= base + t + 1 - window). The chunk's
own K/V must already be appended to the cache (append-then-attend, exactly like
the decode path).

One kernel body serves all three cache layouts — contiguous, quantized
(int8/fp8 + per-(b, head, pos) scales, dequant folded past the dots), and paged
(vLLM-style page pools) — because paging lives entirely in the BlockSpec index
maps (scalar-prefetched block-table chase), not in the kernel.

Reference analog: the (k+1)-token verify pass of speculative decoding; the
reference corpus itself stops at single-shot attention kernels
(kernels/flash-attn/ has no decode/verify path at all).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import interpret_default
from leetcuda_tpu.attention.decode import _pick_bk, _vmem_params

_NEG_INF = -1e30
_LANES = 128


def _chunk_kernel(scale, softcap, Hkv, group, T, block_k, quantized, window,
                  with_lse, len_ref, q_ref, k_ref, v_ref, *rest):
    """q_ref (1, H, T, D); cache blocks (1, Hkv, bk, D); len_ref[b] = base
    length EXCLUDING the chunk. Scratch rows are (kv-head, group, t)-major so
    each kv head owns a contiguous (group*T)-row slab."""
    if quantized:
        ks_ref, vs_ref, *rest = rest
    if with_lse:
        o_ref, lse_ref, m_sc, l_sc, acc_sc = rest
    else:
        o_ref, m_sc, l_sc, acc_sc = rest

    b = pl.program_id(0)
    si = pl.program_id(1)
    base = len_ref[b]
    rows = group * T

    @pl.when(si == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    live = si * block_k < base + T
    if window:  # earliest col any chunk row (t=0) may see: base + 1 - window
        live &= si * block_k + block_k > base + 1 - window

    @pl.when(live)
    def _():
        cols = si * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1)           # global positions
        t_of_row = jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 0) % T       # row r = g*T + t
        limit = base + t_of_row + 1
        valid = cols < limit
        if window:
            valid &= cols >= limit - window

        from leetcuda_tpu.core.runtime import upcast_for_vpu

        for kvh in range(Hkv):  # static unroll over KV heads
            qg = (q_ref[0, kvh * group:(kvh + 1) * group]
                  .reshape(rows, q_ref.shape[-1]).astype(jnp.float32))
            # e4m3 caches decode via bit surgery (core.runtime), not the
            # ~10x-slower software-emulated cast
            k_blk = upcast_for_vpu(k_ref[0, kvh], jnp.float32)   # (bk, D)
            v_blk = upcast_for_vpu(v_ref[0, kvh], jnp.float32)
            s = jax.lax.dot_general(
                qg, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (rows, bk)
            if quantized:
                # dequant folded past the dot (attention/decode.py trick)
                s = s * ks_ref[0, kvh].astype(jnp.float32)[None, :]
            if softcap:  # Gemma2 logit capping, pre-mask
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            s = jnp.where(valid, s, _NEG_INF)

            sl = slice(kvh * rows, (kvh + 1) * rows)
            m_prev = m_sc[sl, 0:1]
            l_prev = l_sc[sl, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                p = p * vs_ref[0, kvh].astype(jnp.float32)[None, :]
            # partial edge block (S_max % bk != 0): padded KV rows hold
            # undefined data; 0 * NaN = NaN through the dot (same fix as
            # attention/decode.py). Zero p at invalid positions and v at
            # columns no chunk row uses — the union of per-row limits is
            # col < base + T (no bool reduction; Mosaic can't lower those).
            p = jnp.where(valid, p, 0.0)
            col_used = (si * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0)) < base + T
            v_blk = jnp.where(col_used, v_blk, 0.0)
            acc_sc[sl, :] = acc_sc[sl, :] * alpha + jnp.dot(
                p, v_blk, preferred_element_type=jnp.float32)
            m_sc[sl, :] = jnp.broadcast_to(m_new, (rows, _LANES))
            l_sc[sl, :] = jnp.broadcast_to(l_new, (rows, _LANES))

    @pl.when(si == pl.num_programs(1) - 1)
    def _():
        l = l_sc[:, 0:1]
        out = acc_sc[:] / jnp.maximum(l, 1e-30)       # (Hkv*group*T, D)
        o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)
        if with_lse:  # rows are (kvh, g, t)-major = flattened (H, T)
            lse_ref[0] = m_sc[:] + jnp.log(jnp.maximum(l_sc[:], 1e-30))


def _bounds(base, T, bk, window):
    """[first, last] valid KV block range for a chunk ending at base+T."""
    last = jnp.maximum(pl.cdiv(base + T, bk) - 1, 0)
    first = 0
    if window is not None:
        first = jnp.maximum((base + 1 - window) // bk, 0)
    return first, last


def _scratch(H, T, D):
    return [
        pltpu.VMEM((H * T, _LANES), jnp.float32),
        pltpu.VMEM((H * T, _LANES), jnp.float32),
        pltpu.VMEM((H * T, D), jnp.float32),
    ]


def make_chunk_attention(*, block_k: int = 512, sm_scale=None,
                         window: int | None = None, quantized: bool = False,
                         softcap: float | None = None,
                         with_lse: bool = False):
    """fn(q, k_cache, v_cache, [k_scale, v_scale,] base_lengths) -> (B,H,T,D).

    q (B, H, T, D) — T chunk tokens at positions base..base+T-1 (already
    appended to the cache); caches (B, Hkv, S_max, D); scales (B, Hkv, S)
    when ``quantized``; base_lengths (B,) int32 EXCLUDING the chunk."""

    @jax.jit
    def fn(q, k_cache, v_cache, *rest):
        if quantized:
            k_scale, v_scale, base_lengths = rest
        else:
            (base_lengths,) = rest
        B, H, T, D = q.shape
        _, Hkv, S, _ = k_cache.shape
        group = H // Hkv
        bk = _pick_bk(S, block_k)
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)

        def kv_map(b, si, L):
            first, last = _bounds(L[b], T, bk, window)
            return (b, 0, jnp.clip(si, first, last), 0)

        def s_map(b, si, L):
            first, last = _bounds(L[b], T, bk, window)
            return (b, 0, jnp.clip(si, first, last))

        cache_spec = pl.BlockSpec((1, Hkv, bk, D), kv_map,
                                  memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, H, T, D), lambda b, si, L: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            cache_spec, cache_spec,
        ]
        args = [q, k_cache, v_cache]
        if quantized:
            scale_spec = pl.BlockSpec((1, Hkv, bk), s_map,
                                      memory_space=pltpu.VMEM)
            in_specs += [scale_spec, scale_spec]
            args += [k_scale, v_scale]

        o_spec = pl.BlockSpec((1, H, T, D), lambda b, si, L: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((1, H * T, _LANES),
                                lambda b, si, L: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        o_shape = jax.ShapeDtypeStruct((B, H, T, D), q.dtype)
        lse_shape = jax.ShapeDtypeStruct((B, H * T, _LANES), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, pl.cdiv(S, bk)),
            in_specs=in_specs,
            out_specs=(o_spec, lse_spec) if with_lse else o_spec,
            scratch_shapes=_scratch(H, T, D),
        )
        res = pl.pallas_call(
            functools.partial(_chunk_kernel, scale, softcap, Hkv, group, T,
                              bk,
                              quantized, window, with_lse),
            out_shape=(o_shape, lse_shape) if with_lse else o_shape,
            grid_spec=grid_spec,
            interpret=interpret_default(),
            **_vmem_params(),
        )(base_lengths.astype(jnp.int32), *args)
        if with_lse:
            out, lse = res
            return out, lse[..., 0].reshape(B, H, T)
        return res

    return fn


def make_paged_chunk_attention(*, sm_scale=None, window: int | None = None,
                               quantized: bool = False,
                               softcap: float | None = None,
                               with_lse: bool = False):
    """fn(q, k_pages, v_pages, [k_scales, v_scales,] page_table, base_lengths)
    -> (B, H, T, D). Paged-cache chunk attention: same kernel body, block-table
    index maps (attention/paged.py semantics)."""

    @jax.jit
    def fn(q, k_pages, v_pages, *rest):
        if quantized:
            k_scales, v_scales, page_table, base_lengths = rest
        else:
            page_table, base_lengths = rest
        B, H, T, D = q.shape
        _, Hkv, page, _ = k_pages.shape
        P_max = page_table.shape[1]
        group = H // Hkv
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)

        def _phys(si, pt, b, L):
            first, last = _bounds(L[b], T, page, window)
            return pt[b, jnp.clip(si, first, last)]

        def kv_map(b, si, pt, L):
            return (_phys(si, pt, b, L), 0, 0, 0)

        def s_map(b, si, pt, L):
            return (_phys(si, pt, b, L), 0, 0)

        page_spec = pl.BlockSpec((1, Hkv, page, D), kv_map,
                                 memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, H, T, D), lambda b, si, pt, L: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            page_spec, page_spec,
        ]
        args = [q, k_pages, v_pages]
        if quantized:
            scale_spec = pl.BlockSpec((1, Hkv, page), s_map,
                                      memory_space=pltpu.VMEM)
            in_specs += [scale_spec, scale_spec]
            args += [k_scales, v_scales]

        o_spec = pl.BlockSpec((1, H, T, D),
                              lambda b, si, pt, L: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((1, H * T, _LANES),
                                lambda b, si, pt, L: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        o_shape = jax.ShapeDtypeStruct((B, H, T, D), q.dtype)
        lse_shape = jax.ShapeDtypeStruct((B, H * T, _LANES), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # page_table, base_lengths
            grid=(B, P_max),
            in_specs=in_specs,
            out_specs=(o_spec, lse_spec) if with_lse else o_spec,
            scratch_shapes=_scratch(H, T, D),
        )
        def body(pt_ref, *refs):  # page table is index-map-only
            return _chunk_kernel(scale, softcap, Hkv, group, T, page,
                                 quantized, window, with_lse, *refs)

        res = pl.pallas_call(
            body,
            out_shape=(o_shape, lse_shape) if with_lse else o_shape,
            grid_spec=grid_spec,
            interpret=interpret_default(),
            **_vmem_params(),
        )(page_table.astype(jnp.int32), base_lengths.astype(jnp.int32), *args)
        if with_lse:
            out, lse = res
            return out, lse[..., 0].reshape(B, H, T)
        return res

    return fn


def chunk_attention_ref(q, k_cache, v_cache, base_lengths, sm_scale=None,
                        window=None, softcap=None):
    """jnp oracle. q (B, H, T, D); row t attends cols < base + t + 1
    (minus the window band when set)."""
    B, H, T, D = q.shape
    _, Hkv, S, _ = k_cache.shape
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    if Hkv != H:
        k_cache = jnp.repeat(k_cache, H // Hkv, axis=1)
        v_cache = jnp.repeat(v_cache, H // Hkv, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k_cache.astype(jnp.float32)) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    limit = (base_lengths[:, None, None, None]
             + jnp.arange(T)[None, None, :, None] + 1)
    cols = jnp.arange(S)[None, None, None, :]
    mask = cols < limit
    if window is not None:
        mask &= cols >= limit - window
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p,
                      v_cache.astype(jnp.float32)).astype(q.dtype)


# --- registry ---------------------------------------------------------------------

from leetcuda_tpu.core.registry import register_op  # noqa: E402


def _chunk_flops(q, k, v, *rest):
    B, H, T, D = q.shape
    S = k.shape[2]
    return float(2 * 2 * B * H * T * S * D)


for _name, _kw in [
    ("chunk_attn_verify", {}),
    ("chunk_attn_verify_window", {"window": 64}),
]:
    register_op(
        _name,
        ref=functools.partial(chunk_attention_ref, window=_kw.get("window")),
        flops=_chunk_flops, atol=2e-2, rtol=2e-2,
        family="chunk-attn", tags=("decode", "speculative")
        + (("window",) if _kw else ()),
    )(make_chunk_attention(block_k=128, **_kw))
