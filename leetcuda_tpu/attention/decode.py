"""Decode (single-token) attention over a KV cache — the engine's hot kernel.

The reference has no decode engine (SURVEY.md §5 checkpoint/resume: absent); this
is the north-star extension (BASELINE.json: "FP8-weight Llama-style decode with
FP8 KV cache"). Design: q is one token per sequence, (B, H, D); the KV cache is
(B, Hkv, S_max, D) with a per-sequence ``length``. The kernel is bandwidth-bound
(read the valid KV prefix once), so:

- grid = (B, S_max/block_k) with the KV sweep on the sequential dim,
- all H heads processed per step (MXU M-dim = GQA group size per kv head),
- per-sequence lengths arrive via scalar prefetch; KV blocks beyond a sequence's
  length are skipped in BOTH compute (pl.when) and bandwidth: their index maps
  clamp to the last valid block, and Pallas elides the re-fetch of an unchanged
  block — so a 512-token sequence in an 8192-slot cache reads ~512 tokens, not 8192,
- online-softmax state in VMEM scratch exactly like the prefill kernel,
- optional quantized (int8/fp8) cache: the per-(seq, head, position) scales are
  folded past the dots (a (group, bk) multiply, not a (bk, D) dequant) and laid
  out (B, Hkv, S) so a block is (Hkv, bk) = heads on sublanes, positions on the
  full 128-lane axis (the transposed layout would use 4 of 128 lanes and its
  per-token scatter append lowers catastrophically).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default

_NEG_INF = -1e30
_LANES = 128


def _decode_kernel(scale, softcap, Hkv, group, block_k, quantized, window,
                   with_lse, len_ref, q_ref, k_ref, v_ref, *rest):
    if quantized:
        ks_ref, vs_ref, *rest = rest
    if with_lse:
        o_ref, lse_ref, m_sc, l_sc, acc_sc = rest
    else:
        o_ref, m_sc, l_sc, acc_sc = rest

    b = pl.program_id(0)
    si = pl.program_id(1)
    seq_len = len_ref[b]

    @pl.when(si == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    live = si * block_k < seq_len  # skip fully-invalid KV blocks
    if window:  # sliding window: also skip blocks entirely before it
        live &= si * block_k + block_k > seq_len - window

    @pl.when(live)
    def _():
        cols = si * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)  # (1, bk) global positions
        valid = cols < seq_len
        if window:
            valid &= cols >= seq_len - window

        from leetcuda_tpu.core.runtime import upcast_for_vpu

        for kvh in range(Hkv):  # static unroll over KV heads
            qg = q_ref[0, kvh * group:(kvh + 1) * group, :].astype(jnp.float32)
            # e4m3 caches decode via bit surgery, not the ~10x-slower
            # software-emulated cast (core.runtime.e4m3_bits_to_f32)
            k_blk = upcast_for_vpu(k_ref[0, kvh], jnp.float32)   # (bk, D)
            v_blk = upcast_for_vpu(v_ref[0, kvh], jnp.float32)
            s = jax.lax.dot_general(
                qg, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (group, bk)
            if quantized:
                # dequant folded past the dot: s_ij = (q_i · k_j_raw) · ks_j,
                # a (group, bk) row-scale instead of a (bk, D) dequant — D/group
                # times less VPU work. V's scale folds into P the same way.
                s = s * ks_ref[0, kvh].astype(jnp.float32)[None, :]
            if softcap:  # Gemma2: cap AFTER the dequant fold, before masking
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            s = jnp.where(valid, s, _NEG_INF)

            rows = slice(kvh * group, (kvh + 1) * group)
            m_prev = m_sc[rows, 0:1]
            l_prev = l_sc[rows, 0:1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                p = p * vs_ref[0, kvh].astype(jnp.float32)[None, :]
            # partial edge block (S_max % bk != 0): rows past the array end
            # are PADDING with undefined contents — a NaN/inf there survives
            # multiplication by p == 0 (0 * NaN = NaN) and poisons the
            # accumulator. Zero both sides of the dot at invalid positions.
            p = jnp.where(valid, p, 0.0)
            # Column-oriented mask rebuilt from a (bk,1) iota: Mosaic can't
            # reshape a (1,bk) i1 vector to (bk,1) (minor-dim insertion is
            # 32-bit-only), same pattern as attention/chunk.py.
            col_rows = si * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0)
            valid_col = col_rows < seq_len
            if window:
                valid_col &= col_rows >= seq_len - window
            v_blk = jnp.where(valid_col, v_blk, 0.0)
            acc_sc[rows, :] = acc_sc[rows, :] * alpha + jnp.dot(
                p, v_blk, preferred_element_type=jnp.float32)
            m_sc[rows, :] = jnp.broadcast_to(m_new, (group, _LANES))
            l_sc[rows, :] = jnp.broadcast_to(l_new, (group, _LANES))

    @pl.when(si == pl.num_programs(1) - 1)
    def _():
        l = l_sc[:, 0:1]
        o_ref[0] = (acc_sc[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = m_sc[:] + jnp.log(jnp.maximum(l_sc[:], 1e-30))


def _clamped_kv_map(bk, window=None):
    """Index map clamping the KV block to the sequence's valid range: all
    fully-masked grid steps map to an already-fetched block index, so Pallas
    skips their DMA (unchanged block) — bandwidth follows actual lengths (and,
    with a sliding ``window``, the window), not S_max."""

    def kv_map(b, si, len_ref):
        last = jnp.maximum(pl.cdiv(len_ref[b], bk) - 1, 0)
        first = 0
        if window is not None:
            first = jnp.maximum((len_ref[b] - window) // bk, 0)
        return (b, 0, jnp.clip(si, first, last), 0)

    return kv_map


def _pick_bk(S, block_k):
    """KV block size: min(block_k, S) — v5e sweep says 1024 is best at long
    contexts (603 GB/s vs 570 at 512; 2048+ exceeds scoped VMEM). S need NOT
    divide: the grid is cdiv(S, bk) and Pallas clips the partial edge block
    (the col < seq_len mask already covers the tail). The old
    must-divide rule silently fell back to 128-wide blocks for caches like
    S=2176 — a 5x attention slowdown measured by tools/ablate_decode.py."""
    return min(block_k, S)


def _vmem_params():
    if interpret_default():
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def make_decode_attention(*, block_k: int = 1024, sm_scale=None,
                          window: int | None = None, with_lse: bool = False,
                          shared_kv: bool = False,
                          softcap: float | None = None):
    """decode_attention(q, k_cache, v_cache, lengths) -> (B, H, D).

    q (B, H, D); caches (B, Hkv, S_max, D); lengths (B,) int32 — number of valid
    KV positions per sequence (the current token's K/V must already be appended).
    ``window``: Mistral-style sliding window — attend to the last ``window``
    positions only; earlier blocks are neither read nor computed.
    ``with_lse``: also return the log-sum-exp (B, H) — the partial-result
    statistic for flash-decoding / context-parallel merging.
    ``shared_kv``: fn(q, cache, lengths) — ONE cache operand serves as both
    K and V (MLA's latent cache, models/mla.py). The kernel is
    bandwidth-bound, so the single DMA per block matters: passing the same
    array as k_cache and v_cache would fetch every block twice.
    """

    def impl(q, k_cache, v_cache, lengths):
        B, H, D = q.shape
        _, Hkv, S, _ = k_cache.shape
        group = H // Hkv
        bk = _pick_bk(S, block_k)
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)

        kv_specs = [pl.BlockSpec((1, Hkv, bk, D), _clamped_kv_map(bk, window),
                                 memory_space=pltpu.VMEM)]
        if not shared_kv:
            kv_specs.append(
                pl.BlockSpec((1, Hkv, bk, D), _clamped_kv_map(bk, window),
                             memory_space=pltpu.VMEM))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, cdiv(S, bk)),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, si, L: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                *kv_specs,
            ],
            out_specs=(
                pl.BlockSpec((1, H, D), lambda b, si, L: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, _LANES), lambda b, si, L: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ) if with_lse else pl.BlockSpec(
                (1, H, D), lambda b, si, L: (b, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((H, _LANES), jnp.float32),
                pltpu.VMEM((H, _LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        )
        out_shape = jax.ShapeDtypeStruct((B, H, D), q.dtype)
        if with_lse:
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((B, H, _LANES), jnp.float32))
        body = functools.partial(_decode_kernel, scale, softcap, Hkv, group,
                                 bk, False, window, with_lse)
        if shared_kv:
            def body(len_ref, q_ref, kv_ref, *rest, _b=body):  # noqa: F811
                _b(len_ref, q_ref, kv_ref, kv_ref, *rest)
        operands = (q, k_cache) if shared_kv else (q, k_cache, v_cache)
        res = pl.pallas_call(
            body,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret_default(),
            **_vmem_params(),
        )(lengths.astype(jnp.int32), *operands)
        if with_lse:
            out, lse = res
            return out, lse[..., 0]
        return res

    if shared_kv:
        return jax.jit(lambda q, cache, lengths: impl(q, cache, None,
                                                      lengths))
    return jax.jit(impl)


def make_decode_attention_quantized(*, block_k: int = 1024, sm_scale=None,
                                    window: int | None = None,
                                    shared_kv: bool = False,
                                    softcap: float | None = None,
                                    with_lse: bool = False):
    """Quantized-cache decode: caches int8/fp8, per-(b, head, pos) f32 scales.

    fn(q, k_cache_q, v_cache_q, k_scale, v_scale, lengths); scales (B, Hkv, S).
    ``window``: sliding window, same semantics as make_decode_attention.
    ``shared_kv``: fn(q, cache_q, scale, lengths) — one quantized cache (and
    one scale) serves as both K and V (MLA's quantized latent cache): one
    DMA per block + scale block.
    """

    def impl(q, k_cache, v_cache, k_scale, v_scale, lengths):
        B, H, D = q.shape
        _, Hkv, S, _ = k_cache.shape
        group = H // Hkv
        bk = _pick_bk(S, block_k)
        assert k_scale.shape == (B, Hkv, S), "scales must be (B, Hkv, S)"
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)

        def s_map(b, si, L):
            last = jnp.maximum(pl.cdiv(L[b], bk) - 1, 0)
            first = 0
            if window is not None:
                first = jnp.maximum((L[b] - window) // bk, 0)
            return (b, 0, jnp.clip(si, first, last))

        cache_spec = pl.BlockSpec((1, Hkv, bk, D), _clamped_kv_map(bk, window),
                                  memory_space=pltpu.VMEM)
        scale_spec = pl.BlockSpec((1, Hkv, bk), s_map, memory_space=pltpu.VMEM)
        if shared_kv:
            in_specs = [pl.BlockSpec((1, H, D), lambda b, si, L: (b, 0, 0),
                                     memory_space=pltpu.VMEM),
                        cache_spec, scale_spec]
            operands = (q, k_cache, k_scale)
        else:
            in_specs = [pl.BlockSpec((1, H, D), lambda b, si, L: (b, 0, 0),
                                     memory_space=pltpu.VMEM),
                        cache_spec, cache_spec, scale_spec, scale_spec]
            operands = (q, k_cache, v_cache, k_scale, v_scale)
        o_spec = pl.BlockSpec((1, H, D), lambda b, si, L: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((1, H, _LANES), lambda b, si, L: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, cdiv(S, bk)),
            in_specs=in_specs,
            out_specs=(o_spec, lse_spec) if with_lse else o_spec,
            scratch_shapes=[
                pltpu.VMEM((H, _LANES), jnp.float32),
                pltpu.VMEM((H, _LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        )
        out_shape = jax.ShapeDtypeStruct((B, H, D), q.dtype)
        if with_lse:
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((B, H, _LANES), jnp.float32))
        body = functools.partial(_decode_kernel, scale, softcap, Hkv, group,
                                 bk, True,
                                 window, with_lse)
        if shared_kv:
            def body(len_ref, q_ref, kv_ref, s_ref, *rest, _b=body):  # noqa: F811
                _b(len_ref, q_ref, kv_ref, kv_ref, s_ref, s_ref, *rest)
        res = pl.pallas_call(
            body,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret_default(),
            **_vmem_params(),
        )(lengths.astype(jnp.int32), *operands)
        if with_lse:
            out, lse = res
            return out, lse[..., 0]
        return res

    if shared_kv:
        return jax.jit(lambda q, cache, scale, lengths: impl(
            q, cache, None, scale, None, lengths))
    return jax.jit(impl)


def decode_attention_ref(q, k_cache, v_cache, lengths, sm_scale=None,
                         window=None, softcap=None):
    B, H, D = q.shape
    _, Hkv, S, _ = k_cache.shape
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    if Hkv != H:
        k_cache = jnp.repeat(k_cache, H // Hkv, axis=1)
        v_cache = jnp.repeat(v_cache, H // Hkv, axis=1)
    s = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32),
                   k_cache.astype(jnp.float32)) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    mask = jnp.arange(S)[None, None, :] < lengths[:, None, None]
    if window is not None:
        mask &= (jnp.arange(S)[None, None, :]
                 >= (lengths - window)[:, None, None])
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p,
                      v_cache.astype(jnp.float32)).astype(q.dtype)


decode_attention = make_decode_attention()


# --- registry: quantized-cache decode rungs ---------------------------------------
# The int8 rung is the production KV path; the fp8 (e4m3) rung is the north-
# star dtype — emulated-cast-speed on v5e but REAL on-chip evidence that the
# fp8 cache compiles through Mosaic and matches the dequantized oracle
# (VERDICT r2 #5; reference analog: fp8 rungs bound first-class,
# block_all_reduce.cu:873-894).
from leetcuda_tpu.core.registry import register_op  # noqa: E402


def _decode_q_ref(q, k_q, v_q, k_scale, v_scale, lengths):
    k = k_q.astype(jnp.float32) * k_scale.astype(jnp.float32)[..., None]
    v = v_q.astype(jnp.float32) * v_scale.astype(jnp.float32)[..., None]
    return decode_attention_ref(q, k, v, lengths)


def _decode_q_flops(q, k_q, *rest):
    B, H, D = q.shape
    S = k_q.shape[2]
    return float(2 * 2 * B * H * S * D)


_decode_q_fn = make_decode_attention_quantized(block_k=128)  # one shared
# jitted fn: both rungs hit the same jit cache entry on-chip (the kernel is
# cache-dtype-generic; the rung split is an inventory/tagging distinction)
for _name, _tag in [("decode_attn_int8kv", "int8"),
                    ("decode_attn_fp8kv", "fp8")]:
    register_op(
        _name,
        ref=_decode_q_ref, flops=_decode_q_flops,
        atol=5e-2, rtol=5e-2,
        family="decode-attn-quant", tags=(_tag, "decode"),
    )(_decode_q_fn)


def _decode_shared_ref(q, cache, lengths):
    return decode_attention_ref(q, cache, cache, lengths)


def _decode_shared_flops(q, cache, *rest):
    B, H, D = q.shape
    return float(2 * 2 * B * H * cache.shape[2] * D)


register_op(
    "decode_attn_shared_kv",
    ref=_decode_shared_ref, flops=_decode_shared_flops,
    atol=2e-2, rtol=2e-2,
    family="decode-attn-shared", tags=("shared-kv", "mla", "decode"),
)(make_decode_attention(block_k=128, shared_kv=True))


def _decode_shared_q_ref(q, cache_q, scale, lengths):
    c = cache_q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]
    return decode_attention_ref(q, c, c, lengths)


_decode_shared_q_fn = make_decode_attention_quantized(block_k=128,
                                                      shared_kv=True)
for _name, _tag in [("decode_attn_shared_kv_int8", "int8"),
                    ("decode_attn_shared_kv_fp8", "fp8")]:
    register_op(
        _name,
        ref=_decode_shared_q_ref, flops=_decode_shared_flops,
        atol=5e-2, rtol=5e-2,
        family="decode-attn-shared", tags=(_tag, "shared-kv", "mla",
                                           "decode"),
    )(_decode_shared_q_fn)


register_op(
    # Gemma2 decode semantics: capped logits over the KV cache
    "decode_attn_softcap",
    # cap chosen to BITE at canonical score scale — see the flash softcap rung
    ref=functools.partial(decode_attention_ref, softcap=0.5),
    flops=lambda q, k, v, l: float(
        2 * 2 * q.shape[0] * q.shape[1] * k.shape[2] * q.shape[2]),
    atol=2e-2, rtol=2e-2,
    family="decode-attn-softcap", tags=("softcap", "decode"),
)(make_decode_attention(block_k=128, softcap=0.5))
