"""Multi-head Latent Attention (MLA, DeepSeek-V2/V3 family) — TPU-native.

Beyond-reference serving capability: the KV cache stores ONE shared latent
row per position — ``c = x @ W_dkv`` (kv_lora_rank lanes) plus a small
RoPE'd key slice — instead of per-head K and V. Cache memory drops by
``H·(d_n + d_r + d_v) / (d_c + d_r)`` — 8.9x at the default config, 17.8x
at 32 heads — which is the difference between paging and not paging at
long context.

The TPU-first part is the DECODE mapping: with the weight-absorption
identity (fold W_uk into the query, W_uv into the output), per-position
attention becomes MQA with ONE latent "head" of width d_c + d_r:

    score_h(t) = [q_h W_uk , q_h^rope] . [c_t , k_t^rope]
    out_h      = (sum_t A_h(t) c_t) W_uv_h

so the existing Pallas decode kernel (`attention/decode.py`) runs it
(`shared_kv=True`): the latent cache serves as BOTH K and V — one operand,
one DMA per block on the bandwidth-bound kernel — with Hkv=1,
D = d_c + d_r, and the first d_c output lanes are the attended latent.
The absorbed projections are dense MXU matmuls.

Prefill runs the expanded MHA form (einsum scores; the MXU eats it) and
returns the latent cache for decode. Numerics: absorbed decode ==
expanded attention per position (tests/test_mla.py parity test).

Reference analog: none — the reference corpus (SURVEY §2) has no MLA; this
extends the serving stack the same way fp8-KV/int4 did.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leetcuda_tpu.attention.decode import (make_decode_attention,
                                           make_decode_attention_quantized)
from leetcuda_tpu.models.llama import _dus_token
from leetcuda_tpu.ops.rope import apply_rope_half, apply_rope_interleaved

_QDT = {"int8": (jnp.int8, 127.0), "fp8": (jnp.float8_e4m3fn, 448.0)}


def _quantize_latent(latent, quant: str):
    """Per-position symmetric quantization of latent rows (..., d_c + d_r):
    one f32 scale per position (c and k_rope share it — the latent row is
    one DMA unit, and a split scale would double the scale traffic)."""
    qdt, qmax = _QDT[quant]
    amax = jnp.max(jnp.abs(latent.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax, 1e-8) / qmax
    q = latent.astype(jnp.float32) / s[..., None]
    if quant == "int8":
        q = jnp.clip(jnp.round(q), -127, 127)
    return q.astype(qdt), s.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class MLAConfig:
    dim: int = 2048
    n_heads: int = 16
    kv_lora_rank: int = 512       # d_c: latent width shared by K-nope and V
    qk_nope_head_dim: int = 128   # d_n: per-head non-rotary key/query lanes
    qk_rope_head_dim: int = 64    # d_r: shared rotary key lanes (1 "head")
    v_head_dim: int = 128         # d_v: per-head value lanes (expanded form)
    rope_theta: float = 10000.0
    # DeepSeek conventions (HF deepseek_v2 golden parity): interleaved-pair
    # RoPE on the rotary lanes, RMSNorm on the latent before up-projection
    # (the cache stores the NORMED latent — the norm is position-wise, so it
    # commutes with caching)
    rope_interleaved: bool = True
    latent_norm: bool = True
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def latent_dim(self) -> int:
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim


def init_mla_params(key, cfg: MLAConfig):
    """One MLA attention layer (HF DeepSeek naming minus the LoRA-q path)."""
    D, H = cfg.dim, cfg.n_heads
    dc, dn, dr, dv = (cfg.kv_lora_rank, cfg.qk_nope_head_dim,
                      cfg.qk_rope_head_dim, cfg.v_head_dim)
    ks = jax.random.split(key, 5)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(cfg.dtype)

    p = {
        "w_q": dense(ks[0], D, (D, H * (dn + dr))),
        "w_dkv": dense(ks[1], D, (D, dc + dr)),
        "w_uk": dense(ks[2], dc, (H, dc, dn)),
        "w_uv": dense(ks[3], dc, (H, dc, dv)),
        "w_o": dense(ks[4], H * dv, (H * dv, D)),
    }
    if cfg.latent_norm:
        p["c_norm"] = jnp.ones((dc,), cfg.dtype)
    return p


def mla_param_shardings(cfg: MLAConfig):
    """Megatron-style TP rules for one MLA layer: per-head projections shard
    on tp (w_q column-parallel, w_uk/w_uv on their head dim, w_o
    row-parallel); the latent down-projection w_dkv is REPLICATED — the
    latent is shared by every head, and at (D, d_c + d_r) it is the one
    place where replicated compute is cheaper than an all-gather. The
    latent cache is likewise replicated across tp (it is 9-18x smaller
    than an expanded cache, so replication costs less than sharded MHA)."""
    return {
        "w_q": P(None, "tp"),
        "w_dkv": P(None, None),
        "c_norm": P(None),
        "w_uk": P("tp", None, None),
        "w_uv": P("tp", None, None),
        "w_o": P("tp", None),
    }


def shard_mla_params(params, cfg: MLAConfig, mesh: Mesh):
    """device_put one MLA layer's params per mla_param_shardings. A param
    without a sharding rule raises KeyError — the one place that catches a
    new weight added without thinking about its placement."""
    spec = mla_param_shardings(cfg)
    return {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
            for k, v in params.items()}


def _q_proj(params, x, cfg: MLAConfig):
    """x (..., D) -> (qn (..., H, d_n), qr (..., H, d_r)) pre-RoPE."""
    H, dn, dr = cfg.n_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    q = (x @ params["w_q"]).reshape(*x.shape[:-1], H, dn + dr)
    return q[..., :dn], q[..., dn:]


def _latent_proj(params, x, cfg: MLAConfig):
    """x (..., D) -> (c (..., d_c), kr (..., d_r)); c is RMS-normed when the
    config says so (kv_a_layernorm) — the single site both prefill and
    decode go through, so the cache always holds the normed latent."""
    dc = cfg.kv_lora_rank
    ckr = x @ params["w_dkv"]
    c, kr = ckr[..., :dc], ckr[..., dc:]
    if cfg.latent_norm:
        c = _mla_rms(c, params["c_norm"], cfg.norm_eps)
    return c, kr


def _rope(x, positions, cfg: MLAConfig):
    fn = (apply_rope_interleaved if cfg.rope_interleaved
          else apply_rope_half)
    return fn(x, positions, cfg.rope_theta)


def mla_prefill(params, x, cfg: MLAConfig, max_seq: int | None = None,
                quant: str | None = None):
    """Causal MLA over hidden states x (B, S, D).

    Returns (y (B, S, D), latent_cache (B, 1, max_seq, d_c + d_r)) — the
    cache rows hold [c , RoPE(k_rope)] and feed mla_decode_step directly.
    Expanded MHA form: scores via einsum (one MXU contraction per term),
    f32 softmax. ``quant`` ("int8" | "fp8"): the returned cache is a
    (quantized rows, per-position f32 scales (B, 1, max_seq)) pair —
    compounds the latent compression (int8 latent at 32 heads: 35x vs the
    bf16 expanded-MHA cache)."""
    B, S, D = x.shape
    H = cfg.n_heads
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    qn, qr = _q_proj(params, x, cfg)                       # (B,S,H,dn/dr)
    qr = _rope(qr, positions, cfg)
    c, kr = _latent_proj(params, x, cfg)                   # (B,S,dc/dr)
    kr = _rope(kr[:, :, None, :], positions, cfg)[:, :, 0]  # (B,S,dr)

    kn = jnp.einsum("bsc,hcn->bshn", c.astype(jnp.float32),
                    params["w_uk"].astype(jnp.float32))
    v = jnp.einsum("bsc,hcv->bshv", c.astype(jnp.float32),
                   params["w_uv"].astype(jnp.float32))

    scale = 1.0 / math.sqrt(cfg.qk_head_dim)
    s = (jnp.einsum("bthn,bshn->bhts", qn.astype(jnp.float32), kn)
         + jnp.einsum("bthr,bsr->bhts", qr.astype(jnp.float32),
                      kr.astype(jnp.float32))) * scale
    mask = jnp.tril(jnp.ones((S, S), bool))
    s = jnp.where(mask[None, None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhts,bshv->bthv", a, v)              # (B,S,H,dv)
    y = (out.reshape(B, S, H * cfg.v_head_dim).astype(x.dtype)
         @ params["w_o"])

    max_seq = max_seq or S
    assert max_seq >= S, f"max_seq {max_seq} < prompt length {S}"
    latent = jnp.concatenate([c, kr], axis=-1)[:, None]    # (B,1,S,dc+dr)
    if quant is not None:
        lat_q, lat_s = _quantize_latent(latent, quant)
        cache = jax.lax.dynamic_update_slice(
            jnp.zeros((B, 1, max_seq, cfg.latent_dim), _QDT[quant][0]),
            lat_q, (0, 0, 0, 0))
        scales = jax.lax.dynamic_update_slice(
            jnp.ones((B, 1, max_seq), jnp.float32), lat_s, (0, 0, 0))
        return y, (cache, scales)
    cache = jnp.zeros((B, 1, max_seq, cfg.latent_dim), cfg.dtype)
    cache = jax.lax.dynamic_update_slice(
        cache, latent.astype(cache.dtype), (0, 0, 0, 0))
    return y, cache


@functools.lru_cache(maxsize=8)
def _decode_kernel(block_k: int, scale: float, quantized: bool = False):
    """Kernel factory cached by config — a fresh make_decode_attention per
    step would retrace/recompile every call. shared_kv: the latent cache is
    both K and V, and the kernel is bandwidth-bound — one DMA per block,
    not two."""
    make = (make_decode_attention_quantized if quantized
            else make_decode_attention)
    return make(block_k=block_k, sm_scale=scale, shared_kv=True)


@functools.lru_cache(maxsize=None)
def _paged_decode_kernel(scale: float, quantized: bool = False):
    from leetcuda_tpu.attention.paged import make_paged_attention

    return make_paged_attention(sm_scale=scale, quantized=quantized,
                                shared_kv=True)


def init_paged_latent_cache(cfg: MLAConfig, num_pages: int, page: int,
                            quant: str | None = None):
    """Paged latent pool for long-context MLA serving: (num_pages, 1,
    page, d_c + d_r) — block-table indirection over the ALREADY-compressed
    latent rows compounds with the 9-18x cache shrink. ``quant``
    ("int8"|"fp8") adds a per-(page, position) f32 scale pool. Allocate
    pages with attention/paged.PageManager exactly like the llama engine."""
    L = cfg.latent_dim
    if quant is None:
        return jnp.zeros((num_pages, 1, page, L), cfg.dtype)
    qdt = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
    return (jnp.zeros((num_pages, 1, page, L), qdt),
            jnp.zeros((num_pages, 1, page), jnp.float32))


def mla_decode_step(params, x_t, cache, lengths, cfg: MLAConfig,
                    block_k: int = 1024, mesh: Mesh | None = None,
                    page_table=None):
    """One absorbed-MQA decode step. x_t (B, D) hidden states at positions
    ``lengths``; cache (B, 1, max_seq, d_c + d_r). Returns (y (B, D),
    cache with this token's latent appended).

    The latent cache is the decode kernel's single shared-KV operand
    (one DMA per block): lanes [:d_c] of the attended output are
    sum_t A(t)·c_t, which W_uv expands per head. Lanes [d_c:] (sum A·k_rope)
    are discarded — 11% extra VPU work, no extra memory traffic.

    ``page_table`` (B, P_max) int32: the cache is a PAGED latent pool from
    ``init_paged_latent_cache`` ((num_pages, 1, page, L) or its quantized
    (pool, scales) pair) — block-table serving for long-context DeepSeek
    with the same PageManager the llama engine uses. The page holding
    position lengths[b] must be allocated."""
    B, D = x_t.shape
    H, dc = cfg.n_heads, cfg.kv_lora_rank
    pos = lengths

    qn, qr = _q_proj(params, x_t, cfg)                     # (B,H,dn/dr)
    qr = _rope(qr[:, None], pos[:, None], cfg)[:, 0]       # (B,H,dr)
    # absorb W_uk into the query: q_lat . c == (q W_uk) . c
    q_lat = jnp.einsum("bhn,hcn->bhc", qn.astype(jnp.float32),
                       params["w_uk"].astype(jnp.float32))
    q_cat = jnp.concatenate([q_lat, qr.astype(jnp.float32)], axis=-1)
    if not isinstance(cache, tuple):
        q_cat = q_cat.astype(cache.dtype)

    c_t, kr_t = _latent_proj(params, x_t, cfg)
    kr_t = _rope(kr_t[:, None, None, :], pos[:, None], cfg)[:, 0, 0]
    latent_t = jnp.concatenate([c_t, kr_t], axis=-1)[:, None]  # (B,1,dc+dr)

    sm = 1.0 / math.sqrt(cfg.qk_head_dim)

    def run(kern, *args):
        """Under a mesh: q heads shard on tp, the latent cache (and scales)
        stay replicated on tp — shard_map because GSPMD cannot partition a
        custom call. Single-device otherwise."""
        if mesh is None:
            return kern(*args)
        cache_specs = tuple(P("dp", None, None, None) if a.ndim == 4
                            else P("dp", None, None) for a in args[1:-1])
        return shard_map(
            kern, mesh=mesh,
            in_specs=(P("dp", "tp", None), *cache_specs, P("dp")),
            out_specs=P("dp", "tp", None), check_vma=False)(*args)

    if page_table is not None:
        from leetcuda_tpu.attention.paged import _dus_pool

        def run_paged(kern, *args):
            # pool/scale pools have NO batch dim — shared across dp shards
            # (each shard attends its own page-table rows into the common
            # pool); q heads shard on tp, latent lanes replicated
            if mesh is None:
                return kern(*args)
            specs = [P("dp", "tp", None)]
            for a in args[1:-2]:
                specs.append(P(None, None, None, None) if a.ndim == 4
                             else P(None, None, None))
            specs += [P("dp", None), P("dp")]
            return shard_map(kern, mesh=mesh, in_specs=tuple(specs),
                             out_specs=P("dp", "tp", None),
                             check_vma=False)(*args)

        page = (cache[0] if isinstance(cache, tuple) else cache).shape[2]
        phys = page_table[jnp.arange(B), pos // page]
        offs = pos % page
        if isinstance(cache, tuple):                       # quantized pool
            pool, scales = cache
            quant = "int8" if pool.dtype == jnp.int8 else "fp8"
            lat_q, lat_s = _quantize_latent(latent_t, quant)
            pool = _dus_pool(pool, lat_q, phys, offs)
            scales = _dus_pool(scales, lat_s[:, :, None], phys, offs)
            cache = (pool, scales)
            att = run_paged(_paged_decode_kernel(sm, quantized=True),
                            q_cat.astype(jnp.float32), pool, scales,
                            page_table, lengths + 1)
        else:
            pool = _dus_pool(cache, latent_t, phys, offs)
            cache = pool
            att = run_paged(_paged_decode_kernel(sm),
                            q_cat.astype(pool.dtype), pool, page_table,
                            lengths + 1)
    elif isinstance(cache, tuple):                         # quantized latent
        rows, scales = cache
        quant = "int8" if rows.dtype == jnp.int8 else "fp8"
        lat_q, lat_s = _quantize_latent(latent_t, quant)
        rows = _dus_token(rows, lat_q, jnp.arange(B), pos)
        scales = _dus_token(scales, lat_s[:, :, None], jnp.arange(B), pos)
        cache = (rows, scales)
        att = run(_decode_kernel(block_k, sm, quantized=True),
                  q_cat.astype(jnp.float32), rows, scales, lengths + 1)
    else:
        cache = _dus_token(cache, latent_t, jnp.arange(B), pos)
        att = run(_decode_kernel(block_k, sm),
                  q_cat, cache, lengths + 1)               # (B,H,dc+dr)
    out_lat = att[..., :dc].astype(jnp.float32)
    out = jnp.einsum("bhc,hcv->bhv", out_lat,
                     params["w_uv"].astype(jnp.float32))
    y = (out.reshape(B, H * cfg.v_head_dim).astype(x_t.dtype)
         @ params["w_o"])
    return y, cache


def kv_bytes_per_token(cfg: MLAConfig) -> tuple[int, int]:
    """(mla_bytes, mha_bytes) per token per layer at cfg.dtype — the cache
    compression this buys. The expanded-MHA baseline caches per-head K at
    qk_head_dim (d_n + d_r) lanes and V at d_v lanes: 8.9x at the defaults
    (H=16), 17.8x at H=32."""
    item = jnp.dtype(cfg.dtype).itemsize
    mla = cfg.latent_dim * item
    mha = cfg.n_heads * (cfg.qk_head_dim + cfg.v_head_dim) * item
    return mla, mha


# --- minimal MLA language model ---------------------------------------------------
# Enough model around the attention to serve tokens end-to-end: embed ->
# L x (MLA + SwiGLU MLP, pre-RMSNorm, residual) -> norm -> tied lm head.
# This is the integration surface a DeepSeek-family checkpoint loader will
# target; the serving path (latent caches + absorbed decode) is already the
# production-shaped one.


@dataclasses.dataclass(frozen=True)
class MLAModelConfig(MLAConfig):
    vocab_size: int = 32000
    n_layers: int = 2
    ffn_dim: int = 4096
    norm_eps: float = 1e-5
    # DeepSeek MoE (layers >= first_k_dense get routed experts + an
    # always-on shared expert; greedy softmax top-k, optionally
    # re-normalized, scaled by routed_scaling_factor)
    n_routed_experts: int = 0
    num_experts_per_tok: int = 2
    moe_ffn_dim: int = 0
    n_shared_experts: int = 0
    first_k_dense: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False

    def is_moe_layer(self, i: int) -> bool:
        return self.n_routed_experts > 0 and i >= self.first_k_dense


def init_mla_model(key, cfg: MLAModelConfig):
    k_embed, k_norm, *k_layers = jax.random.split(key, 2 + cfg.n_layers)
    D, F = cfg.dim, cfg.ffn_dim

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(cfg.dtype)

    layers = []
    for i, kl in enumerate(k_layers):
        ka, kg, ku, kd, km = jax.random.split(kl, 5)
        layer = {
            "attn_norm": jnp.ones((D,), cfg.dtype),
            "attn": init_mla_params(ka, cfg),
            "mlp_norm": jnp.ones((D,), cfg.dtype),
        }
        if cfg.is_moe_layer(i):
            E, Fm = cfg.n_routed_experts, cfg.moe_ffn_dim
            Fs = Fm * max(cfg.n_shared_experts, 1)
            kge, kue, kde, kgw, ksg, ksu, ksd = jax.random.split(km, 7)
            layer["moe"] = {
                "gate_w": dense(kgw, D, (E, D)),
                "w_gate": dense(kge, D, (E, D, Fm)),
                "w_up": dense(kue, D, (E, D, Fm)),
                "w_down": dense(kde, Fm, (E, Fm, D)),
            }
            if cfg.n_shared_experts:
                layer["moe"]["shared"] = {
                    "w_gate": dense(ksg, D, (D, Fs)),
                    "w_up": dense(ksu, D, (D, Fs)),
                    "w_down": dense(ksd, Fs, (Fs, D)),
                }
        else:
            layer.update({
                "w_gate": dense(kg, D, (D, F)),
                "w_up": dense(ku, D, (D, F)),
                "w_down": dense(kd, F, (F, D)),
            })
        layers.append(layer)
    return {
        "embed": dense(k_embed, D, (cfg.vocab_size, D)),
        "norm": jnp.ones((D,), cfg.dtype),
        "layers": layers,
    }


def _mla_rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(v + eps)
            ).astype(x.dtype) * w


def _mla_mlp(x, layer):
    g = jax.nn.silu((x @ layer["w_gate"]).astype(jnp.float32))
    return ((g * (x @ layer["w_up"]).astype(jnp.float32))
            .astype(x.dtype) @ layer["w_down"])


def _deepseek_moe(x, moe, cfg: MLAModelConfig):
    """DeepSeek MoE (greedy top-k): softmax router scores in f32, top-k
    weights (optionally re-normalized) scaled by routed_scaling_factor,
    plus the always-on shared expert. Dense-combine formulation — every
    expert evaluates every token and a (tokens, E) weight matrix combines
    them: HF-exact and MXU-shaped; capacity-routed dispatch for
    production-scale expert counts lives in models/moe.py (moe_ffn)."""
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    scores = jax.nn.softmax(
        (x.astype(jnp.float32) @ moe["gate_w"].astype(jnp.float32).T),
        axis=-1)                                           # (..., E)
    topw, topi = jax.lax.top_k(scores, k)
    if cfg.norm_topk_prob:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    topw = topw * cfg.routed_scaling_factor
    w_full = jnp.sum(jax.nn.one_hot(topi, E, dtype=jnp.float32)
                     * topw[..., None], axis=-2)           # (..., E)

    g = jnp.einsum("...d,edf->...ef", x.astype(jnp.float32),
                   moe["w_gate"].astype(jnp.float32))
    u = jnp.einsum("...d,edf->...ef", x.astype(jnp.float32),
                   moe["w_up"].astype(jnp.float32))
    h = jax.nn.silu(g) * u
    y = jnp.einsum("...ef,efd->...ed", h,
                   moe["w_down"].astype(jnp.float32))
    out = jnp.einsum("...e,...ed->...d", w_full, y)
    if "shared" in moe:
        out = out + _mla_mlp(x, moe["shared"]).astype(jnp.float32)
    return out.astype(x.dtype)


def _mla_ffn(x, layer, cfg: MLAModelConfig):
    if "moe" in layer:
        return _deepseek_moe(x, layer["moe"], cfg)
    return _mla_mlp(x, layer)


def mla_model_prefill(params, tokens, cfg: MLAModelConfig,
                      max_seq: int | None = None):
    """tokens (B, S) -> (logits (B, S, V), caches [per-layer latent])."""
    x = jnp.take(params["embed"], tokens, axis=0)
    caches = []
    for layer in params["layers"]:
        a, cache = mla_prefill(layer["attn"],
                               _mla_rms(x, layer["attn_norm"], cfg.norm_eps),
                               cfg, max_seq=max_seq)
        x = x + a
        x = x + _mla_ffn(_mla_rms(x, layer["mlp_norm"], cfg.norm_eps),
                         layer, cfg)
        caches.append(cache)
    x = _mla_rms(x, params["norm"], cfg.norm_eps)
    w_lm = params.get("lm_head", params["embed"])
    return (x @ w_lm.T).astype(jnp.float32), caches


def mla_model_decode_step(params, tokens, caches, lengths,
                          cfg: MLAModelConfig, page_table=None):
    """tokens (B,) -> (logits (B, V), caches) via absorbed latent decode.

    ``page_table``: caches are per-layer PAGED latent pools
    (init_paged_latent_cache); all layers share one block table — the same
    layout the llama engine's paged pools use."""
    x = jnp.take(params["embed"], tokens, axis=0)
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        a, cache = mla_decode_step(
            layer["attn"], _mla_rms(x, layer["attn_norm"], cfg.norm_eps),
            cache, lengths, cfg, page_table=page_table)
        x = x + a
        x = x + _mla_ffn(_mla_rms(x, layer["mlp_norm"], cfg.norm_eps),
                         layer, cfg)
        new_caches.append(cache)
    x = _mla_rms(x, params["norm"], cfg.norm_eps)
    w_lm = params.get("lm_head", params["embed"])
    return (x @ w_lm.T).astype(jnp.float32), new_caches


def mla_generate(params, cfg: MLAModelConfig, prompts, max_new: int,
                 max_seq: int | None = None):
    """Greedy generation, whole decode loop in one jit (lax.scan) over the
    per-layer latent caches — engine/engine.py's generate_scan shape, on a
    cache 9-18x smaller."""
    B, S = prompts.shape
    max_seq = max_seq or S + max_new

    @jax.jit
    def go(params, prompts):
        logits, caches = mla_model_prefill(params, prompts, cfg,
                                           max_seq=max_seq)
        first = jnp.argmax(logits[:, S - 1], axis=-1).astype(jnp.int32)
        lengths = jnp.full((B,), S, jnp.int32)

        def body(carry, _):
            toks, caches, lengths = carry
            lg, caches = mla_model_decode_step(params, toks, caches,
                                               lengths, cfg)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, caches, lengths + 1), toks

        (_, _, _), toks = jax.lax.scan(
            body, (first, caches, lengths), None, length=max_new)
        return toks.T

    return go(params, prompts)


# --- HF DeepSeek loader ----------------------------------------------------------
# transformers' core DeepseekV2 port (modeling_deepseek_v2.py) is the golden
# oracle: load_deepseek_v2 maps a (tiny, random-init or real) HF model's
# state dict onto this module's trees, and tests/test_mla.py pins logits
# parity — the same standard the Llama/Qwen/Gemma loaders meet.


def config_from_hf_deepseek(hf_cfg) -> "MLAModelConfig":
    assert hf_cfg.q_lora_rank is None, "q-LoRA path not implemented"
    # fail LOUDLY on conventions we do not reproduce rather than emitting
    # silently-wrong logits (real V2 checkpoints ship yarn rope_scaling
    # with mscale folded into the attention scale; some configs add biases)
    assert getattr(hf_cfg, "rope_scaling", None) is None, (
        "yarn rope_scaling (incl. mscale attention scaling) not "
        "implemented — logits would silently diverge")
    assert not getattr(hf_cfg, "attention_bias", False), (
        "attention biases not implemented")
    moe = {}
    n_routed = getattr(hf_cfg, "n_routed_experts", None)
    if n_routed and hf_cfg.num_hidden_layers > hf_cfg.first_k_dense_replace:
        assert hf_cfg.topk_method == "greedy", (
            "only greedy top-k routing implemented (V2-Lite); "
            "group_limited_greedy would silently mis-route")
        moe = dict(
            n_routed_experts=n_routed,
            num_experts_per_tok=hf_cfg.num_experts_per_tok,
            moe_ffn_dim=hf_cfg.moe_intermediate_size,
            n_shared_experts=hf_cfg.n_shared_experts or 0,
            first_k_dense=hf_cfg.first_k_dense_replace,
            routed_scaling_factor=hf_cfg.routed_scaling_factor,
            norm_topk_prob=hf_cfg.norm_topk_prob)
    return MLAModelConfig(
        dim=hf_cfg.hidden_size, n_heads=hf_cfg.num_attention_heads,
        kv_lora_rank=hf_cfg.kv_lora_rank,
        qk_nope_head_dim=hf_cfg.qk_nope_head_dim,
        qk_rope_head_dim=hf_cfg.qk_rope_head_dim,
        v_head_dim=hf_cfg.v_head_dim, rope_theta=hf_cfg.rope_theta,
        norm_eps=hf_cfg.rms_norm_eps, vocab_size=hf_cfg.vocab_size,
        n_layers=hf_cfg.num_hidden_layers,
        ffn_dim=hf_cfg.intermediate_size, dtype=jnp.float32, **moe)


def load_deepseek_v2(hf_model):
    """(params, cfg) from a transformers DeepseekV2ForCausalLM. Dense and
    MoE layers (greedy routing + shared experts); the q-LoRA path and
    yarn rope_scaling assert out."""
    import numpy as np

    hf_cfg = hf_model.config
    cfg = config_from_hf_deepseek(hf_cfg)
    H, dn, dr, dv, dc = (cfg.n_heads, cfg.qk_nope_head_dim,
                         cfg.qk_rope_head_dim, cfg.v_head_dim,
                         cfg.kv_lora_rank)
    sd = {k: np.asarray(v.detach().to("cpu").float().numpy())
          for k, v in hf_model.state_dict().items()}

    def t(name):  # torch Linear stores (out, in) -> ours is (in, out)
        return jnp.asarray(sd[name].T, cfg.dtype)

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        # kv_b_proj (H*(dn+dv), dc): rows are [head][dn "+" dv]
        kv_b = sd[p + "self_attn.kv_b_proj.weight"].reshape(H, dn + dv, dc)
        layer = {
            "attn_norm": jnp.asarray(sd[p + "input_layernorm.weight"],
                                     cfg.dtype),
            "mlp_norm": jnp.asarray(
                sd[p + "post_attention_layernorm.weight"], cfg.dtype),
            "attn": {
                "w_q": t(p + "self_attn.q_proj.weight"),
                "w_dkv": t(p + "self_attn.kv_a_proj_with_mqa.weight"),
                "c_norm": jnp.asarray(
                    sd[p + "self_attn.kv_a_layernorm.weight"], cfg.dtype),
                "w_uk": jnp.asarray(
                    kv_b[:, :dn].transpose(0, 2, 1), cfg.dtype),
                "w_uv": jnp.asarray(
                    kv_b[:, dn:].transpose(0, 2, 1), cfg.dtype),
                "w_o": t(p + "self_attn.o_proj.weight"),
            },
        }
        if cfg.is_moe_layer(i):
            E = cfg.n_routed_experts
            layer["moe"] = {
                "gate_w": jnp.asarray(sd[p + "mlp.gate.weight"], cfg.dtype),
                "w_gate": jnp.stack([t(p + f"mlp.experts.{e}."
                                         "gate_proj.weight")
                                     for e in range(E)]),
                "w_up": jnp.stack([t(p + f"mlp.experts.{e}.up_proj.weight")
                                   for e in range(E)]),
                "w_down": jnp.stack(
                    [t(p + f"mlp.experts.{e}.down_proj.weight")
                     for e in range(E)]),
            }
            if cfg.n_shared_experts:
                layer["moe"]["shared"] = {
                    "w_gate": t(p + "mlp.shared_experts.gate_proj.weight"),
                    "w_up": t(p + "mlp.shared_experts.up_proj.weight"),
                    "w_down": t(p + "mlp.shared_experts.down_proj.weight"),
                }
        else:
            layer.update({
                "w_gate": t(p + "mlp.gate_proj.weight"),
                "w_up": t(p + "mlp.up_proj.weight"),
                "w_down": t(p + "mlp.down_proj.weight"),
            })
        layers.append(layer)
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], cfg.dtype),
        "norm": jnp.asarray(sd["model.norm.weight"], cfg.dtype),
        "layers": layers,
    }
    if "lm_head.weight" in sd and not hf_cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(sd["lm_head.weight"], cfg.dtype)
    return params, cfg


def mla_loss_fn(params, tokens, cfg: MLAModelConfig):
    """Next-token cross-entropy over the MLA model (shifted, mean) — the
    same form as models/llama.loss_fn so trainers are interchangeable."""
    logits, _ = mla_model_prefill(params, tokens, cfg)
    logits = logits[:, :-1]
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def make_mla_train_step(cfg: MLAModelConfig, learning_rate: float = 3e-4):
    """AdamW train step for the DeepSeek-style MLA model (dense + MoE
    layers; the greedy top-k router trains through its gate weights, the
    standard straight-through-free MoE gradient). Prefill attention is the
    dense expanded-MHA form — exact, differentiable, O(S^2) activations;
    long-context training should wrap layers in jax.checkpoint upstream."""
    import optax

    tx = optax.adamw(learning_rate)

    def init_opt(params):
        return tx.init(params)

    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(mla_loss_fn)(params, tokens, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt, jax.jit(step, donate_argnums=(0, 1))
