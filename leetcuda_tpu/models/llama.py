"""Llama-style transformer — the flagship model composing the kernel corpus.

The reference is a kernel library, not a model zoo; its north star (BASELINE.json)
is an "FP8-weight Llama-style decode" built FROM those kernels. This module is the
composition layer:

- prefill/training: Pallas flash attention (causal, GQA) — single-chip directly,
  multi-chip via shard_map with heads on "tp", batch on "dp", and sequence on
  "sp" (ring attention: ppermute KV rotation + LSE merge, parallel/ring.py math);
- rope: half-rotation fused angle computation (ops/rope.py);
- decode: KV-cache decode attention (attention/decode.py) under the engine;
- projections/norms: jnp — GSPMD shards them from the weight PartitionSpecs
  (Megatron column/row rules in parallel/mesh.py) and XLA's fusion of
  norm/elementwise into matmuls is already optimal; hand kernels are spent where
  XLA is weak (attention inner loop), which is the TPU-first division of labor.

Weights follow the HF Llama naming so checkpoints map 1:1.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from leetcuda_tpu.attention.flash import make_flash_attention
from leetcuda_tpu.attention.flash_bwd import make_flash_attention_trainable
from leetcuda_tpu.attention.decode import (
    make_decode_attention, make_decode_attention_quantized)
from leetcuda_tpu.gemm.quant import make_matmul_w8a16, make_matmul_w4a16
from leetcuda_tpu.ops.rope import apply_rope_half

_w8a16 = make_matmul_w8a16()
# e4m3 packs: integer bit-surgery decode instead of the software-emulated
# cast (core.runtime.e4m3_bits_to_f32) — prefill keeps bf16 dots, decode
# rows take f32 dots (MXU idle at small M; skips the bf16 cast passes)
_w8a16_fp8 = make_matmul_w8a16(fp8_bits=True)
_w8a16_fp8_decode = make_matmul_w8a16(fp8_bits=True,
                                      compute_dtype=jnp.float32)
_w4a16 = make_matmul_w4a16()            # floor unpack, bf16 dots (prefill)
# decode-shape specialization: f32 dots skip the bf16 cast passes; at small
# M the MXU is idle so the f32 rate is free — measured 599 vs 389 GB/s
# packed at M=8 (INT4_UNPACK_DUEL.json). Shapes are static under jit, so
# the row-count dispatch in linear() resolves at trace time.
_w4a16_decode = make_matmul_w4a16(compute_dtype=jnp.float32)
_W4_F32_MAX_ROWS = 256


def linear(x, w, adapter_ids=None):
    """x (..., K) @ w. ``w`` is a dense (K, N) array, a weight-only-quantized
    pack {"q": int8/fp8 (K, N), "s": f32 (N,)} routed through the fused-dequant
    Pallas matmul (gemm/quant.py) — weights stream from HBM at 1 byte/elem and
    are cast up in VMEM right after the DMA — or a LoRA pack
    {"w": base, "A", "B", "scale"} (models/lora.py): base + low-rank delta.

    Multi-tenant packs {"As" (M, K, r), "Bs" (M, r, N)} (lora.stack_lora)
    apply PER-ROW adapters selected by ``adapter_ids`` (B,) int32 — the
    selection is a one-hot mix (einsum, MXU-shaped; M·r is adapter-sized,
    so mixing costs less than one rank-M·r adapter), no gathers."""
    if isinstance(w, dict):
        if "As" in w:  # stacked multi-tenant adapters
            base = linear(x, w["w"])
            assert adapter_ids is not None, (
                "multi-LoRA pack needs adapter_ids (per-row adapter index)")
            oh = jax.nn.one_hot(adapter_ids, w["As"].shape[0],
                                dtype=jnp.float32)              # (B, M)
            a = jnp.einsum("bm,mkr->bkr", oh, w["As"])
            bmat = jnp.einsum("bm,mrn->brn", oh, w["Bs"])
            xf = x.astype(jnp.float32)
            if x.ndim == 2:    # decode rows (B, K)
                delta = jnp.einsum("bk,bkr->br", xf, a)
                delta = jnp.einsum("br,brn->bn", delta, bmat)
            else:              # prefill rows (B, S, K)
                delta = jnp.einsum("bsk,bkr->bsr", xf, a)
                delta = jnp.einsum("bsr,brn->bsn", delta, bmat)
            return base + (delta * w["scale"]).astype(base.dtype)
        if "A" in w:  # LoRA adapter over a (possibly quantized) frozen base
            base = linear(x, w["w"])
            delta = (x.astype(jnp.float32) @ w["A"]) @ w["B"] * w["scale"]
            return base + delta.astype(base.dtype)
        lead = x.shape[:-1]
        if "q4" in w:  # int4 pack: {"q4": (K/2, N) nibble pairs, "s4": (G, N)}
            xf = x.reshape(-1, x.shape[-1])
            w4 = _w4a16_decode if xf.shape[0] <= _W4_F32_MAX_ROWS else _w4a16
            out = w4(xf, w["q4"], w["s4"])
        else:
            xf = x.reshape(-1, x.shape[-1])
            if w["q"].dtype == jnp.dtype("float8_e4m3fn"):
                w8 = (_w8a16_fp8_decode if xf.shape[0] <= _W4_F32_MAX_ROWS
                      else _w8a16_fp8)
            else:
                w8 = _w8a16
            out = w8(xf, w["q"], w["s"])
        return out.reshape(*lead, out.shape[-1])
    return x @ w


def fuse_params(params):
    """Serving-side transform: concatenate the QKV in-projections into one
    (D, (H+2Hkv)·Dh) matrix and gate+up into one (D, 2F) — one weight stream
    and one MXU pass where there were three/two. forward/decode_step detect
    the fused keys. Compose as quantize_params(fuse_params(p)) — per-output-
    channel scales make fusion exact."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        fused = {k: v for k, v in layer.items()
                 if k in ("attn_norm", "mlp_norm", "wo", "w_down",
                          "bq", "bk", "bv", "q_norm", "k_norm")}
        fused["wqkv"] = jnp.concatenate(
            [layer["wq"], layer["wk"], layer["wv"]], axis=1)
        fused["w_gate_up"] = jnp.concatenate(
            [layer["w_gate"], layer["w_up"]], axis=1)
        out["layers"].append(fused)
    return out


def _proj_qkv(h, layer, H, Hkv, Dh, adapter_ids=None):
    """Q/K/V projections, fused or split; optional biases (Qwen2-style QKV
    bias: bq/bk/bv). Returns flat (..., X*Dh) arrays."""
    if "wqkv" in layer:
        qkv = linear(h, layer["wqkv"], adapter_ids=adapter_ids)
        q, k, v = jnp.split(qkv, [H * Dh, (H + Hkv) * Dh], axis=-1)
    else:
        q, k, v = (linear(h, layer["wq"], adapter_ids=adapter_ids),
                   linear(h, layer["wk"], adapter_ids=adapter_ids),
                   linear(h, layer["wv"], adapter_ids=adapter_ids))
    if "bq" in layer:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    return q, k, v


def _gptoss_moe(h, moe, cfg):
    """GPT-OSS routed experts (HF GptOssExperts semantics): biased router
    whose top-k logits softmax AMONG THEMSELVES; experts read an interleaved
    gate/up projection with biases, clamp (gate <= limit, |up| <= limit),
    gate swishes at alpha=1.702 and combines as (up + 1) * glu. Dense-combine
    formulation (every expert evaluates every token, a (tokens, E) weight
    matrix combines) — exact and MXU-shaped; production-scale expert counts
    route through gemm/grouped.py instead."""
    alpha, limit = 1.702, 7.0
    E, k = moe["w_gate_up"].shape[0], cfg.expert_topk
    hf = h.astype(jnp.float32)
    logits = hf @ moe["router_w"] + moe["router_b"]        # (..., E)
    topv, topi = jax.lax.top_k(logits, k)
    topw = jax.nn.softmax(topv, axis=-1)                    # over the k only
    w_full = jnp.sum(jax.nn.one_hot(topi, E, dtype=jnp.float32)
                     * topw[..., None], axis=-2)            # (..., E)

    gu = (jnp.einsum("...d,edf->...ef", hf,
                     moe["w_gate_up"].astype(jnp.float32))
          + moe["b_gate_up"].astype(jnp.float32))           # (..., E, 2F)
    gate, up = gu[..., ::2], gu[..., 1::2]
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    y = (jnp.einsum("...ef,efd->...ed", (up + 1.0) * glu,
                    moe["w_down"].astype(jnp.float32))
         + moe["b_down"].astype(jnp.float32))               # (..., E, D)
    out = jnp.einsum("...e,...ed->...d", w_full, y)
    return out.astype(h.dtype)


def _apply_rope(x, positions, cfg: "ModelConfig"):
    """Family rope dispatch: GLM partial-interleaved, else rotate_half with
    optional scaled frequencies (llama3/linear/yarn) and YaRN mscale."""
    if cfg.glm_rope_dim:
        if cfg.rope_scaling is not None:
            raise NotImplementedError(
                "GLM partial rotary with rope_scaling is not implemented "
                "(long-context GLM variants) — refusing to silently ignore "
                "the scaling")
        from leetcuda_tpu.ops.rope import apply_rope_glm

        return apply_rope_glm(x, positions, cfg.rope_theta,
                              cfg.glm_rope_dim)
    return apply_rope_half(x, positions, cfg.rope_theta,
                           inv_freq=cfg.rope_inv_freq(),
                           mscale=cfg.rope_mscale())


def _proj_mlp(h, layer, cfg=None, adapter_ids=None):
    if "moe_oss" in layer:
        return _gptoss_moe(h, layer["moe_oss"], cfg)
    if "moe" in layer:
        from leetcuda_tpu.models.moe import moe_ffn, moe_ffn_dropless

        if cfg.moe_dropless:
            return moe_ffn_dropless(h, layer["moe"], cfg.moe)
        return moe_ffn(h, layer["moe"], cfg.moe)
    if "w_gate_up" in layer:
        gu = linear(h, layer["w_gate_up"], adapter_ids=adapter_ids)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate, up = (linear(h, layer["w_gate"], adapter_ids=adapter_ids),
                    linear(h, layer["w_up"], adapter_ids=adapter_ids))
    act = (jax.nn.silu if cfg is None or cfg.hidden_act == "silu"
           else functools.partial(jax.nn.gelu, approximate=True))
    gate = act(gate.astype(jnp.float32))
    return linear((gate * up.astype(jnp.float32)).astype(h.dtype),
                  layer["w_down"], adapter_ids=adapter_ids)


def quantize_params(params, dtype="fp8"):
    """Weight-only quantization of every projection matrix (embed/norms stay
    high-precision — the reference north star is FP8 *weights*, BASELINE.json).
    dtype: "fp8" (e4m3) / "int8" (per-output-channel symmetric scales) /
    "int4" (group-128 scales, nibble-packed — half int8's weight bandwidth;
    TP-composable: shard_llama_params storage-shards the pack and GSPMD
    reconstructs the canonical split-halves layout around the kernel)."""
    from leetcuda_tpu.gemm.quant import (
        quantize_rowwise_fp8, quantize_rowwise_int8, quantize_groupwise_int4)

    if dtype == "int4":
        def qmat(w):
            packed, scales = quantize_groupwise_int4(w, group=128)
            return {"q4": packed, "s4": scales}
    else:
        quant = (quantize_rowwise_fp8 if dtype == "fp8"
                 else quantize_rowwise_int8)

        def qmat(w):
            q, s = quant(w, axis=0)
            return {"q": q, "s": s}

    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        out["layers"].append({
            k: (qmat(v) if k.startswith("w") else v) for k, v in layer.items()
        })
    return out


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    dim: int = 2048
    n_layers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 4
    ffn_dim: int = 5632
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # MoE (Mixtral-style): n_experts > 0 replaces the dense FFN with a
    # top-k-routed expert FFN (models/moe.py)
    n_experts: int = 0
    expert_topk: int = 2
    capacity_factor: float = 2.0
    moe_renorm: bool = False          # Mixtral: renormalize top-k gates
    moe_ffn_dim: int = 0              # expert hidden dim (0 = ffn_dim)
    # route the FFN through the dropless grouped matmul: EXACT (no capacity
    # drops) at O(T) memory — the serving/eval path for loaded checkpoints.
    # Inference-only (the gmm kernel has no VJP); set False (+ pick a
    # capacity_factor) to fine-tune.
    moe_dropless: bool = False
    # family switches (Gemma: gelu_tanh + (1+w) norm + sqrt(D) embed scaling
    # + decoupled head_dim; Llama/Qwen2 defaults otherwise)
    hidden_act: str = "silu"          # "silu" | "gelu_tanh"
    sliding_window: int | None = None  # Mistral-style causal window
    rms_offset: bool = False          # normalize * (1 + w) instead of * w
    embed_scale: bool = False         # x = embed[tokens] * sqrt(dim)
    head_dim_override: int | None = None
    qk_norm: bool = False             # Qwen3: per-head RMS norm on q/k pre-rope
    # Gemma2 family switches
    attn_softcap: float | None = None   # cap*tanh(s/cap) on attention logits
    attn_sinks: bool = False  # GPT-OSS: learned per-head denominator logit
    glm_rope_dim: int = 0  # GLM-4 partial rotary: lanes [0, glm_rope_dim)
    nope_interval: int = 0  # SmolLM3: every Nth layer skips rope (NoPE)
    final_softcap: float | None = None  # same cap on the LM-head logits
    query_scale: float | None = None    # attention scale override
    alt_window: bool = False     # sliding window on EVEN layers only (Gemma2)
    sandwich_norms: bool = False  # post-attn / post-mlp output norms (Gemma2)
    # rope scaling, hashable for jit-static configs:
    # ("llama3", factor, low_freq_factor, high_freq_factor, original_max_pos)
    # or ("linear", factor)
    # or ("yarn", factor, beta_fast, beta_slow, original_max_pos, truncate,
    #     attention_factor_or_None)
    rope_scaling: tuple | None = None

    def rope_inv_freq(self):
        """Scaled (head_dim/2,) inverse frequencies, or None (plain θ)."""
        if self.rope_scaling is None:
            return None
        from leetcuda_tpu.ops.rope import llama3_scaled_inv_freq
        kind = self.rope_scaling[0]
        if kind == "llama3":
            _, f, lo, hi, orig = self.rope_scaling
            return llama3_scaled_inv_freq(self.head_dim, self.rope_theta,
                                          f, lo, hi, orig)
        if kind == "linear":
            half = self.head_dim // 2
            base = self.rope_theta ** (
                -jnp.arange(half, dtype=jnp.float32) / half)
            return base / self.rope_scaling[1]
        if kind == "yarn":
            from leetcuda_tpu.ops.rope import yarn_scaled_inv_freq
            _, f, bf, bs, orig, trunc, af = self.rope_scaling
            return yarn_scaled_inv_freq(self.head_dim, self.rope_theta, f,
                                        bf, bs, orig, truncate=trunc,
                                        attention_factor=af)[0]
        raise NotImplementedError(f"rope_scaling kind {kind!r}")

    def rope_mscale(self) -> float:
        """YaRN attention factor scaling cos/sin (1.0 otherwise)."""
        if self.rope_scaling is None or self.rope_scaling[0] != "yarn":
            return 1.0
        from leetcuda_tpu.ops.rope import yarn_scaled_inv_freq
        _, f, bf, bs, orig, trunc, af = self.rope_scaling
        return yarn_scaled_inv_freq(self.head_dim, self.rope_theta, f, bf,
                                    bs, orig, truncate=trunc,
                                    attention_factor=af)[1]

    def layer_rope(self, i: int | None = None) -> bool:
        """SmolLM3 NoPE: every nope_interval-th layer attends without any
        positional rotation (None = rope everywhere)."""
        if self.nope_interval and i is not None:
            return (i + 1) % self.nope_interval != 0
        return True

    def layer_window(self, i: int | None = None) -> int | None:
        """Per-layer sliding window: alternating local/global when
        alt_window (HF Gemma2 layer_types — even layers slide)."""
        if self.alt_window and i is not None and i % 2 != 0:
            return None
        return self.sliding_window

    @property
    def head_dim(self):
        return self.head_dim_override or self.dim // self.n_heads

    @property
    def moe(self):
        from leetcuda_tpu.models.moe import MoEConfig

        return MoEConfig(n_experts=self.n_experts, topk=self.expert_topk,
                         capacity_factor=self.capacity_factor, dim=self.dim,
                         ffn_dim=self.moe_ffn_dim or self.ffn_dim,
                         dtype=self.dtype, renorm_topk=self.moe_renorm)


def tiny_config(**kw) -> ModelConfig:
    """Small config for tests and the multichip dry run."""
    base = dict(vocab_size=256, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
                ffn_dim=512, dtype=jnp.float32)
    base.update(kw)
    return ModelConfig(**base)


def init_params(key, cfg: ModelConfig):
    """Random-init parameter pytree (HF Llama layout)."""
    k_embed, k_layers, k_norm = jax.random.split(key, 3)
    D, H, Hkv, Dh, F = (cfg.dim, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                        cfg.ffn_dim)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(cfg.dtype)

    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(jax.random.fold_in(k_layers, i), 7)
        layer = {
            "attn_norm": jnp.ones((D,), cfg.dtype),
            "wq": dense(ks[0], D, (D, H * Dh)),
            "wk": dense(ks[1], D, (D, Hkv * Dh)),
            "wv": dense(ks[2], D, (D, Hkv * Dh)),
            "wo": dense(ks[3], H * Dh, (H * Dh, D)),
            "mlp_norm": jnp.ones((D,), cfg.dtype),
        }
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((Dh,), cfg.dtype)
            layer["k_norm"] = jnp.ones((Dh,), cfg.dtype)
        if cfg.sandwich_norms:  # Gemma2 block-output norms
            layer["post_attn_norm"] = jnp.ones((D,), cfg.dtype)
            layer["post_mlp_norm"] = jnp.ones((D,), cfg.dtype)
        if cfg.attn_sinks:  # GPT-OSS sinks (exp(sink) joins each denominator)
            layer["sinks"] = (jax.random.normal(
                jax.random.fold_in(ks[3], 99), (H,), jnp.float32) * 0.5)
        if cfg.n_experts:
            from leetcuda_tpu.models.moe import init_moe_params

            layer["moe"] = init_moe_params(ks[4], cfg.moe)
        else:
            layer.update({
                "w_gate": dense(ks[4], D, (D, F)),
                "w_up": dense(ks[5], D, (D, F)),
                "w_down": dense(ks[6], F, (F, D)),
            })
        layers.append(layer)
    return {
        "embed": dense(k_embed, D, (cfg.vocab_size, D)),
        "norm": jnp.ones((D,), cfg.dtype),
        "layers": layers,
    }


def param_shardings(cfg: ModelConfig, mesh: Mesh):
    """PartitionSpec pytree matching init_params (Megatron TP rules). MoE
    expert stacks shard their expert dim over the tp axis (expert parallelism
    reuses tp — the standard choice when ep == tp degree)."""
    layer = {
        "attn_norm": P(None),
        "wq": P(None, "tp"), "wk": P(None, "tp"), "wv": P(None, "tp"),
        "wo": P("tp", None),
        "mlp_norm": P(None),
        "w_gate": P(None, "tp"), "w_up": P(None, "tp"),
        "w_down": P("tp", None),
    }
    if cfg.qk_norm:
        layer["q_norm"] = P(None)
        layer["k_norm"] = P(None)
    if cfg.sandwich_norms:
        layer["post_attn_norm"] = P(None)
        layer["post_mlp_norm"] = P(None)
    if cfg.attn_sinks:
        layer["sinks"] = P("tp")
    if cfg.n_experts:
        for k in ("w_gate", "w_up", "w_down"):
            del layer[k]
        layer["moe"] = {
            "router": P(None, None),
            "w_gate": P("tp", None, None),
            "w_up": P("tp", None, None),
            "w_down": P("tp", None, None),
        }
    return {
        "embed": P(None, None),
        "norm": P(None),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
    }


def shard_llama_params(params, cfg: ModelConfig, mesh: Mesh):
    """device_put the param tree with Megatron TP rules. Handles quantized
    packs ({"q", "s"}): the per-output-channel scale follows the weight's
    output-dim sharding (tp for column-parallel, replicated for row-parallel).
    Fused wqkv/w_gate_up are supported (column-parallel): correctness under
    GSPMD does not depend on the split landing on head boundaries — XLA
    reshards the logical split — though unfused weights shard cleanest."""
    spec = param_shardings(cfg, mesh)
    fused_specs = {"wqkv": P(None, "tp"), "w_gate_up": P(None, "tp"),
                   "bq": P("tp"), "bk": P("tp"), "bv": P("tp")}

    def put(x, s):
        if isinstance(s, dict):  # nested spec tree (moe)
            return {k: put(x[k], s[k]) for k in s}
        if isinstance(x, dict) and "q4" in x:
            # int4 pack {"q4": (K/2, N) split-halves nibbles, "s4": (K/g, N)}.
            # Storage sharding: each array follows the dense weight's spec on
            # its own shape (q4 row-sharding slices the packed dim; the
            # canonical split-halves layout is reconstructed exactly by the
            # all-gather GSPMD inserts around the w4a16 pallas_call — the
            # same reshard mechanism the int8 packs serve through). Axes
            # whose extent doesn't divide the mesh axis stay replicated
            # (scales have K/group rows and can undershoot wide tp).
            def fit(arr, want):
                axes = [a if a is None or arr.shape[i] % mesh.shape[a] == 0
                        else None for i, a in enumerate(want)]
                return jax.device_put(arr, NamedSharding(mesh, P(*axes)))
            return {"q4": fit(x["q4"], tuple(s)),
                    "s4": fit(x["s4"], tuple(s))}
        if isinstance(x, dict):  # quantized pack
            s_scale = P("tp") if s[1] == "tp" else P(None)
            return {"q": jax.device_put(x["q"], NamedSharding(mesh, s)),
                    "s": jax.device_put(x["s"], NamedSharding(mesh, s_scale))}
        return jax.device_put(x, NamedSharding(mesh, s))

    out = {"embed": put(params["embed"], spec["embed"]),
           "norm": put(params["norm"], spec["norm"]),
           "layers": []}
    if "lm_head" in params:
        out["lm_head"] = put(params["lm_head"], spec["embed"])
    for layer in params["layers"]:
        lspec = {**spec["layers"][0], **fused_specs}
        out["layers"].append({k: put(v, lspec[k]) for k, v in layer.items()})
    return out


def shard_kv_caches(caches, mesh: Mesh):
    """Caches onto the mesh: slot caches (slots, kv-heads, S, D) ->
    (dp, tp, -, -); paged pools (pages, kv-heads, page, D) shard heads on tp
    and are shared across dp shards (the pool has no batch dim — each dp
    shard attends its own slots' block-table rows into the common pool)."""
    cache_spec = {"k": P("dp", "tp", None, None),
                  "v": P("dp", "tp", None, None),
                  "k_scale": P("dp", "tp", None),
                  "v_scale": P("dp", "tp", None),
                  "k_pages": P(None, "tp", None, None),
                  "v_pages": P(None, "tp", None, None),
                  "k_scales": P(None, "tp", None),
                  "v_scales": P(None, "tp", None)}
    return [
        {k: jax.device_put(v, NamedSharding(mesh, cache_spec[k]))
         for k, v in c.items()}
        for c in caches
    ]


def _rms_norm(x, w, eps, offset: bool = False):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xhat = (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype)
    return xhat * (1.0 + w.astype(jnp.float32)).astype(x.dtype) if offset \
        else xhat * w


def _attention(q, k, v, mesh: Mesh | None, causal: bool,
               window: int | None = None, softcap: float | None = None,
               sm_scale: float | None = None, sinks=None):
    """(B, H, N, D) attention: direct Pallas kernel single-chip; under a mesh,
    shard_map with batch->dp, heads->tp, sequence->sp. The sp axis uses the
    Ulysses all-to-all reshard (differentiable end to end — all_to_all has a
    transpose rule, so the FA-2 custom VJP is the only hand-written gradient);
    the ring/ppermute variant (parallel/ring.py) is the inference-path choice."""
    if sinks is not None:
        # GPT-OSS attention sinks: a learned per-head logit joins the
        # softmax denominator. probs_j = softmax_j * L/(L + exp(sink - M)),
        # so the kernel output just rescales by sigmoid(lse - sink) —
        # LSE-carrying kernels need no modification. TRAINABLE: the
        # with_lse FA-2 VJP consumes the lse cotangent (it folds into the
        # delta operand), so grads reach q/k/v AND the sinks themselves.
        assert mesh is None or mesh.shape.get("sp", 1) == 1, \
            "attention sinks: sp>1 (Ulysses) resharding not wired yet"
        fa_lse = make_flash_attention_trainable(
            causal=causal, window=window, softcap=softcap,
            sm_scale=sm_scale, with_lse=True)

        def sink_fa(q, k, v, s):
            out, lse = fa_lse(q, k, v)
            return out * jax.nn.sigmoid(
                lse - s[None, :, None]).astype(out.dtype)[..., None]

        if mesh is None:
            return sink_fa(q, k, v, sinks)
        spec = P("dp", "tp", None, None)
        return shard_map(sink_fa, mesh=mesh,
                         in_specs=(spec, spec, spec, P("tp")),
                         out_specs=spec, check_vma=False)(q, k, v, sinks)

    fa = make_flash_attention_trainable(causal=causal, window=window,
                                        softcap=softcap, sm_scale=sm_scale)
    if mesh is None:
        return fa(q, k, v)

    n_sp = mesh.shape["sp"]
    spec = P("dp", "tp", "sp", None)

    def local(q, k, v):
        if n_sp == 1:
            return fa(q, k, v)

        if k.shape[1] != q.shape[1]:
            # GQA under Ulysses: expand kv to q's head count so the head
            # chunks land on matching shards after the all-to-all
            rep = q.shape[1] // k.shape[1]
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        def seq2head(x):
            return jax.lax.all_to_all(x, "sp", split_axis=1, concat_axis=2,
                                      tiled=True)

        def head2seq(x):
            return jax.lax.all_to_all(x, "sp", split_axis=2, concat_axis=1,
                                      tiled=True)

        return head2seq(fa(seq2head(q), seq2head(k), seq2head(v)))

    return shard_map(local, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                     check_vma=False)(q, k, v)


def apply_layer(layer, x, positions=None, cfg: ModelConfig = None,
                mesh: Mesh | None = None, layer_idx: int | None = None,
                adapter_ids=None):
    """One transformer layer (prefill/training path). x (B, S, D) ->
    (x, (k, v)) with the post-rope K/V the decode path would cache.

    ``layer_idx`` feeds cfg.layer_window for alternating-window families
    (Gemma2); None means the global window. Sandwich norms (post_attn_norm /
    post_mlp_norm keys) are structure-driven like bq/q_norm."""
    B, S, _ = x.shape
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    # OLMo2 is post-norm-only: no input norms, the block outputs normalize
    h = (_rms_norm(x, layer["attn_norm"], cfg.norm_eps, cfg.rms_offset)
         if "attn_norm" in layer else x)
    q, k, v = _proj_qkv(h, layer, H, Hkv, Dh, adapter_ids=adapter_ids)
    if "q_norm" in layer and layer["q_norm"].shape[-1] == H * Dh:
        # OLMo2: RMS norm over the FLAT projection (H*Dh lanes), pre-reshape
        q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
        k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, Hkv, Dh)
    v = v.reshape(B, S, Hkv, Dh)
    if cfg.qk_norm:  # Qwen3: per-head RMS norm before rope
        q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
        k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
    if cfg.layer_rope(layer_idx):
        q = _apply_rope(q, positions, cfg)
        k = _apply_rope(k, positions, cfg)
    k, v = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    o = _attention(q.transpose(0, 2, 1, 3), k, v, mesh, causal=True,
                   window=cfg.layer_window(layer_idx),
                   softcap=cfg.attn_softcap, sm_scale=cfg.query_scale,
                   sinks=layer.get("sinks"))
    o = o.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
    attn_out = linear(o, layer["wo"], adapter_ids=adapter_ids)
    if "bo" in layer:
        attn_out = attn_out + layer["bo"]
    if "post_attn_norm" in layer:  # Gemma2: norm the block OUTPUT too
        attn_out = _rms_norm(attn_out, layer["post_attn_norm"], cfg.norm_eps,
                             cfg.rms_offset)
    x = x + attn_out

    h = (_rms_norm(x, layer["mlp_norm"], cfg.norm_eps, cfg.rms_offset)
         if "mlp_norm" in layer else x)
    mlp_out = _proj_mlp(h, layer, cfg, adapter_ids=adapter_ids)
    if "post_mlp_norm" in layer:
        mlp_out = _rms_norm(mlp_out, layer["post_mlp_norm"], cfg.norm_eps,
                            cfg.rms_offset)
    x = x + mlp_out
    return x, (k, v)


def forward(params, tokens, cfg: ModelConfig, mesh: Mesh | None = None,
            positions=None, return_kv: bool = False, remat: bool = False,
            adapter_ids=None):
    """Causal LM forward. tokens (B, S) int32 -> logits (B, S, V).

    ``return_kv=True`` additionally returns the post-rope per-layer K/V
    [(B, Hkv, S, Dh)] — exactly what the decode path would have cached — for
    engine prefill (engine/engine.py). ``remat=True`` checkpoints each layer
    (activations rematerialized in the backward): the standard FLOPs-for-HBM
    trade that makes 2k-context training of the 0.8B fit a 16 GB chip."""
    B, S = tokens.shape
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = jnp.take(params["embed"], tokens, axis=0)  # (B, S, D)
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    kvs = []
    for i, layer in enumerate(params["layers"]):
        layer_fn = functools.partial(apply_layer, positions=positions,
                                     cfg=cfg, mesh=mesh, layer_idx=i,
                                     adapter_ids=adapter_ids)
        if remat:
            layer_fn = jax.checkpoint(layer_fn)
        x, kv = layer_fn(layer, x)
        if return_kv:
            kvs.append(kv)

    x = _rms_norm(x, params["norm"], cfg.norm_eps, cfg.rms_offset)
    # tied lm head by default; HF checkpoints may carry an untied one
    w_lm = params.get("lm_head", params["embed"])
    logits = (x @ w_lm.T).astype(jnp.float32)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return (logits, kvs) if return_kv else logits


def forward_ragged(params, tokens, lengths, cfg: ModelConfig,
                   mesh: Mesh | None = None, adapter_ids=None):
    """Batched-prefill forward over different-length prompts padded to a
    common S: logits (B, S, V) + per-layer K/V, with attention masked to each
    sequence's valid prefix (attention/flash.py ragged kernel). Rows past a
    sequence's length are garbage the engine never reads (it samples at
    lengths[b]-1 and inserts only [:lengths[b]] K/V positions... the padded
    tail K/V is inserted too but masked by cache lengths).

    Under a ``mesh``: batch shards on dp (dp must divide B), heads on tp;
    projections shard via GSPMD from the weight PartitionSpecs (sequence
    stays unsharded — ragged admission runs on serving meshes, sp=1)."""
    from leetcuda_tpu.attention.flash import make_flash_attention_ragged

    B, S = tokens.shape
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = jnp.take(params["embed"], tokens, axis=0)
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    has_sinks = "sinks" in params["layers"][0]

    def build_fa(window):
        fa = make_flash_attention_ragged(causal=True, window=window,
                                         softcap=cfg.attn_softcap,
                                         sm_scale=cfg.query_scale,
                                         with_lse=has_sinks)
        if mesh is not None:
            spec = P("dp", "tp", None, None)
            fa = shard_map(fa, mesh=mesh,
                           in_specs=(spec, spec, spec, P("dp")),
                           out_specs=((spec, P("dp", "tp", None))
                                      if has_sinks else spec),
                           check_vma=False)
        return fa

    fa_by_window = {w: build_fa(w) for w in
                    {cfg.layer_window(i) for i in range(cfg.n_layers)}}

    kvs = []
    for li, layer in enumerate(params["layers"]):
        fa = fa_by_window[cfg.layer_window(li)]
        h = (_rms_norm(x, layer["attn_norm"], cfg.norm_eps, cfg.rms_offset)
             if "attn_norm" in layer else x)
        q, k, v = _proj_qkv(h, layer, H, Hkv, Dh, adapter_ids=adapter_ids)
        if ("q_norm" in layer
                and layer["q_norm"].shape[-1] == H * Dh):  # OLMo2 flat
            q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
            k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
        q = q.reshape(B, S, H, Dh)
        k = k.reshape(B, S, Hkv, Dh)
        if cfg.qk_norm:
            q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
            k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
        if cfg.layer_rope(li):
            q = _apply_rope(q, positions, cfg)
            k = _apply_rope(k, positions, cfg)
        v = v.reshape(B, S, Hkv, Dh)
        k, v = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        kvs.append((k, v))
        o = fa(q.transpose(0, 2, 1, 3), k, v, lengths)  # kernel handles GQA
        if has_sinks:
            # GPT-OSS sinks (see _attention): invalid rows carry lse=-inf,
            # so sigmoid(-inf - s) = 0 keeps them loudly zeroed
            o, lse = o
            o = o * jax.nn.sigmoid(
                lse - layer["sinks"][None, :, None]).astype(o.dtype)[..., None]
        o = o.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)
        attn_out = linear(o, layer["wo"], adapter_ids=adapter_ids)
        if "bo" in layer:
            attn_out = attn_out + layer["bo"]
        if "post_attn_norm" in layer:
            attn_out = _rms_norm(attn_out, layer["post_attn_norm"],
                                 cfg.norm_eps, cfg.rms_offset)
        x = x + attn_out
        h = (_rms_norm(x, layer["mlp_norm"], cfg.norm_eps, cfg.rms_offset)
             if "mlp_norm" in layer else x)
        mlp_out = _proj_mlp(h, layer, cfg, adapter_ids=adapter_ids)
        if "post_mlp_norm" in layer:
            mlp_out = _rms_norm(mlp_out, layer["post_mlp_norm"],
                                cfg.norm_eps, cfg.rms_offset)
        x = x + mlp_out

    x = _rms_norm(x, params["norm"], cfg.norm_eps, cfg.rms_offset)
    w_lm = params.get("lm_head", params["embed"])
    logits = (x @ w_lm.T).astype(jnp.float32)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits, kvs


def pipeline_forward(params, tokens, cfg: ModelConfig, mesh: Mesh,
                     n_microbatches: int = None):
    """Pipeline-parallel forward over the mesh's "pp" axis (GPipe schedule,
    parallel/pipeline.py): layers are split into pp stages (stage weights live
    only on their stage's devices); the batch is split into microbatches that
    stream through the stage ring via ppermute. Embedding, final norm and the
    LM head are replicated (cheap next to the layer stack).

    Requires n_layers % pp == 0 and batch % n_microbatches == 0."""
    from leetcuda_tpu.parallel.pipeline import (
        split_llama_stages, shard_stage_params, pipeline_apply)

    n_stages = mesh.shape["pp"]
    # the stage scan applies ONE static window to every layer it carries
    assert not cfg.alt_window, (
        "alt_window models need per-layer static kernels; pipeline paths "
        "support uniform-window configs only")
    B, S = tokens.shape
    M = n_microbatches or n_stages
    assert B % M == 0, (B, M)

    # (stage, layers-per-stage, ...) weight stacks, stage dim sharded on pp
    _, staged = split_llama_stages(params, n_stages)
    stacked = shard_stage_params(staged, mesh)

    x = jnp.take(params["embed"], tokens, axis=0)  # (B, S, D)
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
    positions = jnp.broadcast_to(jnp.arange(S), (B // M, S))
    mbs = x.reshape(M, B // M, S, cfg.dim)

    def stage_fn(stage_layers, xmb):
        def body(x, layer):
            x, _ = apply_layer(layer, x, positions, cfg)
            return x, None

        x, _ = jax.lax.scan(body, xmb, stage_layers)
        return x

    x = pipeline_apply(stage_fn, stacked, mbs, mesh).reshape(B, S, cfg.dim)
    x = _rms_norm(x, params["norm"], cfg.norm_eps, cfg.rms_offset)
    w_lm = params.get("lm_head", params["embed"])
    logits = (x @ w_lm.T).astype(jnp.float32)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


def loss_fn(params, tokens, cfg: ModelConfig, mesh: Mesh | None = None,
            remat: bool = False):
    """Next-token cross-entropy (shifted). Runs the model at the full (usually
    block-aligned) S and drops the last position's logits, rather than feeding
    the kernels an S-1 sequence."""
    logits = forward(params, tokens, cfg, mesh, remat=remat)[:, :-1]
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def make_train_step(cfg: ModelConfig, mesh: Mesh | None = None,
                    learning_rate: float = 3e-4, remat: bool = True,
                    fsdp: bool = False, example_params=None):
    """AdamW train step. Under a mesh, jit with GSPMD shardings: weights per
    Megatron TP rules, batch on dp, sequence on sp. ``remat`` (default on)
    checkpoints each layer — without it the 0.8B at B=8 S=2048 OOMs 16 GB HBM
    (activations ~10 GB); with it they rematerialize in the backward.

    ``fsdp=True`` (requires a mesh) keeps params AND optimizer state sharded
    over the dp axis on top of TP (ZeRO-3): declare the resident layout via
    in/out shardings and XLA inserts jit all-gathers / grad reduce-scatters
    (parallel/fsdp.py). Enter params via ``shard_params_fsdp``; pass
    ``example_params`` when the tree differs from init_params' (untied
    lm_head, fused projections from the HF loader) so the declared
    shardings match its structure."""
    import optax

    assert not cfg.moe_dropless, (
        "moe_dropless routes the FFN through the grouped-matmul kernel, "
        "which has no VJP — fine-tune with "
        "dataclasses.replace(cfg, moe_dropless=False, capacity_factor=...)")
    tx = optax.adamw(learning_rate)

    def init_opt(params):
        return tx.init(params)

    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg, mesh,
                                                  remat)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a mesh with a dp axis")
    if mesh is None:
        # donate params/opt_state: two 8GB state generations don't fit HBM
        return init_opt, jax.jit(step, donate_argnums=(0, 1))

    if fsdp:
        from leetcuda_tpu.parallel.fsdp import fsdp_param_shardings

        pspec = fsdp_param_shardings(cfg, mesh, params=example_params)
    else:
        pspec = param_shardings(cfg, mesh)
    pshard = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspec,
        is_leaf=lambda s: isinstance(s, P))
    # optimizer state (adamw mu/nu) mirrors param shardings automatically when
    # tx.init runs on already-sharded params; None = inherit argument sharding
    tok_shard = NamedSharding(mesh, P("dp", None))

    jstep = jax.jit(
        step,
        in_shardings=(pshard, None, tok_shard),
        out_shardings=(pshard, None, None),
        donate_argnums=(0, 1),
    )
    return init_opt, jstep


# --- decode path -------------------------------------------------------------------

def init_kv_caches(cfg: ModelConfig, batch: int, max_seq: int,
                   dtype=None, quant: str | None = None):
    """Plain caches: [{"k", "v"}]. With ``quant`` ("int8" | "fp8"): the cache
    arrays are stored quantized with per-(batch, kv-head, position) f32 scales
    in the (B, Hkv, S) layout the decode kernel DMAs efficiently (positions on
    the lane axis)."""
    shape = (batch, cfg.n_kv_heads, max_seq, cfg.head_dim)
    if quant is None:
        dtype = dtype or cfg.dtype
        return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
                for _ in range(cfg.n_layers)]
    qdt = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
    sshape = (batch, cfg.n_kv_heads, max_seq)
    return [{"k": jnp.zeros(shape, qdt), "v": jnp.zeros(shape, qdt),
             "k_scale": jnp.ones(sshape, jnp.float32),
             "v_scale": jnp.ones(sshape, jnp.float32)}
            for _ in range(cfg.n_layers)]


def _quantize_token_kv(x, qdt):
    """x (B, Hkv, D) -> (x_q (B, Hkv, D), scale (B, Hkv)) per-(seq, head)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    qmax = 127.0 if qdt == jnp.int8 else 448.0
    scale = jnp.maximum(amax, 1e-8) / qmax
    xq = x.astype(jnp.float32) / scale[..., None]
    if qdt == jnp.int8:
        xq = jnp.round(xq)
    return xq.astype(qdt), scale


def init_paged_kv_caches(cfg: ModelConfig, num_pages: int, page_size: int,
                         dtype=None, quant: str | None = None):
    """Paged caches (attention/paged.py): per-layer page pools sharing one
    block table (managed host-side by PageManager). With ``quant``
    ("int8" | "fp8"): pools store quantized values + per-(page, head,
    position) f32 scale pools."""
    shape = (num_pages, cfg.n_kv_heads, page_size, cfg.head_dim)
    if quant is None:
        dtype = dtype or cfg.dtype
        return [{"k_pages": jnp.zeros(shape, dtype),
                 "v_pages": jnp.zeros(shape, dtype)}
                for _ in range(cfg.n_layers)]
    qdt = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
    sshape = (num_pages, cfg.n_kv_heads, page_size)
    return [{"k_pages": jnp.zeros(shape, qdt),
             "v_pages": jnp.zeros(shape, qdt),
             "k_scales": jnp.ones(sshape, jnp.float32),
             "v_scales": jnp.ones(sshape, jnp.float32)}
            for _ in range(cfg.n_layers)]


def _dus_token(cache_arr, vals, rows, pos):
    """In-place one-token append: per-row dynamic_update_slice chain.

    A batched scatter (``at[bidx, :, pos].set``) does NOT alias on TPU — XLA
    materializes a full-cache copy per call, which at 16 layers x k+v made
    the appends ~33% of a 2k-ctx decode step (time scaled with cache
    CAPACITY at fixed context; tools/ablate_decode.py found it). A chain of
    per-sequence dynamic-update-slices is XLA's guaranteed in-place pattern.
    ``rows``: row index per sequence (slot id, or physical page id for page
    pools); ``pos``: position within the row."""
    vals = vals.astype(cache_arr.dtype)
    B = vals.shape[0]
    c = cache_arr
    for b in range(B):  # static unroll: a straight DUS chain aliases best
        upd = vals[b:b + 1]
        c = jax.lax.dynamic_update_slice(
            c, upd[:, :, None] if c.ndim == 4 else upd,
            (rows[b], 0, pos[b], 0)[: c.ndim])
    return c


def _cache_append(cache, k, v, pos, page_table=None):
    """Write this token's k/v (B, Hkv, Dh) at position ``pos`` (B,), quantizing
    when the cache is quantized; paged caches index through the block table.
    All writes are dynamic-update-slice chains (in place — see _dus_token)."""
    B = k.shape[0]
    bidx = jnp.arange(B)
    if "k_pages" in cache:
        page = cache["k_pages"].shape[2]
        phys = page_table[bidx, pos // page]
        offs = pos % page
        out = dict(cache)
        if "k_scales" in cache:
            kq, ks = _quantize_token_kv(k, cache["k_pages"].dtype)
            vq, vs = _quantize_token_kv(v, cache["v_pages"].dtype)
            out["k_pages"] = _dus_token(cache["k_pages"], kq, phys, offs)
            out["v_pages"] = _dus_token(cache["v_pages"], vq, phys, offs)
            out["k_scales"] = _dus_token(cache["k_scales"], ks[..., None],
                                         phys, offs)
            out["v_scales"] = _dus_token(cache["v_scales"], vs[..., None],
                                         phys, offs)
        else:
            out["k_pages"] = _dus_token(cache["k_pages"], k, phys, offs)
            out["v_pages"] = _dus_token(cache["v_pages"], v, phys, offs)
        return out
    out = dict(cache)
    if "k_scale" in cache:
        kq, ks = _quantize_token_kv(k, cache["k"].dtype)
        vq, vs = _quantize_token_kv(v, cache["v"].dtype)
        out["k"] = _dus_token(cache["k"], kq, bidx, pos)
        out["v"] = _dus_token(cache["v"], vq, bidx, pos)
        out["k_scale"] = _dus_token(cache["k_scale"], ks[..., None], bidx,
                                    pos)
        out["v_scale"] = _dus_token(cache["v_scale"], vs[..., None], bidx,
                                    pos)
    else:
        out["k"] = _dus_token(cache["k"], k, bidx, pos)
        out["v"] = _dus_token(cache["v"], v, bidx, pos)
    return out


def _cache_attend(q, cache, lengths, block_k=1024, mesh: Mesh | None = None,
                  page_table=None, window: int | None = None,
                  softcap: float | None = None,
                  sm_scale: float | None = None, sinks=None):
    """Decode attention over the cache. Under a mesh the Pallas kernel is
    wrapped in shard_map (GSPMD cannot partition a custom call): batch on dp,
    heads on tp — each shard runs the kernel on its local head group."""
    # GPT-OSS sinks rescale the out rows by sigmoid(lse - sink) — every
    # cache layout (plain, quantized, paged, paged-quantized) has a with_lse
    # kernel variant, so sinks compose with the whole serving matrix. The
    # correction runs OUTSIDE the shard_map: lse gathers to (B, H) and the
    # (H,) sink vector broadcasts under GSPMD.
    with_lse = sinks is not None
    if "k_pages" in cache:
        from leetcuda_tpu.attention.paged import make_paged_attention

        quantized = "k_scales" in cache
        da = make_paged_attention(quantized=quantized, window=window,
                                  softcap=softcap, sm_scale=sm_scale,
                                  with_lse=with_lse)
        if quantized:
            args = (q, cache["k_pages"], cache["v_pages"], cache["k_scales"],
                    cache["v_scales"], page_table, lengths)
            in_specs = (P("dp", "tp", None), P(None, "tp", None, None),
                        P(None, "tp", None, None), P(None, "tp", None),
                        P(None, "tp", None), P("dp", None), P("dp"))
        else:
            # page pools shard on tp (heads); the pool (no batch dim) is
            # shared across dp shards, each attending its own table rows
            args = (q, cache["k_pages"], cache["v_pages"], page_table,
                    lengths)
            in_specs = (P("dp", "tp", None), P(None, "tp", None, None),
                        P(None, "tp", None, None), P("dp", None), P("dp"))
    elif "k_scale" in cache:
        da = make_decode_attention_quantized(block_k=block_k, window=window,
                                             softcap=softcap,
                                             sm_scale=sm_scale,
                                             with_lse=with_lse)
        args = (q, cache["k"], cache["v"], cache["k_scale"],
                cache["v_scale"], lengths)
        in_specs = (P("dp", "tp", None), P("dp", "tp", None, None),
                    P("dp", "tp", None, None), P("dp", "tp", None),
                    P("dp", "tp", None), P("dp"))
    else:
        da = make_decode_attention(block_k=block_k, window=window,
                                   softcap=softcap, sm_scale=sm_scale,
                                   with_lse=with_lse)
        args = (q, cache["k"], cache["v"], lengths)
        in_specs = (P("dp", "tp", None), P("dp", "tp", None, None),
                    P("dp", "tp", None, None), P("dp"))
    if mesh is None:
        res = da(*args)
    else:
        out_specs = ((P("dp", "tp", None), P("dp", "tp"))
                     if with_lse else P("dp", "tp", None))
        res = shard_map(da, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)(*args)
    if with_lse:
        out, lse = res
        return out * jax.nn.sigmoid(lse - sinks[None, :]
                                    ).astype(out.dtype)[..., None]
    return res


def decode_step_impl(params, tokens, caches, lengths, cfg: ModelConfig,
                     mesh: Mesh | None = None, page_table=None,
                     adapter_ids=None):
    """One decode step for B sequences. tokens (B,) int32; lengths (B,) = current
    context length EXCLUDING this token. Returns (logits (B, V), new caches).
    Uses the Pallas decode-attention kernel over the padded cache; params and
    caches may each be quantized (weight-only fp8/int8; int8/fp8 KV).

    Under a ``mesh``: projections shard via GSPMD from the weights' Megatron TP
    PartitionSpecs; the attention kernel runs per-shard under shard_map
    (batch->dp, kv-heads->tp). tp must divide n_kv_heads, dp must divide B.

    Un-jitted implementation — the engine jits it with ``donate_argnums=(2,)``
    so the cache scatter is in-place rather than a full-cache copy per token."""
    B = tokens.shape[0]
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = jnp.take(params["embed"], tokens, axis=0)  # (B, D)
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
    pos = lengths  # this token's position

    # fused norm->QKV->rope entry block (gemm/fused_decode.py): one weight
    # stream instead of norm + matmul + rope round-trips. Applies to dense
    # fused-QKV layers without biases, single-shard (GSPMD cannot partition
    # the custom call; the mesh path keeps the unfused projections).
    # Measured policy (PERF.md): the kernel streams weights ~25% faster in
    # isolation (987 vs 736 GB/s) but a custom call forfeits XLA's cross-op
    # weight prefetch, which dominates at short context — same-session A/B:
    # -26% at S=128, +8.8% at S=2048. Gate on cache capacity >= 2048.
    import os
    if "k" in caches[0]:
        s_cap = caches[0]["k"].shape[2]
    else:
        s_cap = page_table.shape[1] * caches[0]["k_pages"].shape[2]
    fused_qkv = None
    if (mesh is None and s_cap >= 2048 and cfg.rope_scaling is None
            and not cfg.glm_rope_dim and not cfg.nope_interval
            and not os.environ.get("LEETCUDA_NO_FUSED_DECODE")):
        from leetcuda_tpu.gemm.fused_decode import make_fused_norm_qkv_rope

        fused_qkv = make_fused_norm_qkv_rope(
            n_heads=H, n_kv_heads=Hkv, head_dim=Dh, eps=cfg.norm_eps,
            theta=cfg.rope_theta, rms_offset=cfg.rms_offset)

    new_caches = []
    for li, (layer, cache) in enumerate(zip(params["layers"], caches)):
        if (fused_qkv is not None and "wqkv" in layer
                and "attn_norm" in layer
                and not isinstance(layer["wqkv"], dict)
                and "bq" not in layer and "q_norm" not in layer):
            qkv = fused_qkv(x, layer["attn_norm"], layer["wqkv"], pos)
            q, k, v = jnp.split(qkv, [H * Dh, (H + Hkv) * Dh], axis=-1)
            q, k, v = (q.reshape(B, H, Dh), k.reshape(B, Hkv, Dh),
                       v.reshape(B, Hkv, Dh))
        else:
            h = (_rms_norm(x, layer["attn_norm"], cfg.norm_eps,
                           cfg.rms_offset)
                 if "attn_norm" in layer else x)
            q, k, v = _proj_qkv(h, layer, H, Hkv, Dh,
                                adapter_ids=adapter_ids)
            if ("q_norm" in layer
                    and layer["q_norm"].shape[-1] == H * Dh):  # OLMo2 flat
                q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
                k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
            q, k, v = (q.reshape(B, H, Dh), k.reshape(B, Hkv, Dh),
                       v.reshape(B, Hkv, Dh))
            if cfg.qk_norm:
                q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
                k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
            if cfg.layer_rope(li):
                q = _apply_rope(q[:, None], pos[:, None], cfg)[:, 0]
                k = _apply_rope(k[:, None], pos[:, None], cfg)[:, 0]
        cache = _cache_append(cache, k, v, pos, page_table=page_table)
        new_caches.append(cache)
        o = _cache_attend(q.astype(cfg.dtype), cache, lengths + 1, mesh=mesh,
                          page_table=page_table,
                          window=cfg.layer_window(li),
                          softcap=cfg.attn_softcap, sm_scale=cfg.query_scale,
                          sinks=layer.get("sinks"))
        attn_out = linear(o.reshape(B, H * Dh).astype(x.dtype), layer["wo"],
                          adapter_ids=adapter_ids)
        if "bo" in layer:
            attn_out = attn_out + layer["bo"]
        if "post_attn_norm" in layer:
            attn_out = _rms_norm(attn_out, layer["post_attn_norm"],
                                 cfg.norm_eps, cfg.rms_offset)
        x = x + attn_out

        h = (_rms_norm(x, layer["mlp_norm"], cfg.norm_eps, cfg.rms_offset)
             if "mlp_norm" in layer else x)
        mlp_out = _proj_mlp(h, layer, cfg, adapter_ids=adapter_ids)
        if "post_mlp_norm" in layer:
            mlp_out = _rms_norm(mlp_out, layer["post_mlp_norm"],
                                cfg.norm_eps, cfg.rms_offset)
        x = x + mlp_out

    x = _rms_norm(x, params["norm"], cfg.norm_eps, cfg.rms_offset)
    w_lm = params.get("lm_head", params["embed"])
    logits = (x @ w_lm.T).astype(jnp.float32)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits, new_caches


decode_step = jax.jit(decode_step_impl, static_argnames=("cfg",))
