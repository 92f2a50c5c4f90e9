"""HF Llama checkpoint loading — safetensors -> (sharded) jax param trees.

The reference has no model state at all (SURVEY.md §5: checkpoint/resume
"absent"); a serving engine needs real weights. This module maps the HF
Llama/Qwen2 layout (same module names; Qwen2 adds QKV biases, mapped to
bq/bk/bv) onto models/llama.py's tree:

    model.embed_tokens.weight            -> embed            (V, D)
    model.layers.{i}.input_layernorm     -> layers[i].attn_norm
    .self_attn.{q,k,v,o}_proj.weight     -> wq/wk/wv/wo      (transposed: HF
    .post_attention_layernorm            -> mlp_norm          stores (out, in),
    .mlp.{gate,up,down}_proj.weight      -> w_gate/w_up/w_down  we use (in, out))
    model.norm.weight                    -> norm
    lm_head.weight                       -> lm_head (V, D), omitted when tied

Conventions verified against transformers' LlamaForCausalLM by the golden test
(tests/test_loader.py): rotate_half RoPE (ops/rope.py apply_rope_half), f32
RMS-norm statistics, 1/sqrt(head_dim) attention scale, SiLU gate.

Under a mesh, every tensor is device_put with its Megatron TP PartitionSpec as
it is converted, so the host never materializes more than one full tensor.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leetcuda_tpu.models.llama import ModelConfig, param_shardings


def _rope_scaling_from_hf(rs) -> tuple | None:
    """HF rope_scaling dict -> the hashable ModelConfig tuple. Supports
    "llama3" (Llama-3.1 wavelength remap) and "linear"; "default"/None pass
    through; anything else fails loudly rather than silently degrading long-
    context quality."""
    if not rs:
        return None
    kind = rs.get("rope_type", rs.get("type", "default"))
    if kind in (None, "default"):
        return None
    if kind == "llama3":
        return ("llama3", float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs["original_max_position_embeddings"]))
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "yarn":
        af = rs.get("attention_factor")
        if af is None and rs.get("mscale") and rs.get("mscale_all_dim"):
            # HF derives the factor from the mscale pair (DeepSeek-style
            # yarn checkpoints); bake the resolved value into the tuple
            import math as _m

            def _gm(scale, m):
                return 0.1 * m * _m.log(scale) + 1.0 if scale > 1 else 1.0

            af = (_gm(float(rs["factor"]), float(rs["mscale"]))
                  / _gm(float(rs["factor"]), float(rs["mscale_all_dim"])))
        return ("yarn", float(rs["factor"]),
                float(rs.get("beta_fast", 32.0) or 32.0),
                float(rs.get("beta_slow", 1.0) or 1.0),
                int(rs["original_max_position_embeddings"]),
                bool(rs.get("truncate", True)),
                float(af) if af is not None else None)
    raise NotImplementedError(
        f"rope_scaling type {kind!r} (supported: llama3, linear, yarn)")


def config_from_hf(hf_cfg, dtype=jnp.bfloat16) -> ModelConfig:
    """Build a ModelConfig from a transformers Llama/Qwen2/Gemma config (or
    its dict). Gemma flips the family switches: GeGLU (gelu_tanh), (1+w)
    RMS-norm, sqrt(D) embedding scaling, decoupled head_dim."""
    get = (hf_cfg.get if isinstance(hf_cfg, dict)
           else lambda k, d=None: getattr(hf_cfg, k, d))
    mtype = str(get("model_type", "llama") or "llama")
    is_gemma = "gemma" in mtype
    is_gemma2 = mtype == "gemma2"
    is_mixtral = "mixtral" in mtype
    is_qwen3moe = mtype == "qwen3_moe"
    is_gptoss = mtype == "gpt_oss"
    is_glm4 = mtype == "glm4"
    is_smollm3 = mtype == "smollm3"
    head_dim = get("head_dim", None)
    derived = get("hidden_size") // get("num_attention_heads")
    n_experts = int(get("num_local_experts", 0) or 0) if is_mixtral else (
        int(get("num_experts", 0) or 0) if is_qwen3moe else 0)
    nope = int(get("no_rope_layer_interval", 0) or 0) if is_smollm3 else 0
    if is_smollm3 and get("no_rope_layers", None):
        want = [0 if (i + 1) % nope == 0 else 1
                for i in range(get("num_hidden_layers"))] if nope else None
        if list(get("no_rope_layers")) != want:
            raise NotImplementedError(
                "smollm3 no_rope_layers doesn't match the interval pattern "
                "— irregular NoPE layouts aren't mapped")
    topk = int(get("num_experts_per_tok", 2) or 2)
    return ModelConfig(
        vocab_size=get("vocab_size"),
        dim=get("hidden_size"),
        n_layers=get("num_hidden_layers"),
        n_heads=get("num_attention_heads"),
        n_kv_heads=get("num_key_value_heads", get("num_attention_heads")),
        ffn_dim=get("intermediate_size"),
        rope_theta=float(get("rope_theta", 10000.0)),
        norm_eps=float(get("rms_norm_eps", 1e-5)),
        dtype=dtype,
        hidden_act="gelu_tanh" if is_gemma else "silu",
        rms_offset=is_gemma,
        embed_scale=is_gemma,
        head_dim_override=(head_dim if head_dim and head_dim != derived
                           else None),
        sliding_window=(get("sliding_window", None)
                        if get("use_sliding_window", True) else None),
        qk_norm="qwen3" in mtype,  # per-head q/k RMS norm before rope
        # Gemma2: logit soft caps, decoupled attention scale, alternating
        # local/global layers, block-output (sandwich) norms
        attn_softcap=get("attn_logit_softcapping", None) if is_gemma2
        else None,
        final_softcap=get("final_logit_softcapping", None) if is_gemma2
        else None,
        query_scale=(float(get("query_pre_attn_scalar")) ** -0.5
                     if is_gemma2 and get("query_pre_attn_scalar", None)
                     else None),
        alt_window=is_gemma2 or is_gptoss,
        attn_sinks=is_gptoss,
        # GLM-4's post_self_attn/post_mlp norms ride the sandwich-norm
        # machinery — the flag also makes param_shardings emit their specs
        sandwich_norms=is_gemma2 or is_glm4,
        nope_interval=nope,
        glm_rope_dim=(int((head_dim or derived)
                          * float(get("partial_rotary_factor", 0.5)))
                      if is_glm4 else 0),
        # GPT-OSS: experts live in layer["moe_oss"] (structure-driven);
        # expert_topk still parameterizes its router
        expert_topk=topk,
        rope_scaling=_rope_scaling_from_hf(get("rope_scaling", None)),
        n_experts=n_experts,
        moe_renorm=(is_mixtral
                    or bool(is_qwen3moe and get("norm_topk_prob", False))),
        moe_ffn_dim=(int(get("moe_intermediate_size", 0) or 0)
                     if is_qwen3moe else 0),
        # loaded checkpoints serve through the DROPLESS grouped-matmul path:
        # exact (HF parity needs zero capacity drops) at O(T) memory — the
        # no-drop capacity bound (E/topk) would make the dispatch einsums
        # O(T^2 E) and OOM a real prefill
        moe_dropless=bool(n_experts),
    )


def _to_np(t):
    """torch / numpy / jax tensor -> numpy f32 (bf16 has no numpy dtype in
    torch; round-trip through f32 is exact for any <=f32 source)."""
    if hasattr(t, "detach"):  # torch
        return t.detach().to(dtype=__import__("torch").float32).numpy()
    return np.asarray(t, np.float32)


def params_from_hf_state_dict(sd, cfg: ModelConfig, mesh: Mesh | None = None):
    """Convert an HF Llama state dict (name -> tensor) to the param tree."""
    specs = param_shardings(cfg, mesh) if mesh else None

    def put(arr, spec, dtype=None):
        arr = jnp.asarray(arr, dtype or cfg.dtype)
        if mesh is not None:
            return jax.device_put(arr, NamedSharding(mesh, spec))
        return arr

    def mat(name, spec):
        return put(_to_np(sd[name]).T, spec)  # (out, in) -> (in, out)

    layers = []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        lspec = specs["layers"][i] if specs else {k: None for k in (
            "attn_norm", "wq", "wk", "wv", "wo", "mlp_norm",
            "w_gate", "w_up", "w_down")}
        layer = {
            "wq": mat(pre + "self_attn.q_proj.weight", lspec["wq"]),
            "wk": mat(pre + "self_attn.k_proj.weight", lspec["wk"]),
            "wv": mat(pre + "self_attn.v_proj.weight", lspec["wv"]),
            "wo": mat(pre + "self_attn.o_proj.weight", lspec["wo"]),
        }
        if pre + "input_layernorm.weight" in sd:
            layer["attn_norm"] = put(
                _to_np(sd[pre + "input_layernorm.weight"]),
                lspec["attn_norm"])
            # Gemma2 renames: pre_feedforward_layernorm is the pre-MLP norm
            # (llama's post_attention_layernorm slot); post_attention/
            # post_feedforward become the sandwich output norms
            layer["mlp_norm"] = put(_to_np(sd[
                pre + ("pre_feedforward_layernorm.weight"
                       if pre + "pre_feedforward_layernorm.weight" in sd
                       else "post_attention_layernorm.weight")]),
                lspec["mlp_norm"])
            if pre + "pre_feedforward_layernorm.weight" in sd:
                layer["post_attn_norm"] = put(
                    _to_np(sd[pre + "post_attention_layernorm.weight"]),
                    lspec.get("post_attn_norm"))
                layer["post_mlp_norm"] = put(
                    _to_np(sd[pre + "post_feedforward_layernorm.weight"]),
                    lspec.get("post_mlp_norm"))
            elif pre + "post_self_attn_layernorm.weight" in sd:
                # GLM-4 sandwich names: post_self_attn / post_mlp wrap the
                # block outputs; post_attention_layernorm stayed the
                # pre-MLP norm (already mapped to mlp_norm above)
                layer["post_attn_norm"] = put(
                    _to_np(sd[pre + "post_self_attn_layernorm.weight"]),
                    lspec.get("post_attn_norm"))
                layer["post_mlp_norm"] = put(
                    _to_np(sd[pre + "post_mlp_layernorm.weight"]),
                    lspec.get("post_mlp_norm"))
        else:
            # OLMo2: post-norm-only — no input norms, the block outputs
            # normalize before their residual adds
            layer["post_attn_norm"] = put(
                _to_np(sd[pre + "post_attention_layernorm.weight"]),
                lspec.get("post_attn_norm"))
            layer["post_mlp_norm"] = put(
                _to_np(sd[pre + "post_feedforward_layernorm.weight"]),
                lspec.get("post_mlp_norm"))
        if pre + "mlp.experts.gate_up_proj" in sd:
            pass  # GPT-OSS experts (mapped with the attention extras below)
        elif pre + "mlp.gate.weight" in sd:  # Qwen3-MoE routed experts
            mspec = lspec.get("moe") or {k: None for k in (
                "router", "w_gate", "w_up", "w_down")}
            estack = lambda w: np.stack(
                [_to_np(sd[pre + f"mlp.experts.{e}.{w}.weight"]).T
                 for e in range(cfg.n_experts)])
            layer["moe"] = {
                "router": put(_to_np(sd[pre + "mlp.gate.weight"]).T,
                              mspec["router"], dtype=jnp.float32),
                "w_gate": put(estack("gate_proj"), mspec["w_gate"]),
                "w_up": put(estack("up_proj"), mspec["w_up"]),
                "w_down": put(estack("down_proj"), mspec["w_down"]),
            }
        elif pre + "mlp.gate_up_proj.weight" in sd:
            # GLM-4: fused gate+up projection (first half gate, second up —
            # the same split _proj_mlp's w_gate_up expects)
            layer["w_gate_up"] = mat(pre + "mlp.gate_up_proj.weight",
                                     lspec.get("w_gate_up",
                                               P(None, "tp") if mesh
                                               else None))
            layer["w_down"] = mat(pre + "mlp.down_proj.weight",
                                  lspec["w_down"])
        elif pre + "block_sparse_moe.gate.weight" in sd:
            # Mixtral routed experts: gate (E, D) -> router (D, E) f32;
            # experts.{e}.{w1,w3,w2} -> w_gate/w_up/w_down stacks
            mspec = lspec.get("moe") or {k: None for k in (
                "router", "w_gate", "w_up", "w_down")}
            stack = lambda w: np.stack(
                [_to_np(sd[pre + f"block_sparse_moe.experts.{e}.{w}.weight"]).T
                 for e in range(cfg.n_experts)])
            layer["moe"] = {
                "router": put(
                    _to_np(sd[pre + "block_sparse_moe.gate.weight"]).T,
                    mspec["router"], dtype=jnp.float32),
                "w_gate": put(stack("w1"), mspec["w_gate"]),
                "w_up": put(stack("w3"), mspec["w_up"]),
                "w_down": put(stack("w2"), mspec["w_down"]),
            }
        else:
            layer.update(
                w_gate=mat(pre + "mlp.gate_proj.weight", lspec["w_gate"]),
                w_up=mat(pre + "mlp.up_proj.weight", lspec["w_up"]),
                w_down=mat(pre + "mlp.down_proj.weight", lspec["w_down"]),
            )
        if pre + "self_attn.q_norm.weight" in sd:  # Qwen3 QK-norm
            layer["q_norm"] = put(
                _to_np(sd[pre + "self_attn.q_norm.weight"]),
                P(None) if mesh else None)
            layer["k_norm"] = put(
                _to_np(sd[pre + "self_attn.k_norm.weight"]),
                P(None) if mesh else None)
        if pre + "self_attn.q_proj.bias" in sd:  # Qwen2-style QKV bias
            for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"),
                                 ("bv", "v_proj")):
                layer[ours] = put(
                    _to_np(sd[pre + f"self_attn.{theirs}.bias"]),
                    P("tp") if mesh else None)
        if pre + "self_attn.o_proj.bias" in sd:
            layer["bo"] = put(_to_np(sd[pre + "self_attn.o_proj.bias"]),
                              P(None) if mesh else None)
        if pre + "self_attn.sinks" in sd:  # GPT-OSS attention sinks
            layer["sinks"] = put(_to_np(sd[pre + "self_attn.sinks"]),
                                 P("tp") if mesh else None,
                                 dtype=jnp.float32)
        if pre + "mlp.experts.gate_up_proj" in sd:  # GPT-OSS experts
            def rspec(arr):  # replicated under a mesh, plain otherwise
                return P(*([None] * arr.ndim)) if mesh else None

            def oss(name, dtype=None, T=False):
                a = _to_np(sd[pre + name])
                a = a.T if T else a
                return put(a, rspec(a), dtype=dtype)

            layer["moe_oss"] = {
                "router_w": oss("mlp.router.weight", jnp.float32, T=True),
                "router_b": oss("mlp.router.bias", jnp.float32),
                # HF stores bmm-ready layouts: (E, D, 2F) and (E, F, D)
                "w_gate_up": oss("mlp.experts.gate_up_proj"),
                "b_gate_up": oss("mlp.experts.gate_up_proj_bias"),
                "w_down": oss("mlp.experts.down_proj"),
                "b_down": oss("mlp.experts.down_proj_bias"),
            }
        layers.append(layer)

    params = {
        "embed": put(_to_np(sd["model.embed_tokens.weight"]),
                     specs["embed"] if specs else None),
        "norm": put(_to_np(sd["model.norm.weight"]),
                    specs["norm"] if specs else None),
        "layers": layers,
    }
    if "lm_head.weight" in sd:
        head = _to_np(sd["lm_head.weight"])
        embed = _to_np(sd["model.embed_tokens.weight"])
        if head.shape != embed.shape or not np.array_equal(head, embed):
            params["lm_head"] = put(head, specs["embed"] if specs else None)
    return params


def load_llama(model_dir: str, dtype=jnp.bfloat16, mesh: Mesh | None = None):
    """Load a saved HF Llama directory (config.json + *.safetensors).

    Returns (cfg, params). Tensors are read lazily per-file via safetensors,
    converted, and (under a mesh) sharded immediately."""
    from safetensors import safe_open

    model_dir = pathlib.Path(model_dir)
    with open(model_dir / "config.json") as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, dtype=dtype)

    sd = {}
    for st in sorted(model_dir.glob("*.safetensors")):
        with safe_open(st, framework="pt") as f:
            for name in f.keys():
                sd[name] = f.get_tensor(name)
    if not sd:
        raise FileNotFoundError(f"no *.safetensors under {model_dir}")
    return cfg, params_from_hf_state_dict(sd, cfg, mesh=mesh)


def hf_config_dict(cfg: ModelConfig) -> dict:
    """ModelConfig -> a transformers-loadable config.json dict (the dense
    Llama/Qwen2-style families; the inverse of config_from_hf for the
    fields save_llama exports)."""
    assert not (cfg.n_experts or cfg.attn_sinks or cfg.glm_rope_dim
                or cfg.sandwich_norms or cfg.rms_offset), (
        "save_llama exports the dense Llama/Qwen-style families; "
        "MoE/sink/GLM/Gemma trees carry weights HF names differently")
    out = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "intermediate_size": cfg.ffn_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.norm_eps,
        "max_position_embeddings": 4096,
        "hidden_act": "silu",
        "tie_word_embeddings": True,
        "torch_dtype": "bfloat16",
    }
    if cfg.head_dim_override:
        out["head_dim"] = cfg.head_dim_override
    if cfg.sliding_window:
        out["model_type"] = "mistral"
        out["architectures"] = ["MistralForCausalLM"]
        out["sliding_window"] = cfg.sliding_window
    if cfg.rope_scaling:  # every kind we load must round-trip out
        kind = cfg.rope_scaling[0]
        if kind == "llama3":
            _, f, lo, hi, orig = cfg.rope_scaling
            out["rope_scaling"] = {
                "rope_type": "llama3", "factor": f, "low_freq_factor": lo,
                "high_freq_factor": hi,
                "original_max_position_embeddings": orig}
        elif kind == "linear":
            out["rope_scaling"] = {"rope_type": "linear",
                                   "factor": cfg.rope_scaling[1]}
        elif kind == "yarn":
            _, f, bf, bs, orig, trunc, af = cfg.rope_scaling
            out["rope_scaling"] = {
                "rope_type": "yarn", "factor": f, "beta_fast": bf,
                "beta_slow": bs, "original_max_position_embeddings": orig,
                "truncate": trunc,
                **({"attention_factor": af} if af is not None else {})}
        else:  # pragma: no cover — loader rejects unknown kinds on entry
            raise NotImplementedError(f"rope_scaling {kind!r} export")
    return out


def save_llama(model_dir: str, params, cfg: ModelConfig):
    """Export the param tree as an HF checkpoint (config.json +
    model.safetensors) that transformers loads directly — the interop exit
    ramp for models trained here (train -> save_llama -> HF ecosystem).
    Inverse of load_llama for the dense families; golden round-trip tested
    (our logits == the reloaded LlamaForCausalLM's)."""
    import torch
    from safetensors.torch import save_file

    model_dir = pathlib.Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    hf = hf_config_dict(cfg)

    def t(x, transpose=False):
        a = np.asarray(jax.device_get(x), np.float32)
        if transpose:
            a = a.T  # ours (in, out) -> HF (out, in)
        return torch.from_numpy(np.ascontiguousarray(a)).to(torch.bfloat16)

    sd = {"model.embed_tokens.weight": t(params["embed"]),
          "model.norm.weight": t(params["norm"])}
    if "lm_head" in params:
        sd["lm_head.weight"] = t(params["lm_head"])
        hf["tie_word_embeddings"] = False
    for i, layer in enumerate(params["layers"]):
        assert "wq" in layer and not isinstance(layer["wq"], dict), (
            "save_llama exports dense unfused trees (no quantized packs/"
            "fused wqkv; dequantize or keep an unfused copy to export)")
        assert "attn_norm" in layer and "post_attn_norm" not in layer, (
            "save_llama exports pre-norm Llama/Qwen-style trees; post-norm "
            "(OLMo-2) / sandwich-norm layers use HF names this exporter "
            "doesn't write")
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = t(layer["attn_norm"])
        sd[pre + "post_attention_layernorm.weight"] = t(layer["mlp_norm"])
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "o_proj")):
            sd[pre + f"self_attn.{theirs}.weight"] = t(layer[ours],
                                                       transpose=True)
        for ours, theirs in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                             ("w_down", "down_proj")):
            sd[pre + f"mlp.{theirs}.weight"] = t(layer[ours], transpose=True)
        for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"),
                             ("bv", "v_proj")):
            if ours in layer:
                sd[pre + f"self_attn.{theirs}.bias"] = t(layer[ours])
                hf["attention_bias"] = True
                if hf["model_type"] == "llama":  # don't clobber mistral
                    hf["model_type"] = "qwen2"
                    hf["architectures"] = ["Qwen2ForCausalLM"]
                if hf["model_type"] == "qwen2" and cfg.sliding_window:
                    # qwen2's window is opt-in and per-layer-gated
                    hf["sliding_window"] = cfg.sliding_window
                    hf["use_sliding_window"] = True
                    hf["max_window_layers"] = 0
        if "q_norm" in layer:  # Qwen3 per-head norms
            sd[pre + "self_attn.q_norm.weight"] = t(layer["q_norm"])
            sd[pre + "self_attn.k_norm.weight"] = t(layer["k_norm"])
            hf["model_type"] = "qwen3"
            hf["architectures"] = ["Qwen3ForCausalLM"]
            hf["head_dim"] = cfg.head_dim

    with open(model_dir / "config.json", "w") as f:
        json.dump(hf, f, indent=1)
    save_file(sd, str(model_dir / "model.safetensors"))
    return model_dir
