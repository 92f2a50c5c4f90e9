"""MLA (DeepSeek-V2) demo: latent-cache serving end to end.

    python examples/mla_demo.py              # random-init tiny model
    python examples/mla_demo.py --hf         # via a transformers DeepseekV2
    python examples/mla_demo.py --quant int8 # quantized latent cache

Shows the cache arithmetic (latent vs expanded MHA bytes) and runs the
whole-loop greedy generator over the absorbed-decode path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.mla import (
    MLAModelConfig, init_mla_model, kv_bytes_per_token, mla_generate,
    mla_model_prefill, mla_model_decode_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf", action="store_true",
                    help="route weights through the transformers loader")
    ap.add_argument("--quant", choices=("none", "int8", "fp8"),
                    default="none")
    ap.add_argument("--max-new", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode kernels)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.hf:
        import torch
        from transformers.models.deepseek_v2 import (DeepseekV2Config,
                                                     DeepseekV2ForCausalLM)
        from leetcuda_tpu.models.mla import load_deepseek_v2

        torch.manual_seed(0)
        hf = DeepseekV2ForCausalLM(DeepseekV2Config(
            hidden_size=256, intermediate_size=512, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=8, vocab_size=256,
            q_lora_rank=None, kv_lora_rank=128, qk_nope_head_dim=64,
            qk_rope_head_dim=32, v_head_dim=64, first_k_dense_replace=2,
            attention_bias=False, use_cache=False)).eval()
        params, cfg = load_deepseek_v2(hf)
    else:
        cfg = MLAModelConfig(dim=256, n_heads=8, kv_lora_rank=128,
                             qk_nope_head_dim=64, qk_rope_head_dim=32,
                             v_head_dim=64, vocab_size=256, n_layers=2,
                             ffn_dim=512, dtype=jnp.float32)
        params = init_mla_model(jax.random.key(0), cfg)

    import dataclasses

    # quote the bf16 baseline the docs use regardless of the demo's dtype
    bf16_cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    mla_b, mha_b = kv_bytes_per_token(bf16_cfg)
    line = (f"latent cache: {mla_b} B/token/layer vs expanded bf16 MHA "
            f"{mha_b} ({mha_b / mla_b:.1f}x smaller")
    if args.quant != "none":
        line += (f"; {args.quant} latent + f32 scale: "
                 f"{mha_b / (cfg.latent_dim + 4):.1f}x")
    print(line + ")")

    prompts = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)),
        jnp.int32)
    toks = mla_generate(params, cfg, prompts, max_new=args.max_new)
    print("greedy (plain latent cache):", np.asarray(toks)[0][:10], "...")

    if args.quant != "none":
        # stepwise decode over per-layer QUANTIZED latent caches
        from leetcuda_tpu.models.mla import mla_prefill, mla_decode_step

        B, S = prompts.shape
        x = jnp.take(params["embed"], prompts, axis=0)
        _, qcache = mla_prefill(params["layers"][0]["attn"], x, cfg,
                                max_seq=S + 4, quant=args.quant)
        lengths = jnp.full((B,), S, jnp.int32)
        y, _ = mla_decode_step(params["layers"][0]["attn"], x[:, -1],
                               qcache, lengths, cfg)
        print(f"quantized ({args.quant}) latent decode: finite="
              f"{bool(jnp.isfinite(y).all())}; full tracked-error harness: "
              "tests/test_mla.py::test_quantized_latent_cache")


if __name__ == "__main__":
    main()
