"""LoRA fine-tuning: low-rank adapters over frozen (possibly quantized) bases.

y = x @ W + (x @ A) @ B · (alpha/r) — the base W stays frozen (and may be an
int8/fp8 pack served by the fused-dequant matmul, i.e. QLoRA-style), only the
(K, r)/(r, N) adapters train. ``models/llama.py linear()`` dispatches on the
{"w", "A", "B"} pack, so every projection in forward/decode/engine serves
adapted weights with zero extra plumbing — merge with ``merge_lora`` for
adapter-free serving.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp

# layer weight names that receive adapters by default (the attention
# projections — the classic LoRA recipe; pass names=... for more)
DEFAULT_TARGETS = ("wq", "wk", "wv", "wo")


def add_lora(params, key, rank: int = 8, alpha: float = 16.0,
             targets=DEFAULT_TARGETS):
    """Wrap target layer weights in {"w", "A", "B", "scale"} packs.
    A ~ N(0, 1/r), B = 0 (so the adapted model starts exactly at the base)."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        new = {}
        for name, w in layer.items():
            if name in targets:
                if isinstance(w, dict):  # quantized base: shapes from the pack
                    K, N = w["q"].shape
                else:
                    K, N = w.shape
                # crc32, not hash(): str hashes are per-process randomized
                # (PYTHONHASHSEED), which would make init non-reproducible
                k1 = jax.random.fold_in(jax.random.fold_in(key, li),
                                        zlib.crc32(name.encode()) % (2 ** 31))
                new[name] = {
                    "w": w,
                    "A": (jax.random.normal(k1, (K, rank), jnp.float32)
                          / jnp.sqrt(rank)).astype(jnp.float32),
                    "B": jnp.zeros((rank, N), jnp.float32),
                    "scale": alpha / rank,
                }
            else:
                new[name] = w
        out["layers"].append(new)
    return out


def lora_params(params):
    """Extract just the trainable (A, B) leaves as a pytree (same layer
    structure, only adapter entries)."""
    return [
        {name: {"A": w["A"], "B": w["B"]}
         for name, w in layer.items()
         if isinstance(w, dict) and "A" in w}
        for layer in params["layers"]
    ]


def set_lora_params(params, adapters):
    """Write (A, B) adapter leaves back into a LoRA-wrapped param tree."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer, ad in zip(params["layers"], adapters):
        new = {}
        for name, w in layer.items():
            if isinstance(w, dict) and "A" in w:
                new[name] = {**w, "A": ad[name]["A"], "B": ad[name]["B"]}
            else:
                new[name] = w
        out["layers"].append(new)
    return out


def merge_lora(params):
    """Fold adapters into dense bases (requires unquantized bases):
    W' = W + A @ B · scale. Returns a plain param tree for serving."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        new = {}
        for name, w in layer.items():
            if isinstance(w, dict) and "A" in w:
                base = w["w"]
                assert not isinstance(base, dict), \
                    "merge requires a dense base (dequantize first)"
                delta = (w["A"] @ w["B"]) * w["scale"]
                new[name] = (base.astype(jnp.float32)
                             + delta).astype(base.dtype)
            else:
                new[name] = w
        out["layers"].append(new)
    return out


def make_lora_train_step(cfg, learning_rate: float = 1e-3):
    """AdamW over ONLY the adapters; the base tree is a frozen closure-free
    argument (may be quantized). step(adapters, opt_state, base, tokens)."""
    import optax

    from leetcuda_tpu.models.llama import loss_fn

    tx = optax.adamw(learning_rate)

    def init_opt(adapters):
        return tx.init(adapters)

    @jax.jit
    def step(adapters, opt_state, base_params, tokens):
        def loss(ad):
            return loss_fn(set_lora_params(base_params, ad), tokens, cfg)

        l, grads = jax.value_and_grad(loss)(adapters)
        updates, opt_state = tx.update(grads, opt_state, adapters)
        return optax.apply_updates(adapters, updates), opt_state, l

    return init_opt, step


def stack_lora(params_with_adapters_list):
    """MULTI-TENANT serving: N single-adapter trees (same base, same
    targets/rank — e.g. N independently fine-tuned adapters over one
    checkpoint) -> ONE tree whose packs hold stacked {"As" (N, K, r),
    "Bs" (N, r, N_out)}. models/llama.linear() applies the per-row adapter
    selected by ``adapter_ids``; the engine serves different adapters for
    different slots IN ONE BATCHED DECODE (Engine(multi_lora=True),
    submit(..., adapter_id=i))."""
    first = params_with_adapters_list[0]
    out = {k: v for k, v in first.items() if k != "layers"}
    out["layers"] = []
    for li, layer in enumerate(first["layers"]):
        new = {}
        for name, w in layer.items():
            if isinstance(w, dict) and "A" in w:
                new[name] = {
                    "w": w["w"],
                    "As": jnp.stack([p["layers"][li][name]["A"]
                                     for p in params_with_adapters_list]),
                    "Bs": jnp.stack([p["layers"][li][name]["B"]
                                     for p in params_with_adapters_list]),
                    "scale": w["scale"],
                }
            else:
                new[name] = w
        out["layers"].append(new)
    return out
