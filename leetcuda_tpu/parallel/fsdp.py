"""FSDP (ZeRO-3) parameter + optimizer sharding over the data axis.

TPU-native recipe (the scaling-book formulation): parameters LIVE sharded
over the ``dp`` mesh axis on top of their Megatron TP layout; the train
step's jit in/out shardings declare that layout, and XLA inserts the
just-in-time all-gathers in the forward/backward and the reduce-scatters
for the gradients. There are no wrapper classes and no manual gather code —
the sharding annotations ARE the implementation, which is exactly the
design difference from a CUDA framework's hand-written bucketing/gathering
runtime. Optimizer state (adamw mu/nu) inherits the sharded layout from
``zeros_like`` on sharded params, so state memory also drops by the dp
degree — the ZeRO-3 property.

Reference analog: the reference's distributed tier is 13 NCCL collective
demo scripts (/root/reference/others/pytorch/distributed/, SURVEY §2e);
it has no sharded-training runtime. This module is the framework-level
capability those collectives exist to serve, built on the same primitives
(all-gather / reduce-scatter) via GSPMD instead of hand-placed NCCL calls.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_param_shardings", "shard_params_fsdp"]

# column-/row-parallel specs for tree keys init_params doesn't emit but the
# HF loader can (fused projections, biases) — mirrors llama.py's
# shard_llama_params fused_specs table
_EXTRA_SPECS = {
    "lm_head": P(None, None),
    "wqkv": P(None, "tp"), "w_gate_up": P(None, "tp"),
    "bq": P("tp"), "bk": P("tp"), "bv": P("tp"),
}


def _extend_leaf(shape, spec: P, mesh: Mesh, axis: str) -> P:
    """Additionally shard the largest unsharded, divisible dim over ``axis``.

    Keeps existing TP placements untouched. Leaves too small or indivisible
    (norm vectors when D % dp != 0) stay as they were — replicating a few KB
    is the right trade versus padded gathers."""
    n = mesh.shape[axis]
    ndim = len(shape)
    names = tuple(spec) + (None,) * (ndim - len(tuple(spec)))
    if n == 1:
        return P(*names)
    cands = [d for d in range(ndim)
             if names[d] is None and shape[d] % n == 0 and shape[d] >= n]
    if not cands:
        return P(*names)
    d = max(cands, key=lambda i: shape[i])
    names = names[:d] + (axis,) + names[d + 1:]
    return P(*names)


def fsdp_param_shardings(cfg, mesh: Mesh, axis: str = "dp", params=None):
    """PartitionSpec pytree: Megatron TP rules + ZeRO-3 sharding over
    ``axis``. Walks the ACTUAL param tree when given (handles untied
    lm_head / fused wqkv / biases from the HF loader); otherwise shapes come
    from ``jax.eval_shape`` of the initializer — nothing is materialized.
    Quantized packs ({"q","s"} / {"q4",...}) are rejected: FSDP targets
    dense training trees (train in bf16/f32, quantize for serving)."""
    from leetcuda_tpu.models.llama import init_params, param_shardings

    base = param_shardings(cfg, mesh)
    layer_table = dict(base["layers"][0])
    if params is None:
        params = jax.eval_shape(lambda k: init_params(k, cfg),
                                jax.random.key(0))

    def leaf(x, spec):
        return _extend_leaf(tuple(x.shape), spec, mesh, axis)

    def walk_dict(tree, table):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "q" in v or "q4" in v:
                    raise ValueError(
                        f"FSDP shards dense training params; leaf '{k}' is "
                        "a quantized pack — dequantize (or train the bf16 "
                        "tree) first")
                sub = table.get(k)
                if not isinstance(sub, dict):
                    sub = {}
                out[k] = walk_dict(v, sub)
            else:
                spec = table.get(k, _EXTRA_SPECS.get(
                    k, P(*((None,) * v.ndim))))
                out[k] = leaf(v, spec)
        return out

    top_table = {k: v for k, v in base.items() if k != "layers"}
    out = walk_dict({k: v for k, v in params.items() if k != "layers"},
                    top_table)
    out["layers"] = [walk_dict(l, layer_table) for l in params["layers"]]
    return out


def shard_params_fsdp(params, cfg, mesh: Mesh, axis: str = "dp"):
    """device_put the param tree into its FSDP-resident layout."""
    spec = fsdp_param_shardings(cfg, mesh, axis, params=params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec)
