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


def _extend_tree(shapes, spec, mesh: Mesh, axis: str):
    if isinstance(spec, P):
        return _extend_leaf(tuple(shapes.shape), spec, mesh, axis)
    if isinstance(spec, dict):
        return {k: _extend_tree(shapes[k], spec[k], mesh, axis) for k in spec}
    if isinstance(spec, (list, tuple)):
        return [_extend_tree(sh, sp, mesh, axis)
                for sh, sp in zip(shapes, spec)]
    raise TypeError(f"unexpected spec node {type(spec)}")


def fsdp_param_shardings(cfg, mesh: Mesh, axis: str = "dp"):
    """PartitionSpec pytree: Megatron TP rules + ZeRO-3 sharding over
    ``axis``. Shapes come from ``jax.eval_shape`` of the initializer — no
    params are materialized."""
    from leetcuda_tpu.models.llama import init_params, param_shardings

    base = param_shardings(cfg, mesh)
    shapes = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.key(0))
    return _extend_tree(shapes, base, mesh, axis)


def shard_params_fsdp(params, cfg, mesh: Mesh, axis: str = "dp"):
    """device_put the param tree into its FSDP-resident layout."""
    spec = fsdp_param_shardings(cfg, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec,
        is_leaf=lambda x: isinstance(x, P))
