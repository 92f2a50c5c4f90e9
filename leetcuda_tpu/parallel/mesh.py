"""Mesh / sharding layer — the GSPMD replacement for the reference's NCCL scripts.

The reference contains no parallelism implementation (SURVEY.md §2e) — only
collective demos. Here sharding is first-class: a named mesh with the standard
axes (dp, fsdp, tp, sp) and PartitionSpec rules for transformer weights and
activations, consumed by ``jax.jit``-with-shardings (GSPMD inserts the
collectives; they ride ICI by construction when the mesh axes map to the
physical torus) and by ``shard_map`` for the hand-written ring kernels.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1   # data parallel (gradients all-reduced)
    tp: int = 1   # tensor parallel (weights column/row sharded)
    sp: int = 1   # sequence/context parallel (ring attention axis)

    @property
    def size(self):
        return self.dp * self.tp * self.sp


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a (dp, sp, tp) mesh. Defaults to all devices on the tp axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if config is None:
        config = MeshConfig(tp=n)
    assert config.size == n, f"mesh {config} != {n} devices"
    arr = np.asarray(devices).reshape(config.dp, config.sp, config.tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def tp_shard_rules():
    """PartitionSpecs for a Llama-style layer under tensor parallelism.

    Megatron convention: column-parallel in-projections (q/k/v/gate/up sharded on
    the output dim), row-parallel out-projections (o/down sharded on the input
    dim) — one psum per block, inserted automatically by GSPMD.
    """
    return {
        "embedding": P("tp", None),          # vocab-sharded embedding
        "attn_qkv": P(None, "tp"),           # column parallel
        "attn_o": P("tp", None),             # row parallel
        "mlp_in": P(None, "tp"),             # gate/up column parallel
        "mlp_out": P("tp", None),            # down row parallel
        "norm": P(None),                     # replicated
        "lm_head": P(None, "tp"),            # vocab-sharded logits
        # activations
        "tokens": P("dp", "sp"),             # (batch, seq)
        "acts": P("dp", "sp", None),         # (batch, seq, model)
        "kv_cache": P("dp", "tp", None, None),  # (batch, heads, seq, head_dim)
    }


def shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))
