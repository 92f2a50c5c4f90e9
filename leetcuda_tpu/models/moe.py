"""Mixture-of-Experts layer with expert parallelism (the "ep" mesh axis).

The reference has no parallelism implementation at all (SURVEY.md §2e); this
completes the strategy set (dp/tp/sp from parallel/ + pp from
parallel/pipeline.py + ep here). TPU-native design constraints drive the
algorithm choice:

- **Static shapes**: top-k routing uses the GShard/Switch capacity-based
  dispatch — every expert processes exactly C = ceil(T·k·cf / E) token slots;
  overflow tokens drop (cf controls how rare that is). Dispatch and combine
  are one-hot einsums, which XLA lowers to MXU matmuls — no gather/scatter.
- **Expert parallelism**: expert-stacked weights (E, ...) shard on "ep";
  under jit+GSPMD the dispatch einsum's (E, C, D) result inherits the expert
  sharding, so XLA inserts the token all-to-all automatically.

Reference for the pattern: GShard (arXiv:2006.16668) §3.2 dispatch einsums.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    n_experts: int = 8
    topk: int = 2
    capacity_factor: float = 1.25
    dim: int = 256
    ffn_dim: int = 512
    dtype: object = jnp.float32
    # Mixtral semantics: gate weights renormalize over the SELECTED top-k
    # (HF MixtralSparseMoeBlock divides by their sum); GShard/Switch keep the
    # raw softmax probabilities
    renorm_topk: bool = False

    def capacity(self, n_tokens: int) -> int:
        c = math.ceil(n_tokens * self.topk * self.capacity_factor
                      / self.n_experts)
        return max(8, -(-c // 8) * 8)  # sublane-aligned


def init_moe_params(key, cfg: MoEConfig):
    E, D, F = cfg.n_experts, cfg.dim, cfg.ffn_dim
    ks = jax.random.split(key, 4)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(cfg.dtype)

    return {
        "router": dense(ks[0], D, (D, E)).astype(jnp.float32),
        "w_gate": dense(ks[1], D, (E, D, F)),
        "w_up": dense(ks[2], D, (E, D, F)),
        "w_down": dense(ks[3], F, (E, F, D)),
    }


def moe_shardings():
    """PartitionSpecs: router replicated, expert stacks sharded on ep."""
    return {
        "router": P(None, None),
        "w_gate": P("ep", None, None),
        "w_up": P("ep", None, None),
        "w_down": P("ep", None, None),
    }


def shard_moe_params(params, mesh: Mesh):
    spec = moe_shardings()
    return {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
            for k, v in params.items()}


def _routing(logits, cfg: MoEConfig, capacity: int):
    """Top-k capacity routing. logits (T, E) f32 ->
    dispatch (T, E, C) bool-ish, combine (T, E, C) f32."""
    T, E = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)  # (T, E)

    dispatch = jnp.zeros((T, E, capacity), jnp.float32)
    combine = jnp.zeros((T, E, capacity), jnp.float32)
    gsum = jnp.zeros((T,), jnp.float32)
    masked = probs
    for _ in range(cfg.topk):
        # current best expert per token
        idx = jnp.argmax(masked, axis=-1)  # (T,)
        gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
        onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # (T, E)
        # position of each token within its chosen expert's buffer =
        # number of earlier tokens that chose the same expert (this round)
        # plus slots already taken in earlier rounds
        taken = jnp.sum(dispatch, axis=(0, 2))  # (E,) slots used so far
        rank = jnp.cumsum(onehot, axis=0) - onehot  # (T, E) earlier same-expert
        pos = (rank + taken[None, :]) * onehot  # (T, E)
        within = (pos < capacity) & (onehot > 0)
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                                dtype=jnp.float32)  # (T, E, C)
        sel = within.astype(jnp.float32)[..., None] * pos_oh
        dispatch = dispatch + sel
        combine = combine + gate[:, None, None] * sel
        gsum = gsum + gate  # selected gates (capacity drops still count)
        masked = masked * (1.0 - onehot)  # exclude chosen expert next round
    if cfg.renorm_topk:
        combine = combine / gsum[:, None, None]
    return dispatch, combine


def moe_ffn(x, params, cfg: MoEConfig):
    """MoE SwiGLU FFN. x (..., T, D) -> (..., T, D).

    Flattens leading dims; dispatch/combine via one-hot einsums (MXU-friendly,
    GSPMD-shardable on "ep")."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    xf = x.reshape(-1, D)
    T = xf.shape[0]
    C = cfg.capacity(T)

    logits = xf.astype(jnp.float32) @ params["router"]
    dispatch, combine = _routing(logits, cfg, C)

    # (T,E,C) x (T,D) -> (E,C,D): the token all-to-all under ep sharding
    expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), xf)
    gate = jax.nn.silu(jnp.einsum("ecd,edf->ecf", expert_in,
                                  params["w_gate"]).astype(jnp.float32))
    up = jnp.einsum("ecd,edf->ecf", expert_in,
                    params["w_up"]).astype(jnp.float32)
    h = (gate * up).astype(x.dtype)
    expert_out = jnp.einsum("ecf,efd->ecd", h, params["w_down"])
    out = jnp.einsum("tec,ecd->td", combine.astype(x.dtype), expert_out)
    return out.reshape(*lead, D)


def moe_ffn_dropless(x, params, cfg: MoEConfig, block_m: int = 128):
    """Dropless MoE via the grouped matmul (gemm/grouped.py): every token
    reaches its top-k experts regardless of load — no capacity, no drops.

    Token copies are sorted by expert into a zero-padded buffer whose group
    boundaries are block_m-aligned, the three FFN matmuls run as gmm chains
    (each row tile DMAs its own expert's panel), and a segment-sum combines
    the k weighted copies back per token. All shapes static: the buffer is
    T·k + E·block_m rows (worst-case per-group padding)."""
    from leetcuda_tpu.gemm.grouped import make_gmm, tile_groups_from_sizes

    lead = x.shape[:-1]
    D = x.shape[-1]
    E, k = cfg.n_experts, cfg.topk
    xf = x.reshape(-1, D)
    T = xf.shape[0]

    logits = xf.astype(jnp.float32) @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_w, expert_id = jax.lax.top_k(probs, k)       # (T, k)
    if cfg.renorm_topk:
        gate_w = gate_w / jnp.sum(gate_w, axis=-1, keepdims=True)
    e_flat = expert_id.reshape(-1)                     # (T*k,)
    token_of_copy = jnp.repeat(jnp.arange(T), k)

    counts = jnp.sum(jax.nn.one_hot(e_flat, E, dtype=jnp.int32), axis=0)
    padded = ((counts + block_m - 1) // block_m) * block_m
    off_pad = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded)[:-1]])
    off_raw = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1]])

    order = jnp.argsort(e_flat, stable=True)           # copies sorted by expert
    e_sorted = e_flat[order]
    pos = off_pad[e_sorted] + (jnp.arange(T * k) - off_raw[e_sorted])

    # static worst case, rounded so the row-tile grid divides exactly for
    # ANY token count (decode calls come in with T as small as B)
    T_buf = -(-T * k // block_m) * block_m + E * block_m
    buf = jnp.zeros((T_buf, D), x.dtype).at[pos].set(xf[token_of_copy[order]])

    n_tiles = T_buf // block_m
    tile_group = jnp.minimum(
        tile_groups_from_sizes(padded, block_m, n_tiles), E - 1)

    # (bm, 2048, 2048) tuned on v5e (140 TFLOPS at T=8192 variable groups);
    # make_gmm clamps bn/bk to the actual dims for small models
    gmm = make_gmm(block=(block_m, 2048, 2048))
    gate = jax.nn.silu(gmm(buf, params["w_gate"], tile_group)
                       .astype(jnp.float32))
    up = gmm(buf, params["w_up"], tile_group).astype(jnp.float32)
    down = gmm((gate * up).astype(x.dtype), params["w_down"], tile_group)

    w_sorted = gate_w.reshape(-1)[order].astype(jnp.float32)
    contrib = down[pos].astype(jnp.float32) * w_sorted[:, None]
    out = jnp.zeros((T, D), jnp.float32).at[token_of_copy[order]].add(contrib)
    return out.astype(x.dtype).reshape(*lead, D)


def moe_ffn_dropless_ref(x, params, cfg: MoEConfig):
    """Dense oracle: every token through its top-k experts, no capacity."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    xf = x.reshape(-1, D)
    logits = xf.astype(jnp.float32) @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_w, topi = jax.lax.top_k(probs, cfg.topk)
    if cfg.renorm_topk:
        gate_w = gate_w / jnp.sum(gate_w, axis=-1, keepdims=True)

    out = jnp.zeros((xf.shape[0], D), jnp.float32)
    for e in range(cfg.n_experts):
        g = jax.nn.silu((xf @ params["w_gate"][e]).astype(jnp.float32))
        u = (xf @ params["w_up"][e]).astype(jnp.float32)
        y = ((g * u).astype(x.dtype) @ params["w_down"][e]).astype(jnp.float32)
        for r in range(cfg.topk):
            w = jnp.where(topi[:, r] == e, gate_w[:, r], 0.0)
            out = out + w[:, None] * y
    return out.astype(x.dtype).reshape(*lead, D)


def moe_ffn_ref(x, params, cfg: MoEConfig):
    """Dense oracle: run every token through its top-k experts by loop."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    xf = x.reshape(-1, D)
    logits = xf.astype(jnp.float32) @ params["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    topg, topi = jax.lax.top_k(probs, cfg.topk)  # (T, k)
    if cfg.renorm_topk:
        probs = probs / jnp.sum(topg, axis=-1, keepdims=True)

    def expert(e, v):
        g = jax.nn.silu((v @ params["w_gate"][e]).astype(jnp.float32))
        u = (v @ params["w_up"][e]).astype(jnp.float32)
        return ((g * u).astype(v.dtype) @ params["w_down"][e])

    out = jnp.zeros_like(xf)
    T = xf.shape[0]
    C = cfg.capacity(T)
    # capacity bookkeeping must match _routing's (first-come order per round)
    for r in range(cfg.topk):
        idx = topi[:, r]
        gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
        for e in range(cfg.n_experts):
            mask = idx == e
            # drop overflow: tokens ranked >= remaining capacity this round
            prior = sum(jnp.sum(topi[:, rr] == e) for rr in range(r))
            rank = jnp.cumsum(mask) - mask
            keep = mask & (rank + prior < C)
            y = expert(e, xf)
            out = out + jnp.where(keep[:, None],
                                  gate[:, None].astype(x.dtype) * y, 0)
    return out.reshape(*lead, D)
