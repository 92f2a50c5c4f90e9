"""Pipeline parallelism (the "pp" mesh axis) — GPipe schedule over ppermute.

Completes the parallelism strategy set (dp/tp/sp in mesh.py + ring.py, ep in
models/moe.py). The reference has none of these (SURVEY.md §2e).

Design (idiomatic TPU, single compiled program):
- Stage weights live stacked with a leading stage dim, sharded P("pp", ...);
  inside shard_map each device sees exactly its own stage's slice.
- The schedule is the classic GPipe loop unrolled as `lax.fori_loop` over
  M + P - 1 ticks: at tick t, stage s runs microbatch t - s; activations
  circulate one hop per tick via `jax.lax.ppermute` over the pp ring (ICI
  neighbor traffic by construction).
- Bubbles (invalid (t, s) pairs) compute garbage that is fully overwritten
  next tick and never collected — no masking needed in the stage function.

``pipeline_apply`` is shape-generic: any shape-preserving stage_fn works
(a transformer layer block, an MLP, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map


def stack_stage_params(per_stage_params):
    """[stage0_tree, stage1_tree, ...] -> one tree with leading stage dim."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage_params)


def shard_stage_params(stacked, mesh: Mesh):
    """Put the stacked tree on the mesh with the stage dim on "pp"."""
    def put(x):
        spec = P("pp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, stacked)


def pipeline_apply(stage_fn, stacked_params, microbatches, mesh: Mesh,
                   axis: str = "pp", batch_axis: str | None = None):
    """Run a P-stage pipeline over M microbatches.

    stage_fn(stage_params, x) -> y with y.shape == x.shape;
    stacked_params: pytree with leading dim P (sharded on ``axis``);
    microbatches: (M, ...) array. Returns (M, ...) outputs =
    stage_{P-1}(...stage_0(mb)...) per microbatch.

    ``batch_axis``: optional mesh axis sharding microbatches' dim 1 (the
    per-microbatch batch) — the pp x dp hybrid. stage_fn must be
    batch-elementwise (a transformer stack is); params replicate over it.
    """
    M = microbatches.shape[0]
    nstages = mesh.shape[axis]

    def spmd(params, mbs):
        # leading stage/shard dim of size 1 inside the shard -> squeeze
        params = jax.tree_util.tree_map(lambda x: x[0], params)
        stage = jax.lax.axis_index(axis)
        last = nstages - 1
        perm = [(i, (i + 1) % nstages) for i in range(nstages)]

        state = jnp.zeros_like(mbs[0])
        outputs = jnp.zeros_like(mbs)

        def tick(t, carry):
            state, outputs = carry
            # stage 0 ingests microbatch t; everyone else takes the wire
            mb_in = mbs[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(stage == 0, mb_in, state)
            out = stage_fn(params, inp)
            # collect at the last stage: tick t completes microbatch t - last
            mb_idx = t - last
            collect = (stage == last) & (mb_idx >= 0)
            outputs = jax.lax.dynamic_update_slice(
                outputs,
                jnp.where(collect, out, outputs[jnp.clip(mb_idx, 0, M - 1)]
                          )[None],
                (jnp.clip(mb_idx, 0, M - 1),) + (0,) * out.ndim)
            # circulate one hop along the ring
            state = jax.lax.ppermute(out, axis, perm)
            return state, outputs

        _, outputs = jax.lax.fori_loop(0, M + last, tick, (state, outputs))
        return outputs

    tail = [None] * (microbatches.ndim - 2)
    mb_spec = P(None, batch_axis, *tail)
    in_specs = (
        jax.tree_util.tree_map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), stacked_params),
        mb_spec,
    )
    # each stage returns its (mostly-garbage) (M, ...) collection buffer;
    # out_specs concatenates them along dim 0 -> (P*M, ...); the last stage's
    # block is the real result
    out = shard_map(spmd, mesh=mesh, in_specs=in_specs,
                    out_specs=P(axis, batch_axis, *tail),
                    check_vma=False)(stacked_params, microbatches)
    return out[(nstages - 1) * M:]

# --- full-model pipeline training (llama stack over pp, optional dp) --------

def split_llama_stages(params, n_stages: int):
    """Split a llama param tree for pipeline training.

    Returns ``(outer, staged)``: ``outer`` = {embed, norm, lm_head?}
    (replicated — they run outside the pipeline), ``staged`` = the L layer
    trees stacked to leading dims (P, L/P, ...) ready for
    ``shard_stage_params``. Layers must be structurally homogeneous (true of
    init_params / the HF loader; stage boundaries land between layers)."""
    layers = params["layers"]
    L, P_ = len(layers), n_stages
    assert L % P_ == 0, f"n_layers={L} must divide into {P_} stages"
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    staged = jax.tree_util.tree_map(
        lambda x: x.reshape((P_, L // P_) + x.shape[1:]), stacked)
    outer = {k: v for k, v in params.items() if k != "layers"}
    return outer, staged


def merge_llama_stages(outer, staged):
    """Inverse of split_llama_stages — back to the flat llama tree (e.g. to
    hand a pp-trained model to the Engine or a checkpointer)."""
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), staged)
    L = jax.tree_util.tree_leaves(flat)[0].shape[0]
    layers = [jax.tree_util.tree_map(lambda x: x[i], flat) for i in range(L)]
    return {**outer, "layers": layers}


def make_pp_train_step(cfg, mesh: Mesh, n_microbatches: int,
                       learning_rate: float = 3e-4, remat: bool = True,
                       batch_axis: str | None = None):
    """GPipe pipeline-parallel AdamW train step for the full llama stack.

    The layer stack runs inside ``pipeline_apply`` (stage weights sharded on
    the mesh's "pp" axis, activations hopping the ICI ring); embedding, final
    norm and the LM head run outside, replicated. Reverse-mode AD flows
    through the schedule (static-bound fori_loop lowers to scan; ppermute and
    the collect DUS have transpose rules), so the backward is the mirrored
    pipeline XLA derives — bubbles' garbage gets zero cotangents.

    ``batch_axis``: optional dp axis for the pp x dp hybrid (global batch
    must then be divisible by n_microbatches * dp). ``remat`` checkpoints
    each layer inside a stage. The loss is EXACTLY models/llama.loss_fn —
    microbatching a mean CE changes nothing (equal microbatch sizes).

    Usage:
        outer, staged = split_llama_stages(params, mesh.shape["pp"])
        staged = shard_stage_params(staged, mesh)
        init_opt, step = make_pp_train_step(cfg, mesh, n_microbatches=4)
        state = ((outer, staged), init_opt((outer, staged)))
    """
    import math

    import optax

    from leetcuda_tpu.models.llama import _rms_norm, apply_layer

    # the stage scans layers with ONE static config — per-layer alternating
    # windows (Gemma2 alt_window) would need a static window per scan step
    assert not getattr(cfg, "alt_window", False), (
        "alt_window models need per-layer static kernels; unroll the stage "
        "(pp training currently supports uniform-window configs)")
    assert not getattr(cfg, "nope_interval", 0), (
        "NoPE-interval models vary rope per layer; the stage scan applies "
        "one static config")
    tx = optax.adamw(learning_rate)

    def stage_fn(stage_params, x):
        B, S, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))

        def body(h, layer):
            h2, _ = apply_layer(layer, h, positions=positions, cfg=cfg,
                                mesh=None)
            return h2, None

        body_fn = jax.checkpoint(body) if remat else body
        x, _ = jax.lax.scan(body_fn, x, stage_params)
        return x

    def loss_pp(train_params, tokens):
        outer, staged = train_params
        M = n_microbatches
        B, S = tokens.shape
        assert B % M == 0, (B, M)
        x = jnp.take(outer["embed"], tokens, axis=0)
        if cfg.embed_scale:
            x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
        mbs = x.reshape(M, B // M, S, x.shape[-1])
        y = pipeline_apply(stage_fn, staged, mbs, mesh,
                           batch_axis=batch_axis)
        y = y.reshape(B, S, -1)
        h = _rms_norm(y, outer["norm"], cfg.norm_eps, cfg.rms_offset)
        w_lm = outer.get("lm_head", outer["embed"])
        logits = (h @ w_lm.T).astype(jnp.float32)[:, :-1]
        if cfg.final_softcap:
            logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    def init_opt(train_params):
        return tx.init(train_params)

    def step(train_params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_pp)(train_params, tokens)
        updates, opt_state = tx.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss

    return init_opt, jax.jit(step, donate_argnums=(0, 1))
