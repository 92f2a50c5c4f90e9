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
                   axis: str = "pp"):
    """Run a P-stage pipeline over M microbatches.

    stage_fn(stage_params, x) -> y with y.shape == x.shape;
    stacked_params: pytree with leading dim P (sharded on ``axis``);
    microbatches: (M, ...) array. Returns (M, ...) outputs =
    stage_{P-1}(...stage_0(mb)...) per microbatch.
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

    in_specs = (
        jax.tree_util.tree_map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), stacked_params),
        P(*([None] * microbatches.ndim)),
    )
    # each stage returns its (mostly-garbage) (M, ...) collection buffer;
    # out_specs concatenates them along dim 0 -> (P*M, ...); the last stage's
    # block is the real result
    out = shard_map(spmd, mesh=mesh, in_specs=in_specs,
                    out_specs=P(axis, *([None] * (microbatches.ndim - 1))),
                    check_vma=False)(stacked_params, microbatches)
    return out[(nstages - 1) * M:]
