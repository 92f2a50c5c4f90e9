"""Pipeline parallelism: GPipe schedule over ppermute == sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from leetcuda_tpu.parallel.pipeline import (
    stack_stage_params, shard_stage_params, pipeline_apply)

pytestmark = pytest.mark.slow  # full engine/model run; default skips, CI (--runslow) covers


def mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


@pytest.fixture(scope="module")
def setup():
    P_STAGES, D, H = 4, 32, 64
    rng = np.random.default_rng(0)
    per_stage = [{
        "w1": jnp.asarray(rng.normal(0, 0.3, (D, H)), jnp.float32),
        "b1": jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.3, (H, D)), jnp.float32),
        "b2": jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.float32),
    } for _ in range(P_STAGES)]
    mesh = Mesh(np.asarray(jax.devices()[:P_STAGES]), axis_names=("pp",))
    return per_stage, mesh


@pytest.mark.parametrize("M", [1, 4, 7])
def test_pipeline_matches_sequential(setup, M):
    per_stage, mesh = setup
    rng = np.random.default_rng(M)
    mbs = jnp.asarray(rng.normal(size=(M, 8, 32)), jnp.float32)

    stacked = shard_stage_params(stack_stage_params(per_stage), mesh)
    got = pipeline_apply(mlp_stage, stacked, mbs, mesh)

    want = mbs
    for p in per_stage:
        want = mlp_stage(p, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_eight_stages():
    P_STAGES, D = 8, 16
    rng = np.random.default_rng(9)
    per_stage = [{
        "w1": jnp.asarray(rng.normal(0, 0.3, (D, D)), jnp.float32),
        "b1": jnp.zeros((D,), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.3, (D, D)), jnp.float32),
        "b2": jnp.zeros((D,), jnp.float32),
    } for _ in range(P_STAGES)]
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("pp",))
    mbs = jnp.asarray(rng.normal(size=(3, 4, D)), jnp.float32)
    stacked = shard_stage_params(stack_stage_params(per_stage), mesh)
    got = pipeline_apply(mlp_stage, stacked, mbs, mesh)
    want = mbs
    for p in per_stage:
        want = mlp_stage(p, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_llama_forward_matches_plain():
    """Full model through the 4-stage pipeline == plain forward."""
    import jax.numpy as jnp
    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, forward, pipeline_forward)

    cfg = tiny_config(n_layers=4)
    params = init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("pp",))
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 32)), jnp.int32)
    want = forward(params, tokens, cfg)
    got = pipeline_forward(params, tokens, cfg, mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pp_train_step_matches_solo():
    """Pipeline-parallel TRAINING: the GPipe step's loss and gradients equal
    the plain single-device train step's (reverse AD through the schedule —
    static-bound fori_loop lowers to scan, ppermute transposes to the
    inverted ring)."""
    from leetcuda_tpu.models.llama import tiny_config, init_params, loss_fn
    from leetcuda_tpu.parallel.pipeline import (
        split_llama_stages, shard_stage_params, merge_llama_stages,
        make_pp_train_step)

    cfg = tiny_config(n_layers=4)
    params = init_params(jax.random.key(0), cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("pp",))
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 32)), jnp.int32)

    # the step donates its state and `params` is compared below -> copy
    outer, staged = split_llama_stages(
        jax.tree_util.tree_map(jnp.copy, params), 4)
    staged = shard_stage_params(staged, mesh)
    init_opt, step = make_pp_train_step(cfg, mesh, n_microbatches=2,
                                        learning_rate=1e-3)
    tp = (outer, staged)
    (outer2, staged2), opt, loss = step(tp, init_opt(tp), tokens)

    solo = float(loss_fn(params, tokens, cfg))
    np.testing.assert_allclose(float(loss), solo, atol=1e-5, rtol=1e-5)

    # gradient parity: one adamw step from identical state must produce the
    # same updated weights as the plain step (same tx, same lr)
    from leetcuda_tpu.models.llama import make_train_step
    init_opt_s, step_s = make_train_step(cfg, learning_rate=1e-3, remat=False)
    p_solo = jax.tree_util.tree_map(jnp.copy, params)
    p_solo, _, _ = step_s(p_solo, init_opt_s(p_solo), tokens)
    merged = merge_llama_stages(outer2, staged2)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(merged),
            jax.tree_util.tree_leaves_with_path(p_solo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=str(ka))


def test_pp_dp_hybrid_train():
    """pp=4 x dp=2 hybrid: microbatch batch dim sharded over dp; loss equals
    the solo step's."""
    from leetcuda_tpu.models.llama import tiny_config, init_params, loss_fn
    from leetcuda_tpu.parallel.pipeline import (
        split_llama_stages, shard_stage_params, make_pp_train_step)

    cfg = tiny_config(n_layers=4)
    params = init_params(jax.random.key(1), cfg)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                axis_names=("pp", "dp"))
    tokens = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab_size, (8, 32)), jnp.int32)

    outer, staged = split_llama_stages(
        jax.tree_util.tree_map(jnp.copy, params), 4)
    staged = shard_stage_params(staged, mesh)
    init_opt, step = make_pp_train_step(cfg, mesh, n_microbatches=2,
                                        batch_axis="dp")
    tp = (outer, staged)
    _, _, loss = step(tp, init_opt(tp), tokens)
    solo = float(loss_fn(params, tokens, cfg))
    np.testing.assert_allclose(float(loss), solo, atol=1e-5, rtol=1e-5)


def test_merge_llama_stages_roundtrip():
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.parallel.pipeline import (
        split_llama_stages, merge_llama_stages)

    cfg = tiny_config(n_layers=4)
    params = init_params(jax.random.key(2), cfg)
    outer, staged = split_llama_stages(params, 2)
    back = merge_llama_stages(outer, staged)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
