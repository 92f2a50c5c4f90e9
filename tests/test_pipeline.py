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
