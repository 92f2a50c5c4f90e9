"""MoE + expert parallelism tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leetcuda_tpu.models.moe import (
    MoEConfig, init_moe_params, moe_ffn, moe_ffn_ref, shard_moe_params)


@pytest.fixture(scope="module")
def setup():
    cfg = MoEConfig(n_experts=4, topk=2, dim=64, ffn_dim=128,
                    capacity_factor=2.0)
    params = init_moe_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 64), jnp.float32)
    return cfg, params, x


def test_moe_matches_dense_oracle(setup):
    cfg, params, x = setup
    got = moe_ffn(x, params, cfg)
    want = moe_ffn_ref(x, params, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_moe_capacity_drops_overflow():
    """With capacity_factor tiny, overflow tokens contribute zero output."""
    cfg = MoEConfig(n_experts=2, topk=1, dim=64, ffn_dim=64,
                    capacity_factor=0.1)
    params = init_moe_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (64, 64), jnp.float32)
    out = moe_ffn(x, params, cfg)
    # capacity = max(8, ceil(64*1*0.1/2)) = 8 slots/expert -> <=16 tokens live
    live = jnp.sum(jnp.any(out != 0, axis=-1))
    assert int(live) <= 16


def test_moe_expert_parallel_matches(setup):
    cfg, params, x = setup
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("dp", "ep"))
    sharded = shard_moe_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
    got = jax.jit(lambda x, p: moe_ffn(x, p, cfg))(xs, sharded)
    want = moe_ffn(x, params, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_moe_gradients_flow(setup):
    cfg, params, x = setup

    def loss(params):
        return jnp.mean(jnp.square(moe_ffn(x, params, cfg)))

    grads = jax.grad(loss)(params)
    for name in ("w_gate", "w_up", "w_down", "router"):
        g = grads[name]
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0, name
