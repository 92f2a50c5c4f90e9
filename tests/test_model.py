"""Llama-model tests: training step runs + loss falls; prefill/decode agree.

The prefill-vs-decode consistency check is the transformer equivalent of the
reference's oracle diffing: the same tokens run through the flash-attention
prefill path and the KV-cache decode path must produce the same logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.models.llama import (
    tiny_config, init_params, forward, loss_fn, make_train_step,
    init_kv_caches, decode_step)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    return cfg, params


def test_forward_shape(setup):
    cfg, params = setup
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 128)), jnp.int32)
    logits = forward(params, tokens, cfg)
    assert logits.shape == (2, 128, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_train_step_loss_decreases(setup):
    cfg, params = setup
    # the step donates its state args; train on a copy so the module-scoped
    # fixture params stay alive for later tests
    params = jax.tree_util.tree_map(jnp.copy, params)
    init_opt, step = make_train_step(cfg, learning_rate=1e-3)
    opt_state = init_opt(params)
    tokens = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab_size, (4, 65)), jnp.int32)
    losses = []
    p = params
    for _ in range(5):
        p, opt_state, loss = step(p, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_prefill_decode_consistency(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    B, S = 2, 16
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)

    prefill_logits = forward(params, tokens, cfg)  # (B, S, V)

    caches = init_kv_caches(cfg, B, 128)
    lengths = jnp.zeros((B,), jnp.int32)
    decode_logits = []
    for t in range(S):
        logits, caches = decode_step(params, tokens[:, t], caches, lengths, cfg)
        decode_logits.append(logits)
        lengths = lengths + 1
    decode_logits = jnp.stack(decode_logits, axis=1)

    np.testing.assert_allclose(np.asarray(decode_logits),
                               np.asarray(prefill_logits),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_sharded_train_step():
    """dp=2, sp=2, tp=2 over the 8 virtual devices — the dryrun_multichip path."""
    from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig
    cfg = tiny_config()
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    params = init_params(jax.random.key(0), cfg)
    init_opt, step = make_train_step(cfg, mesh=mesh, learning_rate=1e-3)
    opt_state = init_opt(params)
    tokens = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (4, 128)), jnp.int32)
    p, opt_state, loss = step(params, opt_state, tokens)
    assert np.isfinite(float(loss))
    # sharded loss == single-device loss
    solo = float(loss_fn(init_params(jax.random.key(0), cfg), tokens, cfg))
    np.testing.assert_allclose(float(loss), solo, atol=1e-3, rtol=1e-4)
