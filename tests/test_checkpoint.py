"""Checkpoint/resume: a run interrupted at step k and restored must produce
the same losses as an uninterrupted run (bitwise state round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.llama import tiny_config, init_params, make_train_step
from leetcuda_tpu.models.checkpoint import save_checkpoint, restore_checkpoint
import pytest

pytestmark = pytest.mark.slow  # full engine/model runs; default run skips (-m) — CI covers


def test_resume_matches_uninterrupted(tmp_path):
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    init_opt, step = make_train_step(cfg, learning_rate=1e-3)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 65)), jnp.int32)

    # uninterrupted: 4 steps (on copies: the step donates its arguments)
    p = jax.tree_util.tree_map(jnp.copy, params)
    s = init_opt(p)
    losses = []
    for _ in range(4):
        p, s, loss = step(p, s, tokens)
        losses.append(float(loss))

    # interrupted: 2 steps -> save -> restore -> 2 more
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    s2 = init_opt(p2)
    for _ in range(2):
        p2, s2, _ = step(p2, s2, tokens)
    save_checkpoint(tmp_path / "ckpt", p2, s2, step=2)
    rp, rs, rstep = restore_checkpoint(tmp_path / "ckpt",
                                       like=(params, init_opt(params)))
    assert rstep == 2
    resumed = []
    for _ in range(2):
        rp, rs, loss = step(rp, rs, tokens)
        resumed.append(float(loss))

    np.testing.assert_allclose(resumed, losses[2:], rtol=1e-6)


def test_params_roundtrip_exact(tmp_path):
    cfg = tiny_config()
    params = init_params(jax.random.key(1), cfg)
    save_checkpoint(tmp_path / "p", params)
    rp, ropt, _ = restore_checkpoint(tmp_path / "p")
    assert ropt is None
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
