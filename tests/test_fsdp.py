"""FSDP (ZeRO-3) sharded training — parallel/fsdp.py.

Oracle: one AdamW step under (dp=4, tp=2) FSDP must produce the same loss
and updated params as the unsharded single-device step — sharding the
resident layout is numerics-neutral. Memory claim checked structurally:
every large leaf's addressable shard carries 1/dp of the rows, and the
optimizer state inherits the same layout (the ZeRO-3 property).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.models.llama import (tiny_config, init_params,
                                       make_train_step)
from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig
from leetcuda_tpu.parallel.fsdp import (fsdp_param_shardings,
                                        shard_params_fsdp)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    return cfg, params, tokens


def test_fsdp_specs_extend_tp(setup):
    cfg, params, _ = setup
    mesh = make_mesh(MeshConfig(dp=4, sp=1, tp=2), devices=jax.devices())
    spec = fsdp_param_shardings(cfg, mesh)
    l0 = spec["layers"][0]
    # column-parallel wq keeps tp on dim 1 and gains dp on dim 0
    assert tuple(l0["wq"]) == ("dp", "tp")
    # row-parallel wo: tp on dim 0, dp lands on dim 1
    assert tuple(l0["wo"]) == ("tp", "dp")
    # embed (V, D): dp on the larger vocab dim
    assert tuple(spec["embed"])[0] == "dp"


def test_fsdp_step_matches_unsharded(setup):
    cfg, params, tokens = setup
    mesh = make_mesh(MeshConfig(dp=4, sp=1, tp=2), devices=jax.devices())

    # shard first: the unsharded step donates its params buffers
    init_f, step_f = make_train_step(cfg, mesh=mesh, fsdp=True)
    p_sh = shard_params_fsdp(params, cfg, mesh)

    p_in = jax.tree_util.tree_map(jnp.array, params)  # donation-safe copy
    init_ref, step_ref = make_train_step(cfg, mesh=None)
    p_ref, _, loss_ref = step_ref(p_in, init_ref(p_in), tokens)
    # ZeRO-3 structural check: big leaves hold 1/dp x 1/tp of the elements
    wq = p_sh["layers"][0]["wq"]
    shard = wq.addressable_shards[0].data
    assert shard.shape[0] == wq.shape[0] // 4
    assert shard.shape[1] == wq.shape[1] // 2
    opt_f = init_f(p_sh)
    # optimizer state mirrors the FSDP layout (mu for wq)
    mu_wq = opt_f[0].mu["layers"][0]["wq"]
    assert (mu_wq.addressable_shards[0].data.shape
            == shard.shape), "adamw state did not inherit ZeRO-3 sharding"

    p_new, _, loss = step_f(p_sh, opt_f, tokens)
    np.testing.assert_allclose(float(loss), float(loss_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_new = jax.tree_util.tree_leaves(p_new)
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(jax.device_get(b),
                                                  np.float32),
            rtol=5e-2, atol=5e-3)


def test_fsdp_handles_hf_trees_and_rejects_quant(setup):
    """Review fixes: untied-lm_head trees get specs (no pytree mismatch),
    quantized packs are rejected with a clear message, and fsdp=True without
    a mesh raises instead of silently degrading to the unsharded step."""
    from leetcuda_tpu.models.llama import quantize_params

    cfg, params, _ = setup
    mesh = make_mesh(MeshConfig(dp=4, sp=1, tp=2), devices=jax.devices())

    untied = dict(params)
    untied["lm_head"] = jnp.array(params["embed"])
    spec = fsdp_param_shardings(cfg, mesh, params=untied)
    assert "lm_head" in spec and "dp" in tuple(spec["lm_head"])
    sh = shard_params_fsdp(untied, cfg, mesh)
    lm = sh["lm_head"]
    assert lm.addressable_shards[0].data.shape[0] == lm.shape[0] // 4

    with pytest.raises(ValueError, match="quantized pack"):
        fsdp_param_shardings(cfg, mesh, params=quantize_params(params))

    with pytest.raises(ValueError, match="requires a mesh"):
        make_train_step(cfg, mesh=None, fsdp=True)
