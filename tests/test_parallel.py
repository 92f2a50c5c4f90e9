"""Distributed layer tests on the 8-device virtual CPU mesh — the multi-chip
test strategy from SURVEY.md §4 (xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from leetcuda_tpu.parallel import collectives
from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig
from leetcuda_tpu.parallel.ring import ring_attention, ulysses_attention
from leetcuda_tpu.attention.flash import mha_ref


def _mesh_sp(n):
    return make_mesh(MeshConfig(sp=n, tp=len(jax.devices()) // n))


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_all_reduce():
    n = 8
    x = jnp.arange(n * 4, dtype=jnp.float32)
    out = collectives.demo_all_reduce(x)
    # psum of per-rank chunks, result replicated per shard then re-assembled
    chunks = np.asarray(x).reshape(n, 4)
    want = np.tile(chunks.sum(0), n)
    np.testing.assert_allclose(np.asarray(out), want)


def test_all_gather():
    x = jnp.arange(32, dtype=jnp.float32)
    out = collectives.demo_all_gather(x)
    np.testing.assert_allclose(np.asarray(out)[:32], np.asarray(x))


def test_reduce_scatter():
    n = 8
    x = jnp.arange(n * 8, dtype=jnp.float32)
    out = collectives.demo_reduce_scatter(x)
    assert out.shape == x.shape  # tiled psum_scatter keeps global shape


def test_p2p_ring():
    n = 8
    x = jnp.arange(n * 8, dtype=jnp.float32)
    out = collectives.demo_p2p(x)
    chunks = np.asarray(x).reshape(n, 8)
    want = np.roll(chunks, 1, axis=0).reshape(-1)
    np.testing.assert_allclose(np.asarray(out), want)


def test_all_demos_run():
    res = collectives.run_all(verbose=False)
    assert set(res) == set(collectives.ALL_DEMOS)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(causal, rng):
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8, 1), ("dp", "sp", "tp"))
    B, H, N, D = 1, 2, 1024, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    got = np.asarray(ring_attention(q, k, v, mesh, causal=causal,
                                    block_q=128, block_k=128))
    want = np.asarray(mha_ref(q, k, v, causal=causal))
    diff = np.abs(got - want)
    assert diff.max() < 2e-2 and diff.mean() < 1e-4, (diff.max(), diff.mean())


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention(causal, rng):
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8, 1), ("dp", "sp", "tp"))
    B, H, N, D = 1, 8, 1024, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    got = np.asarray(ulysses_attention(q, k, v, mesh, causal=causal,
                                       block_q=128, block_k=128))
    want = np.asarray(mha_ref(q, k, v, causal=causal))
    assert np.abs(got - want).max() < 2e-2


def test_ring_attention_gqa(rng):
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8, 1), ("dp", "sp", "tp"))
    B, H, Hkv, N, D = 1, 4, 2, 1024, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, N, D)), jnp.float32)
    got = np.asarray(ring_attention(q, k, v, mesh, causal=True,
                                    block_q=128, block_k=128))
    want = np.asarray(mha_ref(q, k, v, causal=True))
    assert np.abs(got - want).max() < 2e-2


def test_ppermute_pallas():
    from leetcuda_tpu.parallel.ring_pallas import ppermute_pallas
    mesh = Mesh(np.asarray(jax.devices()), ("x",))
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = np.asarray(ppermute_pallas(x, mesh))
    want = np.roll(np.asarray(x).reshape(8, 1, 128), 1, axis=0).reshape(8, 128)
    np.testing.assert_array_equal(out, want)


def test_ring_all_gather_pallas():
    from leetcuda_tpu.parallel.ring_pallas import ring_all_gather_pallas
    mesh = Mesh(np.asarray(jax.devices()), ("x",))
    x = jnp.arange(8 * 16 * 128, dtype=jnp.float32).reshape(8 * 16, 128)
    out = np.asarray(ring_all_gather_pallas(x, mesh))
    np.testing.assert_array_equal(out, np.asarray(x))


def test_multihost_object_collectives():
    """Object broadcast/all-gather (the reference's object-collective
    scripts) — single-process degenerate case must round-trip exactly."""
    from leetcuda_tpu.parallel.multihost import (
        broadcast_object, all_gather_objects, demo_all_gather_objects,
        demo_broadcast_object, sync_processes)

    obj = {"rank": 0, "nested": [1, "two", (3.0,)]}
    assert broadcast_object(obj) == obj
    got = all_gather_objects(obj)
    assert got == [obj]
    assert demo_all_gather_objects(verbose=False)[0]["devices"] >= 1
    assert demo_broadcast_object(verbose=False)["config"]["steps"] == 1000
    sync_processes("test")
