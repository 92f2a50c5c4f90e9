"""Non-divisible-shape regression tests for the reduction family.

Advisor r4: blocks past the true (S, K) bounds are DMA padding, and the
vector-accumulator rewrite summed it — (300, 1500) f32 sum was off by ~4e5
and max of an all-negative array came back wrong by 10.0 on chip. The fix
masks boundary blocks with broadcasted_iota against the true bounds (zeros
for sum/dot, -inf for max), the same ragged-tail idiom the attention kernels
use. Reference analog: the CUDA rungs guard `if (idx < N)` on every load
(/root/reference/kernels/reduce/block_all_reduce.cu).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.ops.dot_product import make_dot_product
from leetcuda_tpu.ops.reduce import (
    make_block_all_reduce_max,
    make_block_all_reduce_sum,
)

# (S, K) deliberately not divisible by the (256, 1024) default block
_SHAPES = [(300, 1500), (257, 1025), (100, 4000), (512, 1000)]


@pytest.mark.parametrize("shape", _SHAPES)
def test_sum_non_divisible(rng, shape):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    got = make_block_all_reduce_sum(jnp.float32)(x)
    np.testing.assert_allclose(float(got), float(jnp.sum(x)),
                               rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("shape", _SHAPES)
def test_max_all_negative_non_divisible(rng, shape):
    # all-negative input: any unmasked padding (zeros) wins the max
    x = jnp.asarray(-1.0 - np.abs(rng.normal(size=shape)), jnp.float32)
    got = make_block_all_reduce_max(jnp.float32)(x)
    np.testing.assert_allclose(float(got), float(jnp.max(x)), rtol=1e-6)


@pytest.mark.parametrize("shape", _SHAPES)
def test_dot_non_divisible(rng, shape):
    x = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    y = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    got = make_dot_product()(x, y)
    np.testing.assert_allclose(float(got), float(jnp.sum(x * y)),
                               rtol=1e-4, atol=1e-2)


def test_sum_divisible_unmasked_path(rng):
    # divisible shapes take the mask-free fast path — keep it correct too
    x = jnp.asarray(rng.normal(size=(512, 2048)), jnp.float32)
    got = make_block_all_reduce_sum(jnp.float32)(x)
    np.testing.assert_allclose(float(got), float(jnp.sum(x)),
                               rtol=1e-4, atol=1e-2)


def test_zero_arg_run_benchmark():
    # advisor r4: run_benchmark on a zero-arg fn crashed in _rpc_floor
    from leetcuda_tpu.bench.harness import run_benchmark

    r = run_benchmark(lambda: jnp.ones((8, 128)), iters=2)
    assert r.mean_ms > 0
