"""Layer norm — analog of /root/reference/kernels/layer-norm/layer_norm.cu.

The reference's kernels (layer_norm.cu:55-410) normalize each row of a (N, K)
matrix: mean/variance via block reduce, then ``g·(x−μ)/√(σ²+ε) + b`` with scalar
g, b. The TPU version maps rows to grid steps, does the mean/var reduce on the VPU
within the block, and supports both the reference's scalar g/b form and the
production per-feature ``gamma/beta`` vectors. Statistics are always f32 (the
``_f32`` accumulator rungs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op

EPS = 1e-5


def _layer_norm_kernel(x_ref, g_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + EPS)
    g = g_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    o_ref[:] = (xhat * g + b).astype(o_ref.dtype)


def make_layer_norm(*, rows_per_step: int = 8):
    """layer_norm(x, gamma, beta) over rows of (S, K); gamma/beta shape (K,)."""

    @jax.jit
    def fn(x, gamma, beta):
        assert x.ndim == 2
        S, K = x.shape
        bs = min(rows_per_step, S)
        g2 = gamma.reshape(1, K)
        b2 = beta.reshape(1, K)
        return pl.pallas_call(
            _layer_norm_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(cdiv(S, bs),),
            in_specs=[
                pl.BlockSpec((bs, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret_default(),
        )(x, g2, b2)

    return fn


def layer_norm_scalar_gb(x, g: float = 1.0, b: float = 0.0, *, rows_per_step=8):
    """Reference-signature form: scalar gain/bias (layer_norm.cu:55)."""
    K = x.shape[-1]
    gamma = jnp.full((K,), g, x.dtype)
    beta = jnp.full((K,), b, x.dtype)
    return make_layer_norm(rows_per_step=rows_per_step)(x, gamma, beta)


def _ln_ref(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + EPS)
    return (out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def _ln_flops(x, *a):
    return float(8 * x.size)


def _ln_bytes(x, *a):
    return float(2 * x.size * x.dtype.itemsize)


# ladder: rung -> rows-per-grid-step (more rows per program amortizes grid overhead,
# like wider per-thread vectorization did on CUDA)
for _suffix, _rows, _atol in [
    ("f32", 8, 1e-5), ("f32x4", 32, 1e-5),
    ("f16_f16", 16, 2e-2), ("f16x2_f16", 32, 2e-2), ("f16x8_f16", 64, 2e-2),
    ("f16x8_pack_f16", 128, 2e-2), ("f16x8_pack_f32", 128, 2e-2),
    ("f16_f32", 16, 2e-2),
]:
    register_op(
        f"layer_norm_{_suffix}",
        ref=_ln_ref, flops=_ln_flops, bytes=_ln_bytes,
        atol=_atol, rtol=1e-2, family="layer-norm", tags=(_suffix,),
    )(make_layer_norm(rows_per_step=_rows))

layer_norm = make_layer_norm(rows_per_step=32)
