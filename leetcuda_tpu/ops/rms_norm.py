"""RMS norm — analog of /root/reference/kernels/rms-norm/rms_norm.cu.

Reference kernels (rms_norm.cu:55-379) compute per-row ``x / √(mean(x²)+ε) · g``
with scalar g. Here: rows on the grid, VPU reduce within the block, f32 statistics,
per-feature weight vector (plus a scalar-g wrapper mirroring the reference
signature). This kernel is also the decode-path epilogue used by
``leetcuda_tpu.models`` (pre-attention/pre-MLP norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op

EPS = 1e-5


def _rms_norm_kernel(x_ref, w_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    w = w_ref[:].astype(jnp.float32)
    o_ref[:] = (x * jax.lax.rsqrt(ms + EPS) * w).astype(o_ref.dtype)


def make_rms_norm(*, rows_per_step: int = 8):
    """rms_norm(x, weight) over rows of (S, K); weight shape (K,)."""

    from leetcuda_tpu.ops.reduce import _vmem_params

    @jax.jit
    def fn(x, weight):
        assert x.ndim == 2
        S, K = x.shape
        bs = min(rows_per_step, S)
        w2 = weight.reshape(1, K)
        # in-place on x's buffer when x is dead after the call — see the
        # aliasing note in elementwise.make_elementwise_binary
        return pl.pallas_call(
            _rms_norm_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(cdiv(S, bs),),
            in_specs=[
                pl.BlockSpec((bs, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret_default(),
            **_vmem_params(),
        )(x, w2)

    return fn


def rms_norm_scalar_g(x, g: float = 1.0, *, rows_per_step=8):
    """Reference-signature form: scalar gain (rms_norm.cu:55)."""
    w = jnp.full((x.shape[-1],), g, x.dtype)
    return make_rms_norm(rows_per_step=rows_per_step)(x, w)


def _rms_ref(x, weight):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + EPS) * weight.astype(jnp.float32)).astype(x.dtype)


def _rms_flops(x, *a):
    return float(4 * x.size)


def _rms_bytes(x, *a):
    return float(2 * x.size * x.dtype.itemsize)


# top rungs sized to the measured multi-MB HBM-bound plateau (see layer_norm)
for _suffix, _rows, _atol in [
    ("f32", 8, 1e-5), ("f32x4", 256, 1e-5),
    ("f16_f16", 16, 2e-2), ("f16x2_f16", 64, 2e-2), ("f16x8_f16", 128, 2e-2),
    ("f16x8_f32", 128, 2e-2), ("f16x8_pack_f16", 512, 2e-2),
    ("f16x8_pack_f32", 512, 2e-2), ("f16_f32", 16, 2e-2),
]:
    register_op(
        f"rms_norm_{_suffix}",
        ref=_rms_ref, flops=_rms_flops, bytes=_rms_bytes,
        atol=_atol, rtol=1e-2, family="rms-norm", tags=(_suffix,),
    )(make_rms_norm(rows_per_step=_rows))

rms_norm = make_rms_norm(rows_per_step=32)
