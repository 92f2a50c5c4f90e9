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

    from leetcuda_tpu.ops.reduce import _vmem_params

    @jax.jit
    def fn(x, gamma, beta):
        assert x.ndim == 2
        S, K = x.shape
        bs = min(rows_per_step, S)
        g2 = gamma.reshape(1, K)
        b2 = beta.reshape(1, K)
        # in-place on x's buffer when x is dead after the call — see the
        # aliasing note in elementwise.make_elementwise_binary
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
            input_output_aliases={0: 0},
            interpret=interpret_default(),
            **_vmem_params(),
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
# top rungs sized to the measured multi-MB HBM-bound plateau: at K=4096,
# 256 f32 rows = 4 MB, 512 f16 rows = 4 MB (logs/r5_explore.log)
for _suffix, _rows, _atol in [
    ("f32", 8, 1e-5), ("f32x4", 256, 1e-5),
    ("f16_f16", 16, 2e-2), ("f16x2_f16", 64, 2e-2), ("f16x8_f16", 128, 2e-2),
    ("f16x8_pack_f16", 512, 2e-2), ("f16x8_pack_f32", 512, 2e-2),
    ("f16_f32", 16, 2e-2),
]:
    register_op(
        f"layer_norm_{_suffix}",
        ref=_ln_ref, flops=_ln_flops, bytes=_ln_bytes,
        atol=_atol, rtol=1e-2, family="layer-norm", tags=(_suffix,),
    )(make_layer_norm(rows_per_step=_rows))

layer_norm = make_layer_norm(rows_per_step=32)


# --- trainable layer norm (custom VJP, Pallas backward) ----------------------------
# Parity with the reference's Triton layer-norm fwd+bwd
# (/root/reference/kernels/openai-triton/layer-norm/triton_layer_norm.py:35-186):
# dx fused per-row; dgamma/dbeta via a two-stage reduction (per-block partials in
# the kernel, final sum in XLA). Statistics are recomputed in the backward from x
# rather than saved — on TPU the row is already resident in VMEM for xhat, so the
# recompute trades two (S, 1) residual streams for a handful of VPU ops.


def _ln_bwd_kernel(fold, x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = (x - mean) * rstd

    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = ((dxhat - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)
    # stage 1 of the (K,) reductions: fold this block's rows to an (8, K)
    # partial (sublane-width VPU adds) and accumulate into the revisited
    # output block; stage 2 (XLA) sums the 8 rows. When the row count isn't
    # a multiple of 8 (fold=False: single whole-array block), the partials
    # are simply the per-row terms.
    bs, K = x.shape
    if fold:
        dg_ref[:] += jnp.sum((dy * xhat).reshape(bs // 8, 8, K), axis=0)
        db_ref[:] += jnp.sum(dy.reshape(bs // 8, 8, K), axis=0)
    else:
        dg_ref[:] += dy * xhat
        db_ref[:] += dy


def _row_block(S: int, rows_per_step: int) -> int:
    """Largest multiple of 8 that divides S and is <= rows_per_step; S itself
    when S has no such divisor (whole-array block is always legal)."""
    for bs in range(min(rows_per_step, S), 7, -1):
        if bs % 8 == 0 and S % bs == 0:
            return bs
    return S


def make_layer_norm_trainable(*, rows_per_step: int = 32):
    """Differentiable layer_norm(x, gamma, beta) with a Pallas backward."""
    fwd = make_layer_norm(rows_per_step=rows_per_step)

    @jax.jit
    def bwd_kernels(x, gamma, dy):
        S, K = x.shape
        bs = _row_block(S, rows_per_step)
        nb = cdiv(S, bs)
        dg_shape = (8, K) if bs % 8 == 0 else (bs, K)
        dx, dg_part, db_part = pl.pallas_call(
            functools.partial(_ln_bwd_kernel, bs % 8 == 0),
            out_shape=(
                jax.ShapeDtypeStruct((S, K), x.dtype),
                jax.ShapeDtypeStruct(dg_shape, jnp.float32),
                jax.ShapeDtypeStruct(dg_shape, jnp.float32),
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((bs, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bs, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bs, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(dg_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(dg_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret_default(),
        )(x, gamma.reshape(1, K), dy)
        # stage 2: XLA sums the per-sublane partials
        return dx, dg_part.sum(0), db_part.sum(0)

    @jax.custom_vjp
    def ln(x, gamma, beta):
        return fwd(x, gamma, beta)

    def ln_fwd(x, gamma, beta):
        return fwd(x, gamma, beta), (x, gamma)

    def ln_bwd(res, dy):
        x, gamma = res
        dx, dg, db = bwd_kernels(x, gamma, dy)
        return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)

    ln.defvjp(ln_fwd, ln_bwd)
    return ln


layer_norm_trainable = make_layer_norm_trainable()
