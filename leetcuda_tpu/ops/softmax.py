"""Row softmax — analog of /root/reference/kernels/softmax/softmax.cu.

Three algorithm grades, mirroring the reference:

1. ``softmax_*`` (naive, softmax.cu:161+): exp/sum without max subtraction —
   overflow-prone by design; kept for the pedagogy ladder.
2. ``safe_softmax_*`` (softmax.cu:219+): subtract the row max first.
3. ``online_softmax_*`` (softmax.cu:330-410): single pass maintaining (m, d) pairs
   with the merge rule  m' = max(m, m_blk);  d' = d·e^{m−m'} + d_blk·e^{m_blk−m'}
   — the ``warp_reduce_md_op`` semantics, realized here as a fori_loop over column
   chunks inside one Pallas program (the same math that powers flash-attention's
   online rescale in ``leetcuda_tpu.attention``).

Rows map to the grid; each program owns a (rows_per_step, K) block. Softmax math is
always f32 (the reference's ``_f32`` accumulator stance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op


def _naive_softmax_kernel(x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    e = jnp.exp(x)
    o_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


def _safe_softmax_kernel(x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    o_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


def _online_softmax_kernel(chunk: int, x_ref, o_ref):
    """Single-pass (m, d) accumulation over column chunks, then a rescale pass."""
    rows, K = x_ref.shape
    n_chunks = K // chunk

    def md_step(c, carry):
        m, d = carry
        blk = x_ref[:, pl.ds(c * chunk, chunk)].astype(jnp.float32)
        m_blk = jnp.max(blk, axis=-1, keepdims=True)
        d_blk = jnp.sum(jnp.exp(blk - m_blk), axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # the md-merge: rescale both partial denominators to the new max
        d_new = d * jnp.exp(m - m_new) + d_blk * jnp.exp(m_blk - m_new)
        return m_new, d_new

    m0 = jnp.full((rows, 1), -jnp.inf, jnp.float32)
    d0 = jnp.zeros((rows, 1), jnp.float32)
    m, d = jax.lax.fori_loop(0, n_chunks, md_step, (m0, d0))
    inv_d = 1.0 / d

    def write_step(c, _):
        blk = x_ref[:, pl.ds(c * chunk, chunk)].astype(jnp.float32)
        o_ref[:, pl.ds(c * chunk, chunk)] = (
            jnp.exp(blk - m) * inv_d).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, write_step, 0)


def _make_rowwise(kernel, *, rows_per_step: int = 8):
    from leetcuda_tpu.ops.reduce import _vmem_params

    @jax.jit
    def fn(x):
        assert x.ndim == 2
        S, K = x.shape
        bs = min(rows_per_step, S)
        # in-place on x's buffer when x is dead after the call — see the
        # aliasing note in elementwise.make_elementwise_binary
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(cdiv(S, bs),),
            in_specs=[pl.BlockSpec((bs, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bs, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret_default(),
            **_vmem_params(),
        )(x)

    return fn


def make_softmax(*, rows_per_step: int = 8):
    return _make_rowwise(_naive_softmax_kernel, rows_per_step=rows_per_step)


def make_safe_softmax(*, rows_per_step: int = 8):
    return _make_rowwise(_safe_softmax_kernel, rows_per_step=rows_per_step)


def make_online_softmax(*, rows_per_step: int = 8, chunk: int = 128):
    @jax.jit
    def fn(x):
        S, K = x.shape
        c = chunk if K % chunk == 0 else K
        return _make_rowwise(functools.partial(_online_softmax_kernel, c),
                             rows_per_step=rows_per_step)(x)

    return fn


def _softmax_ref(x):
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)


def _softmax_flops(x):
    return float(5 * x.size)


def _softmax_bytes(x):
    return float(2 * x.size * x.dtype.itemsize)


_COMMON = dict(ref=_softmax_ref, flops=_softmax_flops, bytes=_softmax_bytes,
               family="softmax")

# row counts graded to the saturating regime: at K=2048 f32, 256 rows = 2 MB
# blocks (the measured HBM-bound plateau, logs/r5_explore.log)
for _suffix, _rows in [("f32", 8), ("f32x4", 256)]:
    register_op(f"softmax_{_suffix}_per_token", atol=1e-4, rtol=1e-4,
                tags=("naive", _suffix), **_COMMON)(
        make_softmax(rows_per_step=_rows))
    register_op(f"safe_softmax_{_suffix}_per_token", atol=1e-5, rtol=1e-5,
                tags=("safe", _suffix), **_COMMON)(
        make_safe_softmax(rows_per_step=_rows))

for _suffix, _rows, _atol in [("f16_f32", 16, 1e-2), ("f16x2_f32", 128, 1e-2),
                              ("f16x8_pack_f32", 512, 1e-2)]:
    register_op(f"safe_softmax_{_suffix}_per_token", atol=_atol, rtol=1e-2,
                tags=("safe", _suffix), **_COMMON)(
        make_safe_softmax(rows_per_step=_rows))

register_op("online_safe_softmax_f32", atol=1e-5, rtol=1e-5,
            tags=("online", "f32"), **_COMMON)(make_online_softmax())
register_op("online_safe_softmax_f32x4_pack", atol=1e-5, rtol=1e-5,
            tags=("online", "f32x4"), **_COMMON)(
    make_online_softmax(rows_per_step=256, chunk=256))

softmax = make_safe_softmax(rows_per_step=256)
online_softmax = make_online_softmax(rows_per_step=256)
