"""Elementwise binary ops (add) — analog of /root/reference/kernels/elementwise/.

The reference grades one op across a vectorization ladder
(``elementwise_add_{f32,f32x4,f16,f16x2,f16x8,f16x8_pack}``,
elementwise.cu:23-103): each rung widens the per-thread access. On TPU the VPU is
(8, 128) lanes and vectorization is implicit, so the ladder's analog is the *block
shape fed to each grid step*: the naive rung uses the minimum hardware tile per
program (maximum grid steps, maximum pipeline overhead), and each higher rung gives
the pipeline larger blocks — same pedagogy (amortize control overhead, saturate HBM
bandwidth), TPU mechanism.

All variants operate on 2-D ``(S, K)`` arrays like the reference harness
(elementwise.py:74 sweeps S,K in {1024,2048,4096}²).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default, min_tile
from leetcuda_tpu.core.registry import register_op


def _binary_kernel(op, x_ref, y_ref, o_ref):
    o_ref[:] = op(x_ref[:], y_ref[:])


def make_elementwise_binary(op, *, block: tuple[int, int] | None = None):
    """Build a jitted 2-D elementwise binary op with the given block shape.

    ``block=None`` processes the whole array in one program (only for small inputs);
    otherwise the grid tiles (S, K) by ``block`` and Pallas double-buffers the
    HBM→VMEM streams automatically — the TPU-native replacement for the reference's
    grid-stride + float4 loads.
    """

    @jax.jit
    def fn(x, y):
        assert x.ndim == 2, "elementwise corpus operates on (S, K) arrays"
        S, K = x.shape
        bs, bk = block if block is not None else (S, K)
        bs, bk = min(bs, S), min(bk, K)
        grid = (cdiv(S, bs), cdiv(K, bk))
        params = {}
        if not interpret_default():
            # the saturating rung's multi-MB blocks exceed the 16 MB default
            # scoped-vmem limit once double-buffered (v5e has 128 MB)
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        # input 0 aliases the output: the kernel updates x's HBM buffer in
        # place when the caller no longer needs x (XLA elementwise fusions
        # get the same buffer reuse from buffer assignment; without this a
        # chained y = f(y, ...) pays a defensive 2N-byte copy of the carry
        # before every custom call — the r4 VPU "0.6x XLA" was exactly that
        # copy, not the kernel). If x is still live, XLA inserts the same
        # copy it always did; semantics are unchanged.
        return pl.pallas_call(
            functools.partial(_binary_kernel, op),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bs, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bs, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs, bk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret_default(),
            **params,
        )(x, y)

    return fn


# --- the graded ladder -----------------------------------------------------------
# rung -> block-shape multiplier over the minimum hardware tile (sublane, lane).
# naive(x1) = minimum tile per grid step; x2/x4 widen lanes; x8_pack widens both
# sublanes and lanes (the "128-bit packed LDST" rung of the reference).
_LADDER = {
    "": (1, 1),        # naive: min tile
    "x2": (1, 2),
    "x4": (2, 4),
    # measured on chip (logs/r5_explore.log): f32 add at (64,1024) = 256 KB
    # already duels XLA at 0.991; (512,2048) = 4 MB lands 1.003 and
    # (512,8192) 1.06 — once blocks clear ~256 KB the stream is HBM-bound.
    "x8": (8, 8),
    "x8_pack": (64, 16),
}

_DTYPES = {"f32": jnp.float32, "f16": jnp.float16, "bf16": jnp.bfloat16}


def _add_flops(x, y):
    return float(x.size)


def _add_bytes(x, y):
    return float(3 * x.size * x.dtype.itemsize)


def _ref_add(x, y):
    return x + y


def _register_ladder(op_name: str, op):
    for dt_name, dt in _DTYPES.items():
        sub, lane = min_tile(dt)
        for rung, (ms, ml) in _LADDER.items():
            # mirror reference naming: elementwise_add_f32, .._f32x4, .._f16x8_pack
            name = f"elementwise_{op_name}_{dt_name}{rung}"
            block = (sub * ms, lane * ml)
            fn = make_elementwise_binary(op, block=block)
            register_op(
                name,
                ref=_ref_add,
                flops=_add_flops,
                bytes=_add_bytes,
                atol=1e-2 if dt != jnp.float32 else 1e-5,
                family="elementwise",
                tags=(dt_name, rung or "naive"),
            )(fn)


_register_ladder("add", lambda a, b: a + b)

# convenience top-level entry points (largest-block rungs)
elementwise_add_f32 = make_elementwise_binary(lambda a, b: a + b,
                                              block=(512, 2048))
elementwise_add_bf16 = elementwise_add_f32  # dtype follows the inputs
