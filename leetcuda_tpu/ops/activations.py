"""Activation kernel corpus — analog of /root/reference/kernels/{relu,sigmoid,gelu,
swish,elu,hardswish,hardshrink}/.

Each reference op dir holds the same 6-rung CUDA vectorization ladder (e.g.
relu.cu:21-89); here each activation instantiates the shared Pallas block-shape
ladder from ``elementwise.py``. Math notes mirror the reference kernels:

- gelu uses the tanh approximation (gelu.cu:64): 0.5x(1+tanh(√(2/π)(x+0.044715x³)))
- sigmoid clamps the exponent range like MIN/MAX_EXP_F32 (sigmoid.cu:27)
- elu alpha=1.0 (elu.cu:48), hardshrink lambda=0.5 (hardshrink.cu:54),
  hardswish is x·relu6(x+3)/6 (hardswish.cu:55)

Transcendentals are evaluated in f32 and cast back to the storage dtype — the TPU
VPU's native precision, and the same accuracy stance as the reference's `_f32`
accumulator variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default, min_tile
from leetcuda_tpu.core.registry import register_op
from leetcuda_tpu.ops.elementwise import _LADDER, _DTYPES

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_COEF = 0.044715
_EXP_CLAMP = 88.0  # exp argument clamp, the MIN/MAX_EXP_F32 analog


def _relu(x):
    return jnp.maximum(x, 0.0)


def _sigmoid(x):
    x = jnp.clip(x, -_EXP_CLAMP, _EXP_CLAMP)
    return 1.0 / (1.0 + jnp.exp(-x))


def _gelu_tanh(x):
    inner = _SQRT_2_OVER_PI * (x + _GELU_COEF * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _swish(x):
    return x * _sigmoid(x)


def _elu(x, alpha=1.0):
    return jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def _hardshrink(x, lam=0.5):
    return jnp.where(jnp.abs(x) > lam, x, 0.0)


ACTIVATIONS = {
    "relu": _relu,
    "sigmoid": _sigmoid,
    "gelu": _gelu_tanh,
    "swish": _swish,
    "elu": _elu,
    "hardswish": _hardswish,
    "hardshrink": _hardshrink,
}


def _unary_kernel(op, x_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    o_ref[:] = op(x).astype(o_ref.dtype)


def make_activation(op, *, block: tuple[int, int] | None = None):
    """Jitted 2-D unary activation with a given Pallas block shape."""

    @jax.jit
    def fn(x):
        assert x.ndim == 2, "activation corpus operates on (S, K) arrays"
        S, K = x.shape
        bs, bk = block if block is not None else (S, K)
        bs, bk = min(bs, S), min(bk, K)
        params = {}
        if not interpret_default():
            # saturating-rung blocks + the f32 compute temp exceed the 16 MB
            # default scoped-vmem limit once double-buffered (v5e: 128 MB)
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        # in-place on x's buffer when x is dead after the call — see the
        # aliasing note in elementwise.make_elementwise_binary
        return pl.pallas_call(
            functools.partial(_unary_kernel, op),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(cdiv(S, bs), cdiv(K, bk)),
            in_specs=[pl.BlockSpec((bs, bk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bs, bk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret_default(),
            **params,
        )(x)

    return fn


def _act_flops(x):
    return float(x.size)  # order-of-magnitude; transcendental cost folded in


def _act_bytes(x):
    return float(2 * x.size * x.dtype.itemsize)


_ORACLES = {
    "relu": lambda x: jnp.maximum(x, 0).astype(x.dtype),
    "sigmoid": lambda x: jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype),
    "gelu": lambda x: jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype),
    "swish": lambda x: jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype),
    "elu": lambda x: jax.nn.elu(x.astype(jnp.float32)).astype(x.dtype),
    "hardswish": lambda x: jax.nn.hard_swish(x.astype(jnp.float32)).astype(x.dtype),
    "hardshrink": lambda x: jnp.where(jnp.abs(x) > 0.5, x, 0).astype(x.dtype),
}

for _name, _op in ACTIVATIONS.items():
    for _dt_name, _dt in _DTYPES.items():
        _sub, _lane = min_tile(_dt)
        for _rung, (_ms, _ml) in _LADDER.items():
            register_op(
                f"{_name}_{_dt_name}{_rung}",
                ref=_ORACLES[_name],
                flops=_act_flops,
                bytes=_act_bytes,
                atol=2e-2 if _dt != jnp.float32 else 1e-5,
                rtol=1e-2 if _dt != jnp.float32 else 1e-5,
                family="activation",
                tags=(_name, _dt_name, _rung or "naive"),
            )(make_activation(_op, block=(_sub * _ms, _lane * _ml)))

# top-level convenience entries (production block shape)
relu = make_activation(_relu, block=(64, 1024))
sigmoid = make_activation(_sigmoid, block=(64, 1024))
gelu = make_activation(_gelu_tanh, block=(64, 1024))
swish = make_activation(_swish, block=(64, 1024))
elu = make_activation(_elu, block=(64, 1024))
hardswish = make_activation(_hardswish, block=(64, 1024))
hardshrink = make_activation(_hardshrink, block=(64, 1024))
