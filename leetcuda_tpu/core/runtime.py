"""Runtime helpers: backend detection, tiling constraints, small math utils.

TPU tiling model (see pallas guide): VPU registers are (8, 128) lanes for f32;
narrower dtypes pack more sublanes — bf16 (16, 128), int8/fp8 (32, 128). The MXU is a
128x128 systolic array. Every Pallas kernel in this library aligns its block shapes to
these tiles; the reference's CUDA "vectorization ladder" (f32x4 / f16x2 / f16x8_pack,
e.g. /root/reference/kernels/elementwise/elementwise.cu:23-103) maps here to the
choice of block shape and grid arity, which is what the graded variants sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128  # last-dim tile width, all dtypes
MXU = 128  # MXU systolic array dimension


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return cdiv(x, m) * m


_SUBLANES = {
    jnp.dtype(jnp.float32): 8,
    jnp.dtype(jnp.bfloat16): 16,
    jnp.dtype(jnp.float16): 16,
    jnp.dtype(jnp.int32): 8,
    jnp.dtype(jnp.uint32): 8,
    jnp.dtype(jnp.int16): 16,
    jnp.dtype(jnp.int8): 32,
    jnp.dtype(jnp.uint8): 32,
}


def min_tile(dtype) -> tuple[int, int]:
    """Minimum (sublane, lane) tile for ``dtype`` on TPU."""
    d = jnp.dtype(dtype)
    if d.name.startswith("float8"):
        return (32, LANE)
    return (_SUBLANES.get(d, 8), LANE)


@functools.cache
def backend() -> str:
    return jax.default_backend()


@functools.cache
def on_tpu() -> bool:
    """True when the default backend is a real TPU (incl. the axon tunnel).

    ``LEETCUDA_TARGET_TPU=1`` forces True from a CPU-only session — used by
    tools/lower_sweep.py to build kernels exactly as they would build for
    the chip (interpret off, f16-compat upcasts on) and lower them for the
    TPU platform via jax.export without needing hardware."""
    import os

    if os.environ.get("LEETCUDA_TARGET_TPU") == "1":
        return True
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")


def interpret_default() -> bool:
    """Whether pallas_call should run in interpreter mode.

    On CPU (tests, the driver's virtual multi-chip dry run) Mosaic cannot compile, so
    every kernel call site defaults to ``interpret=interpret_default()``. On real TPU
    this is False and kernels compile through Mosaic.
    """
    return not on_tpu()


def bytes_of(shape, dtype) -> int:
    n = 1
    for s in shape:
        n *= s
    return n * jnp.dtype(dtype).itemsize
