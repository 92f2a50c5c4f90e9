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


def e4m3_bits_to_f32(wi32):
    """e4m3fn byte (as sign-extended i32) -> exact f32, via bit surgery.

    Normals: shift the 7 abs bits a = (e<<3)|m into the f32 exponent/mantissa
    position and ADD the rebias ((120)<<23) in integer space — the bitcast
    then reads 2^(e+120-127)(1+m/8) = 2^(e-7)(1+m/8) directly, no float
    multiply and no subnormal-f32 intermediate (an earlier x*2^120 variant
    died to flush-to-zero). Subnormals (a < 8): value is m*2^-9, computed as
    an exact int->f32 cast times a normal constant; one select merges the
    branches and one signed select applies the sign. Pure int ops + bitcast
    + select — replaces Mosaic's software-emulated e4m3 cast (measured ~10x
    slower than the HBM stream: FP8_DECODE r4; e4m3 reduce rung 80 GB/s vs
    752 for e5m2, logs/r5_vpu.log). NaN (abs 0x7F) decodes to NaN — this
    feeds generic ops (the e4m3 reduce rung, the quantized-KV decode), not
    just quantizer output, so a corrupted cache byte must surface as NaN
    rather than a plausible ±480.
    """
    a = jnp.bitwise_and(wi32, 0x7F)
    bits = jnp.left_shift(a, 20) + (120 << 23)
    normal = jax.lax.bitcast_convert_type(bits, jnp.float32)
    sub = a.astype(jnp.float32) * jnp.float32(2.0 ** -9)
    mag = jnp.where(a < 8, sub, normal)
    mag = jnp.where(a == 0x7F, jnp.float32(jnp.nan), mag)
    return jnp.where(wi32 < 0, -mag, mag)


def upcast_for_vpu(x, target_dtype):
    """x.astype(target) with the e4m3 software-cast bypassed by bit surgery."""
    if x.dtype == jnp.dtype("float8_e4m3fn"):
        raw = jax.lax.bitcast_convert_type(x, jnp.int8)
        return e4m3_bits_to_f32(raw.astype(jnp.int32)).astype(target_dtype)
    return x.astype(target_dtype)


def bytes_of(shape, dtype) -> int:
    n = 1
    for s in shape:
        n *= s
    return n * jnp.dtype(dtype).itemsize
