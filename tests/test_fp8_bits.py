"""Exactness of the e4m3 integer bit-surgery decode (core.runtime
e4m3_bits_to_f32): every representable e4m3 value — normals, subnormals,
both signs, zeros — must decode bit-exactly to the value astype(f32) gives.

This is the decode used to bypass Mosaic's software-emulated fp8 cast in
hgemm_w8a16_dequant_fp8_bits and the e4m3 reduce rung (VERDICT r4 #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.core.runtime import e4m3_bits_to_f32


def test_all_bytes_exact():
    # all 256 byte patterns except the two NaN encodings (0x7F / 0xFF)
    raw = np.array([b for b in range(256) if (b & 0x7F) != 0x7F], np.uint8)
    e4m3 = jax.lax.bitcast_convert_type(jnp.asarray(raw), jnp.float8_e4m3fn)
    want = np.asarray(e4m3.astype(jnp.float32))
    wi32 = jnp.asarray(raw.astype(np.int8)).astype(jnp.int32)  # sign-extended
    got = np.asarray(e4m3_bits_to_f32(wi32))
    np.testing.assert_array_equal(got, want)  # bit-exact, subnormals included


def test_nan_bytes_surface_as_nan():
    # the decode feeds generic ops (reduce, KV caches): a corrupted 0x7F/0xFF
    # byte must surface as NaN, not a plausible +-480
    wi32 = jnp.asarray(np.array([0x7F, 0xFF], np.uint8).astype(np.int8)
                       ).astype(jnp.int32)
    got = np.asarray(e4m3_bits_to_f32(wi32))
    assert np.isnan(got).all()


def test_quant_roundtrip_matmul():
    from leetcuda_tpu.core.registry import OPS
    import leetcuda_tpu.gemm.quant  # noqa: F401

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (16, 256)), jnp.bfloat16)
    # include tiny weights so some quantized values land subnormal
    w = jnp.asarray(rng.normal(0, 0.3, (256, 128))
                    * np.where(rng.random((256, 128)) < 0.2, 1e-3, 1.0),
                    jnp.float32)
    from leetcuda_tpu.gemm.quant import (matmul_w8a16_ref,
                                         quantize_rowwise_fp8)
    wq, scale = quantize_rowwise_fp8(w)
    spec = OPS["hgemm_w8a16_dequant_fp8_bits"]
    got = spec.fn(x, wq, scale)
    want = matmul_w8a16_ref(x, wq, scale)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(want, np.float64),
                               atol=spec.atol, rtol=spec.rtol)
