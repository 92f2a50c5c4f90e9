"""Uniform op registry: name -> (pallas impl, jnp reference, tolerance, FLOPs model).

The reference exposes 231 pybind11-bound kernel entry points with a rigid naming
convention (kernel name minus ``_kernel``; see
/root/reference/kernels/hgemm/pybind/hgemm.cc:9-182 and SURVEY.md L3). On TPU there is
no C++ binding layer — Pallas kernels are plain Python callables — so the binding
surface becomes this registry: every graded kernel variant registers itself with its
numpy-level oracle, its tolerance, and a FLOPs/bytes model so the benchmark harness
and the test suite can sweep the whole corpus uniformly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

OPS: dict[str, "OpSpec"] = {}


@dataclasses.dataclass(frozen=True)
class OpSpec:
    """One registered kernel variant.

    Attributes:
      name: registry key, e.g. ``elementwise_add_f32`` (mirrors the reference's
        bound-function names where an analog exists).
      fn: the Pallas-backed implementation. Positional array args only.
      ref: oracle with the same signature computing the result via jnp/XLA — the
        vendor-library parity bar (cuBLAS/SDPA analog).
      flops: callable(*args) -> float, FLOPs for one call (for TFLOPS reporting).
      bytes: callable(*args) -> float, HBM bytes moved (for roofline/GB/s).
      atol/rtol: comparison tolerances vs the oracle.
      family: op family for grouping (``elementwise``, ``reduce``, ``gemm``, ...).
      tags: free-form labels (dtype ladder rung, algorithm, ...).
    """

    name: str
    fn: Callable[..., Any]
    ref: Callable[..., Any] | None = None
    flops: Callable[..., float] | None = None
    bytes: Callable[..., float] | None = None
    atol: float = 1e-5
    rtol: float = 1e-5
    family: str = ""
    tags: tuple[str, ...] = ()


def _f16_compat(fn):
    """TPU has no native float16 compute — Mosaic hard-fails on f16 kernels
    (found by tools/hw_sweep.py; CPU interpret mode masked it). The f16 ladder
    rungs exist for reference parity, so on real TPU f16 inputs are upcast to
    f32 for the kernel (strictly more precise than true f16 compute) and
    results cast back. Interpret mode (CPU) still runs true f16."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.wraps(fn)
    def wrapped(*args):
        from leetcuda_tpu.core.runtime import on_tpu

        def is_f16(a):
            return getattr(a, "dtype", None) == jnp.float16

        if not on_tpu() or not any(is_f16(a) for a in args):
            return fn(*args)
        cast = [a.astype(jnp.float32) if is_f16(a) else a for a in args]
        out = fn(*cast)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float16)
            if getattr(x, "dtype", None) == jnp.float32 else x, out)

    return wrapped


def register_op(
    name: str,
    *,
    ref=None,
    flops=None,
    bytes=None,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    family: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator registering a kernel variant under ``name``."""

    def deco(fn):
        if name in OPS:
            raise ValueError(f"duplicate op registration: {name}")
        OPS[name] = OpSpec(
            name=name, fn=_f16_compat(fn), ref=ref, flops=flops, bytes=bytes,
            atol=atol, rtol=rtol, family=family, tags=tags,
        )
        return fn

    return deco


def get_op(name: str) -> OpSpec:
    return OPS[name]


def ops_in_family(family: str) -> list[OpSpec]:
    return [s for s in OPS.values() if s.family == family]
