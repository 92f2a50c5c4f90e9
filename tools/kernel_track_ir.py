"""Companion to docs/kernel_track.md — builds each tier's kernel from scratch
(no library imports on the kernel path: the track is write-it-yourself) and
prints its kernel jaxpr + Mosaic module, CPU-side, via TPU-platform lowering.
The IR snippets in the doc are this tool's output; re-run after a jax upgrade
to refresh them.

    python tools/kernel_track_ir.py            # all tiers
    python tools/kernel_track_ir.py --tier 3   # one tier
    python tools/kernel_track_ir.py --check    # also run each tier in
                                               # interpret mode vs its oracle
"""

from __future__ import annotations

import argparse
import functools
import math
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- tier 1: elementwise ----------------------------------------------------------

def t1_add_kernel(x_ref, y_ref, o_ref):
    o_ref[:] = x_ref[:] + y_ref[:]


def t1_build(interpret=False):
    def f(x, y):
        return pl.pallas_call(
            t1_add_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0] // 256,),
            in_specs=[pl.BlockSpec((256, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((256, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            debug=not interpret,
            interpret=interpret,
        )(x, y)
    args = (jax.ShapeDtypeStruct((1024, 128), jnp.float32),) * 2
    oracle = jnp.add
    return f, args, oracle


# --- tier 2: reduce + online softmax ----------------------------------------------

def t2_softmax_kernel(x_ref, o_ref, m_sc, l_sc, acc_sc):
    """Online (single-pass) safe softmax over the last axis, K-blocked:
    carry running max m and denom l, rescale by exp(m_old - m_new)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)

    x = x_ref[:]                                   # (Br, Bk)
    m_prev = m_sc[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(x, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(x - m_new)
    l_sc[:] = jnp.broadcast_to(
        alpha * l_sc[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True), l_sc.shape)
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
    acc_sc[:, pl.ds(ki * x.shape[1], x.shape[1])] = p

    @pl.when(ki == pl.num_programs(1) - 1)
    def _():
        # every block of acc was written with ITS m at write time; rescale all
        # to the final m in one pass (alpha folds the difference into l too)
        o_ref[:] = acc_sc[:] * jnp.exp(0.0) / jnp.maximum(l_sc[:, 0:1], 1e-30)


def t2_softmax_kernel_fixed(x_ref, o_ref, m_sc, l_sc, acc_sc):
    """The correct version: acc must be RESCALED when m changes (the doc walks
    through why the version above is wrong — blocks written before the max
    arrived are stale)."""
    ki = pl.program_id(1)
    bk = x_ref.shape[1]

    @pl.when(ki == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    x = x_ref[:]
    m_prev = m_sc[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(x, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                # (Br, 1)
    p = jnp.exp(x - m_new)
    l_sc[:] = jnp.broadcast_to(
        alpha * l_sc[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True), l_sc.shape)
    acc_sc[:] = acc_sc[:] * alpha                  # rescale EVERYTHING written
    acc_sc[:, pl.ds(ki * bk, bk)] = p
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)

    @pl.when(ki == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_sc[:] / jnp.maximum(l_sc[:, 0:1], 1e-30)


def t2_build(interpret=False):
    R, K, BK = 256, 1024, 256

    def f(x):
        return pl.pallas_call(
            t2_softmax_kernel_fixed,
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            grid=(1, K // BK),
            in_specs=[pl.BlockSpec((R, BK), lambda r, k: (r, k),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, K), lambda r, k: (r, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32),
                            pltpu.VMEM((R, 128), jnp.float32),
                            pltpu.VMEM((R, K), jnp.float32)],
            debug=not interpret,
            interpret=interpret,
        )(x)
    args = (jax.ShapeDtypeStruct((R, K), jnp.float32),)
    oracle = lambda x: jax.nn.softmax(x, axis=-1)
    return f, args, oracle


# --- tier 3: k-sliced swizzled matmul ---------------------------------------------

def t3_mm_kernel(nk, x_ref, y_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], y_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def t3_build(interpret=False):
    M = N = K = 1024
    BM, BN, BK, G = 256, 256, 256, 2
    ni, nj, nk = M // BM, N // BN, K // BK

    def swz(t):
        # grouped column walk: all i for each group of G columns
        g, r = t // (ni * G), t % (ni * G)
        cur = min(G, nj - g * G) if isinstance(t, int) else jnp.minimum(
            G, nj - g * G)
        return r // cur, g * G + r % cur

    def f(x, y):
        return pl.pallas_call(
            functools.partial(t3_mm_kernel, nk),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            grid=(ni * nj, nk),
            in_specs=[
                pl.BlockSpec((BM, BK), lambda t, k: (swz(t)[0], k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda t, k: (k, swz(t)[1]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda t, k: swz(t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
            debug=not interpret,
            interpret=interpret,
        )(x, y)
    args = (jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
            jax.ShapeDtypeStruct((K, N), jnp.bfloat16))
    oracle = lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32).astype(x.dtype)
    return f, args, oracle


# --- tier 4: flash attention ------------------------------------------------------

def t4_fa_kernel(scale, q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev, l_prev = m_sc[:, 0:1], l_sc[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_sc[:] = jnp.broadcast_to(
        alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True), l_sc.shape)
    acc_sc[:] = acc_sc[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_sc[:] / jnp.maximum(l_sc[:, 0:1], 1e-30)
                    ).astype(o_ref.dtype)


def t4_build(interpret=False):
    BH, N, D, BQ, BK = 2, 1024, 128, 256, 256
    scale = 1.0 / math.sqrt(D)

    def f(q, k, v):
        return pl.pallas_call(
            functools.partial(t4_fa_kernel, scale),
            out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            grid=(BH, N // BQ, N // BK),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda b, qi, ki: (b, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda b, qi, ki: (b, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda b, qi, ki: (b, ki, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda b, qi, ki: (b, qi, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BQ, 128), jnp.float32),
                            pltpu.VMEM((BQ, 128), jnp.float32),
                            pltpu.VMEM((BQ, D), jnp.float32)],
            debug=not interpret,
            interpret=interpret,
        )(q, k, v)
    args = (jax.ShapeDtypeStruct((BH, N, D), jnp.float32),) * 3
    def oracle(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
        return jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, -1), v)
    return f, args, oracle


TIERS = {1: t1_build, 2: t2_build, 3: t3_build, 4: t4_build}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", type=int, choices=sorted(TIERS), default=None)
    ap.add_argument("--check", action="store_true",
                    help="run each tier interpret-mode vs its oracle")
    args = ap.parse_args()
    tiers = [args.tier] if args.tier else sorted(TIERS)

    from jax import export
    for t in tiers:
        print(f"\n{'=' * 30} tier {t} {'=' * 30}", flush=True)
        f, shapes, oracle = TIERS[t]()
        # TPU-platform lowering CPU-side: debug=True prints the kernel jaxpr
        # and the Mosaic module without needing a chip
        export.export(jax.jit(f), platforms=("tpu",))(*shapes)
        if args.check:
            fi, _, _ = TIERS[t](interpret=True)
            rng = np.random.default_rng(0)
            # scale inputs ~1/sqrt(K) so bf16 output rounding (1 ulp at the
            # accumulated magnitude) stays inside the tolerance
            concrete = [jnp.asarray(
                rng.standard_normal(s.shape) * 0.05, s.dtype) for s in shapes]
            got = np.asarray(fi(*concrete), np.float32)
            want = np.asarray(oracle(*concrete), np.float32)
            d = np.abs(got - want).max()
            print(f"tier {t} interpret check: max|diff| = {d:.2e}")
            assert d < 5e-2, d


if __name__ == "__main__":
    main()
