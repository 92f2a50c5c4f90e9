"""Flash-attention backward (FA-2) + custom VJP — training support.

The reference is inference-only (no backward kernels anywhere in flash-attn/);
training the flagship model needs one, so this implements the FA-2 backward split
into two Pallas kernels (the standard decomposition that keeps both passes
streaming):

- dq kernel:  grid (BH, nq, nk) — Q blocks parallel, KV swept; recomputes
  P = exp(S − lse) from the saved log-sum-exp (no N² residual),
  dP = dO·Vᵀ, dS = P∘(dP − Δ), dQ += dS·K·scale, with Δ = rowsum(dO∘O).
- dkv kernel: grid (BH, nk, nq) — KV blocks parallel, Q swept; transposed
  forms: dV += Pᵀ·dO, dK += dSᵀ·Q·scale.

lse/Δ ride in lane-minor (BH, N, 1) / (BH, 1, N) layouts so the blocks are legal
((bq, 1) with array dim 1; (1, bq)). Causal blocks above/below the diagonal are
skipped per-kernel. GQA: k/v are expanded to H heads for the backward and group
gradients summed after — O(H·N·D) transient, fine for training shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import interpret_default
from leetcuda_tpu.attention.flash import (
    make_flash_attention, _default_blocks)

_NEG_INF = -1e30


def _bwd_dq_kernel(causal, window, scale, softcap, bq, bk,
                   q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                   dq_ref, acc):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0].astype(jnp.float32)    # (bq, 1)
        delta = dl_ref[0].astype(jnp.float32)   # (bq, 1)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softcap:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
            sc = s  # pre-mask capped score: |sc| <= cap, derivative finite
        if causal:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            keep = rows >= cols
            if window:  # forward's band: attend to the last `window` cols
                keep &= rows - cols < window
            s = jnp.where(keep, s, _NEG_INF)
        p = jnp.exp(s - lse)                     # masked -> exp(-inf)≈0
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if softcap:  # chain rule through cap*tanh(s/cap): x (1 - (s/cap)^2)
            ds = ds * (1.0 - jnp.square(sc * (1.0 / softcap)))
        acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        on_band = ki * bk <= qi * bq + bq - 1
        if window:  # block fully left of every row's band start -> skip
            on_band &= ki * bk + bk - 1 >= qi * bq - window + 1

        @pl.when(on_band)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(causal, window, scale, softcap, bq, bk,
                    q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc):
    ki, qi = pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0].astype(jnp.float32)    # (1, bq)
        delta = dl_ref[0].astype(jnp.float32)   # (1, bq)
        s_t = jax.lax.dot_general(
            k, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bk, bq)
        if softcap:
            s_t = softcap * jnp.tanh(s_t * (1.0 / softcap))
            sc_t = s_t
        if causal:
            krows = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
            qcols = qi * bq + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 1)
            keep = qcols >= krows
            if window:
                keep &= qcols - krows < window
            s_t = jnp.where(keep, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lse)                 # (bk, bq)
        dv_acc[:] += jax.lax.dot_general(
            p_t.astype(do_ref.dtype), do_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(
            v, do, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bk, bq)
        ds_t = p_t * (dp_t - delta)
        if softcap:
            ds_t = ds_t * (1.0 - jnp.square(sc_t * (1.0 / softcap)))
        dk_acc[:] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        # q blocks entirely before this kv block see none of it
        on_band = qi * bq + bq - 1 >= ki * bk
        if window:  # q blocks entirely past the band's end see none either
            on_band &= qi * bq - (ki * bk + bk - 1) < window

        @pl.when(on_band)
        def _():
            compute()
    else:
        compute()

    @pl.when(qi == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(causal, window, scale, softcap, bq, bk, q, k, v, out, lse, do,
         dlse=None):
    """q,k,v,out,do (BH, N, D); lse (BH, N) natural-log. Returns dq, dk, dv.

    ``dlse`` (BH, N): cotangent of the LSE output (the with_lse=True
    trainable variant). d lse_i/d s_ij = p_ij, so it folds into the delta
    operand: ds = p*(dp - delta + dlse) = p*(dp - (delta - dlse)) — the
    kernels are unchanged."""
    BH, N, D = q.shape
    Nk = k.shape[1]
    bq_, bk_ = min(bq, N), min(bk, Nk)
    # non-divisible N: fall back to whole-length blocks (grids use floor div —
    # a partial tail block would silently drop rows)
    if N % bq_ != 0:
        bq_ = N
    if Nk % bk_ != 0:
        bk_ = Nk
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # (BH, N)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    lse_c = lse[..., None]                      # (BH, N, 1)
    dl_c = delta[..., None]
    lse_r = lse[:, None, :]                     # (BH, 1, N)
    dl_r = delta[:, None, :]

    params = {}
    if not interpret_default():
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))

    qspec = pl.BlockSpec((1, bq_, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk_, D), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, bq_, 1), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, causal, window, scale, softcap,
                          bq_, bk_),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(BH, N // bq_, Nk // bk_),
        in_specs=[qspec, kspec, kspec, qspec, cspec, cspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((bq_, D), jnp.float32)],
        interpret=interpret_default(),
        **params,
    )(q, k, v, do, lse_c, dl_c)

    # kv-parallel pass: note the grid's 2nd dim indexes KV blocks
    qspec2 = pl.BlockSpec((1, bq_, D), lambda bh, ki, qi: (bh, qi, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk_, D), lambda bh, ki, qi: (bh, ki, 0),
                          memory_space=pltpu.VMEM)
    rspec2 = pl.BlockSpec((1, 1, bq_), lambda bh, ki, qi: (bh, 0, qi),
                          memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, causal, window, scale, softcap,
                          bq_, bk_),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=(BH, Nk // bk_, N // bq_),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rspec2, rspec2],
        out_specs=(kspec2, kspec2),
        scratch_shapes=[pltpu.VMEM((bk_, D), jnp.float32),
                        pltpu.VMEM((bk_, D), jnp.float32)],
        interpret=interpret_default(),
        **params,
    )(q, k, v, do, lse_r, dl_r)
    return dq, dk, dv


def make_flash_attention_trainable(*, causal: bool = False, sm_scale=None,
                                   block_q: int | None = None,
                                   block_k: int | None = None,
                                   window: int | None = None,
                                   softcap: float | None = None,
                                   with_lse: bool = False):
    """Differentiable flash attention (B, H, N, D) with GQA, custom FA-2 VJP.

    ``window``: Mistral-style causal sliding window (implies causal masking,
    matching attention/flash.py's band convention rows - cols < window); the
    backward kernels skip off-band blocks in both passes.

    ``with_lse=True``: fa(q, k, v) -> (out, lse (B, H, N)) and the VJP
    consumes BOTH cotangents (the lse one folds into delta) — what
    trainable attention sinks need (out * sigmoid(lse - sink))."""
    if window:
        causal = True

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def fa(q, k, v):
        # primal (inference) path: NO LSE output — serving prefill through
        # this wrapper must not pay an (B*H, N, 128) f32 write it discards.
        # Only the VJP forward below materializes LSE for the backward.
        B, H, N, D = q.shape
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
        f = make_flash_attention(causal=causal, sm_scale=scale,
                                 block_q=block_q, block_k=block_k,
                                 window=window, softcap=softcap)
        return f(q, k, v)

    def _fwd(q, k, v):
        B, H, N, D = q.shape
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
        f = make_flash_attention(causal=causal, with_lse=True, sm_scale=scale,
                                 block_q=block_q, block_k=block_k,
                                 window=window, softcap=softcap)
        out, lse = f(q, k, v)
        return out, (q, k, v, out, lse)

    def _grads(res, do, dlse=None):
        """Shared backward for both VJPs — dlse is the optional LSE
        cotangent (with_lse variant); it folds into _bwd's delta."""
        q, k, v, out, lse = res
        B, H, N, D = q.shape
        Hkv = k.shape[1]
        group = H // Hkv
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
        dbq, dbk = _default_blocks(D, causal)
        bq = block_q or min(dbq, 512)
        bk = block_k or min(dbk, 512)

        kx = jnp.repeat(k, group, axis=1) if group > 1 else k
        vx = jnp.repeat(v, group, axis=1) if group > 1 else v

        flat = lambda x: x.reshape(B * H, *x.shape[2:])
        dq, dk, dv = _bwd(causal, window, scale, softcap, bq, bk,
                          flat(q), flat(kx), flat(vx), flat(out), flat(lse),
                          flat(do),
                          dlse=None if dlse is None else flat(dlse))
        dq = dq.reshape(B, H, N, D)
        dk = dk.reshape(B, H, -1, D)
        dv = dv.reshape(B, H, -1, D)
        if group > 1:
            dk = dk.reshape(B, Hkv, group, -1, D).sum(axis=2).astype(k.dtype)
            dv = dv.reshape(B, Hkv, group, -1, D).sum(axis=2).astype(v.dtype)
        return dq, dk, dv

    def _bwd_rule(res, do):
        return _grads(res, do)

    if not with_lse:
        fa.defvjp(_fwd, _bwd_rule)
        return fa

    @jax.custom_vjp
    def fa_lse(q, k, v):
        B, H, N, D = q.shape
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
        f = make_flash_attention(causal=causal, with_lse=True,
                                 sm_scale=scale, block_q=block_q,
                                 block_k=block_k, window=window,
                                 softcap=softcap)
        return f(q, k, v)

    def _fwd_lse(q, k, v):
        out, lse = fa_lse(q, k, v)
        return (out, lse), (q, k, v, out, lse)

    def _bwd_lse_rule(res, ct):
        do, dlse = ct
        return _grads(res, do, dlse=dlse)

    fa_lse.defvjp(_fwd_lse, _bwd_lse_rule)
    return fa_lse
