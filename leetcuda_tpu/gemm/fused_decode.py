"""Fused decode block: rms-norm -> QKV projection -> RoPE in ONE kernel.

BASELINE.json config 4's north star (fused rms-norm + rope + hgemv + ... decode
block). At decode the projections are weight-bandwidth-bound: the matmul is
(B, D) x (D, X) with B ~ 8 — 8 of the MXU's 128 rows — so time is set by
streaming the (D, X) weight from HBM. Everything else in the block (the norm's
two passes over x, the rope's trig over (B, Dh)) is noise-sized, BUT as
separate XLA ops each costs a kernel launch and an activation round-trip;
fused here they ride the weight stream:

- grid over X blocks; x (B, D) lives whole in VMEM; the normalized activation
  is computed ONCE (first grid step) into a scratch that persists;
- each step streams one (D, bx) weight panel, one MXU pass, and applies the
  half-rotation RoPE in-register to panels inside the Q|K column region
  (bx divides Dh-aligned regions, so a panel is entirely roped or not);
- per-sequence positions enter as a (B, 1) block; angles are computed
  in-kernel (broadcasted-iota frequencies — no host cos/sin tables), exactly
  ops/rope.py's apply_rope_half convention.

The reference's closest analog is the fused-epilogue GEMV ladder
(kernels/hgemv/ + the rms-norm->GEMV fusion this library already had);
this extends it to the full decode entry block. decode_step_impl
(models/llama.py) uses it automatically for dense fused-QKV weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default


def _fused_kernel(eps, rope_end, Dh, bx, theta, offset,
                  x_ref, nw_ref, pos_ref, w_ref, o_ref, xn_sc):
    j = pl.program_id(0)

    # The norm and rope replicate the unfused path's roundings exactly (cast
    # xhat to the activation dtype, multiply by w in that dtype; identical
    # angle formula). The projection dot is the one place parity is only
    # near-bitwise: reduction order may differ from XLA's, so fused-vs-
    # unfused logits agree to f32-accumulation noise (~1 output ulp), not
    # bit-for-bit.
    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)                    # (B, D)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xhat = (xf * jax.lax.rsqrt(ms + eps)).astype(x_ref.dtype)
        nw = nw_ref[:]                                       # (1, D)
        if offset:                                           # Gemma (1+w)
            nw = (1.0 + nw.astype(jnp.float32)).astype(x_ref.dtype)
        xn_sc[:] = (xhat * nw).astype(jnp.float32)

    a = xn_sc[:].astype(w_ref.dtype)  # exact: values are w-dtype-representable
    out = jax.lax.dot_general(
        a, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (B, bx)
    # match the unfused projection's output rounding before the rope
    out = out.astype(o_ref.dtype)
    B = out.shape[0]

    def rope(vals):
        # reshape-free rotate_half on the flat (B, bx) block: the partner of
        # lane c is c +/- Dh/2 within its head, reached by two lane-rolls and
        # a select — no (B, nh, Dh) reshape (splitting the lane dim crashes
        # Mosaic when Dh < 128, found by hw_sweep at the Dh=64 shape)
        half = Dh // 2
        vf = vals.astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, bx), 1)
        in_first = (col % Dh) < half
        partner = jnp.where(in_first, jnp.roll(vf, -half, axis=-1),
                            jnp.roll(vf, half, axis=-1))
        i = col % Dh
        i = jnp.where(in_first, i, i - half).astype(jnp.float32)
        pos = pos_ref[:].astype(jnp.float32)                 # (B, 1)
        # theta ** (-i/half), spelled exactly like ops/rope.apply_rope_half
        # so the angles round identically (token-exact vs the unfused path)
        inv_freq = theta ** (-i / half)
        ang = pos * inv_freq                                 # (B, bx)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        return jnp.where(in_first, vf * c - partner * s,
                         vf * c + partner * s)

    if rope_end == 0:          # plain norm->matmul variant: no rope anywhere
        o_ref[:] = out
    else:
        @pl.when(j * bx < rope_end)
        def _():
            o_ref[:] = rope(out).astype(o_ref.dtype)

        @pl.when(j * bx >= rope_end)
        def _():
            o_ref[:] = out


def make_fused_norm_qkv_rope(*, n_heads: int, n_kv_heads: int, head_dim: int,
                             eps: float = 1e-5, theta: float = 10000.0,
                             rms_offset: bool = False,
                             block_x: int | None = None, out_dtype=None):
    """fn(x (B, D), norm_w (D,), wqkv (D, X), positions (B,)) -> (B, X) with
    RoPE applied in place to the q|k column regions (X = (H + 2*Hkv) * Dh)."""
    H, Hkv, Dh = n_heads, n_kv_heads, head_dim
    rope_end = (H + Hkv) * Dh

    @jax.jit
    def fn(x, norm_w, wqkv, positions):
        B, D = x.shape
        D2, X = wqkv.shape
        assert D == D2 and X == (H + 2 * Hkv) * Dh, (x.shape, wqkv.shape)
        # only constraints: no block straddles the q|k -> v boundary
        # (rope_end % bx == 0) and whole heads per block (bx % Dh == 0);
        # a partial tail block past X is fine (Pallas clips edge blocks)
        bx = block_x or max(Dh, 512 // Dh * Dh)
        bx = bx // Dh * Dh
        while rope_end % bx:
            bx -= Dh
        assert bx % Dh == 0 and bx >= Dh, (bx, Dh)
        odt = out_dtype or x.dtype

        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            functools.partial(_fused_kernel, eps, rope_end, Dh, bx, theta,
                              rms_offset),
            out_shape=jax.ShapeDtypeStruct((B, X), odt),
            grid=(cdiv(X, bx),),
            in_specs=[
                pl.BlockSpec((B, D), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, bx), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, bx), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
            interpret=interpret_default(),
            **params,
        )(x, norm_w.reshape(1, -1), positions.reshape(-1, 1).astype(
            jnp.float32), wqkv)

    return fn


def make_fused_norm_matmul(*, eps: float = 1e-5, rms_offset: bool = False,
                           block_x: int = 512, out_dtype=None):
    """fn(x (B, D), norm_w (D,), w (D, X)) -> (B, X): batched rms-norm ->
    matmul fusion (the MLP entry: norm -> w_gate_up) — same kernel, no rope."""

    @jax.jit
    def fn(x, norm_w, w):
        B, D = x.shape
        D2, X = w.shape
        assert D == D2
        bx = block_x
        while X % bx:
            bx //= 2
        odt = out_dtype or x.dtype
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024)
        dummy_pos = jnp.zeros((B, 1), jnp.float32)
        return pl.pallas_call(
            functools.partial(_fused_kernel, eps, 0, 1, bx, 10000.0,
                              rms_offset),
            out_shape=jax.ShapeDtypeStruct((B, X), odt),
            grid=(cdiv(X, bx),),
            in_specs=[
                pl.BlockSpec((B, D), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, bx), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, bx), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
            interpret=interpret_default(),
            **params,
        )(x, norm_w.reshape(1, -1), dummy_pos, w)

    return fn


def fused_norm_qkv_rope_ref(x, norm_w, wqkv, positions, *, n_heads,
                            n_kv_heads, head_dim, eps=1e-5, theta=10000.0,
                            rms_offset=False):
    """jnp oracle composing the unfused ops exactly as models/llama.py does."""
    from leetcuda_tpu.ops.rope import apply_rope_half

    H, Hkv, Dh = n_heads, n_kv_heads, head_dim
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    nw = norm_w.astype(jnp.float32) + (1.0 if rms_offset else 0.0)
    xn = (xf * jax.lax.rsqrt(ms + eps) * nw).astype(x.dtype)
    out = (xn @ wqkv).astype(x.dtype)
    B = x.shape[0]
    q, k, v = jnp.split(out, [H * Dh, (H + Hkv) * Dh], axis=-1)
    q = apply_rope_half(q.reshape(B, 1, H, Dh), positions[:, None],
                        theta).reshape(B, H * Dh)
    k = apply_rope_half(k.reshape(B, 1, Hkv, Dh), positions[:, None],
                        theta).reshape(B, Hkv * Dh)
    return jnp.concatenate([q, k, v], axis=-1)


# --- registry ---------------------------------------------------------------------

from leetcuda_tpu.core.registry import register_op  # noqa: E402

_REG_H, _REG_HKV, _REG_DH = 4, 2, 64


def _fd_flops(x, nw, w, *rest):
    return float(2 * x.shape[0] * w.shape[0] * w.shape[1])


def _fd_bytes(x, nw, w, *rest):
    return float(w.size * w.dtype.itemsize)


register_op(
    "fused_norm_qkv_rope_decode",
    ref=functools.partial(fused_norm_qkv_rope_ref, n_heads=_REG_H,
                          n_kv_heads=_REG_HKV, head_dim=_REG_DH),
    flops=_fd_flops, bytes=_fd_bytes, atol=3e-2, rtol=3e-2,
    family="fused-decode", tags=("decode", "rope"),
)(make_fused_norm_qkv_rope(n_heads=_REG_H, n_kv_heads=_REG_HKV,
                           head_dim=_REG_DH))


def _fnm_ref(x, nw, w):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = (xf * jax.lax.rsqrt(ms + 1e-5)).astype(x.dtype) * nw
    return (xn.astype(w.dtype) @ w).astype(x.dtype)


register_op(
    "fused_norm_matmul_decode",
    ref=_fnm_ref, flops=_fd_flops, bytes=_fd_bytes, atol=3e-2, rtol=3e-2,
    family="fused-decode", tags=("decode", "plain"),
)(make_fused_norm_matmul())
