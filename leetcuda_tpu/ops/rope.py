"""RoPE — analog of /root/reference/kernels/rope/rope.cu.

Reference semantics (rope.cu:18-66): interleaved pairs, θ=10000 —
``out[2i] = x[2i]·cos(pos·θ^{-2i/D}) − x[2i+1]·sin(·)``,
``out[2i+1] = x[2i]·sin(·) + x[2i+1]·cos(·)``.

Interleaved lanes are hostile to the TPU's (sublane, lane) layout, so the Pallas
kernel operates on the de-interleaved halves (two (S, D/2) planes) and fuses the
angle computation (position from the grid step, frequency from a broadcasted iota)
with the rotation — no host-precomputed cos/sin tables. The wrapper de/re-interleaves
via XLA (a relayout XLA does well), keeping reference-identical I/O. The half-rotation
(HF/Llama "rotate_half") convention used by ``leetcuda_tpu.models`` is also provided.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op

DEFAULT_THETA = 10000.0


def _rope_pair_kernel(theta, rows, x1_ref, x2_ref, o1_ref, o2_ref):
    S_blk, half = x1_ref.shape
    pos0 = pl.program_id(0) * rows
    # Mosaic iota must be integer-typed; cast to f32 after
    pos = (pos0 + jax.lax.broadcasted_iota(jnp.int32, (S_blk, half), 0)
           ).astype(jnp.float32)
    dim = jax.lax.broadcasted_iota(jnp.int32, (S_blk, half), 1).astype(jnp.float32)
    inv_freq = jnp.exp(dim * (-jnp.log(theta) / half))
    ang = pos * inv_freq
    c, s = jnp.cos(ang), jnp.sin(ang)
    x1 = x1_ref[:].astype(jnp.float32)
    x2 = x2_ref[:].astype(jnp.float32)
    o1_ref[:] = (x1 * c - x2 * s).astype(o1_ref.dtype)
    o2_ref[:] = (x1 * s + x2 * c).astype(o2_ref.dtype)


def make_rope(*, theta: float = DEFAULT_THETA, rows_per_step: int = 8):
    """rope(x): x is (S, D) with interleaved pairs, position = row index."""

    @jax.jit
    def fn(x):
        S, D = x.shape
        half = D // 2
        xp = x.reshape(S, half, 2)
        x1, x2 = xp[..., 0], xp[..., 1]
        bs = min(rows_per_step, S)
        spec = pl.BlockSpec((bs, half), lambda i: (i, 0), memory_space=pltpu.VMEM)
        o1, o2 = pl.pallas_call(
            functools.partial(_rope_pair_kernel, theta, bs),
            out_shape=(jax.ShapeDtypeStruct((S, half), x.dtype),
                       jax.ShapeDtypeStruct((S, half), x.dtype)),
            grid=(cdiv(S, bs),),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            interpret=interpret_default(),
        )(x1, x2)
        return jnp.stack([o1, o2], axis=-1).reshape(S, D)

    return fn


def _rope_lane_kernel(theta, rows, x_ref, o_ref):
    """Interleaved rope on the NATIVE lane layout — no de-interleave.

    The pair (2i, 2i+1) lives in adjacent lanes; instead of splitting planes
    (which strands the op on 64-lane arrays and pays an XLA relayout), build
    per-lane cos/sin from iota (lane//2 is the frequency index) and realize
    the pair swap as two 1-lane circular shifts + an even/odd select — three
    VPU ops against an HBM-bound stream. out = x·c + swap(x)·(±s).
    """
    bs, D = x_ref.shape
    half = D // 2
    pos = (pl.program_id(0) * rows
           + jax.lax.broadcasted_iota(jnp.int32, (bs, D), 0)).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bs, D), 1)
    pair = (lane // 2).astype(jnp.float32)
    inv_freq = jnp.exp(pair * (-jnp.log(theta) / half))
    ang = pos * inv_freq
    c, s = jnp.cos(ang), jnp.sin(ang)
    x = x_ref[:].astype(jnp.float32)
    is_even = (lane % 2) == 0
    # pltpu.roll wants non-negative shifts: roll(-1) == roll(D-1)
    swapped = jnp.where(is_even, pltpu.roll(x, D - 1, 1), pltpu.roll(x, 1, 1))
    o_ref[:] = (x * c + swapped * jnp.where(is_even, -s, s)).astype(o_ref.dtype)


def make_rope_lane(*, theta: float = DEFAULT_THETA, rows_per_step: int = 1024):
    """rope(x) directly on the interleaved (S, D) array (top ladder rung)."""
    from leetcuda_tpu.ops.reduce import _vmem_params

    @jax.jit
    def fn(x):
        S, D = x.shape
        bs = min(rows_per_step, S)
        spec = pl.BlockSpec((bs, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_rope_lane_kernel, theta, bs),
            out_shape=jax.ShapeDtypeStruct((S, D), x.dtype),
            grid=(cdiv(S, bs),),
            in_specs=[spec],
            out_specs=spec,
            input_output_aliases={0: 0},
            interpret=interpret_default(),
            **_vmem_params(),
        )(x)

    return fn


def rope_ref(x, theta: float = DEFAULT_THETA):
    """jnp oracle with reference-identical interleaved semantics."""
    S, D = x.shape
    half = D // 2
    xf = x.astype(jnp.float32).reshape(S, half, 2)
    pos = jnp.arange(S, dtype=jnp.float32)[:, None]
    inv_freq = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = pos * inv_freq
    c, s = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(S, D).astype(x.dtype)


def _rope_angles(positions, D, theta, inv_freq=None):
    """(cos, sin) of pos·θ^{-2i/D}, shaped (..., S, 1, half) to broadcast
    over a heads axis — shared by both model-level rotation conventions.
    ``inv_freq`` (half,) overrides the plain power ladder (rope scaling)."""
    half = D // 2
    if inv_freq is None:
        inv_freq = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., S, half)
    return jnp.cos(ang)[..., None, :], jnp.sin(ang)[..., None, :]


def llama3_scaled_inv_freq(D: int, theta: float, factor: float,
                           low_freq_factor: float, high_freq_factor: float,
                           original_max_pos: int):
    """Llama-3.1 rope scaling (HF _compute_llama3_parameters semantics):
    long-wavelength frequencies divide by ``factor``, short wavelengths stay,
    the middle band interpolates smoothly. Returns (D/2,) f32."""
    half = D // 2
    inv_freq = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    wavelen = 2.0 * jnp.pi / inv_freq
    low_wl = original_max_pos / low_freq_factor
    high_wl = original_max_pos / high_freq_factor
    smooth = ((original_max_pos / wavelen - low_freq_factor)
              / (high_freq_factor - low_freq_factor))
    mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = jnp.where(wavelen > low_wl, inv_freq / factor,
                    jnp.where(wavelen < high_wl, inv_freq, mid))
    return out


def yarn_scaled_inv_freq(D: int, theta: float, factor: float,
                         beta_fast: float, beta_slow: float,
                         original_max_pos: int, truncate: bool = True,
                         attention_factor: float | None = None):
    """YaRN (NTK-by-parts) scaling — HF _compute_yarn_parameters semantics:
    interpolated (inv_freq/factor) and extrapolated (raw) frequencies blend
    through a linear ramp between the beta_fast/beta_slow correction dims.
    Returns ((D/2,) f32 inv_freq, attention_factor) — the factor scales
    cos/sin (the paper's sqrt-mscale on attention logits)."""
    import math as _math

    half = D // 2
    pos_freqs = theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    inv_extra = 1.0 / pos_freqs
    inv_inter = 1.0 / (factor * pos_freqs)

    def corr_dim(n_rot):
        return (D * _math.log(original_max_pos / (n_rot * 2 * _math.pi))
                / (2 * _math.log(theta)))

    low, high = corr_dim(beta_fast), corr_dim(beta_slow)
    if truncate:
        low, high = _math.floor(low), _math.ceil(high)
    low, high = max(low, 0), min(high, D - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip((jnp.arange(half, dtype=jnp.float32) - low)
                    / (high - low), 0, 1)
    extra_w = 1.0 - ramp
    inv_freq = inv_inter * (1.0 - extra_w) + inv_extra * extra_w
    if attention_factor is None:
        attention_factor = (0.1 * _math.log(factor) + 1.0 if factor > 1
                            else 1.0)
    return inv_freq, float(attention_factor)


def apply_rope_half(x, positions, theta: float = DEFAULT_THETA,
                    inv_freq=None, mscale: float = 1.0):
    """Half-rotation RoPE for models: x (..., S, H, D), positions (..., S).

    rotate_half convention: the first D/2 lanes pair with the last D/2 lanes —
    layout-friendly on TPU (contiguous halves, no interleave relayout).
    ``inv_freq``: optional (D/2,) scaled frequencies (Llama-3.1 / linear /
    YaRN rope scaling) overriding the θ power ladder. ``mscale``: YaRN
    attention factor multiplying cos/sin.
    """
    D = x.shape[-1]
    half = D // 2
    c, s = _rope_angles(positions, D, theta, inv_freq)
    if mscale != 1.0:
        c, s = c * mscale, s * mscale
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                           axis=-1).astype(x.dtype)


def apply_rope_glm(x, positions, theta: float, rotary_dim: int):
    """GLM-4 partial rotary: INTERLEAVED-pair rope (glm4's rotate_half is
    the stride-2 variant, so pairs (2i, 2i+1) rotate by θ_i) applied to the
    first ``rotary_dim`` lanes only; the rest pass through.
    x (..., S, H, D), positions (..., S)."""
    half = rotary_dim // 2
    inv_freq = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., S, half)
    c = jnp.cos(ang)[..., None, :]                             # (..., S, 1, h)
    s = jnp.sin(ang)[..., None, :]
    xr = x[..., :rotary_dim].astype(jnp.float32)
    xp = x[..., rotary_dim:]
    xv = xr.reshape(*xr.shape[:-1], half, 2)
    x1, x2 = xv[..., 0], xv[..., 1]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    out = out.reshape(*xr.shape).astype(x.dtype)
    return jnp.concatenate([out, xp], axis=-1)


def apply_rope_interleaved(x, positions, theta: float = DEFAULT_THETA):
    """Interleaved-pair RoPE for models: x (..., S, H, D), positions (..., S).

    DeepSeek/complex convention (HF deepseek_v2 ``apply_rotary_emb``): lane
    pairs (2i, 2i+1) rotate by angle pos·θ^{-2i/D} — the kernel-level
    semantics above, broadcast over heads with explicit positions."""
    D = x.shape[-1]
    half = D // 2
    c, s = _rope_angles(positions, D, theta)
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], half, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _rope_flops(x):
    return float(6 * x.size)


def _rope_bytes(x):
    return float(2 * x.size * x.dtype.itemsize)


for _suffix, _rows in [("f32", 8), ("f32_v2", 512)]:
    register_op(
        f"rope_{_suffix}",
        ref=rope_ref, flops=_rope_flops, bytes=_rope_bytes,
        atol=1e-4, rtol=1e-4, family="rope", tags=(_suffix,),
    )(make_rope(rows_per_step=_rows))

# top rung: the native interleaved-lane kernel (no de-interleave relayout)
register_op(
    "rope_f32x4_pack",
    ref=rope_ref, flops=_rope_flops, bytes=_rope_bytes,
    atol=1e-4, rtol=1e-4, family="rope", tags=("f32x4_pack", "lane"),
)(make_rope_lane(rows_per_step=2048))

rope = make_rope_lane(rows_per_step=2048)
