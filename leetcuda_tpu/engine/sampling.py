"""Token samplers for the engine: greedy, temperature, top-k, top-p.

All samplers share the signature ``sample(logits, key) -> tokens`` (logits
(..., V) f32; key a jax PRNG key, ignored by greedy) so the engine can jit
them interchangeably. Static shapes throughout: top-p uses a sorted-cumsum
mask, not a dynamic truncation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def greedy(logits, key=None):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def make_warper(temperature: float = 1.0, top_k: int | None = None,
                top_p: float | None = None):
    """Build warp(logits) -> filtered/scaled logits — the distribution
    transform of make_sampler WITHOUT the draw. Speculative sampling needs
    the warped distributions of BOTH models explicitly (accept ratio
    p_t(x)/p_d(x) and the residual max(p_t - p_d, 0) are defined on the
    warped distributions), so the transform is factored out here."""
    assert temperature > 0, "warper is for stochastic sampling"

    def warp(logits):
        x = logits.astype(jnp.float32) / temperature
        if top_k is not None:
            kth = jnp.sort(x, axis=-1)[..., -top_k][..., None]
            x = jnp.where(x < kth, _NEG_INF, x)
        if top_p is not None:
            sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_x, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # keep tokens whose prefix mass (exclusive) is < top_p; the first
            # token always survives
            keep_sorted = (cum - probs) < top_p
            cutoff = jnp.min(jnp.where(keep_sorted, sorted_x, jnp.inf),
                             axis=-1, keepdims=True)
            x = jnp.where(x < cutoff, _NEG_INF, x)
        return x

    return warp


def make_sampler(temperature: float = 1.0, top_k: int | None = None,
                 top_p: float | None = None):
    """Build sample(logits, key). temperature<=0 degenerates to greedy."""
    if temperature <= 0:
        return greedy
    warp = make_warper(temperature, top_k, top_p)

    def sample(logits, key):
        return jax.random.categorical(
            key, warp(logits), axis=-1).astype(jnp.int32)

    # the engine's speculative mode needs the warped distribution itself
    # (rejection sampling is defined on it), so the sampler carries its warp
    sample.warp = warp
    return sample
