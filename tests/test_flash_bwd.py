"""FA-2 backward kernels vs jnp autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.attention.flash_bwd import make_flash_attention_trainable
from leetcuda_tpu.attention.flash import mha_ref


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("Hkv", [2, 1])
def test_flash_grads_match_autodiff(causal, Hkv, rng):
    B, H, N, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, N, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, N, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, N, D)) * 0.5, jnp.float32)

    fa = make_flash_attention_trainable(causal=causal, block_q=128, block_k=128)

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(fa(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_ref(q, k, v, causal=causal)))

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr, name in zip(g_pallas, g_ref, "qkv"):
        gp, gr = np.asarray(gp), np.asarray(gr)
        np.testing.assert_allclose(
            gp, gr, atol=2e-3, rtol=1e-2,
            err_msg=f"d{name} mismatch (causal={causal}, Hkv={Hkv})")
