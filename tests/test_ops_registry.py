"""Registry-wide oracle sweep — the generalized form of the reference's
benchmark-as-test pattern (SURVEY.md §4): every registered kernel variant is run
against its jnp oracle at its declared tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import leetcuda_tpu.ops  # noqa: F401  (registers the corpus)
import leetcuda_tpu.attention.chunk  # noqa: F401  (chunk-verify family)
import leetcuda_tpu.gemm.fused_decode  # noqa: F401  (fused decode block)
import leetcuda_tpu.attention.decode  # noqa: F401  (quantized-KV decode rungs)
import leetcuda_tpu.gemm.grouped  # noqa: F401  (MoE grouped matmul)
from leetcuda_tpu.core.registry import OPS
from leetcuda_tpu.core.testing import make_args as _make_args


_SWEEP = [name for name, s in sorted(OPS.items()) if s.ref is not None]


@pytest.mark.parametrize("name", _SWEEP)
def test_op_matches_oracle(name, rng):
    spec = OPS[name]
    args = _make_args(spec, rng)
    if args is None:
        pytest.skip(f"no canonical args for family {spec.family}")
    got = spec.fn(*args)
    want = spec.ref(*args)
    got_l = [np.asarray(x, np.float64) for x in
             (got if isinstance(got, tuple) else (got,))]
    want_l = [np.asarray(x, np.float64) for x in
              (want if isinstance(want, tuple) else (want,))]
    for g, w in zip(got_l, want_l):
        np.testing.assert_allclose(g, w, atol=spec.atol, rtol=spec.rtol)
