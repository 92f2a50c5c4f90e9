"""Chip-less Mosaic-lowering gate — tools/lower_sweep.py.

jax.export(platforms=("tpu",)) from a CPU session runs the full
Pallas -> Mosaic kernel generation, the bug class interpret-mode numerics
can't see (it caught a real one: fp8->bf16 has no direct Mosaic cast, so
the fp8 dequant GEMM would have failed its first on-chip compile). This is
the middle tier of the validation ladder: pytest interpret numerics ->
lower_sweep -> tools/hw_sweep.py on-chip.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_all_ops_lower_for_tpu():
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lower_sweep.py"),
         "--e2e"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    # lower_sweep exits 1 iff any op failed to lower
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "lower sweep:" in out.stdout, out.stdout[-1000:]
