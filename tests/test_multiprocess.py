"""Multi-process (multi-"host") execution — the DCN tier run for real.

Reference bar: `others/pytorch/distributed/test_dist_all.py:17-37` actually
spawns N ranks. Here tools/dryrun_multiprocess.py spawns 2 OS processes that
`jax.distributed.initialize` into one 8-device CPU world and prove the hybrid
mesh train step, cross-process token-exact decode, and the process_count==2
object-collective branch.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multiprocess_dryrun():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "dryrun_multiprocess.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["ok"] and summary["processes"] == 2
    assert summary["decode_token_exact"]
    assert summary["object_collectives"]["gathered_ranks"] == [0, 1]
