"""On-hardware validation sweep: every registered op, compiled by Mosaic on
the REAL chip, checked against its oracle.

The pytest suite runs the same sweep in CPU interpret mode; interpret and
Mosaic can disagree (layout bugs, masked-load semantics, dtype support), so
this tool is the hardware gate:

    python tools/hw_sweep.py [--families gemm flash-attn] [--verbose]

Exit code 0 iff every op matches within its declared tolerance.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import importlib
import sys

import numpy as np


MODULES = [
    "ops.elementwise", "ops.activations", "ops.reduce", "ops.softmax",
    "ops.layer_norm", "ops.rms_norm", "ops.rope", "ops.embedding",
    "ops.histogram", "ops.transpose", "ops.dot_product",
    "ops.merge_attn_states", "gemm.matmul", "gemm.gemv", "gemm.quant",
    "attention.flash", "attention.chunk", "gemm.fused_decode", "attention.decode",
    "gemm.grouped",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    for m in MODULES:
        importlib.import_module(f"leetcuda_tpu.{m}")
    from leetcuda_tpu.core.registry import OPS
    from leetcuda_tpu.core.testing import make_args
    from leetcuda_tpu.core.runtime import on_tpu

    print(f"backend: {'TPU' if on_tpu() else 'CPU (interpret)'}; "
          f"{len(OPS)} registered ops")
    rng = np.random.default_rng(0)
    passed = failed = skipped = 0
    failures = []
    for name in sorted(OPS):
        spec = OPS[name]
        if args.families and spec.family not in args.families:
            continue
        if spec.ref is None:
            skipped += 1
            continue
        a = make_args(spec, rng)
        if a is None:
            skipped += 1
            continue
        try:
            got = spec.fn(*a)
            want = spec.ref(*a)
            gl = got if isinstance(got, tuple) else (got,)
            wl = want if isinstance(want, tuple) else (want,)
            for g, w in zip(gl, wl):
                np.testing.assert_allclose(
                    np.asarray(g, np.float64), np.asarray(w, np.float64),
                    atol=spec.atol, rtol=spec.rtol)
            passed += 1
            if args.verbose:
                print(f"  ok   {name}")
        except Exception as e:
            failed += 1
            failures.append((name, f"{type(e).__name__}: {str(e)[:160]}"))
            print(f"  FAIL {name}: {failures[-1][1]}")
    print(f"hw sweep: {passed} passed, {failed} failed, {skipped} skipped")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
