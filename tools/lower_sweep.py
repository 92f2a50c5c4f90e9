"""TPU-lowering sweep WITHOUT a chip: lower every registered op for the TPU
platform from a CPU-only session.

`jax.export(..., platforms=("tpu",))` runs the full Pallas -> Mosaic kernel
generation (grid/BlockSpec legality, scratch shapes, dtype legalization,
iota/layout rules) that interpret-mode tests never touch — the bug class
tools/hw_sweep.py exists for, minus the final on-device Mosaic compile and
numerics. Run it in CI as the chip-less middle tier of the validation
ladder:

    pytest (interpret numerics)  ->  lower_sweep (Mosaic lowering)
        ->  hw_sweep (on-chip compile + numerics)

    python tools/lower_sweep.py [--families gemm flash-attn] [--verbose]

Exit 0 iff every op lowers. LEETCUDA_TARGET_TPU=1 makes on_tpu() report
True so kernels build exactly as they would for the chip (interpret off,
f16-compat upcasts active).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["LEETCUDA_TARGET_TPU"] = "1"

import argparse
import importlib

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hw_sweep import MODULES


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    for m in MODULES:
        importlib.import_module(f"leetcuda_tpu.{m}")
    from jax import export

    from leetcuda_tpu.core.registry import OPS
    from leetcuda_tpu.core.testing import make_args

    print(f"{len(OPS)} registered ops; lowering for platform=tpu on cpu host")
    rng = np.random.default_rng(0)
    passed = failed = skipped = 0
    failures = []
    for name in sorted(OPS):
        spec = OPS[name]
        if args.families and spec.family not in args.families:
            continue
        a = make_args(spec, rng)
        if a is None:
            skipped += 1
            continue
        abstract = [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                    for x in a]
        try:
            export.export(jax.jit(spec.fn), platforms=("tpu",))(*abstract)
            passed += 1
            if args.verbose:
                print(f"  ok   {name}")
        except Exception as e:
            failed += 1
            failures.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
            print(f"  FAIL {name}: {failures[-1][1]}")
    print(f"lower sweep: {passed} lowered, {failed} failed, "
          f"{skipped} skipped")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
