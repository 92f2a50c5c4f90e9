"""Profiling & IR-inspection helpers — the nsight-recipes analog.

The reference documents nsys/ncu workflows and PTX/SASS reading
(/root/reference/kernels/nvidia-nsight/README.md:12-38). The TPU equivalents:

- ``trace(path)``: jax.profiler context — open the result in XProf/TensorBoard
  to see per-kernel device time (the nsys timeline analog).
- ``dump_ir(fn, *args)``: returns {stage: text} with the jaxpr, StableHLO and
  (on TPU) optimized HLO — the PTX/SASS-reading analog.
- ``mosaic_dir(path)``: env context that makes Mosaic dump each Pallas
  kernel's intermediate IR (the -Xptxas -v resource-report analog).

See docs/profiling.md for the walkthrough.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a device trace: ``with trace(): fn(...)`` then inspect with
    ``tensorboard --logdir`` (profile plugin) or xprof."""
    with jax.profiler.trace(logdir):
        yield logdir


def dump_ir(fn, *args, static_argnames=()) -> dict:
    """Lower fn(*args) and return {'jaxpr', 'stablehlo', 'hlo_optimized'}."""
    out = {}
    out["jaxpr"] = str(jax.make_jaxpr(fn, static_argnums=())(*args))
    lowered = jax.jit(fn, static_argnames=static_argnames).lower(*args)
    out["stablehlo"] = lowered.as_text()
    try:
        out["hlo_optimized"] = lowered.compile().as_text()
    except Exception as e:  # CPU interpret mode can't produce TPU HLO
        out["hlo_optimized"] = f"<unavailable: {e}>"
    return out


@contextlib.contextmanager
def mosaic_dir(path: str = "/tmp/mosaic-dumps"):
    """Make XLA/Mosaic dump per-kernel IR into ``path`` (set BEFORE the first
    compilation of the kernel — dumps happen at compile time, and already-
    cached executables won't recompile)."""
    os.makedirs(path, exist_ok=True)
    old = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{old} --xla_dump_to={path}".strip()
    try:
        yield path
    finally:
        os.environ["XLA_FLAGS"] = old
