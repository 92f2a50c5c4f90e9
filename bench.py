"""Headline benchmark — the driver runs this on real TPU hardware each round.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: flagship Pallas HGEMM (bf16 8192^3 — the reference's headline
is at large MNK, kernels/hgemm/README.md:157-165) TFLOPS, with
``vs_baseline`` = ratio vs XLA's own dot_general on the same shapes — the TPU
analog of the reference's 98–100%-of-cuBLAS bar
(/root/reference/kernels/hgemm/README.md:17). Timing through the axon tunnel is
noisy (RPC floor ~30 ms), so both sides take best-of-3 chained-scan reps.
"""

from __future__ import annotations

import json
import os
import threading


def _device_probe(timeout_s: float = 180.0) -> bool:
    """Guard against a half-up axon tunnel: jax.devices() HANGS (not errors)
    when the relay is down, which would wedge the driver's bench step. Probe
    device init on a daemon thread; on timeout emit an honest zero row and
    hard-exit (the hung C call can't be cancelled)."""
    ok = threading.Event()

    def probe():
        try:
            import jax

            jax.devices()
            ok.set()
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok.is_set()


def main():
    if not _device_probe():
        print(json.dumps({
            "metric": "hgemm_pallas_bf16_8192cubed_tflops", "value": 0,
            "unit": "TFLOPS", "vs_baseline": 0,
            "note": "backend unreachable: device init hung >180s "
                    "(axon tunnel down)"}), flush=True)
        os._exit(0)

    # Interleaved best-of-5: ours/XLA alternate every rep so both sides
    # sample the same chip/tunnel state (chained-scan timing per rep — see
    # leetcuda_tpu/bench/harness.py).
    import jax
    import jax.numpy as jnp

    from leetcuda_tpu.bench.harness import run_benchmark
    from leetcuda_tpu.core.runtime import on_tpu
    from leetcuda_tpu.gemm.matmul import hgemm, matmul_ref

    n, iters = (8192, 50) if on_tpu() else (512, 5)  # CPU-runnable fallback
    dtype = jnp.bfloat16
    key = jax.random.key(0)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (n, n), jnp.float32).astype(dtype)
    b = jax.random.normal(kb, (n, n), jnp.float32).astype(dtype)

    flops = 2.0 * n * n * n
    xla = jax.jit(matmul_ref)
    ours_tflops = xla_tflops = 0.0
    for _ in range(5):
        ours_tflops = max(ours_tflops, run_benchmark(
            hgemm, a, b, iters=iters, flops=flops).tflops)
        xla_tflops = max(xla_tflops, run_benchmark(
            xla, a, b, iters=iters, flops=flops).tflops)

    print(json.dumps({
        "metric": f"hgemm_pallas_bf16_{n}cubed_tflops",
        "value": round(ours_tflops, 2),
        "unit": "TFLOPS",
        "vs_baseline": round(ours_tflops / xla_tflops, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
