"""leetcuda_tpu — a from-scratch TPU-native kernel library and inference stack.

Rebuilds the capabilities of xlite-dev/LeetCUDA (a CUDA kernel corpus + toy-HGEMM +
flash-attention-MMA mini-libraries, see /root/reference) as an idiomatic
JAX / XLA / Pallas / pjit framework:

- ``ops``       graded Pallas VPU kernel corpus (elementwise, activations, reduce,
                softmax incl. online-softmax, layer/rms-norm, rope, embedding,
                histogram, transpose, dot-product) — the analog of ``kernels/<op>/``.
- ``gemm``      MXU matmul library (naive → tiled → pipelined; f32/bf16/f16;
                weight-only int8/fp8 dequant fusion) — the analog of
                ``kernels/hgemm`` + ``kernels/sgemm``.
- ``attention`` Pallas flash-attention family (split-Q analog, low-VMEM variants,
                long-headdim tiling, GQA, causal) + merge-attn-states + decode
                attention — the analog of ``kernels/flash-attn``.
- ``parallel``  mesh/sharding layer, ICI collective demos, ring attention /
                context parallelism — first-class replacement for
                ``others/pytorch/distributed``.
- ``models``    Llama-style transformer built on the kernel corpus.
- ``engine``    continuous-batching decode engine (paged KV cache, quantized).
- ``bench``     benchmark-as-test harness mirroring the reference's
                ``run_benchmark`` output contract (mean ms, TFLOPS, vs-baseline).
- ``utils``     layout visualizer, roofline reporter, profiling helpers.
"""

__version__ = "0.1.0"

from leetcuda_tpu.core.registry import OPS, get_op, register_op  # noqa: F401
