"""Graded Pallas VPU kernel corpus — the analog of the reference's ``kernels/<op>/``.

Importing this package registers every kernel variant in the op registry
(``leetcuda_tpu.core.registry.OPS``). Each module mirrors one reference op directory
and keeps the reference's graded-variant pedagogy: the CUDA vectorization ladder
(f32 → f32x4 → f16x2 → f16x8_pack) becomes a Pallas block-shape/dtype ladder.
"""

from leetcuda_tpu.ops import (  # noqa: F401
    elementwise,
    activations,
    reduce,
    dot_product,
    softmax,
    layer_norm,
    rms_norm,
    rope,
    embedding,
    histogram,
    transpose,
    nms,
    merge_attn_states,
)
