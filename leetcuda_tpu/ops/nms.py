"""NMS — analog of /root/reference/kernels/nms/{nms.cu,nms.cc}.

Reference: a CUDA kernel computing per-box IoU suppression (nms.cu:15) plus a C++
CPU ``hard_nms`` oracle (nms.cc:4-20), validated against torchvision. Greedy NMS is
inherently sequential in the *decision* but parallel in the *geometry*, so the
TPU-native design precomputes the full IoU matrix batched on the VPU/MXU-friendly
path, then runs the greedy suppression as a ``lax.fori_loop`` over boxes in score
order with vectorized mask updates — static shapes, no data-dependent control flow.

A C++ CPU oracle (leetcuda_tpu/native/nms.cc) mirrors the reference's nms.cc as a
test oracle; see leetcuda_tpu.native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from leetcuda_tpu.core.registry import register_op


def _pairwise_iou(boxes):
    """boxes (N, 4) [x1, y1, x2, y2] -> IoU matrix (N, N)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


@jax.jit
def nms(boxes, scores, iou_threshold: float = 0.5):
    """Greedy hard-NMS. Returns a keep mask over boxes (in input order).

    Matches torchvision.ops.nms semantics (the reference's oracle, nms.py:5):
    boxes are processed in descending score order; a box is kept iff its IoU with
    every previously-kept box is <= threshold.
    """
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = _pairwise_iou(sorted_boxes.astype(jnp.float32))
    n = boxes.shape[0]

    def body(i, suppressed):
        keep_i = jnp.logical_not(suppressed[i])
        # suppress all later boxes overlapping box i (only if i itself is kept)
        idx = jnp.arange(n)
        newly = keep_i & (idx > i) & (iou[i] > iou_threshold)
        return suppressed | newly

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep_sorted = jnp.logical_not(suppressed)
    # scatter back to input order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_indices(boxes, scores, iou_threshold: float = 0.5, max_out: int | None = None):
    """Kept indices in descending-score order (torchvision return convention),
    padded with -1 to ``max_out`` (static shape for jit)."""
    n = boxes.shape[0]
    max_out = max_out or n
    keep = nms(boxes, scores, iou_threshold)
    order = jnp.argsort(-scores)
    keep_sorted = keep[order]
    # stable-compact the kept positions (descending-score order), pad with -1
    pos = jnp.sort(jnp.where(keep_sorted, jnp.arange(n), n))
    gathered = jnp.where(pos < n, order[jnp.minimum(pos, n - 1)], -1)
    return gathered[:max_out]


def nms_ref(boxes, scores, iou_threshold: float = 0.5):
    """Pure-numpy greedy oracle (the nms.cc analog, used when the C++ oracle
    isn't built)."""
    import numpy as np

    b = np.asarray(boxes, dtype=np.float64)
    s = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-s)
    keep = np.zeros(len(b), dtype=bool)
    area = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    taken = []
    for i in order:
        ok = True
        for j in taken:
            ix1, iy1 = max(b[i, 0], b[j, 0]), max(b[i, 1], b[j, 1])
            ix2, iy2 = min(b[i, 2], b[j, 2]), min(b[i, 3], b[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            union = area[i] + area[j] - inter
            if union > 0 and inter / union > iou_threshold:
                ok = False
                break
        if ok:
            keep[i] = True
            taken.append(i)
    return keep


register_op(
    "hard_nms",
    ref=None, family="nms", tags=("greedy",),
)(nms)
