"""Native (C++) component tests.

- libnms_ref.so: the from-scratch C++ hard-NMS oracle (native/nms_ref.cc,
  role-parity with /root/reference/kernels/nms/nms.cc) must agree with the
  JAX/Pallas NMS on random boxes.
- pjrt_bench: compiles from source (the PJRT C API runner itself is exercised
  on real TPU in the bench flow, not here — CPU has no PJRT plugin .so).
"""

import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

NATIVE = pathlib.Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module")
def nms_lib():
    so = NATIVE / "libnms_ref.so"
    if not so.exists():
        r = subprocess.run(["make", "-C", str(NATIVE), "libnms_ref.so"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build unavailable: {r.stderr[-200:]}")
    lib = ctypes.CDLL(str(so))
    lib.hard_nms.restype = ctypes.c_int
    lib.hard_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    return lib


def cpp_nms(lib, boxes, scores, iou_threshold):
    n = boxes.shape[0]
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros((n,), np.int32)
    cnt = lib.hard_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, iou_threshold,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n)
    return keep[:cnt]


def random_boxes(rng, n):
    xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    wh = rng.uniform(1, 30, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    # distinct scores: ties would make the keep-order oracle ambiguous
    scores = rng.permutation(n).astype(np.float32) / n
    return boxes, scores


@pytest.mark.parametrize("n,thresh", [(16, 0.5), (64, 0.3), (128, 0.7)])
def test_cpp_nms_matches_jax(nms_lib, n, thresh):
    from leetcuda_tpu.ops.nms import nms_indices

    rng = np.random.default_rng(n)
    boxes, scores = random_boxes(rng, n)
    want = cpp_nms(nms_lib, boxes, scores, thresh)
    got = np.asarray(nms_indices(boxes, scores, iou_threshold=thresh))
    got = got[got >= 0]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_pjrt_bench_compiles():
    r = subprocess.run(["make", "-C", str(NATIVE), "pjrt_bench"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"toolchain unavailable: {r.stderr[-200:]}")
    assert (NATIVE / "pjrt_bench").exists()
