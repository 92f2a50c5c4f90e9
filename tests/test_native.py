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


# --- native data loader (native/dataloader.cc) --------------------------------------


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    from leetcuda_tpu.data import write_token_shard

    d = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    paths = []
    sizes = [5000, 3000, 77]  # tiny third shard forces boundary-crossing rows
    for i, n in enumerate(sizes):
        toks = rng.integers(0, 32000, n).astype(np.int64)
        paths.append(write_token_shard(d / f"shard{i}.bin", toks))
    return paths, sizes


def test_shard_roundtrip(shard_dir):
    from leetcuda_tpu.data import read_token_shard, write_token_shard

    paths, sizes = shard_dir
    assert [read_token_shard(p).size for p in paths] == sizes
    # uint32 path for vocab >= 65536
    import pathlib
    big = write_token_shard(pathlib.Path(paths[0]).parent / "big.bin",
                            np.asarray([0, 70000, 5], np.int64))
    got = read_token_shard(big)
    np.testing.assert_array_equal(got, [0, 70000, 5])


def test_loader_batches_match_shards(shard_dir):
    """Every emitted row must be a contiguous crop of the concatenated
    shard stream (including rows straddling shard boundaries)."""
    from leetcuda_tpu.data import TokenLoader, read_token_shard

    paths, _ = shard_dir
    stream = np.concatenate([read_token_shard(p) for p in paths])
    with TokenLoader(paths, seq_len=32, batch=4, seed=7) as dl:
        assert dl.total_tokens == stream.size
        for _ in range(8):
            b = next(dl)
            assert b.shape == (4, 33) and b.dtype == np.int32
            for row in b:
                # find the crop: match on the first 8 tokens then verify all
                starts = np.where(
                    np.all(np.lib.stride_tricks.sliding_window_view(
                        stream, 33) == row, axis=1))[0]
                assert starts.size >= 1, "row is not a contiguous crop"


def test_loader_deterministic_resume(shard_dir):
    """Same (seed, step) -> same batch: a loader re-opened at start_step=N
    continues the exact stream (checkpoint/resume contract)."""
    from leetcuda_tpu.data import TokenLoader

    paths, _ = shard_dir
    with TokenLoader(paths, seq_len=16, batch=2, seed=3) as dl:
        first = [next(dl) for _ in range(6)]
    with TokenLoader(paths, seq_len=16, batch=2, seed=3,
                     start_step=3) as dl:
        resumed = [next(dl) for _ in range(3)]
    for a, b in zip(first[3:], resumed):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # top-8 wall-time: default tier stays <6 min (CI --runslow covers it)
def test_loader_trains_tiny_model(shard_dir):
    """End-to-end: native loader feeds make_train_step; loss falls."""
    import jax
    import jax.numpy as jnp
    from leetcuda_tpu.data import TokenLoader
    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, make_train_step)

    paths, _ = shard_dir
    cfg = tiny_config(vocab_size=32000)
    params = init_params(jax.random.key(0), cfg)
    init_opt, step = make_train_step(cfg, learning_rate=1e-3, remat=False)
    opt = init_opt(params)
    losses = []
    with TokenLoader(paths, seq_len=32, batch=4, seed=1) as dl:
        for _, tokens in zip(range(8), dl):
            params, opt, loss = step(params, opt, jnp.asarray(tokens))
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
