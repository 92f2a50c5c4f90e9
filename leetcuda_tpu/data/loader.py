"""Tokenized-dataset input pipeline over the native C++ loader.

The host-side half of the training loop: `native/dataloader.cc` mmaps token
shards and assembles random-crop (batch, seq_len+1) batches on a worker
thread into a prefetch ring, so batch assembly overlaps the TPU step
(ctypes releases the GIL during the blocking `dl_next`). This module is the
thin typed boundary: shard writing/reading helpers plus an iterator that
hands out numpy arrays ready for `jnp.asarray`/`device_put`.

Shard format (little-endian): 16-byte header — magic b"LTPU", u32
token_bytes (2 or 4), u64 token count — then the raw tokens. uint16 shards
halve disk/page-cache footprint for vocabularies < 65536.

Determinism: the crop stream is a pure function of (seed, step), so
checkpoint/resume replays exactly — construct with ``start_step`` equal to
the restored step count.

    shards = [write_token_shard(p, toks) for ...]
    with TokenLoader(shards, seq_len=2048, batch=8, seed=0) as dl:
        for step, tokens in zip(range(n_steps), dl):
            params, opt, loss = train_step(params, opt, jnp.asarray(tokens))
"""

from __future__ import annotations

import ctypes
import pathlib
import struct
import subprocess

import numpy as np

_MAGIC = b"LTPU"
_NATIVE = pathlib.Path(__file__).resolve().parent.parent.parent / "native"

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _NATIVE / "libdataloader.so"
    if not so.exists():
        r = subprocess.run(["make", "-C", str(_NATIVE), "libdataloader.so"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"native dataloader build failed:\n{r.stderr[-500:]}")
    lib = ctypes.CDLL(str(so))
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_int, ctypes.c_ulonglong,
        ctypes.c_longlong,
    ]
    lib.dl_next.restype = ctypes.c_longlong
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int32)]
    lib.dl_total_tokens.restype = ctypes.c_ulonglong
    lib.dl_total_tokens.argtypes = [ctypes.c_void_p]
    lib.dl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_token_shard(path, tokens) -> pathlib.Path:
    """Write a token array as a shard. uint16 storage when the values fit
    (vocab < 65536), else uint32."""
    tokens = np.asarray(tokens)
    assert tokens.ndim == 1 and np.issubdtype(tokens.dtype, np.integer)
    assert int(tokens.min(initial=0)) >= 0, "tokens must be non-negative"
    dt = np.uint16 if int(tokens.max(initial=0)) < 2 ** 16 else np.uint32
    path = pathlib.Path(path)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<IQ", dt().itemsize, tokens.size))
        f.write(np.ascontiguousarray(tokens, dt).tobytes())
    return path


def read_token_shard(path) -> np.ndarray:
    """Read a whole shard back as int32 (tests / inspection)."""
    raw = pathlib.Path(path).read_bytes()
    assert raw[:4] == _MAGIC, f"not a token shard: {path}"
    tb, count = struct.unpack("<IQ", raw[4:16])
    dt = np.uint16 if tb == 2 else np.uint32
    return np.frombuffer(raw, dt, count=count, offset=16).astype(np.int32)


class TokenLoader:
    """Iterator of (batch, seq_len+1) int32 batches from token shards,
    prefetched by the native worker thread.

    Rows are independent random crops over the concatenated shard space —
    the standard LM sampling scheme (train on tokens[:, :-1] -> predict
    tokens[:, 1:], or hand the full row to ``loss_fn`` which shifts
    internally)."""

    def __init__(self, paths, *, seq_len: int, batch: int, seed: int = 0,
                 prefetch: int = 2, start_step: int = 0):
        lib = _load_lib()
        self._lib = lib
        enc = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * len(enc))(*enc)
        self._h = lib.dl_open(arr, len(enc), seq_len, batch, prefetch,
                              seed, start_step)
        if not self._h:
            raise ValueError(
                f"dl_open failed: check shard files {list(paths)} and that "
                f"total tokens > seq_len+1")
        self.seq_len, self.batch = seq_len, batch
        self.step = start_step
        self._buf = np.empty((batch, seq_len + 1), np.int32)

    @property
    def total_tokens(self) -> int:
        return int(self._lib.dl_total_tokens(self._h))

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        step = self._lib.dl_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if step < 0:
            raise RuntimeError("dl_next failed")
        self.step = int(step) + 1
        return self._buf.copy()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.dl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
