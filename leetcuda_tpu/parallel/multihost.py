"""Multi-host / object collectives — the host-payload demo scripts' analog.

The reference's NCCL suite includes OBJECT collectives: gathering arbitrary
python objects across ranks (`others/pytorch/distributed/
test_all_gather_objects.py`, `test_scatter.py` object mode) and a Ray-based
all_to_all (`test_all_to_all_single_ray.py`) — host-side coordination
patterns, not device math. The TPU-native mapping is
``jax.experimental.multihost_utils``: every JAX *process* (host) in a
multi-host program contributes/receives host payloads, with the transport
riding the same ICI/DCN fabric as array collectives.

Objects are pickled to uint8 arrays, padded to the cross-process max length,
moved through ``process_allgather`` / ``broadcast_one_to_all``, and
unpickled — exactly what torch.distributed does under the hood for its
object APIs (pickle + tensor collective).

Single-process (tests, CPU-mesh dev) degenerates gracefully: process_count
== 1 means gather returns [obj] and broadcast is identity, so the demos are
runnable everywhere, like the reference's gloo fallback
(test_dist_all.py:26-29).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def broadcast_object(obj, is_source: bool | None = None):
    """test_broadcast.py object-mode analog: process 0's object everywhere.

    ``is_source`` defaults to process_index == 0. Returns the object from the
    source process on every process."""
    from jax.experimental import multihost_utils

    if is_source is None:
        is_source = jax.process_index() == 0
    payload = np.frombuffer(
        pickle.dumps(obj if is_source else None), np.uint8)
    # length first (source wins), then the padded payload
    n = multihost_utils.broadcast_one_to_all(
        np.int32(payload.size), is_source=is_source)
    buf = np.zeros(int(n), np.uint8)
    if is_source:
        buf[:payload.size] = payload
    out = multihost_utils.broadcast_one_to_all(buf, is_source=is_source)
    return pickle.loads(np.asarray(out).tobytes())


def all_gather_objects(obj) -> list:
    """test_all_gather_objects.py analog: every process's object, in
    process order, on every process."""
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.int32(payload.size))
    sizes = np.atleast_1d(np.asarray(sizes))
    cap = int(sizes.max())
    buf = np.zeros(cap, np.uint8)
    buf[:payload.size] = payload
    gathered = np.atleast_2d(np.asarray(
        multihost_utils.process_allgather(buf)))
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(gathered.shape[0])]


def sync_processes(name: str = "barrier"):
    """dist.barrier() analog."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_local_to_global(x, mesh, pspec):
    """The multi-host array-assembly step the reference never needed (one
    process owns all GPUs there): each host's local shard batch becomes one
    global jax.Array laid out by ``pspec`` over ``mesh``."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, pspec)


def demo_all_gather_objects(verbose: bool = True):
    """Runnable demo mirroring the reference script's per-rank logging:
    each process contributes a dict keyed by its rank."""
    rank = jax.process_index()
    obj = {"rank": rank, "payload": [rank, f"host-{rank}"],
           "devices": len(jax.local_devices())}
    out = all_gather_objects(obj)
    if verbose:
        print(f"[process {rank}] gathered objects: {out}")
    return out


def demo_broadcast_object(verbose: bool = True):
    obj = {"config": {"lr": 3e-4, "steps": 1000},
           "from": jax.process_index()} if jax.process_index() == 0 else None
    out = broadcast_object(obj)
    if verbose:
        print(f"[process {jax.process_index()}] broadcast -> {out}")
    return out


if __name__ == "__main__":
    demo_broadcast_object()
    demo_all_gather_objects()
    sync_processes()
    print("multihost demos ok "
          f"(processes={jax.process_count()})")
