"""Kernel-level RDMA ring collectives — Pallas ``make_async_remote_copy`` over ICI.

The lax-collective layer (collectives.py) lets XLA schedule transfers; this module
is the hand-rolled tier the reference reaches with NCCL P2P (test_p2p.py) — direct
chip-to-chip DMA from inside a kernel, double-buffered so the wire stays busy
(SNIPPETS.md pattern / pallas guide "Ring Collectives"). These primitives are the
building blocks for custom overlap schedules (e.g. all-gather-matmul fusion).

All run under shard_map on a 1-D axis; CPU interpret mode emulates the RDMA, so
the suite tests them on the 8-device virtual mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import interpret_default


def _right_permute_kernel(axis, in_ref, out_ref, send_sem, recv_sem):
    me = jax.lax.axis_index(axis)
    right = jax.lax.rem(me + 1, jax.lax.axis_size(axis))
    rdma = pltpu.make_async_remote_copy(
        src_ref=in_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma.start()
    rdma.wait()


def ppermute_pallas(x, mesh: Mesh, axis: str = "x"):
    """Right-rotate shards via direct RDMA (test_p2p.py analog, kernel tier)."""

    def local(x):
        return pl.pallas_call(
            functools.partial(_right_permute_kernel, axis),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=0),
            interpret=interpret_default(),
        )(x)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                   check_vma=False)
    return jax.jit(fn)(x)


def _ring_all_gather_kernel(axis, n_dev, in_ref, out_ref, comm, send_sem,
                            recv_sem, copy_sem):
    me = jax.lax.axis_index(axis)
    right = jax.lax.rem(me + 1, n_dev)
    chunk = in_ref.shape[0]

    # deposit the local chunk into the output and into comm slot 0
    own = pltpu.make_async_copy(
        in_ref, out_ref.at[pl.ds(me * chunk, chunk)], copy_sem)
    own.start()
    seed = pltpu.make_async_copy(in_ref, comm.at[0], copy_sem)
    # sequential local DMAs on one semaphore: wait each before reuse
    own.wait()
    seed.start()
    seed.wait()

    def step(s, _):
        send_slot = jax.lax.rem(s, 2)
        recv_slot = jax.lax.rem(s + 1, 2)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm.at[send_slot], dst_ref=comm.at[recv_slot],
            send_sem=send_sem.at[send_slot], recv_sem=recv_sem.at[recv_slot],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()
        rdma.wait()
        src_dev = jax.lax.rem(me - s - 1 + n_dev, n_dev)
        put = pltpu.make_async_copy(
            comm.at[recv_slot], out_ref.at[pl.ds(src_dev * chunk, chunk)],
            copy_sem)
        put.start()
        put.wait()
        return 0

    jax.lax.fori_loop(0, n_dev - 1, step, 0)


def ring_all_gather_pallas(x, mesh: Mesh, axis: str = "x"):
    """All-gather via an RDMA ring: P-1 hops, each chunk travels one link per
    step (the bandwidth-optimal schedule the lax all_gather also lowers to —
    here explicit, as the base for fused/overlapped variants)."""
    n_dev = mesh.shape[axis]

    def local(x):
        chunk = x.shape[0]
        return pl.pallas_call(
            functools.partial(_ring_all_gather_kernel, axis, n_dev),
            out_shape=jax.ShapeDtypeStruct((n_dev * chunk,) + x.shape[1:],
                                           x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, chunk) + x.shape[1:], x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=1),
            interpret=interpret_default(),
        )(x)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(None),
                   check_vma=False)
    return jax.jit(fn)(x)
