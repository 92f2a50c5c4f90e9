"""Real multi-process (multi-"host") execution — the DCN tier, actually run.

The reference's distributed suite launches N OS processes that init a process
group and exchange tensors (`others/pytorch/distributed/test_dist_all.py:17-37`
spawns ranks via mp.spawn/torchrun). The TPU-native analog is JAX
multi-controller: every process calls `jax.distributed.initialize(coordinator,
N, rank)`, sees the global device set, and participates in the same SPMD
computations; DCN collectives (here: loopback gRPC between the processes)
carry the cross-host axis.

This tool spawns N=2 worker processes, each with 4 virtual CPU devices, and
proves on the resulting 8-device 2-process world:

  (a) hybrid (dcn dp=2) x (ici tp=4) mesh: the sharded train step runs, loss
      finite and byte-identical across processes (grads all-reduce over DCN),
  (b) TP decode token-exact vs a true single-process single-device reference
      (computed by the parent before any distributed init),
  (c) parallel/multihost.py object collectives on the process_count==2 branch
      (broadcast / all-gather / barrier) — the code path a single process can
      never reach.

Run:  python tools/dryrun_multiprocess.py          (parent; spawns workers)
      -> writes MULTIPROC.json {"ok": true, ...} at the repo root.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
N_PROCS = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# --- worker ------------------------------------------------------------------


def worker(coord: str, rank: int, ref_path: str, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{LOCAL_DEVICES}").strip()
    import jax

    # the axon sitecustomize pins jax_platforms="axon,cpu"; this must be a
    # pure-CPU multi-process world
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=N_PROCS, process_id=rank)
    assert jax.process_count() == N_PROCS, jax.process_count()
    assert len(jax.devices()) == N_PROCS * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from leetcuda_tpu.models.llama import (
        tiny_config, init_params, make_train_step, shard_llama_params)
    from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig
    from leetcuda_tpu.parallel import multihost

    results = {"rank": rank, "process_count": jax.process_count()}

    # (a) hybrid dcn_dp=2 x (sp=2, tp=2) train step (tiny config has 2 KV
    # heads, so tp<=2; sp exercises the Ulysses axis across the hybrid mesh).
    # jax.devices() orders process 0's locals first, so reshape(2, 2, 2) puts
    # dp across the process (DCN) boundary and sp/tp within each process.
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    assert {d.process_index for d in mesh.devices[0].ravel()} == {0}
    assert {d.process_index for d in mesh.devices[1].ravel()} == {1}

    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    init_opt, step = make_train_step(cfg, mesh=mesh, learning_rate=1e-3)
    opt_state = init_opt(params)
    tokens_np = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 128)).astype(np.int32)
    tokens = jax.device_put(tokens_np,
                            NamedSharding(mesh, P("dp", None)))
    params2, opt_state, loss = step(params, opt_state, tokens)
    jax.block_until_ready(loss)
    loss = float(loss)  # replicated -> addressable everywhere
    assert np.isfinite(loss), loss
    results["train_loss"] = loss

    # (b) decode on the dcn_dp=2 x tp=4 mesh, token-exact vs the parent's
    # single-process single-device reference
    from leetcuda_tpu.engine import generate_scan

    ref = np.load(ref_path)
    wide = tiny_config(n_heads=8, n_kv_heads=8)
    wparams = init_params(jax.random.key(3), wide)
    prompts_np = np.random.default_rng(3).integers(
        0, wide.vocab_size, (4, 16)).astype(np.int32)
    dmesh = make_mesh(MeshConfig(dp=2, sp=1, tp=4))
    sh = shard_llama_params(wparams, wide, dmesh)
    prompts = jax.device_put(prompts_np,
                             NamedSharding(dmesh, P("dp", None)))
    toks = generate_scan(sh, wide, prompts, 6, mesh=dmesh)
    if not toks.is_fully_replicated:
        # multihost_utils is NOT lazily exposed on jax.experimental —
        # import the submodule explicitly
        from jax.experimental import multihost_utils as mhu
        toks = np.asarray(mhu.process_allgather(toks, tiled=True))
    else:
        toks = np.asarray(
            jax.device_get(jax.jit(lambda x: x, out_shardings=NamedSharding(
                dmesh, P()))(toks)))
    np.testing.assert_array_equal(toks, ref)
    results["decode_token_exact"] = True

    # (c) the multihost object collectives, process_count == 2 for real
    obj = {"rank": rank, "devices": len(jax.local_devices())}
    gathered = multihost.all_gather_objects(obj)
    assert [g["rank"] for g in gathered] == [0, 1], gathered
    bcast = multihost.broadcast_object(
        {"from": 0, "cfg": [1, 2, 3]} if rank == 0 else None)
    assert bcast == {"from": 0, "cfg": [1, 2, 3]}, bcast
    multihost.sync_processes("dryrun-mp")
    results["object_collectives"] = {"gathered_ranks":
                                     [g["rank"] for g in gathered],
                                     "broadcast": bcast}

    with open(out_path, "w") as f:
        json.dump(results, f)
    print(f"[rank {rank}] ok: loss={loss:.4f} decode exact, "
          f"collectives over {jax.process_count()} processes", flush=True)


# --- parent ------------------------------------------------------------------


def parent() -> dict:
    # single-process, single-device decode reference BEFORE any distributed
    # world exists: plain CPU jax in this process
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from leetcuda_tpu.models.llama import tiny_config, init_params
    from leetcuda_tpu.engine import generate_scan

    wide = tiny_config(n_heads=8, n_kv_heads=8)
    wparams = init_params(jax.random.key(3), wide)
    prompts = jnp.asarray(np.random.default_rng(3).integers(
        0, wide.vocab_size, (4, 16)), jnp.int32)
    ref = np.asarray(generate_scan(wparams, wide, prompts, 6))

    tmp = tempfile.mkdtemp(prefix="dryrun_mp_")
    ref_path = os.path.join(tmp, "ref_tokens.npy")
    np.save(ref_path, ref)

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs, outs = [], []
    for rank in range(N_PROCS):
        out_path = os.path.join(tmp, f"rank{rank}.json")
        outs.append(out_path)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--coord", coord, "--rank", str(rank),
             "--ref", ref_path, "--out", out_path],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        logs.append(out)
        if p.returncode != 0:
            for r, l in enumerate(logs):
                print(f"--- rank {r} log ---\n{l}")
            raise SystemExit(f"rank {rank} failed ({p.returncode})")
    per_rank = [json.load(open(o)) for o in outs]
    assert per_rank[0]["train_loss"] == per_rank[1]["train_loss"], \
        "DCN grad all-reduce must make the loss identical on every process"
    summary = {
        "ok": True,
        "processes": N_PROCS,
        "devices_per_process": LOCAL_DEVICES,
        "mesh": "train: dcn_dp=2 x sp=2 x tp=2; decode: dcn_dp=2 x tp=4",
        "train_loss": per_rank[0]["train_loss"],
        "decode_token_exact": all(r["decode_token_exact"] for r in per_rank),
        "object_collectives": per_rank[0]["object_collectives"],
    }
    with open(os.path.join(REPO, "MULTIPROC.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    if "--worker" in sys.argv:
        rest = [a for a in sys.argv[1:] if a != "--worker"]
        args = dict(zip(rest[0::2], rest[1::2]))
        worker(args["--coord"], int(args["--rank"]), args["--ref"],
               args["--out"])
    else:
        parent()
