"""Training example: sharded AdamW over a (dp, sp, tp) mesh with
checkpoint/resume, optionally fed by the native C++ shard loader and/or
run through the GPipe pipeline trainer.

    python examples/train.py --steps 20
    python examples/train.py --steps 20 --loader          # C++ data path
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train.py --dp 2 --sp 2 --tp 2
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train.py --pp 4 --dp 2 --loader   # pipeline x data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.llama import tiny_config, init_params, make_train_step
from leetcuda_tpu.models.checkpoint import save_checkpoint, restore_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--moe", type=int, default=0, help="number of experts")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline stages (GPipe train step; composes with "
                         "--dp as a pp x dp mesh, excludes sp/tp here)")
    ap.add_argument("--loader", action="store_true",
                    help="stream batches from the native C++ shard loader "
                         "(writes a synthetic learnable corpus on first use)")
    ap.add_argument("--data", default="/tmp/leetcuda_tpu_shards")
    ap.add_argument("--ckpt", default="/tmp/leetcuda_tpu_ckpt")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    cfg = tiny_config(n_experts=args.moe,
                      n_layers=4 if args.pp > 1 else 2)
    params = init_params(jax.random.key(0), cfg)
    B = max(4, 2 * args.dp)

    batches = None
    if args.loader:
        # synthetic but LEARNABLE corpus: a fixed-permutation walk, so the
        # next token is a function of the current one and loss falls fast
        import pathlib

        from leetcuda_tpu.data import TokenLoader, write_token_shard

        d = pathlib.Path(args.data)
        d.mkdir(parents=True, exist_ok=True)
        shards = sorted(d.glob("shard*.bin"))
        if not shards:
            rng = np.random.default_rng(0)
            perm = rng.permutation(cfg.vocab_size)
            x = np.zeros(200_000, np.int64)
            for t in range(1, x.size):
                x[t] = perm[x[t - 1]]
            shards = [write_token_shard(d / f"shard{i}.bin", part)
                      for i, part in enumerate(np.array_split(x, 3))]
            print(f"wrote {len(shards)} shards -> {d}")
        # defer construction until the resume step is known: the crop
        # stream is a function of (seed, step), so start_step=N continues
        # the exact data order (leetcuda_tpu/data/loader.py contract)
        def make_batches(start):
            dl = TokenLoader(shards, seq_len=128, batch=B, seed=0,
                             start_step=start)
            print(f"native loader: {dl.total_tokens} tokens "
                  f"(start_step={start})")
            return iter(dl)

        batches = "pending"

    if args.pp > 1:
        from jax.sharding import Mesh
        from leetcuda_tpu.parallel.pipeline import (
            split_llama_stages, shard_stage_params, merge_llama_stages,
            make_pp_train_step)

        n = args.pp * args.dp
        pmesh = Mesh(np.asarray(jax.devices()[:n]).reshape(args.pp, args.dp),
                     axis_names=("pp", "dp"))
        outer, staged = split_llama_stages(params, args.pp)
        staged = shard_stage_params(staged, pmesh)
        init_opt, pstep = make_pp_train_step(
            cfg, pmesh, n_microbatches=2,
            batch_axis="dp" if args.dp > 1 else None, learning_rate=1e-3)
        state, opt_state = (outer, staged), init_opt((outer, staged))
        if batches == "pending":
            batches = make_batches(0)
        for i in range(args.steps):
            tokens = (jnp.asarray(next(batches)[:, :128]) if batches else
                      jnp.asarray(np.random.default_rng(i).integers(
                          0, cfg.vocab_size, (B, 128)), jnp.int32))
            state, opt_state, loss = pstep(state, opt_state, tokens)
            print(f"step {i}: loss {float(loss):.4f}  (pp={args.pp})")
        params = merge_llama_stages(*state)
        print("merged pp stages back to the flat tree "
              f"({len(params['layers'])} layers)")
        return

    mesh = None
    if args.dp * args.sp * args.tp > 1:
        from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig

        n = args.dp * args.sp * args.tp
        mesh = make_mesh(MeshConfig(dp=args.dp, sp=args.sp, tp=args.tp),
                         devices=jax.devices()[:n])

    init_opt, step = make_train_step(cfg, mesh=mesh, learning_rate=1e-3)
    opt_state = init_opt(params)
    start = 0
    if args.resume:
        params, opt_state, start = restore_checkpoint(
            args.ckpt, like=(params, opt_state))
        print(f"resumed at step {start}")

    if batches == "pending":
        batches = make_batches(start)
    for i in range(start, start + args.steps):
        tokens = (jnp.asarray(next(batches)[:, :128]) if batches else
                  jnp.asarray(np.random.default_rng(0).integers(
                      0, cfg.vocab_size, (B, 128)), jnp.int32))
        params, opt_state, loss = step(params, opt_state, tokens)
        print(f"step {i}: loss {float(loss):.4f}")
    save_checkpoint(args.ckpt, params, opt_state, step=start + args.steps)
    print(f"checkpoint -> {args.ckpt}")


if __name__ == "__main__":
    main()
