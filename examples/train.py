"""Training example: sharded AdamW over a (dp, sp, tp) mesh with
checkpoint/resume.

    python examples/train.py --steps 20
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train.py --dp 2 --sp 2 --tp 2
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
    ap.add_argument("--ckpt", default="/tmp/leetcuda_tpu_ckpt")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    cfg = tiny_config(n_experts=args.moe)
    params = init_params(jax.random.key(0), cfg)

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

    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (max(4, 2 * args.dp), 128)), jnp.int32)
    for i in range(start, start + args.steps):
        params, opt_state, loss = step(params, opt_state, tokens)
        print(f"step {i}: loss {float(loss):.4f}")
    save_checkpoint(args.ckpt, params, opt_state, step=start + args.steps)
    print(f"checkpoint -> {args.ckpt}")


if __name__ == "__main__":
    main()
