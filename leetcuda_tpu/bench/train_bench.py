"""Training throughput benchmark: tokens/s and MFU for the flagship model.

MFU = model FLOPs / wall / peak, with the standard 6·P FLOPs-per-token model
(fwd 2P + bwd 4P) plus the attention term 12·L·H·Dh·S² (causal halved).

    python -m leetcuda_tpu.bench.train_bench [--batch 8] [--seq 2048]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.llama import ModelConfig, init_params, make_train_step
from leetcuda_tpu.utils.roofline import detect_chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    cfg = ModelConfig(dim=args.dim, n_layers=args.layers)
    params = init_params(jax.random.key(0), cfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params)
                   if hasattr(x, "size"))
    init_opt, step = make_train_step(cfg, learning_rate=1e-4)
    opt_state = init_opt(params)
    B, S = args.batch, args.seq
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (B, S)), jnp.int32)

    state = [params, opt_state]

    def run(n):
        p, s = state
        loss = None
        for _ in range(n):
            p, s, loss = step(p, s, tokens)
        state[0], state[1] = p, s  # donated buffers: never reuse stale state
        return float(loss)  # readback fences the chain (params carry serializes)

    run(2)  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(args.steps)
        best = min(best, time.perf_counter() - t0)

    toks = B * S * args.steps
    toks_per_s = toks / best
    Dh, H, L = cfg.head_dim, cfg.n_heads, cfg.n_layers
    flops_per_tok = 6 * n_params + 3 * 2 * 2 * L * H * Dh * S / 2  # attn causal
    mfu = toks_per_s * flops_per_tok / (
        detect_chip().peak_tflops(jnp.bfloat16) * 1e12)
    print(f"model {n_params/1e6:.0f}M params, B={B} S={S}: "
          f"{toks_per_s:,.0f} tok/s, "
          f"{toks_per_s * flops_per_tok / 1e12:.1f} TFLOPS, "
          f"MFU {100 * mfu:.1f}% ({detect_chip().name})")


if __name__ == "__main__":
    main()
