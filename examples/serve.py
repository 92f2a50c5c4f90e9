"""Serving example: load (or random-init) a Llama, quantize, serve with the
continuous-batching engine — paged cache, prefix caching, chunked prefill,
speculative decoding, int4/int8 weights, int8 KV, TP, sampling, stats.

    python examples/serve.py                 # random-init tiny model
    python examples/serve.py --model /path/to/hf-llama --tp 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.engine import Engine, EngineConfig
from leetcuda_tpu.engine.sampling import make_sampler
from leetcuda_tpu.models.llama import (
    tiny_config, init_params, quantize_params, fuse_params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="HF Llama dir (safetensors)")
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--quant", choices=("none", "int8", "int4"),
                    default="none", help="weight-only quantization")
    ap.add_argument("--int8", action="store_true",
                    help="(alias for --quant int8)")
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--kv-quant", choices=("none", "int8"), default="none")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="adopt shared prompt prefixes (implies --paged)")
    ap.add_argument("--prefill-chunk", type=int, default=None,
                    help="cap prefill tokens per tick (implies --paged)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help="speculative decoding with a random tiny draft "
                         "(demo; real deployments pass a trained draft)")
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    if args.model:
        from leetcuda_tpu.models.loader import load_llama

        cfg, params = load_llama(args.model)
    else:
        cfg = tiny_config(dtype=jnp.bfloat16)
        params = init_params(jax.random.key(0), cfg)
    quant = "int8" if args.int8 else args.quant
    if quant != "none":
        params = quantize_params(fuse_params(params), dtype=quant)

    mesh = None
    if args.tp > 1:
        from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig

        mesh = make_mesh(MeshConfig(tp=args.tp),
                         devices=jax.devices()[:args.tp])

    sampler = (make_sampler(temperature=args.temperature, top_k=50)
               if args.temperature > 0 else None)
    paged = args.paged or args.prefix_cache or args.prefill_chunk is not None
    draft = None
    if args.spec_k:
        d_cfg = tiny_config(n_layers=1, dim=128, n_heads=2, n_kv_heads=1,
                            ffn_dim=256, vocab_size=cfg.vocab_size,
                            dtype=cfg.dtype)
        draft = (init_params(jax.random.key(1), d_cfg), d_cfg)
    eng = Engine(params, cfg,
                 EngineConfig(slots=4, max_seq=1024, paged=paged,
                              kv_quant=(None if args.kv_quant == "none"
                                        else args.kv_quant),
                              prefix_cache=args.prefix_cache,
                              prefill_chunk=args.prefill_chunk,
                              spec_k=args.spec_k),
                 **({"sample_fn": sampler} if sampler else {}),
                 mesh=mesh, draft=draft)

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (8, 16, 12)]
    uids = [eng.submit(p, max_new=16) for p in prompts]
    tick = 0
    while eng.waiting or eng.active or eng.filling:
        eng.step()
        tick += 1
        if tick % 8 == 0:
            print("stats:", eng.stats())
    for u in uids:
        print(f"request {u}: {eng.finished[u].generated}")


if __name__ == "__main__":
    main()
