"""Serving example: load (or random-init) a Llama, quantize, serve with the
continuous-batching engine — paged cache, sampling, stats.

    python examples/serve.py                 # random-init tiny model
    python examples/serve.py --model /path/to/hf-llama --tp 4
"""

import argparse

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
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    if args.model:
        from leetcuda_tpu.models.loader import load_llama

        cfg, params = load_llama(args.model)
    else:
        cfg = tiny_config(dtype=jnp.bfloat16)
        params = init_params(jax.random.key(0), cfg)
    if args.int8:
        params = quantize_params(fuse_params(params), dtype="int8")

    mesh = None
    if args.tp > 1:
        from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig

        mesh = make_mesh(MeshConfig(tp=args.tp),
                         devices=jax.devices()[:args.tp])

    sampler = (make_sampler(temperature=args.temperature, top_k=50)
               if args.temperature > 0 else None)
    eng = Engine(params, cfg,
                 EngineConfig(slots=4, max_seq=1024, paged=args.paged,
                              kv_quant=None),
                 **({"sample_fn": sampler} if sampler else {}),
                 mesh=mesh)

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (8, 16, 12)]
    uids = [eng.submit(p, max_new=16) for p in prompts]
    tick = 0
    while eng.waiting or eng.active:
        eng.step()
        tick += 1
        if tick % 8 == 0:
            print("stats:", eng.stats())
    for u in uids:
        print(f"request {u}: {eng.finished[u].generated}")


if __name__ == "__main__":
    main()
