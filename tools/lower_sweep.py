"""TPU-lowering sweep WITHOUT a chip: lower every registered op for the TPU
platform from a CPU-only session.

`jax.export(..., platforms=("tpu",))` runs the Pallas -> Mosaic kernel
GENERATION (grid/BlockSpec legality, scratch shapes, dtype legalization,
iota/layout rules) that interpret-mode tests never touch. What it does NOT
run is the Mosaic BACKEND compile — r3 proved the difference: the fp8 decode
rung lowered clean here, then Mosaic rejected its (1,bk)i1->(bk,1) reshape
on the chip ("Insertion of minor dim that is not a no-op only supported for
32-bit types", logs/r3_fp8verify.log). Hence two tiers in one tool:

    default   — lowering only (any CPU host; catches kernel-generation bugs)
    --mosaic  — lower AND run the Mosaic backend compile via
                jax.jit(fn).lower(...).compile() on the TPU backend. Needs
                a TPU backend attached (a chip, or the axon tunnel whose
                remote compile helper AOT-compiles chiplessly) but never
                executes anything. This tier catches the r3 fp8 class.

The validation ladder (SURVEY §4 upgraded to a real pyramid):

    pytest (interpret numerics) -> lower_sweep (kernel gen)
        -> lower_sweep --mosaic (backend compile) -> hw_sweep (run + numerics)

    python tools/lower_sweep.py [--mosaic] [--selftest] [--families ...]

Exit 0 iff every op passes its tier. --selftest compiles a deliberately
Mosaic-illegal canary kernel (the exact r3 i1-reshape pattern) and FAILS
unless the active tier rejects it — proof the gate has teeth.
LEETCUDA_TARGET_TPU=1 makes on_tpu() report True so kernels build exactly
as they would for the chip (interpret off, f16-compat upcasts active).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["LEETCUDA_TARGET_TPU"] = "1"

import argparse
import importlib

import jax

_MOSAIC = "--mosaic" in sys.argv  # needs the TPU backend: skip the cpu pin
if not _MOSAIC:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from hw_sweep import MODULES


def e2e_cases():
    """Composed model/engine/train paths at flagship-model shapes — kernels
    meet each other here at shapes the per-op sweep never builds (the
    Dh<128 rope lane-roll crash was exactly this class)."""
    import functools

    import jax.numpy as jnp

    from jax import export
    from leetcuda_tpu.engine.engine import decode_step_impl, _insert_kvs
    from leetcuda_tpu.engine.speculative import decode_chunk
    from leetcuda_tpu.models.llama import (
        ModelConfig, init_params, forward, init_kv_caches,
        init_paged_kv_caches, make_train_step)

    cfg = ModelConfig()  # flagship 0.8B
    B, S, MAX_SEQ = 8, 128, 2048
    PAGE, NPAGES = 128, B * MAX_SEQ // 128 + 1
    params = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.key(0))
    toks = jax.ShapeDtypeStruct((B, S), jnp.int32)
    tok1 = jax.ShapeDtypeStruct((B,), jnp.int32)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32)
    chunk = jax.ShapeDtypeStruct((B, 4), jnp.int32)

    def caches(quant):
        return jax.eval_shape(
            lambda: init_kv_caches(cfg, B, MAX_SEQ, quant=quant))

    yield ("prefill_forward",
           lambda: export.export(
               jax.jit(functools.partial(forward, cfg=cfg)),
               platforms=("tpu",))(params, toks))
    for quant in (None, "int8", "fp8"):
        yield (f"decode_step_{quant or 'bf16'}",
               lambda q=quant: export.export(
                   jax.jit(functools.partial(decode_step_impl, cfg=cfg)),
                   platforms=("tpu",))(params, tok1, caches(q), lens))
        yield (f"chunk_verify_{quant or 'bf16'}",
               lambda q=quant: export.export(
                   jax.jit(functools.partial(decode_chunk, cfg=cfg)),
                   platforms=("tpu",))(params, chunk, caches(q), lens))
    # paged pool: decode + chunk verify read through the page table
    table = jax.ShapeDtypeStruct((B, MAX_SEQ // PAGE), jnp.int32)
    for quant in (None, "int8"):
        pool = jax.eval_shape(lambda q=quant: init_paged_kv_caches(
            cfg, NPAGES, PAGE, quant=q))
        yield (f"decode_step_paged_{quant or 'bf16'}",
               lambda p=pool: export.export(
                   jax.jit(functools.partial(decode_step_impl, cfg=cfg)),
                   platforms=("tpu",))(params, tok1, p, lens,
                                       page_table=table))
        yield (f"chunk_verify_paged_{quant or 'bf16'}",
               lambda p=pool: export.export(
                   jax.jit(functools.partial(decode_chunk, cfg=cfg)),
                   platforms=("tpu",))(params, chunk, p, lens,
                                       page_table=table))

    kv = jax.ShapeDtypeStruct((B, cfg.n_kv_heads, S, cfg.head_dim),
                              jnp.bfloat16)
    yield ("insert_kvs",
           lambda: export.export(jax.jit(_insert_kvs), platforms=("tpu",))(
               caches(None), [(kv, kv) for _ in range(cfg.n_layers)],
               jax.ShapeDtypeStruct((), jnp.int32),
               jax.ShapeDtypeStruct((), jnp.int32)))

    def mla():
        from leetcuda_tpu.models.mla import (MLAConfig, init_mla_params,
                                             mla_decode_step, mla_prefill)

        mcfg = MLAConfig()  # DeepSeek-V2 ratios; latent D = 576
        mp = jax.eval_shape(lambda k: init_mla_params(k, mcfg),
                            jax.random.key(0))
        x = jax.ShapeDtypeStruct((B, S, mcfg.dim), mcfg.dtype)
        xt = jax.ShapeDtypeStruct((B, mcfg.dim), mcfg.dtype)
        lat = jax.ShapeDtypeStruct((B, 1, MAX_SEQ, mcfg.latent_dim),
                                   mcfg.dtype)
        export.export(jax.jit(functools.partial(mla_prefill, cfg=mcfg)),
                      platforms=("tpu",))(mp, x)
        export.export(jax.jit(functools.partial(mla_decode_step, cfg=mcfg)),
                      platforms=("tpu",))(mp, xt, lat, lens)
        # paged latent pool (block-table long-context serving)
        pool = jax.ShapeDtypeStruct((65, 1, 128, mcfg.latent_dim),
                                    mcfg.dtype)
        pt = jax.ShapeDtypeStruct((B, MAX_SEQ // 128), jnp.int32)
        export.export(jax.jit(functools.partial(mla_decode_step, cfg=mcfg)),
                      platforms=("tpu",))(mp, xt, pool, lens, page_table=pt)

    yield ("mla_prefill_and_absorbed_decode", mla)

    def train():
        _, step = make_train_step(cfg)
        import optax

        opt = jax.eval_shape(
            lambda: optax.adamw(1e-4).init(
                jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), params)))
        export.export(step, platforms=("tpu",))(
            params, opt, jax.ShapeDtypeStruct((8, 2048), jnp.int32))

    yield ("train_step_with_flash_bwd", train)

    def train_windowed():
        # Mistral-style: the banded FA-2 backward kernels lower for TPU
        wcfg = ModelConfig(sliding_window=1024)
        wparams = jax.eval_shape(lambda k: init_params(k, wcfg),
                                 jax.random.key(0))
        _, step = make_train_step(wcfg)
        import optax

        opt = jax.eval_shape(
            lambda: optax.adamw(1e-4).init(jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), wparams)))
        export.export(step, platforms=("tpu",))(
            wparams, opt, jax.ShapeDtypeStruct((8, 2048), jnp.int32))

    yield ("train_step_sliding_window_bwd", train_windowed)

    def gptoss_paths():
        # attention sinks: ragged with_lse prefill + sink-corrected decode
        scfg = ModelConfig(attn_sinks=True, alt_window=True,
                           sliding_window=1024,
                           rope_scaling=("yarn", 32.0, 32.0, 1.0, 4096,
                                         False, None))
        sparams = jax.eval_shape(lambda k: init_params(k, scfg),
                                 jax.random.key(0))
        from leetcuda_tpu.models.llama import forward_ragged

        export.export(
            jax.jit(functools.partial(forward_ragged, cfg=scfg)),
            platforms=("tpu",))(sparams, toks, lens)
        export.export(
            jax.jit(functools.partial(decode_step_impl, cfg=scfg)),
            platforms=("tpu",))(sparams, tok1,
                                jax.eval_shape(lambda: init_kv_caches(
                                    scfg, B, MAX_SEQ)), lens)

    yield ("gptoss_sinks_yarn_paths", gptoss_paths)

    def family_switches():
        # Gemma2-style: softcaps + alternating window + sandwich norms;
        # GLM4-style: partial interleaved rotary — the family switches
        # change which ops hit Mosaic (tanh caps, rope lane slices)
        gcfg = ModelConfig(attn_softcap=50.0, final_softcap=30.0,
                           query_scale=0.0883, alt_window=True,
                           sliding_window=1024, sandwich_norms=True)
        gparams = jax.eval_shape(lambda k: init_params(k, gcfg),
                                 jax.random.key(0))
        export.export(jax.jit(functools.partial(forward, cfg=gcfg)),
                      platforms=("tpu",))(gparams, toks)
        export.export(jax.jit(functools.partial(decode_step_impl, cfg=gcfg)),
                      platforms=("tpu",))(gparams, tok1,
                                          jax.eval_shape(
                                              lambda: init_kv_caches(
                                                  gcfg, B, MAX_SEQ)), lens)
        lcfg = ModelConfig(glm_rope_dim=64)
        lparams = jax.eval_shape(lambda k: init_params(k, lcfg),
                                 jax.random.key(0))
        export.export(jax.jit(functools.partial(forward, cfg=lcfg)),
                      platforms=("tpu",))(lparams, toks)

    yield ("family_switches_gemma2_glm4", family_switches)

    def multi_lora():
        # multi-tenant adapter mixing (one-hot einsums) on the decode path
        from leetcuda_tpu.models.lora import add_lora, stack_lora

        p = init_params(jax.random.key(0), ModelConfig(n_layers=2))
        singles = [add_lora(p, jax.random.key(i), rank=8) for i in range(4)]
        stacked = jax.eval_shape(lambda: stack_lora(singles))
        scfg = ModelConfig(n_layers=2)
        aids = jax.ShapeDtypeStruct((B,), jnp.int32)
        export.export(
            jax.jit(functools.partial(decode_step_impl, cfg=scfg)),
            platforms=("tpu",))(stacked, tok1,
                                jax.eval_shape(lambda: init_kv_caches(
                                    scfg, B, MAX_SEQ)), lens,
                                adapter_ids=aids)

    yield ("multi_lora_decode", multi_lora)

    # Meshed paths cross-lower for TPU over an AbstractMesh (no devices
    # needed): the GSPMD partitioning + shard_map collectives (ppermute ring,
    # Ulysses all-to-all) take the exact lowering route the chip would.
    from jax.sharding import AbstractMesh

    def meshed_decode():
        m = AbstractMesh((2, 2, 2), ("dp", "sp", "tp"))
        export.export(
            jax.jit(functools.partial(decode_step_impl, cfg=cfg, mesh=m)),
            platforms=("tpu",))(params, tok1, caches(None), lens)

    yield ("decode_step_mesh_dp2sp2tp2", meshed_decode)

    def meshed_prefill():
        m = AbstractMesh((2, 2, 2), ("dp", "sp", "tp"))
        export.export(
            jax.jit(functools.partial(forward, cfg=cfg, mesh=m)),
            platforms=("tpu",))(params, toks)

    yield ("prefill_ulysses_mesh_dp2sp2tp2", meshed_prefill)

    def pp_train():
        import optax

        from leetcuda_tpu.parallel.pipeline import (
            split_llama_stages, make_pp_train_step)

        m = AbstractMesh((4, 2), ("pp", "dp"))
        outer, staged = jax.eval_shape(
            lambda k: split_llama_stages(init_params(k, cfg), 4),
            jax.random.key(0))
        _, step = make_pp_train_step(cfg, m, n_microbatches=2,
                                     batch_axis="dp")
        tp_ = (outer, staged)
        opt = jax.eval_shape(
            lambda: optax.adamw(1e-4).init(jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tp_)))
        export.export(step, platforms=("tpu",))(
            tp_, opt, jax.ShapeDtypeStruct((8, 2048), jnp.int32))

    yield ("pp_dp_train_step", pp_train)


def _canary_illegal_kernel():
    """The exact r3 fp8-decode pattern Mosaic rejects on device: reshape a
    (1, bk) i1 mask to (bk, 1) — 'Insertion of minor dim that is not a no-op
    only supported for 32-bit types'. Lowering-only tiers PASS this; the
    --mosaic tier must FAIL it (that asymmetry is the r3 lesson)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bk = 128

    def kernel(x_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        valid = cols < 7
        o_ref[:] = jnp.where(valid.reshape(bk, 1), x_ref[:], 0.0)

    def fn(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((bk, bk), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    return fn, [jax.ShapeDtypeStruct((bk, bk), np.float32)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--e2e", action="store_true",
                    help="also lower composed model/engine/train paths")
    ap.add_argument("--mosaic", action="store_true",
                    help="run the Mosaic BACKEND compile per op (needs a TPU "
                         "backend; AOT only — nothing executes)")
    ap.add_argument("--selftest", action="store_true",
                    help="check the gate catches a known-Mosaic-illegal "
                         "canary kernel (fails in lowering-only mode by "
                         "design: that tier cannot see it)")
    args = ap.parse_args()

    for m in MODULES:
        importlib.import_module(f"leetcuda_tpu.{m}")
    from jax import export

    from leetcuda_tpu.core.registry import OPS
    from leetcuda_tpu.core.testing import make_args

    if args.mosaic:
        assert jax.devices()[0].platform == "tpu", \
            "--mosaic needs a TPU backend (chip or axon tunnel)"

        def check(fn, abstract):
            jax.jit(fn).lower(*abstract).compile()   # full Mosaic, no run
    else:
        def check(fn, abstract):
            export.export(jax.jit(fn), platforms=("tpu",))(*abstract)

    tier = "mosaic backend compile" if args.mosaic else "lowering only"
    print(f"{len(OPS)} registered ops; tier: {tier}")

    if args.selftest:
        fn, abstract = _canary_illegal_kernel()
        try:
            check(fn, abstract)
            print("selftest: canary NOT rejected — this tier cannot catch "
                  "Mosaic-illegal kernels" + (
                      " (FAIL)" if args.mosaic else " (expected: lowering "
                      "tier is blind to backend rules; use --mosaic)"))
            if args.mosaic:
                return 1
        except Exception as e:
            print(f"selftest: canary rejected as expected "
                  f"({type(e).__name__}: {str(e)[:120]})")

    rng = np.random.default_rng(0)
    passed = failed = skipped = 0
    failures = []
    for name in sorted(OPS):
        spec = OPS[name]
        if args.families and spec.family not in args.families:
            continue
        a = make_args(spec, rng)
        if a is None:
            skipped += 1
            continue
        abstract = [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                    for x in a]
        try:
            check(spec.fn, abstract)
            passed += 1
            if args.verbose:
                print(f"  ok   {name}")
        except Exception as e:
            failed += 1
            failures.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
            print(f"  FAIL {name}: {failures[-1][1]}")
    if args.e2e:
        for name, run in e2e_cases():
            try:
                run()
                passed += 1
                print(f"  ok   e2e:{name}")
            except Exception as e:
                failed += 1
                failures.append((name,
                                 f"{type(e).__name__}: {str(e)[:200]}"))
                print(f"  FAIL e2e:{name}: {failures[-1][1]}")
    print(f"lower sweep: {passed} lowered, {failed} failed, "
          f"{skipped} skipped")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
