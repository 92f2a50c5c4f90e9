"""Engine feature-composition matrix (VERDICT r1 #2).

Every marquee feature must compose: paged x int8-KV x TP x dp x speculative x
ragged admission x sliding window. Oracle: the engine under any configuration
must emit exactly the tokens of the solo greedy decode (itself pinned against
prefill logits in test_model.py). Reference analog: the composed feature
matrices of kernels/flash-attn/README.md:5-14.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leetcuda_tpu.models.llama import tiny_config, init_params
from leetcuda_tpu.engine import Engine, EngineConfig
from leetcuda_tpu.parallel.mesh import make_mesh, MeshConfig
from test_engine import solo_greedy

pytestmark = pytest.mark.slow  # full engine/model runs; default run skips (-m) — CI covers


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def draft(setup):
    cfg_d = tiny_config(n_layers=1, dim=128, n_heads=2, n_kv_heads=1,
                        ffn_dim=256)
    return init_params(jax.random.key(1), cfg_d), cfg_d


def run_matrix(cfg, params, ec, mesh=None, draft_model=None, n_prompts=3,
               max_new=6, seed=0):
    rng = np.random.default_rng(seed)
    prompts = [list(rng.integers(0, cfg.vocab_size, n))
               for n in rng.integers(4, 14, n_prompts)]
    eng = Engine(params, cfg, ec, mesh=mesh, draft=draft_model)
    got = eng.run(prompts, max_new=max_new)
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(params, cfg, prompt, max_new)
        assert got[uid] == want, (uid, got[uid], want)
    return eng


def test_paged_int8kv_tp(setup):
    """paged + int8 KV + tensor parallel — the realistic server config the
    r1 asserts forbade."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8"), mesh=mesh)


def test_spec_paged(setup, draft):
    """speculative + paged caches."""
    cfg, params = setup
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        spec_k=3), draft_model=draft)


def test_spec_kv_quant(setup, draft):
    """speculative + int8 KV (verify chunk reads the quantized cache)."""
    cfg, params = setup
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, kv_quant="int8",
        spec_k=3), draft_model=draft)


def test_spec_tp(setup, draft):
    """speculative + TP mesh (sharded verify, replicated draft)."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, spec_k=3),
        mesh=mesh, draft_model=draft)


def test_dp_tp_engine(setup):
    """dp=2 x tp=2 serving: ragged admission pads the prefill batch to dp."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=2), devices=jax.devices()[:4])
    run_matrix(cfg, params, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16), mesh=mesh)


def test_dp_sp_tp_engine(setup):
    """dp=2 x sp=2 x tp=2 serving (r2 fence `dp>1 requires sp=1` removed):
    admission runs the sequence-sharded Ulysses prefill in dp-padded groups;
    decode replicates over sp. Token-exact vs solo greedy."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=jax.devices()[:8])
    run_matrix(cfg, params, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16), mesh=mesh)


def test_dp_sp_paged_int8(setup):
    """dp=2 x sp=2 + paged pool + int8 KV: the sp-sharded prefill's K/V
    slices insert into a head-sharded quantized pool."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=jax.devices()[:8])
    run_matrix(cfg, params, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8"), mesh=mesh)


def test_moe_engine_paged_tp(setup):
    """Mixtral-style MoE model served by the Engine: paged pool + TP mesh.
    Routed-expert FFN rides the same decode path (layer["moe"] via
    _proj_mlp); generous capacity so prefill/decode routing agree and the
    greedy stream is deterministic."""
    cfg = tiny_config(n_experts=4, expert_topk=2, capacity_factor=4.0)
    params = init_params(jax.random.key(0), cfg)
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16),
        mesh=mesh)


def test_everything_at_once(setup, draft):
    """The full stack: paged + int8 KV + TP + dp + speculative + ragged
    admission + sliding window, in one engine."""
    cfg = tiny_config(sliding_window=24)
    params = init_params(jax.random.key(0), cfg)
    d_params, d_cfg0 = draft
    d_cfg = tiny_config(n_layers=1, dim=128, n_heads=2, n_kv_heads=1,
                        ffn_dim=256, sliding_window=24)
    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=2), devices=jax.devices()[:4])
    run_matrix(cfg, params, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8", spec_k=2), mesh=mesh,
        draft_model=(d_params, d_cfg), max_new=8)


def test_int4_paged_spec(setup, draft):
    """int4 weights x paged KV x speculative decoding."""
    from leetcuda_tpu.models.llama import quantize_params

    cfg, params = setup
    q4 = quantize_params(params, dtype="int4")
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (6, 12)]
    eng = Engine(q4, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        spec_k=2), draft=draft)
    got = eng.run(prompts, max_new=5)
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(q4, cfg, prompt, 5)
        assert got[uid] == want, (uid, got[uid], want)


def test_prefix_cache_tp(setup):
    """prefix caching x TP mesh (r2 fence engine.py:211 removed): a second
    prompt sharing the first's page chain adopts pages and suffix-prefills
    through the SHARDED chunk kernel, still token-exact."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    rng = np.random.default_rng(3)
    shared = list(rng.integers(0, cfg.vocab_size, 48))
    prompts = [shared + list(rng.integers(0, cfg.vocab_size, 7)),
               shared + list(rng.integers(0, cfg.vocab_size, 5))]
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefix_cache=True), mesh=mesh)
    eng.run([prompts[0]], max_new=6)   # registers the shared page chain
    got = eng.run(prompts, max_new=6)  # both adopt it, suffix-only prefill
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(params, cfg, prompt, 6)
        assert got[uid] == want, (uid, got[uid], want)
    assert eng.pm.hits > 0  # the shared pages really were adopted


def test_chunked_prefill_tp(setup):
    """chunked prefill x TP mesh (r2 fence engine.py:245 removed)."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (70, 55)]
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=32), mesh=mesh)
    got = eng.run(prompts, max_new=6)
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(params, cfg, prompt, 6)
        assert got[uid] == want, (uid, got[uid], want)


def test_int4_tp(setup):
    """int4 weights x TP mesh (r2 fence llama.py:281 removed): packs are
    storage-sharded; GSPMD reconstructs the canonical split-halves layout
    around the w4a16 kernel."""
    from leetcuda_tpu.models.llama import quantize_params

    cfg, params = setup
    q4 = quantize_params(params, dtype="int4")
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (6, 11)]
    eng = Engine(q4, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16),
        mesh=mesh)
    got = eng.run(prompts, max_new=5)
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(q4, cfg, prompt, 5)
        assert got[uid] == want, (uid, got[uid], want)


def test_everything_with_prefix(setup, draft):
    """The r3 full stack: paged + int8 KV + TP + dp + speculative + sliding
    window + PREFIX CACHE + CHUNKED PREFILL in one engine. The dp=2 mesh
    exercises the dummy-row-padded admission chunk (_chunk_admit)."""
    cfg = tiny_config(sliding_window=24)
    params = init_params(jax.random.key(0), cfg)
    d_params, _ = draft
    d_cfg = tiny_config(n_layers=1, dim=128, n_heads=2, n_kv_heads=1,
                        ffn_dim=256, sliding_window=24)
    mesh = make_mesh(MeshConfig(dp=2, sp=1, tp=2), devices=jax.devices()[:4])
    rng = np.random.default_rng(6)
    shared = list(rng.integers(0, cfg.vocab_size, 32))
    prompts = [shared + list(rng.integers(0, cfg.vocab_size, n))
               for n in (40, 9, 3)]
    eng = Engine(params, cfg, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8", spec_k=2, prefix_cache=True, prefill_chunk=32),
        mesh=mesh, draft=(d_params, d_cfg))
    eng.run([prompts[0]], max_new=6)   # registers the shared page chain
    got = eng.run(prompts, max_new=6)
    # oracle: the same paged+chunked+int8+window engine WITHOUT mesh/spec/
    # prefix — the identical quantization path. int8 KV is lossy and these
    # prompts hit a genuine argmax near-tie (top-2 gap 0.0014 logits at the
    # 41-token prompt's last position), so any cross-path oracle (solo
    # full-precision, or even plain-vs-chunked int8) legitimately flips.
    # The composition claim tested: mesh + speculative + prefix adoption
    # add ZERO token drift on top of the single-shard chunked engine.
    ref = Engine(params, cfg, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8", prefill_chunk=32))
    want = ref.run(prompts, max_new=6)
    for g, w in zip(sorted(got), sorted(want)):
        assert got[g] == want[w], (g, got[g], want[w])
    assert eng.pm.hits > 0


def test_everything_three_axis(setup, draft):
    """The full stack on ALL THREE serving axes at once: dp=2 x sp=2 x tp=2
    + paged + int8 KV + speculative + sliding window. sp>1 forces the
    Ulysses-prefill admission groups under dp padding."""
    cfg = tiny_config(sliding_window=24)
    params = init_params(jax.random.key(0), cfg)
    d_params, _ = draft
    d_cfg = tiny_config(n_layers=1, dim=128, n_heads=2, n_kv_heads=1,
                        ffn_dim=256, sliding_window=24)
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=jax.devices()[:8])
    run_matrix(cfg, params, EngineConfig(
        slots=4, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8", spec_k=2), mesh=mesh,
        draft_model=(d_params, d_cfg), max_new=8)


def test_fp8kv_paged_tp_matches_singleshard(setup):
    """fp8 KV (the north-star cache dtype) composes with paged pools and a TP
    mesh. fp8 is lossy, so the oracle is the single-shard fp8-KV paged engine
    — identical quantization path, so tokens must match exactly; TP/paging
    must be numerics-neutral."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (6, 11, 9)]

    def run(mesh):
        eng = Engine(params, cfg, EngineConfig(
            slots=2, max_seq=256, prefill_bucket=16, paged=True,
            page_size=16, kv_quant="fp8"), mesh=mesh)
        return eng.run(prompts, max_new=6)

    want = run(None)
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    got = run(mesh)
    assert got == want, (got, want)


def test_spec_sampled_near_greedy_exact(setup, draft):
    """Stochastic speculative serving (rejection sampling) at temperature
    ~0: the warped distribution is one-hot at the argmax, so the sampled
    engine must reproduce the greedy stream token-for-token — while running
    entirely through the _spec_verdict rejection path."""
    from leetcuda_tpu.engine.sampling import make_sampler

    cfg, params = setup
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (6, 12)]
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, spec_k=3),
        draft=draft, sample_fn=make_sampler(temperature=1e-4))
    got = eng.run(prompts, max_new=6)
    for uid, prompt in zip(sorted(got), prompts):
        want = solo_greedy(params, cfg, prompt, 6)
        assert got[uid] == want, (uid, got[uid], want)
    # at T->0 the accept rule degenerates to argmax agreement, so the
    # stochastic path's acceptance must equal the greedy engine's exactly
    ref = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, spec_k=3), draft=draft)
    ref.run(prompts, max_new=6)
    assert eng.acceptance_rate == ref.acceptance_rate


def test_spec_sampled_paged_int8(setup, draft):
    """Sampled speculative x paged x int8-KV: the rejection path composes
    with the quantized paged verify chunk. Tokens are stochastic (T=0.9,
    top_k) — assert validity, liveness, and a sane acceptance rate."""
    from leetcuda_tpu.engine.sampling import make_sampler

    cfg, params = setup
    rng = np.random.default_rng(13)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (7, 10)]
    eng = Engine(params, cfg, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8", spec_k=2),
        draft=draft, sample_fn=make_sampler(temperature=0.9, top_k=32))
    got = eng.run(prompts, max_new=6)
    assert sorted(got) and all(len(v) == 6 for v in got.values())
    for toks in got.values():
        assert all(0 <= t < cfg.vocab_size for t in toks)
    assert 0.0 <= eng.acceptance_rate <= 1.0


def test_gemma2_engine_paged_chunked_tp(setup):
    """Gemma2-style model (softcaps + alternating local/global layers +
    sandwich norms) served end-to-end: paged pool + TP + chunked prefill,
    so decode_chunk's per-layer windows and capped kernels are on the hot
    path. Token-exact vs solo greedy. (Plain KV: the final softcap
    compresses logit gaps, so int8-KV quantization noise flips near-tie
    tokens — a tolerance artifact, not a kernel property.)"""
    cfg = tiny_config(sliding_window=24, alt_window=True, attn_softcap=30.0,
                      final_softcap=20.0, query_scale=0.15,
                      sandwich_norms=True)
    params = init_params(jax.random.key(4), cfg)
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=32), mesh=mesh)


def test_sinks_engine_tp(setup):
    """GPT-OSS-style attention-sink model served end-to-end (plain slot
    caches, TP mesh): multi-prompt admission takes the RAGGED path, whose
    with_lse kernel + sigmoid(lse - sink) correction must match the
    per-sequence decode stream token-exactly."""
    cfg = tiny_config(attn_sinks=True)
    params = init_params(jax.random.key(8), cfg)
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16), mesh=mesh)


def test_glm_style_engine_paged(setup):
    """GLM-4-style switches (partial interleaved rotary + sandwich norms)
    through the Engine: paged pool + chunked prefill, token-exact."""
    cfg = tiny_config(glm_rope_dim=32, sandwich_norms=True)
    params = init_params(jax.random.key(9), cfg)
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        prefill_chunk=32))


def test_sinks_full_matrix(setup, draft):
    """Sinks x paged x int8-KV x TP x speculative x chunked prefill x
    prefix cache — the r2 fence (sinks forced plain slot caches) is gone:
    every decode/chunk kernel has a with_lse variant and the
    sigmoid(lse - sink) correction rides outside the kernels."""
    cfg = tiny_config(attn_sinks=True)
    params = init_params(jax.random.key(11), cfg)
    d_params, d_cfg = draft
    mesh = make_mesh(MeshConfig(dp=1, sp=1, tp=2), devices=jax.devices()[:2])
    run_matrix(cfg, params, EngineConfig(
        slots=2, max_seq=256, prefill_bucket=16, paged=True, page_size=16,
        kv_quant="int8", spec_k=2, prefill_chunk=32, prefix_cache=True),
        mesh=mesh, draft_model=(d_params, d_cfg))
