"""Continuous-batching decode engine — the BASELINE.json north star.

The reference is a kernel corpus with no serving layer (SURVEY.md §5:
checkpoint/resume and model state "absent"); BASELINE.json extends it to an
"FP8-weight Llama-style decode with FP8 KV cache, continuous batching". This
module is that composition, TPU-style:

- **Static shapes everywhere.** A fixed pool of ``slots`` sequences shares one
  stacked KV cache (B = slots); per-slot ``lengths`` make the decode-attention
  kernel's bandwidth follow actual context (attention/decode.py clamps DMA to
  the valid prefix). No dynamic batch — a finished slot is simply re-admitted,
  which is what continuous batching means under XLA's compile-once model.
- **Prefill/decode split.** Admission runs the flash-attention prefill on the
  prompt (padded to a bucket size so only a few shapes ever compile) and
  scatters the returned per-layer K/V into the slot; steady state is one
  ``decode_step`` for all live slots per tick.
- **Quantization.** Weights may be weight-only fp8/int8 (models/llama.py
  ``quantize_params`` -> fused-dequant Pallas matmuls) and the KV cache may be
  int8/fp8 with per-(slot, head, position) scales (attention/decode.py).
- **In-place caches.** The hot jits donate the cache pytree AND every append
  is a dynamic-update-slice chain — donation alone is not enough: a batched
  scatter still copies the whole cache inside the step (docs/profiling.md
  §4b; fixing this was +62% decode throughput).

``generate_scan`` is the benchmark path: the whole greedy decode loop inside
one jit (lax.scan), removing the host round-trip per token — on the axon
tunnel that round-trip is ~30 ms, far above a decode step.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.llama import (
    ModelConfig, decode_step_impl, forward, init_kv_caches,
    shard_llama_params, shard_kv_caches)
from leetcuda_tpu.models.llama import _quantize_token_kv  # cache quant helper


@dataclasses.dataclass
class EngineConfig:
    slots: int = 8            # concurrent sequences = decode batch
    max_seq: int = 1024       # KV-cache capacity per slot
    prefill_bucket: int = 128 # prompts pad to a multiple of this
    kv_quant: str | None = None      # None | "int8" | "fp8"
    eos_id: int | None = None        # stop token (None = run to max_new)
    # paged KV cache (attention/paged.py): memory-dense serving — the pool can
    # hold fewer than slots*max_seq tokens; on pool exhaustion the youngest
    # sequence is preempted (pages released, request requeued for recompute)
    paged: bool = False
    # TPU sizing note: paged decode time ~ (base + 0.35us per page DMA) —
    # multi-page prefetch (G) doesn't help, page SIZE does (PAGED_SWEEP.json:
    # page128 278 GB/s, page256 460, page512 767 vs contiguous 924). At long
    # context prefer 256/512 (prefill_bucket and max_seq must be multiples);
    # 128 is the fragmentation-friendly default for short-seq serving.
    page_size: int = 128
    num_pages: int | None = None     # default: a full slots*max_seq pool + 1
    # speculative decoding: k draft proposals per tick verified by one
    # (k+1)-position target chunk (engine/speculative.py mechanics); requires
    # Engine(draft=(draft_params, draft_cfg)) and greedy sampling
    spec_k: int = 0
    # automatic prefix caching (requires paged=True; composes with the
    # serving mesh — admission chunks run the sharded chunk kernel): full
    # prompt pages are published to a refcounted trie; a request whose prompt
    # starts with a cached page chain adopts those pages and only its suffix
    # prefills (chunked prefill via attention/chunk.py). Evicts LRU when the
    # pool runs dry.
    prefix_cache: bool = False
    # bounded chunked prefill (requires paged=True): at most this many prompt
    # tokens are prefilled per engine tick (rounded up to prefill_bucket), so
    # a long prompt streams in across ticks instead of stalling every live
    # sequence's decode for one huge prefill — the vLLM chunked-prefill
    # latency control. None = whole-prompt admission.
    prefill_chunk: int | None = None


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]
    max_new: int
    generated: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    orig_prompt_len: int = 0  # fixed at submit; prompt grows on preemption
    n_filled: int = 0         # prompt tokens already in cache (chunked fill)

    def __post_init__(self):
        if not self.orig_prompt_len:
            self.orig_prompt_len = len(self.prompt)

    @property
    def context_len(self):
        return self.orig_prompt_len + len(self.generated)


from leetcuda_tpu.engine.sampling import greedy as _greedy

# Max suffix tokens per _chunk_prefill call during prefix-cache admission
# (VMEM scratch in attention/chunk.py scales with H*T; 1024 keeps the
# worst realistic config, H=32 D=128, near ~35MB of scratch).
_SUFFIX_T_CAP = 1024


def _insert_kvs(caches, kvs, slot, length):
    """Scatter prefill K/V ((Bp, Hkv, S_pad, Dh) per layer) into the stacked
    caches starting at slot ``slot`` (covers both the engine's Bp=1 admission
    and generate_scan's whole-batch insert at slot 0). Positions >= length are
    garbage but unreachable: decode attention masks by ``lengths`` and later
    appends overwrite them in order."""
    new = []
    for cache, (k, v) in zip(caches, kvs):
        c = dict(cache)
        if "k_scale" in cache:
            kq, ks = _quantize_token_kv(k, cache["k"].dtype)  # ks (Bp, Hkv, S)
            vq, vs = _quantize_token_kv(v, cache["v"].dtype)
            c["k"] = jax.lax.dynamic_update_slice(cache["k"], kq,
                                                  (slot, 0, 0, 0))
            c["v"] = jax.lax.dynamic_update_slice(cache["v"], vq,
                                                  (slot, 0, 0, 0))
            c["k_scale"] = jax.lax.dynamic_update_slice(
                cache["k_scale"], ks, (slot, 0, 0))
            c["v_scale"] = jax.lax.dynamic_update_slice(
                cache["v_scale"], vs, (slot, 0, 0))
        else:
            c["k"] = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (slot, 0, 0, 0))
            c["v"] = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (slot, 0, 0, 0))
        new.append(c)
    return new


def _insert_kvs_paged(caches, kvs, phys_pages, page):
    """Write one sequence's prefill K/V ((1, Hkv, S_pad, Dh) per layer) into
    its physical pages (phys_pages (S_pad/page,) ids, same table all layers)
    as a per-page dynamic-update-slice chain — a pool-indexed scatter copies
    the whole pool per admission on TPU (see llama._dus_token). Quantized
    pools also get their per-position scale chunks."""

    def dus_pages(pool, per_page):
        # per_page (n, Hkv, page[, D]); one in-place DUS per physical page
        per_page = per_page.astype(pool.dtype)
        for j in range(per_page.shape[0]):
            pool = jax.lax.dynamic_update_slice(
                pool, per_page[j:j + 1],
                (phys_pages[j], 0, 0, 0)[: pool.ndim])
        return pool

    new = []
    for cache, (k, v) in zip(caches, kvs):
        _, Hkv, S_pad, D = k.shape
        n = S_pad // page

        def chunks(x):
            return x[0].reshape(Hkv, n, page, D).transpose(1, 0, 2, 3)

        c = {}
        if "k_scales" in cache:
            kq, ks = _quantize_token_kv(k, cache["k_pages"].dtype)
            vq, vs = _quantize_token_kv(v, cache["v_pages"].dtype)

            def schunks(s):  # (1, Hkv, S_pad) -> (n, Hkv, page)
                return s[0].reshape(Hkv, n, page).transpose(1, 0, 2)

            c["k_pages"] = dus_pages(cache["k_pages"], chunks(kq))
            c["v_pages"] = dus_pages(cache["v_pages"], chunks(vq))
            c["k_scales"] = dus_pages(cache["k_scales"], schunks(ks))
            c["v_scales"] = dus_pages(cache["v_scales"], schunks(vs))
        else:
            c["k_pages"] = dus_pages(cache["k_pages"], chunks(k))
            c["v_pages"] = dus_pages(cache["v_pages"], chunks(v))
        new.append(c)
    return new


class Engine:
    """Host-driven continuous-batching engine over jitted device steps."""

    def __init__(self, params, cfg: ModelConfig, econfig: EngineConfig = None,
                 sample_fn: Callable = _greedy, mesh=None, seed: int = 0,
                 draft=None):
        """``mesh``: serve data/sequence/tensor-parallel — a (dp, sp, tp)
        mesh; weights and caches are sharded here (Megatron TP rules;
        kv-heads on tp, slots on dp — dp must divide slots; admission
        prefills through a dp-padded batch: the ragged kernel when sp=1,
        per-bucket groups of the sp-sharded Ulysses forward when sp>1).
        Every EngineConfig feature composes with the mesh: paged pools shard
        heads on tp, speculative verify runs the sharded chunk kernel.

        ``sample_fn(logits, key) -> tokens``: engine/sampling.py samplers
        (greedy default; make_sampler for temperature/top-k/top-p)."""
        self.cfg = cfg
        self.ec = econfig or EngineConfig()
        assert not self.ec.prefix_cache or self.ec.paged, \
            "prefix_cache requires paged=True"
        self._multi_lora = any(
            isinstance(w, dict) and "As" in w
            for w in params["layers"][0].values())
        if self._multi_lora:
            # per-slot adapter routing reaches every serving path: decode,
            # prefill (ragged + per-seq), the chunk paths (spec verify /
            # chunked prefill / prefix admission — decode_chunk threads
            # adapter_ids through every projection), and the prefix trie
            # (namespaced per adapter: adapted wk/wv make KV tenant-
            # specific, so pages must never be shared across adapters)
            self._slot_aids = np.zeros((self.ec.slots,), np.int32)
        # GPT-OSS sinks compose with the full serving matrix: every decode/
        # chunk kernel (plain, quantized, paged, paged-quantized) has a
        # with_lse variant and the sigmoid(lse - sink) correction applies
        # outside the kernel (llama._cache_attend, speculative
        # ._chunk_cache_attend) — no fence.
        self.sample_fn = jax.jit(sample_fn)
        self._key = jax.random.key(seed)
        self.mesh = mesh
        ec = self.ec
        assert ec.max_seq % ec.prefill_bucket == 0

        self.pm = None
        if ec.paged:
            from leetcuda_tpu.attention.paged import PageManager
            from leetcuda_tpu.models.llama import init_paged_kv_caches

            assert ec.prefill_bucket % ec.page_size == 0
            num_pages = ec.num_pages or (
                ec.slots * ec.max_seq // ec.page_size + 1)
            self.pm = PageManager(num_pages, ec.page_size,
                                  ec.max_seq // ec.page_size, ec.slots,
                                  prefix_cache=ec.prefix_cache)
            self._num_pages = num_pages
            caches = init_paged_kv_caches(cfg, num_pages, ec.page_size,
                                          quant=ec.kv_quant)
        else:
            caches = init_kv_caches(cfg, ec.slots, ec.max_seq,
                                    quant=ec.kv_quant)
        if mesh is not None:
            n_dp = mesh.shape.get("dp", 1)
            if n_dp > 1:
                # dp>1 admission routes through a dp-padded prefill batch:
                # the ragged kernel when sp=1, else per-bucket groups of the
                # sp-sharded forward (dummy rows dropped) — see _admit
                assert ec.slots % n_dp == 0, (ec.slots, n_dp)
            n_sp = mesh.shape.get("sp", 1)
            if n_sp > 1:
                # sp>1 prefill shards the padded sequence (multiples of
                # prefill_bucket) over sp — keep the split exact
                assert ec.prefill_bucket % n_sp == 0, (
                    f"prefill_bucket={ec.prefill_bucket} must be a multiple "
                    f"of sp={n_sp} (sequence shards over sp at prefill)")
            params = shard_llama_params(params, cfg, mesh)
            caches = shard_kv_caches(caches, mesh)
        self.params = params
        self.caches = caches
        self.lengths = jnp.zeros((ec.slots,), jnp.int32)
        self.last_tokens = jnp.zeros((ec.slots,), jnp.int32)

        self.free: list[int] = list(range(ec.slots))
        self.active: dict[int, Request] = {}   # slot -> request
        self.filling: dict[int, Request] = {}  # slot -> request mid-prefill
        self._fill_cached: dict[int, int] = {}  # slot -> adopted page count
        self.waiting: deque[Request] = deque()
        self.finished: dict[int, Request] = {}
        self._uid = 0
        if ec.prefill_chunk is not None:
            assert ec.paged, "prefill_chunk requires paged=True"
            assert ec.prefill_chunk % ec.prefill_bucket == 0, \
                "prefill_chunk must be a multiple of prefill_bucket"

        self.draft = None
        if ec.spec_k:
            from leetcuda_tpu.engine.speculative import decode_chunk

            assert draft is not None, "spec_k requires draft=(params, cfg)"
            # greedy -> exact token matching; stochastic samplers work via
            # rejection sampling (speculative.rejection_step), which needs
            # the sampler's warped distribution — make_sampler() attaches it
            self._spec_warp = getattr(sample_fn, "warp", None)
            assert sample_fn is _greedy or self._spec_warp is not None, (
                "speculative decoding needs greedy or a make_sampler() "
                "sampler (carries its .warp for rejection sampling)")
            d_params, d_cfg = draft
            self.draft = (d_params, d_cfg)
            # the draft always runs on plain slot caches, replicated (not
            # sharded): it is small by construction, and paging/quantizing/
            # sharding it would cost more in latency than its memory is worth
            self.caches_d = init_kv_caches(d_cfg, ec.slots, ec.max_seq)
            self._prefill_d = jax.jit(
                functools.partial(forward, cfg=d_cfg, return_kv=True))
            self._decode_d = jax.jit(decode_step_impl,
                                     static_argnames=("cfg",),
                                     donate_argnums=(2,))
            # target verify: the chunk kernel composes with paged/quantized/
            # windowed caches and the mesh (attention/chunk.py)
            self._verify = jax.jit(
                functools.partial(decode_chunk, mesh=mesh),
                static_argnames=("cfg",), donate_argnums=(2,))
            self._accepted = self._proposed = 0
            if self._spec_warp is not None:
                from leetcuda_tpu.engine.speculative import (
                    speculative_verdict)

                warp = self._spec_warp

                def draft_sample(key, logits):
                    p_d = jax.nn.softmax(warp(logits), axis=-1)
                    tok = jax.random.categorical(
                        key, jnp.log(jnp.maximum(p_d, 1e-30)),
                        axis=-1).astype(jnp.int32)
                    return tok, p_d

                self._draft_sample = jax.jit(draft_sample)
                # the composite accept/replace rule lives in speculative.py
                # (speculative_verdict) — ONE implementation for the engine
                # and the standalone generator
                self._spec_verdict = jax.jit(functools.partial(
                    speculative_verdict, warp=warp))

        self._hlen = np.zeros((ec.slots,), np.int64)  # host-side lengths
        self._decode = jax.jit(
            functools.partial(decode_step_impl, mesh=mesh),
            static_argnames=("cfg",), donate_argnums=(2,))
        self._prefill = jax.jit(
            functools.partial(forward, cfg=cfg, mesh=mesh, return_kv=True))
        from leetcuda_tpu.models.llama import forward_ragged
        self._prefill_ragged = jax.jit(
            functools.partial(forward_ragged, cfg=cfg, mesh=mesh))
        self._insert = jax.jit(_insert_kvs, donate_argnums=(0,))
        self._insert_paged = jax.jit(_insert_kvs_paged, donate_argnums=(0,),
                                     static_argnums=(3,))
        if ec.paged and (ec.prefix_cache or ec.prefill_chunk is not None):
            from leetcuda_tpu.engine.speculative import decode_chunk

            # suffix-only / incremental admission against existing pages
            # (page_aligned: admission chunks start page-aligned with
            # page-multiple lengths -> whole-page in-place writes)
            import functools as _ft
            self._chunk_prefill = jax.jit(
                _ft.partial(decode_chunk, page_aligned=True, mesh=mesh),
                static_argnames=("cfg",), donate_argnums=(2,))

    # --- public API -----------------------------------------------------------

    def _chunk_admit(self, toks_np, base_pos: int, slot: int):
        """One admission chunk-prefill call (B=1 logically). Under a dp>1
        mesh the chunk kernel shard_maps batch over dp, so the call is padded
        with dp-1 dummy rows whose page-table rows are all-null (page 0):
        their whole-page writes land on the reserved null page — never read,
        since real rows' length masking excludes it — and their logits are
        dropped. Returns the real row's logits (T, V)."""
        n_dp = (self.mesh.shape.get("dp", 1) if self.mesh is not None else 1)
        toks = np.zeros((n_dp, toks_np.shape[1]), np.int32)
        toks[0] = toks_np[0]
        base = np.zeros((n_dp,), np.int32)
        base[0] = base_pos
        rows = np.zeros((n_dp, self.pm.table.shape[1]), np.int32)
        rows[0] = self.pm.table[slot]
        akw = {}
        if self._multi_lora:
            # _slot_aids[slot] is set at slot assignment, before any chunk
            aids = np.zeros((n_dp,), np.int32)
            aids[0] = self._slot_aids[slot]
            akw["adapter_ids"] = jnp.asarray(aids)
        logits, self.caches = self._chunk_prefill(
            self.params, jnp.asarray(toks), self.caches,
            jnp.asarray(base), cfg=self.cfg, page_table=jnp.asarray(rows),
            **akw)
        return logits[0]

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def submit(self, prompt: list[int], max_new: int = 64,
               adapter_id: int = 0) -> int:
        """``adapter_id``: which stacked LoRA adapter serves this request
        (multi-tenant serving — lora.stack_lora; ignored otherwise)."""
        self._uid += 1
        req = Request(self._uid, list(prompt), max_new)
        req.adapter_id = adapter_id
        self.waiting.append(req)
        return self._uid

    def _admit(self):
        """Admit waiting requests. All admissible requests prefill in ONE
        ragged-flash batch (different lengths padded to a common bucket) —
        including paged and TP/dp-meshed engines (forward_ragged shards batch
        on dp, heads on tp; under dp>1 the batch pads to a dp multiple with
        dummy rows). Only the sp>1 mesh (whose sharded forward re-shards
        sequence) and the single-request case use the per-sequence path."""
        ec = self.ec
        n_dp = (self.mesh.shape.get("dp", 1)
                if self.mesh is not None else 1)
        ragged_ok = (self.mesh is None
                     or self.mesh.shape.get("sp", 1) == 1)
        batch: list[tuple[int, Request, int]] = []  # (slot, req, n_cached)
        while self.free and self.waiting:
            req = self.waiting.popleft()
            slot = self.free.pop()
            if self._multi_lora:  # before any chunk/prefill touches the slot
                self._slot_aids[slot] = getattr(req, "adapter_id", 0)
            L = len(req.prompt)
            assert 0 < L < ec.max_seq, f"prompt length {L}"
            s_pad = L + (-L % ec.prefill_bucket)
            n_cached = 0
            if self.pm is not None:
                if ec.prefix_cache:
                    pages = self.pm.match_prefix(
                        req.prompt, ns=(getattr(req, 'adapter_id', 0)
                                        if self._multi_lora else 0))
                    if pages:
                        self.pm.adopt(slot, pages)
                        n_cached = len(pages) * ec.page_size
                if ec.prefill_chunk is not None:
                    # bounded chunked prefill: the request streams in over
                    # ticks via _advance_filling; reserve only the first
                    # chunk's pages now. lengths tracks n_filled so a dead-
                    # slot decode append can never touch an adopted page.
                    first = min(ec.prefill_chunk, L - n_cached)
                    first += -first % ec.prefill_bucket
                    if not self.pm.ensure(slot, n_cached + first - 1):
                        self.pm.release(slot)
                        self.waiting.appendleft(req)
                        self.free.append(slot)
                        break
                    req.n_filled = n_cached
                    self._fill_cached[slot] = n_cached // ec.page_size
                    self.lengths = self.lengths.at[slot].set(n_cached)
                    self._hlen[slot] = n_cached
                    self.filling[slot] = req
                    continue
                # room for the padded prompt; the chunked suffix path may
                # append up to n_cached + pad(L - n_cached) positions
                t_pad = (L - n_cached) + (-(L - n_cached) % ec.prefill_bucket)
                need = max(s_pad, n_cached + t_pad)
                if not self.pm.ensure(slot, need - 1):
                    # pool exhausted: put the request back, retry after
                    # frees (release also drops any adopted prefix refs).
                    # If no ACTIVE sequence holds pages, nothing can ever
                    # free — fail loudly instead of livelocking run().
                    self.pm.release(slot)
                    self.waiting.appendleft(req)
                    self.free.append(slot)
                    if not any(self.pm.used[s] for s in self.active):
                        raise RuntimeError(
                            f"prompt needs {need // ec.page_size} pages but "
                            f"only {len(self.pm.free)} are free and no "
                            f"active sequence holds any to release; raise "
                            f"num_pages")
                    break
            batch.append((slot, req, n_cached))
        if not batch:
            return

        fresh = [(s, r) for s, r, c in batch if c == 0]
        chunked = [(s, r, c) for s, r, c in batch if c > 0]

        if fresh:
            if ragged_ok and (len(fresh) > 1 or n_dp > 1):
                s_pad = max(len(r.prompt) for _, r in fresh)
                s_pad = s_pad + (-s_pad % ec.prefill_bucket)
                B_pad = -(-len(fresh) // n_dp) * n_dp  # dp-divisible batch
                toks = np.zeros((B_pad, s_pad), np.int32)
                lens = np.ones((B_pad,), np.int32)  # dummy rows: 1 token
                for i, (_, req) in enumerate(fresh):
                    toks[i, :len(req.prompt)] = req.prompt
                    lens[i] = len(req.prompt)
                akw = {}
                if self._multi_lora:
                    aids = np.zeros((B_pad,), np.int32)
                    for i, (_, req) in enumerate(fresh):
                        aids[i] = getattr(req, "adapter_id", 0)
                    akw["adapter_ids"] = jnp.asarray(aids)
                logits, kvs = self._prefill_ragged(
                    self.params, jnp.asarray(toks), jnp.asarray(lens), **akw)
                per_seq = [(logits[i], [(k[i:i + 1], v[i:i + 1])
                                        for k, v in kvs])
                           for i in range(len(fresh))]
            else:
                # sp>1: the sequence-sharded forward (Ulysses reshard) is the
                # prefill; under dp>1 every call pads to an n_dp-row batch so
                # the dp axis stays divisible (dummy rows' logits/K-V are
                # dropped — the same trick _chunk_admit plays)
                per_seq = []
                for g0 in range(0, len(fresh), n_dp):
                    group = fresh[g0:g0 + n_dp]
                    s_pad = max(len(r.prompt) for _, r in group)
                    s_pad += -s_pad % ec.prefill_bucket
                    toks = np.zeros((n_dp, s_pad), np.int32)
                    for i, (_, req) in enumerate(group):
                        toks[i, :len(req.prompt)] = req.prompt
                    akw = {}
                    if self._multi_lora:
                        aids = np.zeros((n_dp,), np.int32)
                        for i, (_, req) in enumerate(group):
                            aids[i] = getattr(req, "adapter_id", 0)
                        akw["adapter_ids"] = jnp.asarray(aids)
                    lg, kvs = self._prefill(self.params, jnp.asarray(toks),
                                            **akw)
                    per_seq.extend(
                        (lg[i], [(k[i:i + 1], v[i:i + 1]) for k, v in kvs])
                        for i in range(len(group)))

            for (slot, req), (logits_i, kvs_i) in zip(fresh, per_seq):
                L = len(req.prompt)
                if self.pm is not None:
                    # slice the (possibly batch-wide) padded K/V down to this
                    # request's own bucket — only those pages were ensured
                    s_req = L + (-L % ec.prefill_bucket)
                    kvs_i = [(k[:, :, :s_req], v[:, :, :s_req])
                             for k, v in kvs_i]
                    n_pages = s_req // ec.page_size
                    phys = jnp.asarray(self.pm.used[slot][:n_pages],
                                       jnp.int32)
                    self.caches = self._insert_paged(self.caches, kvs_i,
                                                     phys, ec.page_size)
                    self.pm.register_prefix(
                        slot, req.prompt, ns=int(self._slot_aids[slot])
                        if self._multi_lora else 0)
                else:
                    self.caches = self._insert(self.caches, kvs_i,
                                               jnp.int32(slot), jnp.int32(L))
                self._finish_admission(slot, req, logits_i[L - 1])

        for slot, req, n_cached in chunked:
            # adopted prefix pages hold positions [0, n_cached); chunk-prefill
            # ONLY the suffix against them (chunked prefill — the same
            # attention/chunk.py kernel speculative verify uses). The suffix
            # streams in bounded pieces: the chunk kernel's VMEM scratch
            # ((H*T,128) f32 m/l + (H*T,D) acc + the q block) scales with
            # H*T, so one monolithic call over a long suffix can exceed the
            # ~100MB VMEM budget at realistic H — cap T per call.
            L = len(req.prompt)
            cap = max(ec.prefill_bucket,
                      _SUFFIX_T_CAP - _SUFFIX_T_CAP % ec.prefill_bucket)
            pos = n_cached
            while pos < L:
                t_real = min(cap, L - pos)
                t_pad = t_real + (-t_real % ec.prefill_bucket)
                toks = np.zeros((1, t_pad), np.int32)
                toks[0, :t_real] = req.prompt[pos:pos + t_real]
                logits = self._chunk_admit(toks, pos, slot)
                pos += t_real
            self.pm.register_prefix(slot, req.prompt,
                                    skip_pages=n_cached // ec.page_size,
                                    ns=int(self._slot_aids[slot])
                                    if self._multi_lora else 0)
            self._finish_admission(slot, req, logits[t_real - 1])

    def _finish_admission(self, slot: int, req: Request, last_logits):
        """Common admission tail: draft prefill (speculative), first-token
        sampling, slot bookkeeping."""
        if self._multi_lora:
            self._slot_aids[slot] = getattr(req, "adapter_id", 0)
        L = len(req.prompt)
        if self.draft is not None:
            d_params, d_cfg = self.draft
            s_pad = L + (-L % self.ec.prefill_bucket)
            toks = np.zeros((1, s_pad), np.int32)
            toks[0, :L] = req.prompt
            _, dkvs = self._prefill_d(d_params, jnp.asarray(toks))
            self.caches_d = self._insert(self.caches_d, dkvs,
                                         jnp.int32(slot), jnp.int32(L))
        first = self.sample_fn(last_logits, self._next_key())
        self.lengths = self.lengths.at[slot].set(L)
        self._hlen[slot] = L
        self.last_tokens = self.last_tokens.at[slot].set(first)
        req.generated.append(int(first))
        self.active[slot] = req
        self._maybe_finish(slot, int(first))

    def _advance_filling(self):
        """Advance mid-prefill slots by at most ``prefill_chunk`` prompt
        tokens TOTAL this tick (admission order), via the B=1 chunk-prefill.
        A request whose last prompt token lands this tick samples its first
        output and becomes active."""
        ec = self.ec
        budget = ec.prefill_chunk
        for slot in sorted(self.filling, key=lambda s: self.filling[s].uid):
            if budget <= 0:
                break
            req = self.filling[slot]
            L = len(req.prompt)
            t_real = min(budget, L - req.n_filled)
            if req.n_filled + t_real < L:
                # NON-final chunk: keep the next chunk's base page-aligned.
                # _chunk_prefill is jitted page_aligned=True (whole-page
                # writes from pos//page); handing a later tick an unaligned
                # base would clobber already-filled tokens in the straddled
                # page. The budget leftover after a final chunk is the only
                # way t_real goes non-multiple here.
                t_real -= t_real % ec.prefill_bucket
                if t_real == 0:
                    continue  # leftover below one bucket; a later slot may
                              # still fit a small FINAL chunk
            t_pad = t_real + (-t_real % ec.prefill_bucket)
            if not self.pm.ensure(slot, req.n_filled + t_pad - 1):
                continue  # pool pressure: this slot stalls a tick
            toks = np.zeros((1, t_pad), np.int32)
            toks[0, :t_real] = req.prompt[req.n_filled:req.n_filled + t_real]
            logits = self._chunk_admit(toks, req.n_filled, slot)
            req.n_filled += t_real
            budget -= t_real
            self.lengths = self.lengths.at[slot].set(req.n_filled)
            self._hlen[slot] = req.n_filled
            if req.n_filled == L:
                del self.filling[slot]
                self.pm.register_prefix(
                    slot, req.prompt,
                    skip_pages=self._fill_cached.pop(slot, 0),
                    ns=int(self._slot_aids[slot])
                    if self._multi_lora else 0)
                self._finish_admission(slot, req, logits[t_real - 1])

    def _maybe_finish(self, slot, token):
        req = self.active.get(slot)
        if req is None:
            return
        hit_eos = self.ec.eos_id is not None and token == self.ec.eos_id
        if (hit_eos or len(req.generated) >= req.max_new
                or req.context_len >= self.ec.max_seq):
            req.done = True
            self.finished[req.uid] = req
            del self.active[slot]
            self.free.append(slot)
            if self.pm is not None:
                self.pm.release(slot)

    def _preempt_youngest(self):
        """Page pool exhausted mid-decode: evict the most recently admitted
        sequence (mid-prefill slots included) — release its pages and requeue
        it for recompute with its generated tokens folded into the prompt
        (vLLM-style recompute preemption). On re-admission, prefill rebuilds
        the cache over prompt+generated and sampling continues from the next
        position; ``context_len`` uses the original prompt length so budgets
        are unaffected."""
        pool = {**self.active, **self.filling}
        slot = max(pool, key=lambda s: pool[s].uid)
        if slot in self.filling:
            req = self.filling.pop(slot)
            req.n_filled = 0
            self._fill_cached.pop(slot, None)
        else:
            req = self.active.pop(slot)
            req.prompt = req.prompt + req.generated
        self.pm.release(slot)
        self.free.append(slot)
        self.waiting.appendleft(req)
        return slot

    def step(self) -> dict[int, int]:
        """Admit waiting requests, advance chunked prefills, then advance
        every live slot one token (or up to 1 + spec_k tokens in speculative
        mode). Returns {uid: last new token} for this tick."""
        self._admit()
        if self.filling:
            self._advance_filling()
        if not self.active:
            return {}
        if self.draft is not None:
            return self._step_speculative()

        if self.pm is not None:
            # grow pages for this step's appends; preempt on pool exhaustion
            # (preempted slots write to the reserved null page 0 until reuse)
            for slot in sorted(self.active):
                if slot not in self.active:
                    continue  # preempted while servicing an earlier slot
                while (slot in self.active
                       and not self.pm.ensure(slot, int(self._hlen[slot]))):
                    self._preempt_youngest()
            if not self.active:
                return {}

        live = np.zeros((self.ec.slots,), bool)
        for s in self.active:
            live[s] = True
        live_j = jnp.asarray(live)

        kw = ({"page_table": self.pm.device_table}
              if self.pm is not None else {})
        if self._multi_lora:
            kw["adapter_ids"] = jnp.asarray(self._slot_aids)
        logits, self.caches = self._decode(
            self.params, self.last_tokens, self.caches, self.lengths,
            cfg=self.cfg, **kw)
        nxt = self.sample_fn(logits, self._next_key())
        # dead slots: freeze length (their repeated append lands on an unused
        # position that the next admission's prefill overwrites)
        self.lengths = jnp.where(live_j, self.lengths + 1, self.lengths)
        self._hlen[live] += 1
        self.last_tokens = jnp.where(live_j, nxt, self.last_tokens)

        out = {}
        nxt_np = np.asarray(jax.device_get(nxt))
        for slot, req in list(self.active.items()):
            tok = int(nxt_np[slot])
            req.generated.append(tok)
            out[req.uid] = tok
            self._maybe_finish(slot, tok)
        return out

    def _step_speculative(self) -> dict[int, int]:
        """One speculative tick: k draft proposals per slot, one (k+1)-chunk
        target verify, emit 1 + accepted tokens per live slot. With a greedy
        sampler the stream is exactly plain greedy decoding; with a
        make_sampler() sampler the accept/replace rule (speculative_verdict)
        preserves the target's warped sampling distribution per position.
        Composes with paged/quantized caches and the mesh — only the draft
        stays on plain replicated slot caches (see __init__)."""
        k = self.ec.spec_k
        d_params, d_cfg = self.draft

        if self.pm is not None:
            # the verify chunk appends at positions hlen..hlen+k: ensure
            # pages cover them, preempting the youngest on pool exhaustion
            for slot in sorted(self.active):
                if slot not in self.active:
                    continue
                while (slot in self.active and not
                       self.pm.ensure(slot, int(self._hlen[slot]) + k)):
                    self._preempt_youngest()
            if not self.active:
                return {}

        live = np.zeros((self.ec.slots,), bool)
        for s in self.active:
            live[s] = True
        live_j = jnp.asarray(live)

        # draft proposes k tokens (cache advances k+1 for full-accept sync);
        # greedy mode takes argmax, stochastic mode samples from the warped
        # draft distribution and records it for the rejection rule
        stochastic = self._spec_warp is not None
        d_tokens, d_probs = [self.last_tokens], []
        d_len = self.lengths
        tok = self.last_tokens
        for _ in range(k):
            lg, self.caches_d = self._decode_d(d_params, tok, self.caches_d,
                                               d_len, cfg=d_cfg)
            if stochastic:
                tok, p_d = self._draft_sample(self._next_key(), lg)
                d_probs.append(p_d)
            else:
                tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            d_tokens.append(tok)
            d_len = d_len + 1
        _, self.caches_d = self._decode_d(d_params, tok, self.caches_d,
                                          d_len, cfg=d_cfg)
        chunk = jnp.stack(d_tokens, axis=1)  # (slots, k+1)

        kw = ({"page_table": self.pm.device_table}
              if self.pm is not None else {})
        if self._multi_lora:
            kw["adapter_ids"] = jnp.asarray(self._slot_aids)
        logits, self.caches = self._verify(self.params, chunk, self.caches,
                                           self.lengths, cfg=self.cfg, **kw)
        proposals = chunk[:, 1:]
        if stochastic:
            n_acc, new_cur = self._spec_verdict(
                self._next_key(), chunk, jnp.stack(d_probs, axis=1), logits)
        else:
            target_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            match = proposals == target_next[:, :-1]
            n_acc = jnp.argmin(jnp.concatenate(
                [match, jnp.zeros((self.ec.slots, 1), bool)], axis=1)
                .astype(jnp.int32), axis=1)
            new_cur = jnp.take_along_axis(target_next, n_acc[:, None],
                                          axis=1)[:, 0]

        n_acc_np = np.asarray(jax.device_get(n_acc))
        props_np = np.asarray(jax.device_get(proposals))
        cur_np = np.asarray(jax.device_get(new_cur))
        self._accepted += int(n_acc_np[live].sum())
        self._proposed += int(live.sum()) * k

        adv = jnp.where(live_j, 1 + n_acc, 0)
        self.lengths = self.lengths + adv
        self._hlen[live] += 1 + n_acc_np[live]
        self.last_tokens = jnp.where(live_j, new_cur, self.last_tokens)

        out = {}
        for slot, req in list(self.active.items()):
            for t in range(int(n_acc_np[slot])):
                req.generated.append(int(props_np[slot, t]))
                out[req.uid] = int(props_np[slot, t])
                self._maybe_finish(slot, int(props_np[slot, t]))
                if slot not in self.active:
                    break
            if slot not in self.active:
                continue
            req.generated.append(int(cur_np[slot]))
            out[req.uid] = int(cur_np[slot])
            self._maybe_finish(slot, int(cur_np[slot]))
        return out

    @property
    def acceptance_rate(self):
        return self._accepted / max(self._proposed, 1)

    def stats(self) -> dict:
        """Serving observability: queue depths, slot/page utilization, and
        per-request progress (the reference's print-based metrics, §5, grown
        into a structured snapshot)."""
        s = {
            "waiting": len(self.waiting),
            "active": len(self.active),
            "filling": {s_: f"{r.n_filled}/{len(r.prompt)}"
                        for s_, r in self.filling.items()},
            "finished": len(self.finished),
            "free_slots": len(self.free),
            "context_lens": {req.uid: req.context_len
                             for req in self.active.values()},
        }
        if self.pm is not None:
            used = sum(len(v) for v in self.pm.used.values())
            s["pages_used"] = used
            s["pages_free"] = len(self.pm.free)
            s["page_utilization"] = used / max(used + len(self.pm.free), 1)
            if self.pm.prefix_cache:
                s["prefix_pages_hit"] = self.pm.hits
                s["prefix_pages_prefilled"] = self.pm.misses
                s["prefix_pages_cached"] = len(self.pm.trie)
        s["kv_memory"] = self.kv_memory_report()
        return s

    def kv_memory_report(self) -> dict:
        """KV memory accounting (VERDICT r2 weak #6: the replicated plain
        draft cache's cost, measured rather than asserted). Returns bytes for
        the target cache/pool and — under speculative decoding — the draft
        cache and its fraction of the target. The draft stays unpaged and
        unquantized by design (engine.py draft setup comment); this report is
        the evidence for when that stance is cheap (7B target + 1B-class
        draft: draft ≈ 4-9% of an int8 paged target pool) and the trigger for
        revisiting it (comparable-size model pairs: fraction approaches 1)."""

        def nbytes(tree):
            return int(sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)))

        rep = {"target_bytes": nbytes(self.caches)}
        if self.ec.spec_k:
            rep["draft_bytes"] = nbytes(self.caches_d)
            rep["draft_frac_of_target"] = round(
                rep["draft_bytes"] / max(rep["target_bytes"], 1), 3)
        return rep

    def recover(self):
        """Elastic recovery after a device/runtime failure: drop all device
        state (caches may hold poisoned buffers), release pages, and requeue
        every in-flight request for recompute — generated tokens fold into the
        prompts, so each request still emits exactly its remaining tokens.
        The reference has no failure handling at all (SURVEY.md §5); through a
        remote-device tunnel, transient INTERNAL errors are a fact of life."""
        for slot, req in list(self.active.items()):
            req.prompt = req.prompt + req.generated
            self.waiting.appendleft(req)
        for slot, req in list(self.filling.items()):
            req.n_filled = 0
            self.waiting.appendleft(req)
        self.active.clear()
        self.filling.clear()
        self._fill_cached.clear()
        self.free = list(range(self.ec.slots))
        self.lengths = jnp.zeros((self.ec.slots,), jnp.int32)
        self.last_tokens = jnp.zeros((self.ec.slots,), jnp.int32)
        self._hlen[:] = 0
        if self.pm is not None:
            from leetcuda_tpu.attention.paged import PageManager
            from leetcuda_tpu.models.llama import init_paged_kv_caches

            self.pm = PageManager(self._num_pages, self.ec.page_size,
                                  self.ec.max_seq // self.ec.page_size,
                                  self.ec.slots,
                                  prefix_cache=self.ec.prefix_cache)
            self.caches = init_paged_kv_caches(self.cfg, self._num_pages,
                                               self.ec.page_size,
                                               quant=self.ec.kv_quant)
        else:
            caches = init_kv_caches(self.cfg, self.ec.slots, self.ec.max_seq,
                                    quant=self.ec.kv_quant)
            if self.mesh is not None:
                caches = shard_kv_caches(caches, self.mesh)
            self.caches = caches
        if self.draft is not None:
            self.caches_d = init_kv_caches(self.draft[1], self.ec.slots,
                                           self.ec.max_seq)

    def run(self, prompts: list[list[int]], max_new: int = 64,
            max_recoveries: int = 2) -> dict[int, list[int]]:
        """Submit all prompts, run to completion, return {uid: generated}.
        Transient device failures trigger recover() up to ``max_recoveries``
        times before re-raising."""
        uids = [self.submit(p, max_new) for p in prompts]
        failures = 0
        stalls = 0
        while self.waiting or self.active or self.filling:
            fill_mark = (len(self.waiting),
                         sum(r.n_filled for r in self.filling.values()),
                         len(self.active))
            try:
                out = self.step()
                if (not out and self.filling
                        and fill_mark == (len(self.waiting),
                                          sum(r.n_filled
                                              for r in self.filling.values()),
                                          len(self.active))):
                    stalls += 1  # nothing decoded, nothing filled, no admit
                    if stalls > 2:
                        raise RuntimeError(
                            "chunked prefill stalled: page pool too small "
                            "for the in-flight prefills; raise num_pages")
                else:
                    stalls = 0
            except jax.errors.JaxRuntimeError:
                failures += 1
                if failures > max_recoveries:
                    raise
                self.recover()
        return {u: self.finished[u].generated for u in uids}


# --- benchmark path: whole decode loop in one jit -----------------------------------


@functools.lru_cache(maxsize=None)
def make_generate_scan(cfg: ModelConfig, max_new: int, mesh=None,
                       sample_fn=None):
    """Build the reusable jitted generator (cached so repeated benchmark
    reps hit the compile cache). go(params, prompts, caches[, key]) ->
    tokens (B, max_new); the caches argument is donated.

    Greedy by default; with ``sample_fn(logits, key)`` (engine/sampling.py)
    the whole sampled loop stays inside the one jit — per-step keys are
    ``fold_in``s of the caller's key, so the stream is reproducible."""
    stochastic = sample_fn is not None and sample_fn is not _greedy

    # The final caches are RETURNED (and dropped by callers): donation can
    # only alias input->output, so a tokens-only return made every donated
    # cache buffer "not usable" — XLA copied the whole (quantized) cache +
    # scales once per call ("Some donated buffers were not usable:
    # int8[8,4,3072,128], float32[8,4,3072], ..." in the r3 int4 logs).
    # Returning them costs nothing: it is the same aliased HBM buffer.
    @functools.partial(jax.jit, donate_argnums=(2,))
    def go(params, prompts, caches, key=None):
        B, S = prompts.shape
        logits, kvs = forward(params, prompts, cfg, mesh=mesh, return_kv=True)
        ins = _insert_kvs(caches, kvs, jnp.int32(0), jnp.int32(S))
        if stochastic:
            first = sample_fn(logits[:, S - 1], jax.random.fold_in(key, 0))
        else:
            first = jnp.argmax(logits[:, S - 1], axis=-1).astype(jnp.int32)
        lengths = jnp.full((B,), S, jnp.int32)

        def body(carry, step):
            toks, caches, lengths = carry
            logits, caches = decode_step_impl(params, toks, caches, lengths,
                                              cfg, mesh=mesh)
            if stochastic:
                nxt = sample_fn(logits, jax.random.fold_in(key, step))
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, caches, lengths + 1), toks

        (_, caches, _), toks = jax.lax.scan(
            body, (first, ins, lengths), jnp.arange(1, max_new + 1))
        return toks.T, caches  # (B, max_new); caches alias the donated input

    return go


def generate_scan(params, cfg: ModelConfig, prompts, max_new: int,
                  kv_quant: str | None = None, max_seq: int | None = None,
                  mesh=None, sample_fn=None, key=None):
    """Generate ``max_new`` tokens for a (B, S) prompt batch with the
    entire decode loop inside one jit (lax.scan) — the tokens/s measurement
    path, free of per-token host round-trips. Returns tokens (B, max_new).
    Greedy by default; pass ``sample_fn`` (make_sampler) + ``key`` for
    whole-loop-in-one-jit stochastic sampling.

    Under a mesh: dp shards the batch, tp the heads (dp | B, tp | n_kv_heads;
    params should already be sharded via shard_llama_params)."""
    B, S = prompts.shape
    max_seq = max_seq or ((S + max_new + 1023) // 1024) * 1024  # enables the 1024 decode block
    caches = init_kv_caches(cfg, B, max_seq, quant=kv_quant)
    if mesh is not None:
        caches = shard_kv_caches(caches, mesh)
    go = make_generate_scan(cfg, max_new, mesh, sample_fn=sample_fn)
    if sample_fn is not None and sample_fn is not _greedy:
        assert key is not None, "sample_fn needs a PRNG key"
        return go(params, prompts, caches, key)[0]
    return go(params, prompts, caches)[0]
