"""Paged KV-cache attention — vLLM-style PagedAttention, TPU-native.

The slot-cache engine (engine/engine.py) reserves max_seq per sequence; paging
removes that: K/V live in a global pool of fixed-size pages

    k_pages, v_pages: (num_pages, Hkv, page_size, D)

and each sequence owns a *block table* row mapping logical page i -> physical
page id. This is the canonical ``PrefetchScalarGridSpec`` use: the block table
and lengths are scalar-prefetched so the KV BlockSpec's index_map can chase
the indirection BEFORE the kernel body runs — each grid step DMAs exactly its
sequence's next physical page, and steps past the sequence's last page clamp
to an already-fetched index (DMA elided). No gather, no copy-out.

The reference has nothing like this (its north star asks for a continuous-
batching decode engine; paging is how production engines make that memory-
dense). Page size is a multiple of 8 (sublane alignment).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import interpret_default

_NEG_INF = -1e30
_LANES = 128


def _paged_kernel(scale, softcap, Hkv, group, page, quantized, window,
                  with_lse, G,
                  pt_ref, len_ref,
                  q_ref, *rest):
    # G pages per grid step, each behind its own BlockSpec ref so Pallas
    # pipelines all G DMAs across steps (the one-page grid was latency-bound:
    # 147 KB per step at MLA shapes — see PERF.md MLA note).
    k_refs, rest = rest[:G], rest[G:]
    v_refs, rest = rest[:G], rest[G:]
    if quantized:
        ks_refs, rest = rest[:G], rest[G:]
        vs_refs, rest = rest[:G], rest[G:]
    if with_lse:
        o_ref, lse_ref, m_sc, l_sc, acc_sc = rest
    else:
        o_ref, m_sc, l_sc, acc_sc = rest
    b = pl.program_id(0)
    si = pl.program_id(1)
    seq_len = len_ref[b]

    @pl.when(si == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    for j in range(G):
        li = si * G + j  # logical page index
        live = li * page < seq_len  # pages past the sequence end: skip
        if window:  # sliding window: also skip pages entirely before it
            live &= li * page + page > seq_len - window

        @pl.when(live)
        def _(j=j, li=li):
            cols = li * page + jax.lax.broadcasted_iota(
                jnp.int32, (1, page), 1)
            valid = cols < seq_len
            if window:
                valid &= cols >= seq_len - window

            from leetcuda_tpu.core.runtime import upcast_for_vpu

            for kvh in range(Hkv):
                qg = q_ref[0, kvh * group:(kvh + 1) * group, :].astype(
                    jnp.float32)
                # e4m3 pools decode via bit surgery (core.runtime), not the
                # ~10x-slower software-emulated cast
                k_blk = upcast_for_vpu(k_refs[j][0, kvh], jnp.float32)
                v_blk = upcast_for_vpu(v_refs[j][0, kvh], jnp.float32)
                s = jax.lax.dot_general(
                    qg, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if quantized:
                    # dequant folded past the dots (see attention/decode.py)
                    s = s * ks_refs[j][0, kvh].astype(jnp.float32)[None, :]
                if softcap:  # Gemma2 logit capping, pre-mask
                    s = softcap * jnp.tanh(s * (1.0 / softcap))
                s = jnp.where(valid, s, _NEG_INF)

                rows = slice(kvh * group, (kvh + 1) * group)
                m_prev = m_sc[rows, 0:1]
                l_prev = l_sc[rows, 0:1]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
                if quantized:
                    p = p * vs_refs[j][0, kvh].astype(jnp.float32)[None, :]
                acc_sc[rows, :] = acc_sc[rows, :] * alpha + jnp.dot(
                    p, v_blk, preferred_element_type=jnp.float32)
                m_sc[rows, :] = jnp.broadcast_to(m_new, (group, _LANES))
                l_sc[rows, :] = jnp.broadcast_to(l_new, (group, _LANES))

    @pl.when(si == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc_sc[:] / jnp.maximum(l_sc[:, 0:1], 1e-30)
                    ).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = m_sc[:] + jnp.log(jnp.maximum(l_sc[:], 1e-30))


def make_paged_attention(*, sm_scale=None, quantized: bool = False,
                         softcap: float | None = None,
                         window: int | None = None,
                         shared_kv: bool = False,
                         with_lse: bool = False,
                         pages_per_step: int | None = None):
    """fn(q, k_pages, v_pages, [k_scales, v_scales,] page_table, lengths)
    -> (B, H, D).

    ``shared_kv``: fn(q, pages, [scales,] page_table, lengths) — ONE page
    pool (and one scale pool) serves as both K and V (MLA's paged latent
    cache): one DMA per page, matching the slot-cache shared_kv decode
    kernel.

    q (B, H, D); pages (N_pages, Hkv, page, D); page_table (B, P_max) int32
    physical page ids (entries past a sequence's last page are ignored);
    lengths (B,) valid token counts. ``quantized``: pages are int8/fp8 with
    per-(page, head, position) f32 scale pools (N_pages, Hkv, page); dequant
    is folded past the dots like attention/decode.py. ``window``: Mistral-style
    sliding window — only the last ``window`` positions are attended, and pages
    entirely before the window are neither fetched nor computed (the index map
    clamps them onto the window's first page so their DMA is elided).

    ``pages_per_step``: pages fetched per grid step, each behind its own
    BlockSpec ref so Pallas keeps all of them in flight while computing the
    previous step. One page per step is DMA-latency-bound (a page is only
    Hkv·page·D bytes); the default auto-picks the count that restores the
    contiguous decode kernel's ~1024-token block granularity."""

    def impl(q, k_pages, v_pages, *rest):
        if quantized:
            k_scales, v_scales, page_table, lengths = rest
        else:
            page_table, lengths = rest
        B, H, D = q.shape
        _, Hkv, page, _ = k_pages.shape
        P_max = page_table.shape[1]
        group = H // Hkv
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
        G = pages_per_step or max(1, min(P_max, 1024 // page))

        def _clamp(li, pt, b, L):
            # chase the block table; clamp past-the-end steps onto the last
            # valid logical page (and, with a window, pre-window steps onto
            # the window's first page) so their DMA is elided
            last = jnp.maximum(pl.cdiv(L[b], page) - 1, 0)
            first = 0
            if window is not None:
                first = jnp.maximum((L[b] - window) // page, 0)
            return pt[b, jnp.clip(li, first, last)]

        def kv_map(j):
            return lambda b, si, pt, L: (_clamp(si * G + j, pt, b, L),
                                         0, 0, 0)

        def s_map(j):
            return lambda b, si, pt, L: (_clamp(si * G + j, pt, b, L), 0, 0)

        page_specs = [pl.BlockSpec((1, Hkv, page, D), kv_map(j),
                                   memory_space=pltpu.VMEM)
                      for j in range(G)]
        in_specs = [
            pl.BlockSpec((1, H, D), lambda b, si, pt, L: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            *page_specs,
        ]
        args = [q] + [k_pages] * G
        if not shared_kv:
            in_specs += page_specs
            args += [v_pages] * G
        if quantized:
            scale_specs = [pl.BlockSpec((1, Hkv, page), s_map(j),
                                        memory_space=pltpu.VMEM)
                           for j in range(G)]
            in_specs += scale_specs if shared_kv else scale_specs * 2
            args += ([k_scales] * G if shared_kv
                     else [k_scales] * G + [v_scales] * G)

        o_spec = pl.BlockSpec((1, H, D), lambda b, si, pt, L: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((1, H, _LANES),
                                lambda b, si, pt, L: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # page_table, lengths
            grid=(B, pl.cdiv(P_max, G)),
            in_specs=in_specs,
            out_specs=(o_spec, lse_spec) if with_lse else o_spec,
            scratch_shapes=[
                pltpu.VMEM((H, _LANES), jnp.float32),
                pltpu.VMEM((H, _LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        )
        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        body = functools.partial(_paged_kernel, scale, softcap, Hkv, group,
                                 page, quantized, window, with_lse, G)
        if shared_kv:
            if quantized:
                def body(pt, L, q_r, *rest, _b=body):  # noqa: F811
                    kv, s, tail = rest[:G], rest[G:2 * G], rest[2 * G:]
                    _b(pt, L, q_r, *kv, *kv, *s, *s, *tail)
            else:
                def body(pt, L, q_r, *rest, _b=body):  # noqa: F811
                    kv, tail = rest[:G], rest[G:]
                    _b(pt, L, q_r, *kv, *kv, *tail)
        out_shape = jax.ShapeDtypeStruct((B, H, D), q.dtype)
        if with_lse:
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((B, H, _LANES), jnp.float32))
        res = pl.pallas_call(
            body,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret_default(),
            **params,
        )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *args)
        if with_lse:
            out, lse = res
            return out, lse[..., 0]
        return res

    if shared_kv:
        if quantized:
            return jax.jit(lambda q, pages, scales, pt, L: impl(
                q, pages, pages, scales, scales, pt, L))
        return jax.jit(lambda q, pages, pt, L: impl(q, pages, pages, pt, L))
    return jax.jit(impl)


def _dus_pool(pool, vals, phys, offs):
    """Per-sequence dynamic-update-slice chain into the page pool — batched
    scatters copy the whole pool on TPU (docs/profiling.md 4b)."""
    vals = vals.astype(pool.dtype)
    for b in range(vals.shape[0]):
        upd = vals[b:b + 1]
        pool = jax.lax.dynamic_update_slice(
            pool, upd[:, :, None] if pool.ndim == 4 else upd,
            (phys[b], 0, offs[b], 0)[: pool.ndim])
    return pool


@functools.partial(jax.jit, donate_argnums=(0, 1))
def paged_append(k_pages, v_pages, k, v, page_table, lengths):
    """Append one token's k/v (B, Hkv, D) at each sequence's current position.
    Returns updated (k_pages, v_pages). The caller must have allocated the
    page containing position ``lengths[b]`` already (PageManager.ensure)."""
    B = k.shape[0]
    page = k_pages.shape[2]
    bidx = jnp.arange(B)
    phys = page_table[bidx, lengths // page]  # (B,)
    offs = lengths % page                      # (B,)
    return (_dus_pool(k_pages, k, phys, offs),
            _dus_pool(v_pages, v, phys, offs))


class PageManager:
    """Host-side physical-page allocator for the paged cache.

    Page 0 is reserved as the null page (block-table filler), so fresh table
    entries are always valid physical indices.

    With ``prefix_cache=True`` the manager also keeps a refcounted prefix
    trie: full pages of a finished-prefill prompt are registered keyed by
    (parent page, that page's tokens), so a later request whose prompt starts
    with the same page chain ADOPTS the physical pages (refcount++) and only
    its suffix needs prefilling (vLLM-style automatic prefix caching; valid
    because the chain always starts at position 0, so the cached post-rope
    K/V has the right absolute positions). Pages whose refcount drops to 0
    stay in the trie on a reclaimable LRU list and are evicted only when the
    free pool runs dry."""

    def __init__(self, num_pages: int, page_size: int, max_pages_per_seq: int,
                 n_slots: int, prefix_cache: bool = False):
        self.page_size = page_size
        self.free = list(range(num_pages - 1, 0, -1))  # pool; 0 reserved
        self.table = np.zeros((n_slots, max_pages_per_seq), np.int32)
        self.used: dict[int, list[int]] = {i: [] for i in range(n_slots)}
        self.prefix_cache = prefix_cache
        # trie: (parent_uid or -1, tokens tuple) -> page id. Keys chain by
        # UID, not physical id: physical ids are reused after eviction, and a
        # stale child keyed by a reused parent id would match wrong content.
        # A uid is never reused, so orphaned children become unreachable (and
        # their pages drain via the reclaimable LRU). trie_inv: page -> key;
        # page_uid: page -> uid; refs: refcount; reclaimable: LRU of
        # refcount-0 cached pages.
        self.trie: dict[tuple, int] = {}
        self.trie_inv: dict[int, tuple] = {}
        self.page_uid: dict[int, int] = {}
        self._next_uid = 0
        self.refs: dict[int, int] = {}
        self.reclaimable: dict[int, None] = {}  # ordered set (LRU)
        self.hits = self.misses = 0  # pages adopted / prefilled

    def _alloc(self) -> int | None:
        if self.free:
            return self.free.pop()
        if self.reclaimable:  # evict the LRU cached-but-unreferenced page
            p = next(iter(self.reclaimable))
            del self.reclaimable[p]
            key = self.trie_inv.pop(p)
            del self.trie[key]
            self.page_uid.pop(p, None)
            self.refs.pop(p, None)
            return p
        return None

    def ensure(self, slot: int, length: int) -> bool:
        """Make sure pages cover positions [0, length]; returns False on OOM."""
        need = length // self.page_size + 1
        while len(self.used[slot]) < need:
            p = self._alloc()
            if p is None:
                return False
            self.refs[p] = self.refs.get(p, 0) + 1
            self.table[slot, len(self.used[slot])] = p
            self.used[slot].append(p)
        return True

    def release(self, slot: int):
        for p in reversed(self.used[slot]):
            n = self.refs.get(p, 1) - 1
            if n > 0:
                self.refs[p] = n
            elif p in self.trie_inv:   # cached: keep, reclaimable
                self.refs[p] = 0
                self.reclaimable[p] = None
            else:                      # private page: straight back to pool
                self.refs.pop(p, None)
                self.free.append(p)
        self.used[slot] = []
        self.table[slot] = 0

    # --- prefix caching -------------------------------------------------------

    def match_prefix(self, tokens: list[int], ns: int = 0) -> list[int]:
        """Longest cached chain of FULL pages covering a strict prefix of
        ``tokens`` (at least one token is always left to prefill so admission
        has logits to sample from). Returns the physical page ids.

        ``ns`` namespaces the chain root (multi-LoRA serving: adapted wk/wv
        make KV adapter-specific, so chains must never cross adapters).
        Roots are -1 - ns — negative, so they can't collide with page uids."""
        if not self.prefix_cache:
            return []
        pages = []
        parent = -1 - ns
        ps = self.page_size
        # strict prefix: the last token never comes from the cache
        max_full = (len(tokens) - 1) // ps
        for i in range(max_full):
            key = (parent, tuple(tokens[i * ps:(i + 1) * ps]))
            p = self.trie.get(key)
            if p is None:
                break
            pages.append(p)
            parent = self.page_uid[p]
        return pages

    def adopt(self, slot: int, pages: list[int]):
        """Attach cached prefix pages to a slot (refcount++)."""
        assert not self.used[slot]
        for i, p in enumerate(pages):
            self.refs[p] = self.refs.get(p, 0) + 1
            if self.refs[p] == 1:
                self.reclaimable.pop(p, None)
            self.table[slot, i] = p
            self.used[slot].append(p)
        self.hits += len(pages)

    def register_prefix(self, slot: int, tokens: list[int],
                        skip_pages: int = 0, ns: int = 0):
        """After prefill: publish the slot's full prompt pages into the trie
        (idempotent; pages already cached — e.g. adopted — are skipped via
        ``skip_pages``). ``ns`` must match the match_prefix namespace."""
        if not self.prefix_cache:
            return
        ps = self.page_size
        parent = (self.page_uid[self.used[slot][skip_pages - 1]]
                  if skip_pages else -1 - ns)
        n_full = len(tokens) // ps
        for i in range(skip_pages, n_full):
            p = self.used[slot][i]
            key = (parent, tuple(tokens[i * ps:(i + 1) * ps]))
            if key in self.trie:
                # chain continues through the canonical page for this key
                parent = self.page_uid[self.trie[key]]
            elif p not in self.trie_inv:
                self.trie[key] = p
                self.trie_inv[p] = key
                self.page_uid[p] = self._next_uid
                parent = self._next_uid
                self._next_uid += 1
                self.misses += 1  # a page actually published fresh — pages
                # that chain through existing canonical entries or hit the
                # early break below were never prefilled anew
            else:
                break  # p already cached under another chain; stop publishing

    @property
    def device_table(self):
        return jnp.asarray(self.table)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def paged_append_quantized(k_pages, v_pages, k_scales, v_scales,
                           kq, vq, ks, vs, page_table, lengths):
    """Quantized paged append: values (B, Hkv, D) already quantized with
    per-(seq, head) scales (B, Hkv); writes values + scales at each
    sequence's current position."""
    B = kq.shape[0]
    page = k_pages.shape[2]
    bidx = jnp.arange(B)
    phys = page_table[bidx, lengths // page]
    offs = lengths % page
    return (_dus_pool(k_pages, kq, phys, offs),
            _dus_pool(v_pages, vq, phys, offs),
            _dus_pool(k_scales, ks[..., None], phys, offs),
            _dus_pool(v_scales, vs[..., None], phys, offs))
