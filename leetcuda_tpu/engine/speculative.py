"""Speculative decoding — draft-model proposal + single-pass target verify.

Greedy speculative decoding is EXACT: the emitted stream equals the target
model's own greedy decode, but each accepted draft token costs the target one
position of a (k+1)-token chunked forward instead of a full decode step —
the target's weights stream once per chunk, not once per token.

TPU-native mechanics:
- ``decode_chunk`` extends the engine's decode path to T tokens at once
  (chunked prefill): all T K/V appended by offset scatter, attention against
  the cache with per-position validity ``pos_q < lengths + t + 1`` (which is
  exactly causal-within-chunk + full-prefix). T is small (k+1 <= 8), so the
  (B, H, T, S) score tensor is jnp einsum territory — no kernel needed.
- Cache rollback after a rejected suffix is free: caches are length-masked,
  so rolling back IS just not advancing ``lengths``; the rejected positions'
  K/V get overwritten by later appends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from leetcuda_tpu.models.llama import (
    ModelConfig, decode_step, forward, init_kv_caches, _rms_norm,
    _proj_qkv, _proj_mlp, _apply_rope, linear)
from leetcuda_tpu.engine.engine import _insert_kvs


def _chunk_attend(q, cache, base_lengths, window=None):
    """q (B, T, H, Dh) at positions base+t; cache (B, Hkv, S, Dh).
    Full-prefix + causal-within-chunk attention (small-T jnp path); with
    ``window``, the same sliding-window band decode_step applies — position
    base+t sees cache cols in [base+t+1-window, base+t]."""
    B, T, H, Dh = q.shape
    Hkv = cache["k"].shape[1]
    S = cache["k"].shape[2]
    k, v = cache["k"], cache["v"]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    s = jnp.einsum("bthd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(Dh)
    # position t may see cache positions < base + t + 1
    limit = base_lengths[:, None, None, None] + jnp.arange(T)[None, None, :,
                                                             None] + 1
    cols = jnp.arange(S)[None, None, None, :]
    mask = cols < limit
    if window is not None:
        mask &= cols >= limit - window
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bthd", p, v.astype(jnp.float32))


def _dus_chunk(cache_arr, vals, rows, pos0):
    """In-place T-token append: vals (B, Hkv, T[, D]) land at contiguous
    positions pos0[b].. in row rows[b] via a per-b dynamic_update_slice
    chain — scatters copy the whole cache on TPU (llama._dus_token)."""
    vals = vals.astype(cache_arr.dtype)
    B = vals.shape[0]
    c = cache_arr
    for b in range(B):
        c = jax.lax.dynamic_update_slice(
            c, vals[b:b + 1], (rows[b], 0, pos0[b], 0)[: c.ndim])
    return c


def _chunk_append(cache, k, v, pos, page_table=None, page_aligned=False):
    """Append T tokens' K/V (B, T, Hkv, Dh) at CONTIGUOUS positions ``pos``
    (B, T) — the T-token generalization of llama._cache_append (plain,
    quantized, paged), all via in-place dynamic-update-slice chains.

    Paged: ``page_aligned=True`` (chunked prefill admission — pos[b, 0] is
    page-aligned and T is a page multiple) writes whole pages; otherwise
    (speculative verify, small T) one DUS per (b, t)."""
    from leetcuda_tpu.models.llama import _quantize_token_kv

    B, T = pos.shape
    if "k_pages" in cache:
        page = cache["k_pages"].shape[2]
        c = dict(cache)
        quant = "k_scales" in cache
        if quant:
            kq, ks = _quantize_token_kv(k, cache["k_pages"].dtype)
            vq, vs = _quantize_token_kv(v, cache["v_pages"].dtype)
        else:
            kq, vq = k, v
        kq = kq.transpose(0, 2, 1, 3)   # (B, Hkv, T, D)
        vq = vq.transpose(0, 2, 1, 3)
        if page_aligned:
            assert T % page == 0, (T, page)
            n = T // page
            for j in range(n):
                sl = slice(j * page, (j + 1) * page)
                phys = page_table[jnp.arange(B), pos[:, 0] // page + j]
                zero = jnp.zeros_like(phys)
                c["k_pages"] = _dus_chunk(c["k_pages"], kq[:, :, sl], phys,
                                          zero)
                c["v_pages"] = _dus_chunk(c["v_pages"], vq[:, :, sl], phys,
                                          zero)
                if quant:
                    c["k_scales"] = _dus_chunk(
                        c["k_scales"], ks.transpose(0, 2, 1)[:, :, sl],
                        phys, zero)
                    c["v_scales"] = _dus_chunk(
                        c["v_scales"], vs.transpose(0, 2, 1)[:, :, sl],
                        phys, zero)
        else:
            bidx = jnp.arange(B)
            for t in range(T):
                phys = page_table[bidx, pos[:, t] // page]
                offs = pos[:, t] % page
                c["k_pages"] = _dus_chunk(c["k_pages"], kq[:, :, t:t + 1],
                                          phys, offs)
                c["v_pages"] = _dus_chunk(c["v_pages"], vq[:, :, t:t + 1],
                                          phys, offs)
                if quant:
                    c["k_scales"] = _dus_chunk(
                        c["k_scales"], ks[:, t:t + 1].transpose(0, 2, 1),
                        phys, offs)
                    c["v_scales"] = _dus_chunk(
                        c["v_scales"], vs[:, t:t + 1].transpose(0, 2, 1),
                        phys, offs)
        return c
    c = dict(cache)
    bidx = jnp.arange(B)
    pos0 = pos[:, 0]
    if "k_scale" in cache:
        kq, ks = _quantize_token_kv(k, cache["k"].dtype)  # ks (B, T, Hkv)
        vq, vs = _quantize_token_kv(v, cache["v"].dtype)
        c["k"] = _dus_chunk(cache["k"], kq.transpose(0, 2, 1, 3), bidx, pos0)
        c["v"] = _dus_chunk(cache["v"], vq.transpose(0, 2, 1, 3), bidx, pos0)
        c["k_scale"] = _dus_chunk(cache["k_scale"], ks.transpose(0, 2, 1),
                                  bidx, pos0)
        c["v_scale"] = _dus_chunk(cache["v_scale"], vs.transpose(0, 2, 1),
                                  bidx, pos0)
    else:
        c["k"] = _dus_chunk(cache["k"], k.transpose(0, 2, 1, 3), bidx, pos0)
        c["v"] = _dus_chunk(cache["v"], v.transpose(0, 2, 1, 3), bidx, pos0)
    return c


def _chunk_cache_attend(q, cache, base_lengths, cfg, mesh=None,
                        page_table=None, window=None, sinks=None):
    """Chunk attention over any cache layout via the attention/chunk.py
    kernels; q (B, T, H, Dh) -> (B, T, H, Dh). Under a mesh: shard_map with
    batch on dp, heads on tp (mirrors llama._cache_attend). ``sinks``
    (GPT-OSS, (H,)): kernels run with_lse and the out rows are damped by
    sigmoid(lse - sink) — the same correction as llama._attention."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from leetcuda_tpu.attention.chunk import (
        make_chunk_attention, make_paged_chunk_attention)

    with_lse = sinks is not None
    softcap, sm_scale = cfg.attn_softcap, cfg.query_scale
    qk = q.transpose(0, 2, 1, 3).astype(cfg.dtype)  # (B, H, T, Dh)
    if "k_pages" in cache:
        quantized = "k_scales" in cache
        fn = make_paged_chunk_attention(window=window, quantized=quantized,
                                        softcap=softcap, sm_scale=sm_scale,
                                        with_lse=with_lse)
        if quantized:
            args = (qk, cache["k_pages"], cache["v_pages"],
                    cache["k_scales"], cache["v_scales"], page_table,
                    base_lengths)
            in_specs = (P("dp", "tp", None, None), P(None, "tp", None, None),
                        P(None, "tp", None, None), P(None, "tp", None),
                        P(None, "tp", None), P("dp", None), P("dp"))
        else:
            args = (qk, cache["k_pages"], cache["v_pages"], page_table,
                    base_lengths)
            in_specs = (P("dp", "tp", None, None), P(None, "tp", None, None),
                        P(None, "tp", None, None), P("dp", None), P("dp"))
    else:
        quantized = "k_scale" in cache
        fn = make_chunk_attention(window=window, quantized=quantized,
                                  softcap=softcap, sm_scale=sm_scale,
                                  with_lse=with_lse)
        if quantized:
            args = (qk, cache["k"], cache["v"], cache["k_scale"],
                    cache["v_scale"], base_lengths)
            in_specs = (P("dp", "tp", None, None), P("dp", "tp", None, None),
                        P("dp", "tp", None, None), P("dp", "tp", None),
                        P("dp", "tp", None), P("dp"))
        else:
            args = (qk, cache["k"], cache["v"], base_lengths)
            in_specs = (P("dp", "tp", None, None), P("dp", "tp", None, None),
                        P("dp", "tp", None, None), P("dp"))
    out_specs = (P("dp", "tp", None, None),
                 P("dp", "tp", None)) if with_lse else P("dp", "tp", None,
                                                         None)
    if mesh is None:
        o = fn(*args)
    else:
        o = shard_map(fn, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)(*args)
    if with_lse:
        o, lse = o  # lse (B, H, T)
        o = o * jax.nn.sigmoid(
            lse - sinks[None, :, None]).astype(o.dtype)[..., None]
    return o.transpose(0, 2, 1, 3).astype(jnp.float32)


def decode_chunk(params, tokens, caches, lengths, cfg: ModelConfig,
                 mesh=None, page_table=None, page_aligned=False,
                 adapter_ids=None):
    """T-token decode step (chunked prefill / speculative verify).

    tokens (B, T) int32 at positions lengths..lengths+T-1. Returns
    (logits (B, T, V), new caches with all T K/V appended). Composes with
    every cache layout the decode path serves: quantized (int8/fp8 + scales),
    paged (``page_table``; the caller must have ensured pages cover
    lengths+T-1), sliding window, and TP/dp meshes."""
    B, T = tokens.shape
    H, Hkv, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = jnp.take(params["embed"], tokens, axis=0)  # (B, T, D)
    if cfg.embed_scale:
        import math as _math
        x = (x.astype(jnp.float32) * _math.sqrt(cfg.dim)).astype(x.dtype)
    pos = lengths[:, None] + jnp.arange(T)[None, :]  # (B, T)

    new_caches = []
    for li, (layer, cache) in enumerate(zip(params["layers"], caches)):
        h = (_rms_norm(x, layer["attn_norm"], cfg.norm_eps, cfg.rms_offset)
             if "attn_norm" in layer else x)
        q, k, v = _proj_qkv(h, layer, H, Hkv, Dh,
                            adapter_ids=adapter_ids)
        if ("q_norm" in layer
                and layer["q_norm"].shape[-1] == H * Dh):  # OLMo2 flat
            q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
            k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
        q = q.reshape(B, T, H, Dh)
        k = k.reshape(B, T, Hkv, Dh)
        if cfg.qk_norm:
            q = _rms_norm(q, layer["q_norm"], cfg.norm_eps)
            k = _rms_norm(k, layer["k_norm"], cfg.norm_eps)
        if cfg.layer_rope(li):
            q = _apply_rope(q, pos, cfg)
            k = _apply_rope(k, pos, cfg)
        v = v.reshape(B, T, Hkv, Dh)
        c = _chunk_append(cache, k, v, pos, page_table=page_table,
                          page_aligned=page_aligned)
        new_caches.append(c)
        o = _chunk_cache_attend(q, c, lengths, cfg, mesh=mesh,
                                page_table=page_table,
                                window=cfg.layer_window(li),
                                sinks=layer.get("sinks"))  # (B,T,H,Dh) f32
        attn_out = linear(o.reshape(B, T, H * Dh).astype(x.dtype),
                          layer["wo"], adapter_ids=adapter_ids)
        if "post_attn_norm" in layer:
            attn_out = _rms_norm(attn_out, layer["post_attn_norm"],
                                 cfg.norm_eps, cfg.rms_offset)
        x = x + attn_out
        h = (_rms_norm(x, layer["mlp_norm"], cfg.norm_eps, cfg.rms_offset)
             if "mlp_norm" in layer else x)
        mlp_out = _proj_mlp(h, layer, cfg, adapter_ids=adapter_ids)
        if "post_mlp_norm" in layer:
            mlp_out = _rms_norm(mlp_out, layer["post_mlp_norm"],
                                cfg.norm_eps, cfg.rms_offset)
        x = x + mlp_out

    x = _rms_norm(x, params["norm"], cfg.norm_eps, cfg.rms_offset)
    w_lm = params.get("lm_head", params["embed"])
    logits = (x @ w_lm.T).astype(jnp.float32)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits, new_caches


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def _jit_chunk(params, tokens, caches, lengths, cfg):
    return decode_chunk(params, tokens, caches, lengths, cfg)


def speculative_generate(params_target, cfg_t: ModelConfig,
                         params_draft, cfg_d: ModelConfig,
                         prompts, max_new: int, k: int = 4,
                         max_seq: int | None = None):
    """Greedy speculative decoding for a (B, S) prompt batch.

    Returns (tokens (B, max_new), acceptance_rate). Exactness: the output
    equals the target model's own greedy decode (tested)."""
    B, S = prompts.shape
    max_seq = max_seq or ((S + max_new + k + 1023) // 1024) * 1024

    # prefill both models
    caches_t = init_kv_caches(cfg_t, B, max_seq)
    caches_d = init_kv_caches(cfg_d, B, max_seq)
    logits_t, kvs = forward(params_target, prompts, cfg_t, return_kv=True)
    caches_t = _insert_kvs(caches_t, kvs, jnp.int32(0), jnp.int32(S))
    _, kvs_d = forward(params_draft, prompts, cfg_d, return_kv=True)
    caches_d = _insert_kvs(caches_d, kvs_d, jnp.int32(0), jnp.int32(S))

    lengths = jnp.full((B,), S, jnp.int32)  # shared: both caches in sync
    cur = jnp.argmax(logits_t[:, S - 1], axis=-1).astype(jnp.int32)

    out = np.zeros((B, max_new + k + 1), np.int32)
    n_out = np.zeros((B,), np.int64)
    accepted_tot, proposed_tot = 0, 0

    while int(n_out.min()) < max_new:
        not_done = n_out < max_new
        for b in range(B):
            if not_done[b]:   # emit the committed token
                out[b, n_out[b]] = int(cur[b])
                n_out[b] += 1

        # --- draft proposes k tokens (its cache advances k steps) ------------
        d_tokens = [cur]
        d_len = lengths
        tok = cur
        for _ in range(k):
            lg, caches_d = decode_step(params_draft, tok, caches_d,
                                       d_len, cfg_d)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            d_tokens.append(tok)
            d_len = d_len + 1
        # append the k-th proposal's K/V too: if the whole chunk is accepted,
        # the next round's draft decode needs position lengths+k populated
        _, caches_d = decode_step(params_draft, tok, caches_d, d_len, cfg_d)
        chunk = jnp.stack(d_tokens, axis=1)  # (B, k+1): cur + k proposals

        # --- target verifies the whole chunk in one pass ----------------------
        logits, caches_t = _jit_chunk(params_target, chunk, caches_t,
                                      lengths, cfg_t)
        target_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,k+1)

        # accepted[i] = how many of the k proposals match the target's greedy
        proposals = chunk[:, 1:]                   # (B, k)
        match = proposals == target_next[:, :-1]
        n_acc = jnp.argmin(jnp.concatenate(
            [match, jnp.zeros((B, 1), bool)], axis=1).astype(jnp.int32),
            axis=1)                                # first mismatch index
        n_acc_np = np.asarray(n_acc)
        accepted_tot += int(n_acc_np[not_done].sum())
        proposed_tot += int(not_done.sum()) * k

        for b in range(B):
            if not not_done[b]:
                continue
            for t in range(int(n_acc_np[b])):
                if n_out[b] < max_new + k:
                    out[b, n_out[b]] = int(proposals[b, t])
                n_out[b] += 1

        # commit: cur = target's token after the accepted prefix; lengths
        # advance past cur + accepted (rejected suffix K/V simply stays
        # masked-out and will be overwritten). Finished sequences freeze.
        cur = jnp.where(jnp.asarray(not_done),
                        jnp.take_along_axis(target_next, n_acc[:, None],
                                            axis=1)[:, 0], cur)
        lengths = lengths + jnp.where(jnp.asarray(not_done), 1 + n_acc, 0)
        # draft cache: same rollback-by-length (its appends beyond are masked)

    rate = accepted_tot / max(proposed_tot, 1)
    return jnp.asarray(out[:, :max_new]), rate


# --- stochastic speculative sampling ----------------------------------------------
# Rejection scheme of "Fast Inference from Transformers via Speculative
# Decoding" (Leviathan et al.) / "Accelerating LLM Decoding with Speculative
# Sampling" (Chen et al.): accept draft token x ~ p_d w.p. min(1, p_t(x)/
# p_d(x)); on rejection emit y ~ norm(max(p_t - p_d, 0)). The emitted
# marginal is EXACTLY p_t per position (tested by Monte Carlo in
# tests/test_speculative.py), so sampled serving keeps the target model's
# distribution while still amortizing its weight stream over k+1 positions.


def rejection_step(key, x, p_d, p_t):
    """One position of speculative rejection sampling.

    x (B,) draft tokens drawn from p_d (B, V); p_t (B, V) the target's warped
    distribution at the same position. Returns (accept (B,) bool,
    replacement (B,) int32 drawn from the normalized residual — only
    meaningful where ``accept`` is False)."""
    ku, kr = jax.random.split(key)
    pt_x = jnp.take_along_axis(p_t, x[:, None], axis=1)[:, 0]
    pd_x = jnp.take_along_axis(p_d, x[:, None], axis=1)[:, 0]
    u = jax.random.uniform(ku, x.shape, jnp.float32)
    accept = u * pd_x < pt_x          # u < p_t(x)/p_d(x), div-free form
    resid = jnp.maximum(p_t - p_d, 0.0)
    mass = resid.sum(axis=-1, keepdims=True)
    # p_t == p_d -> zero residual; any draw is already exact, use p_t
    resid = jnp.where(mass > 0, resid / jnp.maximum(mass, 1e-30), p_t)
    repl = jax.random.categorical(
        kr, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1).astype(jnp.int32)
    return accept, repl


def speculative_verdict(key, chunk, p_d_all, logits, warp):
    """The composite accept/replace rule — THE single implementation shared
    by the engine's speculative tick and the standalone generator.

    chunk (B, k+1) draft tokens (position 0 = the committed token); p_d_all
    (B, k, V) draft distributions for positions 1..k; logits (B, k+1, V)
    target verify logits; warp the sampler's distribution transform.
    Returns (n_acc (B,) accepted-prefix lengths, next (B,) the committed
    next token: the residual draw at the first rejection, or a bonus draw
    from p_t[k] on full accept)."""
    B, k = p_d_all.shape[0], p_d_all.shape[1]
    p_t = jax.nn.softmax(warp(logits), axis=-1)
    keys = jax.random.split(key, k + 1)
    accs, reps = [], []
    for t in range(k):
        a, r = rejection_step(keys[t], chunk[:, t + 1],
                              p_d_all[:, t], p_t[:, t])
        accs.append(a)
        reps.append(r)
    match = jnp.stack(accs, axis=1)
    n_acc = jnp.argmin(jnp.concatenate(
        [match, jnp.zeros((B, 1), bool)], axis=1).astype(jnp.int32), axis=1)
    bonus = jax.random.categorical(
        keys[k], jnp.log(jnp.maximum(p_t[:, k], 1e-30)),
        axis=-1).astype(jnp.int32)
    repl = jnp.take_along_axis(
        jnp.stack(reps, axis=1),
        jnp.minimum(n_acc, k - 1)[:, None], axis=1)[:, 0]
    return n_acc, jnp.where(n_acc == k, bonus, repl)


def speculative_sample_generate(params_target, cfg_t: ModelConfig,
                                params_draft, cfg_d: ModelConfig,
                                prompts, max_new: int, key,
                                k: int = 4, temperature: float = 1.0,
                                top_k: int | None = None,
                                top_p: float | None = None,
                                max_seq: int | None = None):
    """Sampled speculative decoding for a (B, S) prompt batch.

    Per-position output distribution == sampling the target model directly
    with the same (temperature, top_k, top_p) warp — the draft only changes
    WHEN tokens are computed, not WHAT distribution they come from. Returns
    (tokens (B, max_new), acceptance_rate). ``temperature <= 0`` degenerates
    to the greedy-exact path, matching make_sampler's contract."""
    from leetcuda_tpu.engine.sampling import make_warper

    if temperature <= 0:
        return speculative_generate(params_target, cfg_t, params_draft,
                                    cfg_d, prompts, max_new, k=k,
                                    max_seq=max_seq)
    warp = make_warper(temperature, top_k, top_p)
    B, S = prompts.shape
    max_seq = max_seq or ((S + max_new + k + 1023) // 1024) * 1024

    caches_t = init_kv_caches(cfg_t, B, max_seq)
    caches_d = init_kv_caches(cfg_d, B, max_seq)
    logits_t, kvs = forward(params_target, prompts, cfg_t, return_kv=True)
    caches_t = _insert_kvs(caches_t, kvs, jnp.int32(0), jnp.int32(S))
    _, kvs_d = forward(params_draft, prompts, cfg_d, return_kv=True)
    caches_d = _insert_kvs(caches_d, kvs_d, jnp.int32(0), jnp.int32(S))

    lengths = jnp.full((B,), S, jnp.int32)
    key, k0 = jax.random.split(key)
    cur = jax.random.categorical(
        k0, warp(logits_t[:, S - 1]), axis=-1).astype(jnp.int32)

    out = np.zeros((B, max_new + k + 1), np.int32)
    n_out = np.zeros((B,), np.int64)
    accepted_tot = proposed_tot = 0

    while int(n_out.min()) < max_new:
        not_done = n_out < max_new
        for b in range(B):
            if not_done[b]:
                out[b, n_out[b]] = int(cur[b])
                n_out[b] += 1

        # --- draft proposes k sampled tokens, recording its distributions ----
        key, *dkeys = jax.random.split(key, k + 1)
        d_tokens, d_probs = [cur], []
        d_len = lengths
        tok = cur
        for t in range(k):
            lg, caches_d = decode_step(params_draft, tok, caches_d,
                                       d_len, cfg_d)
            p_d = jax.nn.softmax(warp(lg), axis=-1)
            tok = jax.random.categorical(
                dkeys[t], jnp.log(jnp.maximum(p_d, 1e-30)),
                axis=-1).astype(jnp.int32)
            d_tokens.append(tok)
            d_probs.append(p_d)
            d_len = d_len + 1
        _, caches_d = decode_step(params_draft, tok, caches_d, d_len, cfg_d)
        chunk = jnp.stack(d_tokens, axis=1)          # (B, k+1)
        p_d_all = jnp.stack(d_probs, axis=1)         # (B, k, V)

        # --- target verifies; shared composite accept/replace rule -----------
        logits, caches_t = _jit_chunk(params_target, chunk, caches_t,
                                      lengths, cfg_t)
        key, vkey = jax.random.split(key)
        n_acc_j, nxt = speculative_verdict(vkey, chunk, p_d_all, logits,
                                           warp)

        n_acc = np.asarray(n_acc_j)
        proposals = np.asarray(chunk[:, 1:])
        accepted_tot += int(n_acc[not_done].sum())
        proposed_tot += int(not_done.sum()) * k

        for b in range(B):
            if not not_done[b]:
                continue
            for t in range(int(n_acc[b])):
                if n_out[b] < max_new + k:
                    out[b, n_out[b]] = int(proposals[b, t])
                n_out[b] += 1

        cur = jnp.where(jnp.asarray(not_done), nxt, cur)
        lengths = lengths + jnp.where(jnp.asarray(not_done),
                                      1 + n_acc_j, 0)

    rate = accepted_tot / max(proposed_tot, 1)
    return jnp.asarray(out[:, :max_new]), rate
