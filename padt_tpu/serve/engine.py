"""Continuous-batching serve engine: slot-recycled decode over a shared batch.

The reference serves eval workloads with fixed batches (`inference_coco.py:107`,
batch 16/32): every sequence in a batch steps until the LONGEST one finishes,
so a single OVD straggler (hundreds of tokens) keeps finished REC slots
(~25 tokens) burning decode steps. This module is that hot path done TPU-right:

  - a fixed pool of B decode slots (static shapes, one compiled step),
  - per-slot cache write positions / rope positions / budgets,
  - finished slots are harvested and REFILLED from a request queue while the
    rest of the pool keeps decoding (JetStream-style prefill->insert->decode
    split, adapted to PaDT's extended-vocab decode loop),
  - prefill runs in fixed-size buckets (own compile) and is spliced into the
    int8 KV cache with `insert`.

Decode state is int8-KV only (the serving configuration measured fastest in
BASELINE.md); the decode step reuses `ops.kv_cache.decode_attention_int8`,
whose per-sample `valid` mask already expresses ragged per-slot lengths.

Greedy by default (the reference eval path, `utils.py:233-236`); temperature /
top-k / top-p sampling available via the engine's sampling args (shared
`padt.sample_token` logic, one pool-wide PRNG stream).
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import PaDTConfig
from ..models import language
from ..models import padt as padt_model
from ..ops.kv_cache import (
    decode_attention_int8,
    quantize_kv,
    store_kv_rows_all_layers,
)
from ..ops.norms import rms_norm
from ..ops.quant import linear as qlinear
from ..ops.rope import mrope_cos_sin


class DecodeState(NamedTuple):
    """Per-slot decode pool. Leading dim of every leaf = n_slots."""

    k8: jnp.ndarray  # (L, B, Hkv, C, hd) int8
    ks: jnp.ndarray  # (L, B, Hkv, C) f32
    v8: jnp.ndarray
    vs: jnp.ndarray
    valid: jnp.ndarray  # (B, C) bool — live cache slots
    write_pos: jnp.ndarray  # (B,) int32 — next cache slot to write
    text_pos: jnp.ndarray  # (B,) int32 — next rope position (all 3 streams equal past prompt)
    cur_hidden: jnp.ndarray  # (B, 1, D) — hidden that predicts the next token
    proto: jnp.ndarray  # (B, M, D) — per-slot VRT prototype table
    num_merged: jnp.ndarray  # (B,)
    tokens: jnp.ndarray  # (B, T) int32 — generated tokens
    hidden_out: jnp.ndarray  # (B, T, D) — hidden that produced each token (vl_decode input)
    n_gen: jnp.ndarray  # (B,) int32
    budget: jnp.ndarray  # (B,) int32 — per-request max_new_tokens
    active: jnp.ndarray  # (B,) bool
    rng: jnp.ndarray  # PRNG key (sampling; unused under greedy)
    # speculative decoding (n-gram/prompt-lookup drafts): full token context
    # (prompt suffix + generated) per slot, for bigram draft lookups
    ctx: jnp.ndarray  # (B, C) int32
    ctx_len: jnp.ndarray  # (B,) int32
    steps: jnp.ndarray  # () int32 — decode/verify forwards executed (exact)


class PrefillPack(NamedTuple):
    """Everything `insert` needs to splice R prefilled requests into slots."""

    k8: jnp.ndarray  # (L, R, Hkv, C, hd)
    ks: jnp.ndarray
    v8: jnp.ndarray
    vs: jnp.ndarray
    valid: jnp.ndarray  # (R, C)
    write_pos: jnp.ndarray  # (R,)
    text_pos: jnp.ndarray  # (R,)
    cur_hidden: jnp.ndarray  # (R, 1, D)
    proto: jnp.ndarray  # (R, M, D)
    num_merged: jnp.ndarray  # (R,)
    prompt_ctx: jnp.ndarray  # (R, C) int32 — real prompt tokens left-aligned
    prompt_len: jnp.ndarray  # (R,) int32


def init_state(
    cfg: PaDTConfig,
    n_slots: int,
    capacity: int,
    max_new_tokens: int,
    dtype=jnp.bfloat16,
    patch_bucket: Optional[int] = None,
) -> DecodeState:
    t = cfg.text
    L, hkv, hd, d = t.num_hidden_layers, t.num_key_value_heads, t.head_dim, t.hidden_size
    m = (patch_bucket or cfg.max_image_patches) // cfg.vision.spatial_merge_unit
    return DecodeState(
        k8=jnp.zeros((L, n_slots, hkv, capacity, hd), jnp.int8),
        ks=jnp.zeros((L, n_slots, hkv, capacity), jnp.float32),
        v8=jnp.zeros((L, n_slots, hkv, capacity, hd), jnp.int8),
        vs=jnp.zeros((L, n_slots, hkv, capacity), jnp.float32),
        valid=jnp.zeros((n_slots, capacity), bool),
        write_pos=jnp.zeros((n_slots,), jnp.int32),
        text_pos=jnp.zeros((n_slots,), jnp.int32),
        cur_hidden=jnp.zeros((n_slots, 1, d), dtype),
        proto=jnp.zeros((n_slots, m, d), dtype),
        num_merged=jnp.zeros((n_slots,), jnp.int32),
        tokens=jnp.full((n_slots, max_new_tokens), cfg.pad_token_id, jnp.int32),
        hidden_out=jnp.zeros((n_slots, max_new_tokens, d), dtype),
        n_gen=jnp.zeros((n_slots,), jnp.int32),
        budget=jnp.zeros((n_slots,), jnp.int32),
        active=jnp.zeros((n_slots,), bool),
        rng=jax.random.PRNGKey(0),
        ctx=jnp.full((n_slots, capacity), -1, jnp.int32),
        ctx_len=jnp.zeros((n_slots,), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
    )


def prefill(
    params,
    cfg: PaDTConfig,
    batch: Dict[str, jnp.ndarray],
    rope_deltas: jnp.ndarray,
    capacity: int,
    return_artifacts: bool = False,
):
    """Vision + causal prefill for a request bucket -> insertable pack.

    `return_artifacts=True` additionally returns the bucket's full
    `VisionArtifacts` so a serving pipeline can run the perception decoder
    (`padt.vl_decode`) on completed requests (~8 MB/request device-resident)."""
    l = batch["input_ids"].shape[1]
    art = padt_model.run_vision(params, cfg, batch)
    embeds = padt_model.extended_embed(params, cfg, batch["input_ids"], art.proto, art.merged)
    valid = batch["attention_mask"].astype(bool)
    hidden, qc = language.prefill(
        params["text"], cfg.text, embeds, batch["position_ids"], valid, capacity,
        kv_dtype="int8",  # quantized inside the scan: no full bf16 cache stack
    )
    r = batch["input_ids"].shape[0]
    # left-aligned prompt context for n-gram draft lookups (prompts are
    # LEFT-padded: real tokens are the last plen of each row)
    plen = valid.sum(-1).astype(jnp.int32)
    cap = qc.valid.shape[1]
    src_idx = jnp.clip(l - plen[:, None] + jnp.arange(cap)[None, :], 0, l - 1)
    ctx = jnp.take_along_axis(
        batch["input_ids"].astype(jnp.int32), src_idx, axis=1
    )
    ctx = jnp.where(jnp.arange(cap)[None, :] < plen[:, None], ctx, -1)
    pack = PrefillPack(
        k8=qc.k,
        ks=qc.k_scale,
        v8=qc.v,
        vs=qc.v_scale,
        valid=qc.valid,
        write_pos=jnp.full((r,), l, jnp.int32),
        text_pos=(l + rope_deltas).astype(jnp.int32),
        cur_hidden=hidden[:, -1:, :],
        proto=art.proto,
        num_merged=art.num_merged.astype(jnp.int32),
        prompt_ctx=ctx,
        prompt_len=plen,
    )
    return (pack, art) if return_artifacts else pack


def insert(
    state: DecodeState,
    pack: PrefillPack,
    slots: jnp.ndarray,  # (R,) int32
    budgets: jnp.ndarray,  # (R,) int32; <=0 marks a padding request (slot stays idle)
) -> DecodeState:
    """Splice R prefilled requests into the given slots (scatter per leaf).

    tokens/hidden_out rows are NOT reset: the harvest path reads only
    [:n_gen], all of which the incoming occupant rewrites."""
    live = budgets > 0
    return state._replace(
        k8=state.k8.at[:, slots].set(pack.k8),
        ks=state.ks.at[:, slots].set(pack.ks),
        v8=state.v8.at[:, slots].set(pack.v8),
        vs=state.vs.at[:, slots].set(pack.vs),
        valid=state.valid.at[slots].set(pack.valid),
        write_pos=state.write_pos.at[slots].set(pack.write_pos),
        text_pos=state.text_pos.at[slots].set(pack.text_pos),
        cur_hidden=state.cur_hidden.at[slots].set(pack.cur_hidden),
        proto=state.proto.at[slots].set(pack.proto),
        num_merged=state.num_merged.at[slots].set(pack.num_merged),
        n_gen=state.n_gen.at[slots].set(0),
        budget=state.budget.at[slots].set(budgets),
        active=state.active.at[slots].set(live),
        ctx=state.ctx.at[slots].set(pack.prompt_ctx),
        ctx_len=state.ctx_len.at[slots].set(pack.prompt_len),
    )


def _decode_step_slots(params, tcfg, inputs_embeds, state: DecodeState):
    """One decode step over the slot pool with PER-SLOT cache positions.

    Same math as `language._decode_step_int8` but the scalar cache length
    becomes `state.write_pos (B,)`: the new token's K/V is scattered at each
    slot's own position (vmapped dynamic_update_slice -> one XLA scatter)."""
    b = inputs_embeds.shape[0]
    pos3 = jnp.broadcast_to(state.text_pos[None, :, None], (3, b, 1))
    cos, sin = mrope_cos_sin(pos3, tcfg.head_dim, tcfg.mrope_section, tcfg.rope_theta)
    # Clamp the store row: a DRAINED slot's write_pos can equal capacity (when
    # prompt_len + budget == capacity); without the clamp the Pallas row store
    # relies on Mosaic index-map clamping and silently overwrites row cap-1 of
    # the finished request's cache. Inactive slots' rows are never read, but
    # keep the write in-bounds by construction.
    capacity = state.valid.shape[1]
    store_pos = jnp.minimum(state.write_pos, capacity - 1)
    # activate each ACTIVE slot's write position (inactive slots keep theirs)
    rows = jnp.arange(b)
    cur = state.valid[rows, store_pos]
    new_valid = state.valid.at[rows, store_pos].set(cur | state.active)

    nl = len(jax.tree.leaves(params["layers"])[0])
    k8a, ksa, v8a, vsa = state.k8, state.ks, state.v8, state.vs

    def body(x, layer):
        # read-only-cache decomposition (same as language._decode_step_int8):
        # the layer-indexed kernel reads the PRE-update stack (loop invariant
        # -> no scan-carry cache copies) and composites the current token's
        # K/V in-kernel; every layer's new row leaves as ys and ONE all-layer
        # aliased row store lands them post-scan. The fresh column is
        # composited for INACTIVE slots too — their outputs are discarded and
        # their (clamped) row writes land in caches that are never read again.
        lp, li = layer
        xn = rms_norm(x, lp["input_ln_w"], tcfg.rms_norm_eps)
        q, k, v = language._qkv(xn, lp, tcfg, cos, sin)
        k8n, ksn = quantize_kv(k.transpose(0, 2, 1, 3))  # (B, Hkv, 1, hd)
        v8n, vsn = quantize_kv(v.transpose(0, 2, 1, 3))
        attn = decode_attention_int8(
            q, k8a, ksa, v8a, vsa, state.valid, layer=li,
            fresh_kv=(k8n, ksn, v8n, vsn),
        )
        x = x + qlinear(lp, "o_w", attn.reshape(*x.shape[:2], -1))
        xn = rms_norm(x, lp["post_ln_w"], tcfg.rms_norm_eps)
        x = x + language._mlp(xn, lp)
        return x, (k8n, ksn, v8n, vsn)

    x, (k8r, ksr, v8r, vsr) = jax.lax.scan(
        body, inputs_embeds, (params["layers"], jnp.arange(nl, dtype=jnp.int32))
    )
    # one aliased launch writes every (layer, slot) row at its own position
    # (a vmapped dynamic_update_slice lowers to an XLA scatter: measured
    # +20 ms/step at 3B/64 slots)
    k8, ks, v8, vs = store_kv_rows_all_layers(
        k8a, ksa, v8a, vsa, k8r, ksr, v8r, vsr, store_pos
    )
    hidden = rms_norm(x, params["final_ln_w"], tcfg.rms_norm_eps)
    return hidden, state._replace(k8=k8, ks=ks, v8=v8, vs=vs, valid=new_valid)


def _decode_spec_slots(
    params, tcfg, inputs_embeds, state: DecodeState, store_pos, active_mask=None,
    n_store_rows=None,
):
    """K-token verify step for speculative decoding: same per-slot layout as
    `_decode_step_slots`, but K consecutive tokens are embedded, their KVs
    stored at store_pos..store_pos+K-1 (k-row aliased store), and attention
    runs all K queries over ONE cache read with per-query causal limits
    (`decode_attention_int8_multi`). Returns hidden (B, K, D).

    `active_mask` (B,) selects which slots' new rows become valid; defaults to
    `state.active` (the speculative-verify semantics). The prefix-cache suffix
    prefill passes only its admitted slots so a pool-wide suffix pass can't
    mark garbage rows valid in slots that are mid-decode.

    `n_store_rows` (B,) limits how many of the K rows are PHYSICALLY written
    per slot (default all K). Slots outside a pool-wide pass must pass 0:
    their store_pos is clamped to cap-K, which for a near-capacity slot lands
    on LIVE rows — validity masking alone would leave those rows' bytes
    silently corrupted."""
    from ..ops.kv_cache import decode_attention_int8_multi, store_kv_rows_k_all_layers

    if active_mask is None:
        active_mask = state.active
    b, kq, _ = inputs_embeds.shape
    pos3 = jnp.broadcast_to(state.text_pos[None, :, None], (3, b, kq)) + jnp.arange(kq)[None, None, :]
    cos, sin = mrope_cos_sin(pos3, tcfg.head_dim, tcfg.mrope_section, tcfg.rope_theta)
    rows = jnp.arange(b)
    # activate the K new positions for SELECTED slots (masked per position
    # later by the per-query limit; rejected rows are invalidated by the caller)
    newly = (jnp.arange(state.valid.shape[1])[None, :] >= store_pos[:, None]) & (
        jnp.arange(state.valid.shape[1])[None, :] < store_pos[:, None] + kq
    )
    new_valid = state.valid | (newly & active_mask[:, None])

    nl = len(jax.tree.leaves(params["layers"])[0])
    k8a, ksa, v8a, vsa = state.k8, state.ks, state.v8, state.vs

    def body(x, layer):
        # read-only-cache decomposition (same as _decode_step_slots): kernels
        # read the PRE-update stack with the K verify tokens' K/V composited
        # in-kernel (intra-block causal); every layer's K new rows leave as
        # ys and ONE all-layer aliased k-row store lands them post-scan.
        lp, li = layer
        xn = rms_norm(x, lp["input_ln_w"], tcfg.rms_norm_eps)
        q, k, v = language._qkv(xn, lp, tcfg, cos, sin)
        k8n, ksn = quantize_kv(k.transpose(0, 2, 1, 3))  # (B, Hkv, K, hd)
        v8n, vsn = quantize_kv(v.transpose(0, 2, 1, 3))
        attn = decode_attention_int8_multi(
            q, k8a, ksa, v8a, vsa, state.valid, store_pos, layer=li,
            fresh_kv=(k8n, ksn, v8n, vsn),
        )
        x = x + qlinear(lp, "o_w", attn.reshape(*x.shape[:2], -1))
        xn = rms_norm(x, lp["post_ln_w"], tcfg.rms_norm_eps)
        x = x + language._mlp(xn, lp)
        return x, (k8n, ksn, v8n, vsn)

    x, (k8r, ksr, v8r, vsr) = jax.lax.scan(
        body, inputs_embeds, (params["layers"], jnp.arange(nl, dtype=jnp.int32))
    )
    k8, ks, v8, vs = store_kv_rows_k_all_layers(
        k8a, ksa, v8a, vsa, k8r, ksr, v8r, vsr, store_pos, n_rows=n_store_rows
    )
    hidden = rms_norm(x, params["final_ln_w"], tcfg.rms_norm_eps)
    return hidden, state._replace(k8=k8, ks=ks, v8=v8, vs=vs, valid=new_valid)


_SUFFIX_K = 32  # per-pass suffix width (= kv_cache._STORE_ROWS, the k-row store bound)


def _suffix_prefill_step(params, cfg: PaDTConfig, state: DecodeState, inputs, slen):
    """One K=32 suffix-prefill pass over the slot pool (prefix KV caching).

    Slots admitted with a cached shared prefix (see `SharedPrefix`) already
    hold the prefix KV (spliced by `insert`); this pass runs their per-request
    suffix tokens — RIGHT-padded to K — through the same multi-query machinery
    as the speculative verify step: suffix queries attend the prefix cache
    plus intra-suffix causal fresh columns, one aliased k-row store lands the
    new KV rows. Only the real `slen` rows become/stay valid; `cur_hidden`
    advances to the LAST REAL suffix token's post-norm hidden (the position
    that predicts the first generated token, matching full-prompt prefill).

    `inputs` (B, K) int32 — pad-token rows for slots not in this admission
    (slen == 0): their attention outputs are discarded and NO rows are
    physically stored for them (n_store_rows=0) — their clamped store
    position can land on LIVE rows of a near-capacity slot, so masking
    validity alone is not enough. Participants never clamp: _admit_prefix's
    capacity check guarantees prefix + padded suffix + budget fits, so a
    participant's store positions stay within [0, cap - K].
    """
    kq = inputs.shape[1]
    mask = slen > 0
    emb = padt_model.extended_embed(params, cfg, inputs, state.proto)
    cap = state.valid.shape[1]
    store_pos = jnp.minimum(state.write_pos, cap - kq)
    hid, st2 = _decode_spec_slots(
        params["text"], cfg.text, emb, state, store_pos, active_mask=mask,
        n_store_rows=slen,
    )
    # un-validate the right-pad rows: keep [0, write_pos) ∪ [store_pos, store_pos+slen)
    posc = jnp.arange(cap)[None, :]
    keep = (posc < store_pos[:, None] + slen[:, None]) | (posc < state.write_pos[:, None])
    valid = st2.valid & keep
    # hidden of the last real suffix token predicts the first generated token
    new_cur = jnp.take_along_axis(
        hid, jnp.clip(slen - 1, 0, kq - 1)[:, None, None], axis=1
    )
    cur_hidden = jnp.where(mask[:, None, None], new_cur, st2.cur_hidden)
    # append real suffix tokens to the draft context
    b = inputs.shape[0]
    idxk = jnp.arange(kq)[None, :]
    rowsk = jnp.arange(b)[:, None]
    ctx_idx = jnp.clip(st2.ctx_len[:, None] + idxk, 0, cap - 1)
    emit = idxk < slen[:, None]
    cur_ctx = st2.ctx[rowsk, ctx_idx]
    ctx = st2.ctx.at[rowsk, ctx_idx].set(jnp.where(emit, inputs, cur_ctx))
    return st2._replace(
        valid=valid,
        cur_hidden=cur_hidden,
        ctx=ctx,
        ctx_len=st2.ctx_len + slen,
        write_pos=st2.write_pos + slen,
        text_pos=st2.text_pos + slen,
    )


_PACK_KV = ("k8", "ks", "v8", "vs")  # PrefillPack leaves with batch at axis 1


def _pack_slice(pack: PrefillPack, i: int) -> PrefillPack:
    """Row i of a pack as a leading-dim-1 pack (device-side lazy slices)."""
    return PrefillPack(
        **{
            f: (getattr(pack, f)[:, i : i + 1] if f in _PACK_KV else getattr(pack, f)[i : i + 1])
            for f in PrefillPack._fields
        }
    )


def _pack_concat(rows: List[PrefillPack]) -> PrefillPack:
    """Stack R single-row packs into one insertable R-row pack."""
    return PrefillPack(
        **{
            f: jnp.concatenate(
                [getattr(p, f) for p in rows], axis=1 if f in _PACK_KV else 0
            )
            for f in PrefillPack._fields
        }
    )


def _bigram_draft(ctx, ctx_len, last1, t0, kq):
    """Prompt-lookup drafting: find the most recent bigram (last1, t0) in each
    slot's context and propose the kq-1 tokens that followed it. No match ->
    pad drafts (acceptance simply lands at 0). All VPU compares, O(B*C)."""
    b, c = ctx.shape
    idx = jnp.arange(c)
    # match at j: ctx[j] == last1 and ctx[j+1] == t0, j+1 < ctx_len
    nxt = jnp.concatenate([ctx[:, 1:], jnp.full((b, 1), -1, ctx.dtype)], axis=1)
    match = (ctx == last1[:, None]) & (nxt == t0[:, None]) & (idx[None, :] + 1 < ctx_len[:, None])
    j = jnp.max(jnp.where(match, idx[None, :], -1), axis=1)  # (B,) last match or -1
    has = j >= 0
    gidx = jnp.clip(j[:, None] + 2 + jnp.arange(kq - 1)[None, :], 0, c - 1)
    draft = jnp.take_along_axis(ctx, gidx, axis=1)  # (B, kq-1)
    draft = jnp.where(has[:, None] & (draft >= 0), draft, 0)
    return draft


def decode_chunk_spec(
    params,
    cfg: PaDTConfig,
    state: DecodeState,
    n_steps,  # () int32 — macro-step bound
    draft_k: int,
    oracle_seq=None,  # (T,) int32 — benchmark-only: known-correct drafts
    force_accept: bool = False,  # benchmark-only: bypass verification to
    #   measure the K-accept throughput ceiling (outputs NOT valid tokens)
) -> DecodeState:
    """Speculative (greedy-only) decode chunk: each macro-step drafts
    `draft_k - 1` tokens by prompt-lookup, verifies all of them plus the base
    token in ONE K-token forward, and emits 1..draft_k tokens. Outputs are
    token-identical to plain greedy decoding (the model's own argmax decides
    every emitted token; drafts only decide how many verify in one pass)."""
    eos = cfg.eos_token_id
    b, t_cap = state.tokens.shape
    kq = draft_k
    cap = state.valid.shape[1]

    def cond(carry):
        i, st = carry
        return (i < n_steps) & jnp.any(st.active)

    def body(carry):
        i, st = carry
        # base token t0 from the carried hidden (exact, as in plain decode)
        logits0 = padt_model.extended_logits(
            params, cfg, st.cur_hidden, st.proto, st.num_merged
        )[:, 0]
        t0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        t0 = jnp.where(st.active, t0, cfg.pad_token_id)

        if oracle_seq is not None:
            # mechanism-ceiling measurement: drafts ARE the reference tokens
            # (verification still runs; acceptance is 100% by construction)
            gi = jnp.clip(
                st.n_gen[:, None] + 1 + jnp.arange(kq - 1)[None, :], 0, oracle_seq.shape[0] - 1
            )
            draft = oracle_seq[gi]
        else:
            last1 = jnp.take_along_axis(
                st.ctx, jnp.clip(st.ctx_len[:, None] - 1, 0, cap - 1), axis=1
            )[:, 0]
            draft = _bigram_draft(st.ctx, st.ctx_len, last1, t0, kq)  # (B, kq-1)
        inputs = jnp.concatenate([t0[:, None], draft], axis=1)  # (B, K)

        emb = padt_model.extended_embed(params, cfg, inputs, st.proto)
        store_pos = jnp.minimum(st.write_pos, cap - kq)
        hid, st2 = _decode_spec_slots(params["text"], cfg.text, emb, st, store_pos)

        logits = padt_model.extended_logits(params, cfg, hid, st2.proto, st2.num_merged)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K): g[:,i] follows inputs[:,i]

        # longest accepted draft prefix: draft[:, i] must equal g[:, i]
        ok = draft == g[:, :-1]  # (B, K-1)
        acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)  # 0..K-1
        if force_accept:
            acc = jnp.full_like(acc, kq - 1)
        emitted = 1 + acc  # t0 always exact

        # EOS truncation: stop at the first eos AMONG the emitted tokens
        is_eos = inputs == eos
        idxk = jnp.arange(kq)[None, :]
        eos_pos = jnp.min(jnp.where(is_eos & (idxk < emitted[:, None]), idxk, kq), axis=1)
        emitted = jnp.minimum(emitted, eos_pos + 1)  # include the eos token
        # budget clamp (may cut BELOW the eos position -> eos not emitted)
        room = st2.budget - st2.n_gen
        emitted = jnp.minimum(emitted, room)
        emitted = jnp.where(st2.active, emitted, 0)
        hit_eos = (eos_pos < kq) & (emitted == eos_pos + 1) & st2.active

        # write tokens + hidden at n_gen..n_gen+emitted
        out_idx = jnp.clip(st2.n_gen[:, None] + idxk, 0, t_cap - 1)
        emit_mask = idxk < emitted[:, None]
        rowsk = jnp.arange(b)[:, None]
        cur_tok = st2.tokens[rowsk, out_idx]
        tokens = st2.tokens.at[rowsk, out_idx].set(jnp.where(emit_mask, inputs, cur_tok))
        # hidden that PRODUCED token j: t0 <- carried cur_hidden; draft j <- hid[:, j-1]
        prod_hid = jnp.concatenate([st2.cur_hidden, hid[:, : kq - 1]], axis=1)  # (B, K, D)
        cur_hid_rows = st2.hidden_out[rowsk, out_idx]
        hidden_out = st2.hidden_out.at[rowsk, out_idx].set(
            jnp.where(emit_mask[:, :, None], prod_hid, cur_hid_rows)
        )
        # context append (draft table)
        ctx_idx = jnp.clip(st2.ctx_len[:, None] + idxk, 0, cap - 1)
        cur_ctx = st2.ctx[rowsk, ctx_idx]
        ctx = st2.ctx.at[rowsk, ctx_idx].set(jnp.where(emit_mask, inputs, cur_ctx))

        # invalidate rejected KV rows: positions >= store_pos + emitted
        posc = jnp.arange(cap)[None, :]
        keep = (posc < store_pos[:, None] + emitted[:, None]) | (posc < st2.write_pos[:, None])
        valid = st2.valid & keep

        # next carried hidden: consumed exactly `emitted` tokens
        new_cur = jnp.take_along_axis(
            hid, jnp.clip(emitted - 1, 0, kq - 1)[:, None, None], axis=1
        )
        new_cur = jnp.where(st2.active[:, None, None], new_cur, st2.cur_hidden)

        n_gen = st2.n_gen + emitted
        active = st2.active & ~hit_eos & (n_gen < st2.budget)
        st2 = st2._replace(
            tokens=tokens,
            hidden_out=hidden_out,
            ctx=ctx,
            ctx_len=st2.ctx_len + emitted,
            valid=valid,
            cur_hidden=new_cur,
            write_pos=st2.write_pos + emitted,
            text_pos=st2.text_pos + emitted,
            n_gen=n_gen,
            active=active,
            steps=st2.steps + 1,
        )
        return i + 1, st2

    _, out = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), state))
    return out


def decode_chunk(
    params,
    cfg: PaDTConfig,
    state: DecodeState,
    n_steps,  # () int32 — TRACED: one compile serves every chunk length
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> DecodeState:
    """Advance every active slot `n_steps` tokens (one fused device program).

    Token selection mirrors `padt.generate` (greedy by default, or
    temperature/top-k/top-p via `state.rng`): extended logits over each slot's
    own prototype table. Early-exits when the pool drains. `n_steps` is a
    traced scalar so the host can size each chunk to the earliest known slot
    completion (budget-aware chunking) without recompiling."""
    eos = cfg.eos_token_id
    b, t_cap = state.tokens.shape

    def cond(carry):
        i, st = carry
        return (i < n_steps) & jnp.any(st.active)

    def body(carry):
        i, st = carry
        logits = padt_model.extended_logits(
            params, cfg, st.cur_hidden, st.proto, st.num_merged
        )[:, 0]
        key, sub = jax.random.split(st.rng)
        st = st._replace(rng=key)
        tok = padt_model.sample_token(logits, sub, do_sample, temperature, top_k, top_p)
        tok = jnp.where(st.active, tok, cfg.pad_token_id)
        idx = jnp.clip(st.n_gen, 0, t_cap - 1)
        rows = jnp.arange(b)
        tokens = st.tokens.at[rows, idx].set(jnp.where(st.active, tok, st.tokens[rows, idx]))
        hid = jnp.where(st.active[:, None], st.cur_hidden[:, 0], st.hidden_out[rows, idx])
        hidden_out = st.hidden_out.at[rows, idx].set(hid)
        n_gen = st.n_gen + st.active.astype(jnp.int32)
        active = st.active & (tok != eos) & (n_gen < st.budget)
        # next-step forward (runs for the whole pool; inactive slots' writes are
        # masked by `active` through valid/write_pos bookkeeping)
        emb = padt_model.extended_embed(params, cfg, tok[:, None], st.proto)
        st = st._replace(tokens=tokens, hidden_out=hidden_out, n_gen=n_gen)
        new_hidden, st = _decode_step_slots(params["text"], cfg.text, emb, st)
        st = st._replace(
            cur_hidden=new_hidden,
            write_pos=st.write_pos + st.active.astype(jnp.int32),
            text_pos=st.text_pos + st.active.astype(jnp.int32),
            active=active,
            steps=st.steps + 1,
        )
        return i + 1, st

    _, out = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), state))
    return out


# ---------------------------------------------------------------------------
# Host-side engine: request queue -> slot scheduling -> results
# ---------------------------------------------------------------------------

@dataclass
class SharedPrefix:
    """A shareable prompt prefix (system preamble + image), prefilled once per
    `key` and KV-spliced into every slot that references it.

    PaDT eval workloads are prefix-heavy by construction: RefCOCO sends
    several referring expressions against the SAME image
    (`/root/reference/eval/evaluation_scripts/inference_refcoco.py` groups by
    image), and the image occupies ~85-95% of the prompt (vision tower +
    prefill over hundreds of patch tokens) while the per-request query is a
    handful of text tokens. The reference re-prefills the full prompt every
    time; caching the prefix KV skips the vision tower AND the prefix prefill
    for every repeat.

    `batch` is a leading-dim-1 processor batch whose prompt TEXT ends exactly
    at the template's vision boundary (`<|vision_end|>` — see
    `VisionTextProcessor.build_prefix_batch`); `rope_delta` is that batch's
    M-RoPE delta. Requests carry their remaining tokens in `suffix_ids`."""

    key: Any
    batch: Dict[str, np.ndarray]
    rope_delta: int


@dataclass
class Request:
    """A preprocessed single request. `batch` leaves have leading dim 1 and the
    same bucket shapes for every request handed to one engine.

    Prefix-cached form: `prefix` + `suffix_ids` instead of `batch` — the
    engine prefills `prefix.batch` once per `prefix.key` (LRU-cached KV) and
    runs only `suffix_ids` (the query text; <= engine.suffix_bucket tokens)
    per request. Greedy outputs are token-identical to the full-prompt path
    up to KV quantization (the suffix pass reads the int8 prefix cache)."""

    batch: Optional[Dict[str, np.ndarray]] = None
    rope_delta: int = 0
    max_new_tokens: int = 0
    uid: Any = None
    prefix: Optional[SharedPrefix] = None
    suffix_ids: Optional[np.ndarray] = None
    # host scheduling hint: how many tokens this request is EXPECTED to emit
    # before EOS (task-type stats: REC ~25, OVD ~200...). Budgets bound the
    # device loop; expectations size decode chunks so slots that EOS early
    # are harvested (and their slots refilled) promptly. Never affects
    # outputs — only chunk boundaries (greedy decoding is prefix-stable).
    expected_new_tokens: Optional[int] = None


@dataclass
class Completion:
    uid: Any
    tokens: np.ndarray  # (n_gen,) int32
    n_gen: int
    hidden: Optional[jnp.ndarray] = None  # (T, D) device array (collect_hidden=True)
    artifacts: Optional[Any] = None  # single-request VisionArtifacts (keep_artifacts=True)


@dataclass
class ServeStats:
    wall_s: float = 0.0
    prefill_s: float = 0.0
    decode_s: float = 0.0
    generated_tokens: int = 0
    decode_steps: int = 0  # device decode/verify forwards (summed over replicas)
    completions: int = 0
    slot_step_utilization: float = 0.0  # generated / (steps * slots)
    slot_steps: int = 0  # decode_steps weighted by each replica's n_slots
    prefix_hits: int = 0  # prefix-cached requests whose prefix KV was reused
    prefix_misses: int = 0  # prefix prefills actually computed
    prefill_tokens_saved: int = 0  # sum of reused prefixes' real prompt tokens

    def tokens_per_sec(self) -> float:
        return self.generated_tokens / self.wall_s if self.wall_s > 0 else 0.0


_HBM_BUDGET_BYTES = 15.2e9  # usable v5e HBM (15.75 GB) minus runtime slack


def _pack_transient_fits(params) -> bool:
    """Whether `pack_inference_params` can run on-device: its fused qkv/gateup
    concats live NEXT TO the unfused stacks until the old leaves are freed,
    so live params + fused copies must fit HBM. int8-7B's ~4.3 GB transient
    OOMs one v5e chip (bench.py) — detect that instead of crashing the
    default-args constructor (advisor r4). Non-TPU or multi-device (sharded
    params): assume it fits."""
    try:
        leaves = jax.tree.leaves(params)
        devs = {getattr(x, "device", None) for x in leaves if hasattr(x, "device")}
        if len(jax.devices()) > 1 or not any(
            getattr(d, "platform", "") == "tpu" for d in devs if d is not None
        ):
            return True
        live = sum(x.size * x.dtype.itemsize for x in leaves)
        layers = params["text"]["layers"]
        fused_sources = (
            "q_w", "k_w", "v_w", "gate_w", "up_w", "q_b", "k_b", "v_b",
            "q_w_q", "q_w_s", "k_w_q", "k_w_s", "v_w_q", "v_w_s",
            "gate_w_q", "gate_w_s", "up_w_q", "up_w_s",
        )
        transient = sum(
            layers[n].size * layers[n].dtype.itemsize
            for n in fused_sources if n in layers
        )
        return live + transient <= _HBM_BUDGET_BYTES
    except Exception:
        return True  # never let the guard itself break construction


class ServeEngine:
    """Host scheduler around the jitted prefill / insert / decode_chunk ops.

    - `n_slots` decode slots share one int8 KV pool;
    - prefill compiles once per (bucket, prompt-shape); refills happen whenever
      >= `prefill_bucket` slots are free and requests are queued (queue is
      padded with budget-0 dummies to keep the bucket shape static);
    - decode advances in fused chunks of `chunk_steps`; the only host<->device
      traffic per chunk is the (B,) active/n_gen flag readback.
    """

    def __init__(
        self,
        params,
        cfg: PaDTConfig,
        n_slots: int,
        max_new_tokens: int,
        prompt_len: int,
        prefill_bucket: int = 16,
        chunk_steps: int = 16,
        collect_hidden: bool = False,
        patch_bucket: Optional[int] = None,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        seed: int = 0,
        keep_artifacts: bool = False,
        prefill_bucket_small: Optional[int] = None,
        max_chunk_steps: Optional[int] = None,
        speculative: int = 0,
        oracle_draft_seq=None,  # benchmark-only: see decode_chunk_spec
        force_accept: bool = False,  # benchmark-only: K-accept ceiling timing
        suffix_bucket: int = _SUFFIX_K,  # prefix-cached requests' max suffix length
        prefix_cache_entries: int = 8,  # device-resident prefix-KV LRU size
        budget_blind: bool = False,  # sizer ignores budgets (bench: emulates the
        #                              real-weights regime where every budget is
        #                              an uninformative 1024 and EOS stops slots)
        packed_weights: bool = True,  # fused qkv/gateup weight streams
        #                               (padt.pack_inference_params). Pass
        #                               False for models whose concat transient
        #                               doesn't fit HBM next to the unfused
        #                               weights (7B int8 on one v5e chip) —
        #                               pack those host-side at load instead.
    ):
        if packed_weights and not _pack_transient_fits(params):
            # int8-7B on one v5e: the on-device concat transient (~4.3 GB of
            # fused copies next to the live unfused stacks) OOMs — auto-skip
            # instead of crashing a default-args constructor (advisor r4)
            print(
                "ServeEngine: skipping packed_weights — the pack concat "
                "transient would exceed single-chip HBM; pack host-side at "
                "load or pass packed_weights=False to silence this."
            )
            packed_weights = False
        if packed_weights:
            params = padt_model.pack_inference_params(params)
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_new_tokens = max_new_tokens
        self.prefill_bucket = min(prefill_bucket, n_slots)
        # straggler admission quantum: when fewer than prefill_bucket requests
        # (or free slots) remain, admit in this smaller bucket instead of
        # idling slots until a full bucket forms
        self.prefill_bucket_small = min(
            prefill_bucket_small or max(1, self.prefill_bucket // 4), self.prefill_bucket
        )
        self.chunk_steps = chunk_steps
        # budget-aware chunk ceiling: when no active slot can finish within
        # chunk_steps (known from budgets), run up to this many steps in one
        # dispatch — each host sync is a ~40 ms round trip on this backend
        self.max_chunk_steps = max_chunk_steps or 4 * chunk_steps
        self.collect_hidden = collect_hidden
        # keep each in-flight request's VisionArtifacts (device-resident,
        # ~8 MB/request at 3B/2304 patches) so completions can run vl_decode
        self.keep_artifacts = keep_artifacts
        if speculative and do_sample:
            raise ValueError("speculative decoding is greedy-only (exactness)")
        self.speculative = int(speculative)
        self.oracle_draft_seq = oracle_draft_seq
        self.force_accept = force_accept
        self.budget_blind = budget_blind
        # spec verify writes K rows past write_pos before acceptance is known:
        # reserve K headroom so a slot at its last token never clamps back
        # onto live rows
        cap = prompt_len + max_new_tokens + self.speculative
        self.capacity = -(-cap // 128) * 128
        dtype = jax.tree.leaves(params)[0].dtype
        self.state = init_state(
            cfg, n_slots, self.capacity, max_new_tokens, dtype, patch_bucket=patch_bucket
        )
        self.state = self.state._replace(rng=jax.random.PRNGKey(seed))

        c = self.cfg
        capi = self.capacity
        ka = keep_artifacts
        self._prefill = jax.jit(lambda p, b, d: prefill(p, c, b, d, capi, return_artifacts=ka))
        self._insert = jax.jit(insert, donate_argnums=(0,))
        # n_steps is TRACED: one compiled chunk serves every length the
        # budget-aware scheduler picks (chunk_steps..max_chunk_steps)
        if self.speculative:
            kq = self.speculative
            osq = getattr(self, "oracle_draft_seq", None)
            osq = None if osq is None else jnp.asarray(osq, jnp.int32)
            fa = bool(getattr(self, "force_accept", False))
            self._chunk = jax.jit(
                lambda p, st, n: decode_chunk_spec(p, c, st, n, kq, osq, fa),
                donate_argnums=(1,),
            )
        else:
            self._chunk = jax.jit(
                lambda p, st, n: decode_chunk(
                    p, c, st, n, do_sample, temperature, top_k, top_p
                ),
                donate_argnums=(1,),
            )
        # jitted host-loop helpers are cached HERE: a fresh lambda per run()
        # (or a harvest gather whose index length varies) recompiles inside the
        # timed loop — 1-8 min per compile on this backend
        self._flags = jax.jit(
            lambda st: jnp.concatenate(
                [st.active.astype(jnp.int32), st.n_gen, st.steps[None]]
            )
        )
        self._gather = jax.jit(lambda arr, idx: arr[idx])  # idx always (n_slots,)
        # prefix KV caching: suffix passes run in fixed K=32 chunks (the k-row
        # store bound); one compile serves every admission
        if suffix_bucket % _SUFFIX_K:
            raise ValueError(f"suffix_bucket must be a multiple of {_SUFFIX_K}")
        self.suffix_bucket = suffix_bucket
        self.prefix_cache_entries = prefix_cache_entries
        self._prefix_cache: Dict[Any, Tuple[PrefillPack, Any, int]] = {}  # insertion-ordered LRU
        self._suffix = jax.jit(
            lambda p, st, ids, sl: _suffix_prefill_step(p, c, st, ids, sl),
            donate_argnums=(1,),
        )

    @staticmethod
    def _shape_key(req: Request):
        """Requests with equal leaf shapes share prefill compiles; requests
        with DIFFERENT prompt/patch buckets are admitted in separate buckets
        (heterogeneous-workload support). Prefix-cached requests group by
        their PREFIX batch shapes (suffixes share the engine-wide bucket)."""
        if req.prefix is not None:
            if req.suffix_ids is None or len(req.suffix_ids) == 0:
                raise ValueError("prefix-cached requests need non-empty suffix_ids")
            return ("pfx",) + tuple(
                sorted((k, tuple(np.shape(v))) for k, v in req.prefix.batch.items())
            )
        if req.batch is None:
            raise ValueError("request needs either batch or prefix+suffix_ids")
        return tuple(sorted((k, tuple(np.shape(v))) for k, v in req.batch.items()))

    def _make_bucket(
        self, reqs: List[Request], r: Optional[int] = None
    ) -> Tuple[Dict, jnp.ndarray, np.ndarray]:
        r = r or self.prefill_bucket
        pad = r - len(reqs)
        stack = {}
        for k in reqs[0].batch:
            rows = [q.batch[k] for q in reqs] + [reqs[0].batch[k]] * pad
            shapes = {tuple(np.shape(x)) for x in rows}
            if len(shapes) > 1:
                raise ValueError(
                    f"request leaf {k!r} has mixed shapes {shapes}: requests in "
                    "one admission bucket must share prompt/patch buckets (the "
                    "engine groups by shape automatically in run())"
                )
            # jnp.concatenate: device-resident request leaves stay on device
            # (an np.concatenate here pulled every refill's pixels back through
            # the host — at axon-tunnel bandwidth that alone sank the engine).
            # position_ids carries the 3 M-RoPE streams in axis 0; batch is axis 1.
            stack[k] = jnp.concatenate(rows, axis=1 if k == "position_ids" else 0)
        deltas = jnp.asarray(
            np.array([q.rope_delta for q in reqs] + [0] * pad, np.int32)
        )
        budgets = np.array(
            [min(q.max_new_tokens, self.max_new_tokens) for q in reqs] + [0] * pad, np.int32
        )
        return stack, deltas, budgets

    def start_run(self, requests: List[Request], schedule: str = "fifo"):
        """Begin a run: order + group requests, reset per-run bookkeeping.
        Returns a RunCtx to drive with `_refill` / `_dispatch_chunk` /
        `_sync_harvest` and finish with `_finish_run` — `run()` does exactly
        that; `MultiEngine` interleaves the same steps across engines."""
        if schedule == "longest_first":
            requests = sorted(requests, key=lambda q: -q.max_new_tokens)
        elif schedule != "fifo":
            raise ValueError(f"unknown schedule {schedule!r}")
        ctx = RunCtx()
        # group by leaf shapes: heterogeneous prompt/patch buckets coexist in
        # one slot pool; each admission bucket is shape-uniform (own compile)
        for q in requests:
            key = self._shape_key(q)
            if key not in ctx.pending:
                ctx.pending[key] = deque()
            ctx.pending[key].append(q)
        ctx.n_pending = len(requests)
        ctx.free = list(range(self.n_slots))
        ctx.prev_n_gen = np.zeros(self.n_slots, np.int64)  # n_gen at last sync
        # fresh step counter per run (state persists across runs)
        self.state = self.state._replace(steps=jnp.zeros((), jnp.int32))
        ctx.t_start = time.perf_counter()
        return ctx

    def _sync_flags(self):
        # ONE dispatch + ONE readback per chunk (two np.asarray calls cost
        # two ~40 ms host round-trips each on the axon backend)
        both = np.asarray(self._flags(self.state))
        n = self.n_slots
        return both[:n].astype(bool), both[n : 2 * n], int(both[2 * n])

    def _admit(self, ctx, grp: deque, r: int):
        take = [grp.popleft() for _ in range(min(r, len(grp)))]
        ctx.n_pending -= len(take)
        slots = [ctx.free.pop() for _ in range(r)]
        stack, deltas, budgets = self._make_bucket(take, r)
        t0 = time.perf_counter()
        out = self._prefill(self.params, stack, deltas)
        pack, art = out if self.keep_artifacts else (out, None)
        self.state = self._insert(
            self.state, pack, jnp.asarray(np.array(slots, np.int32)), jnp.asarray(budgets)
        )
        # no sync: dispatch stays async (the next chunk's flag readback
        # orders everything); prefill_s is therefore dispatch-side time
        # and the device-side cost lands in decode_s
        ctx.stats.prefill_s += time.perf_counter() - t0
        ctx.prev_n_gen[slots] = 0  # insert resets refilled slots' n_gen
        for i, q in enumerate(take):
            ctx.occupant[slots[i]] = q
            if art is not None:
                # per-request artifact slice (device-side; leading dim 1)
                ctx.slot_art[slots[i]] = jax.tree.map(lambda x: x[i : i + 1], art)
        # padding slots go straight back to the free list
        for s in slots[len(take):]:
            ctx.free.append(s)

    def _admit_prefix(self, ctx, grp: deque, r: int):
        """Admit r prefix-cached requests: prefill only the UNCACHED prefixes
        (one batched call), splice each request's cached prefix KV into its
        slot, then run all suffixes through the pool-wide K=32 suffix pass."""
        take = [grp.popleft() for _ in range(min(r, len(grp)))]
        ctx.n_pending -= len(take)
        for q in take:
            lp = q.prefix.batch["input_ids"].shape[1]
            s = len(q.suffix_ids)
            if s > self.suffix_bucket:
                raise ValueError(f"suffix length {s} exceeds suffix_bucket {self.suffix_bucket}")
            need = (
                lp
                + -(-s // _SUFFIX_K) * _SUFFIX_K
                + min(q.max_new_tokens, self.max_new_tokens)
                + self.speculative
            )
            if need > self.capacity:
                raise ValueError(
                    f"prefix {lp} + suffix {s} + budget does not fit capacity "
                    f"{self.capacity} (need {need}); raise prompt_len"
                )
        slots = [ctx.free.pop() for _ in range(r)]
        t0 = time.perf_counter()
        # 1) prefill uncached prefixes, batched and padded to an engine bucket
        uniq, seen = [], set()
        for q in take:
            if q.prefix.key not in self._prefix_cache and q.prefix.key not in seen:
                uniq.append(q.prefix)
                seen.add(q.prefix.key)
        if uniq:
            ru = (
                self.prefill_bucket_small
                if len(uniq) <= self.prefill_bucket_small
                else self.prefill_bucket
            )
            pad = ru - len(uniq)
            # jnp.concatenate: device-resident prefix leaves stay on device
            # (same trap as _make_bucket — np here would pull pixels through
            # the host link on every unique-prefix admission)
            stack = {
                k: jnp.concatenate(
                    [jnp.asarray(p.batch[k]) for p in uniq]
                    + [jnp.asarray(uniq[0].batch[k])] * pad,
                    axis=1 if k == "position_ids" else 0,
                )
                for k in uniq[0].batch
            }
            deltas = jnp.asarray(np.array([p.rope_delta for p in uniq] + [0] * pad, np.int32))
            out = self._prefill(self.params, stack, deltas)
            pack, art = out if self.keep_artifacts else (out, None)
            for i, p in enumerate(uniq):
                plen = int(np.sum(p.batch["attention_mask"]))
                arow = None if art is None else jax.tree.map(lambda x: x[i : i + 1], art)
                self._prefix_cache[p.key] = (_pack_slice(pack, i), arow, plen)
        # per-request entries, popped+reinserted = LRU recency; the local list
        # keeps this admission's buffers alive across the trim below
        entries = []
        for q in take:
            e = self._prefix_cache.pop(q.prefix.key)
            self._prefix_cache[q.prefix.key] = e
            entries.append(e)
        while len(self._prefix_cache) > self.prefix_cache_entries:
            self._prefix_cache.pop(next(iter(self._prefix_cache)))
        ctx.stats.prefix_misses += len(uniq)
        ctx.stats.prefix_hits += len(take) - len(uniq)
        # the first occurrence of each missed key paid its prefill; every other
        # request in `take` reused a cached prefix of e[2] real prompt tokens
        paying = {p.key for p in uniq}
        for q, e in zip(take, entries):
            if q.prefix.key in paying:
                paying.discard(q.prefix.key)
            else:
                ctx.stats.prefill_tokens_saved += e[2]
        # 2) splice prefix KV into the slots
        rows = [e[0] for e in entries] + [entries[0][0]] * (r - len(take))
        pack = _pack_concat(rows)
        budgets = np.array(
            [min(q.max_new_tokens, self.max_new_tokens) for q in take] + [0] * (r - len(take)),
            np.int32,
        )
        self.state = self._insert(
            self.state, pack, jnp.asarray(np.array(slots, np.int32)), jnp.asarray(budgets)
        )
        # 3) suffix passes over the pool (other slots' rows are untouched —
        # see _suffix_prefill_step's non-participant contract)
        sfx = np.full((self.n_slots, self.suffix_bucket), self.cfg.pad_token_id, np.int32)
        slen = np.zeros(self.n_slots, np.int32)
        for i, q in enumerate(take):
            ids = np.asarray(q.suffix_ids, np.int32).reshape(-1)
            sfx[slots[i], : len(ids)] = ids
            slen[slots[i]] = len(ids)
        for c0 in range(0, self.suffix_bucket, _SUFFIX_K):
            if not np.any(slen - c0 > 0):
                break
            self.state = self._suffix(
                self.params,
                self.state,
                jnp.asarray(sfx[:, c0 : c0 + _SUFFIX_K]),
                jnp.asarray(np.clip(slen - c0, 0, _SUFFIX_K)),
            )
        ctx.stats.prefill_s += time.perf_counter() - t0
        ctx.prev_n_gen[slots] = 0
        for i, q in enumerate(take):
            ctx.occupant[slots[i]] = q
            if entries[i][1] is not None:
                ctx.slot_art[slots[i]] = entries[i][1]
        for s in slots[len(take) :]:
            ctx.free.append(s)

    def _refill(self, ctx):
        """Admit pending requests: full buckets first, then straggler (small)
        buckets so freed slots never idle waiting for a full bucket to form."""
        progressed = True
        while ctx.n_pending and progressed:
            progressed = False
            groups = sorted(ctx.pending.values(), key=len, reverse=True)
            for grp in groups:
                if not grp:
                    continue
                admit = self._admit_prefix if grp[0].prefix is not None else self._admit
                if len(ctx.free) >= self.prefill_bucket and len(grp) >= self.prefill_bucket:
                    admit(ctx, grp, self.prefill_bucket)
                    progressed = True
                    break
                if len(ctx.free) >= self.prefill_bucket_small and (
                    len(grp) < self.prefill_bucket or len(ctx.free) < self.prefill_bucket
                ):
                    admit(ctx, grp, self.prefill_bucket_small)
                    progressed = True
                    break

    def _dispatch_chunk(self, ctx):
        """Dispatch one budget/EOS-aware decode chunk (async — no readback).

        Sizing per slot: a slot finishes at its remaining BUDGET at the
        latest (device truth), but usually EOSes near its EXPECTED length —
        the per-request `expected_new_tokens` hint, or (when absent) an
        online p90 of this run's observed early-EOS lengths. min over slots,
        bounded to [chunk_steps, max_chunk_steps]: long stretches sync ~4x
        less often; slots that finish mid-chunk only waste slot-steps to the
        chunk boundary, so expectation-sized chunks harvest them (and refill
        their slots) promptly. Under-estimates only cost extra syncs;
        over-estimates are bounded by the budget. `budget_blind` removes the
        budget bound from the SIZER only (bench: emulates real-weights
        serving where every budget is an uninformative max_new_tokens)."""
        est_default = None
        if len(ctx.obs_lens) >= 8:
            est_default = int(np.percentile(list(ctx.obs_lens), 90))
        remaining = []
        for s, q in ctx.occupant.items():
            n_gen = int(ctx.prev_n_gen[s])
            rem_budget = min(q.max_new_tokens, self.max_new_tokens) - n_gen
            est = q.expected_new_tokens if q.expected_new_tokens is not None else est_default
            if self.budget_blind:
                rem = (est - n_gen) if est is not None else self.max_chunk_steps
            else:
                rem = min(est - n_gen, rem_budget) if est is not None else rem_budget
            remaining.append(max(rem, 1))
        chunk_n = int(np.clip(min(remaining), self.chunk_steps, self.max_chunk_steps))
        ctx.t_chunk = time.perf_counter()
        self.state = self._chunk(self.params, self.state, jnp.asarray(chunk_n, jnp.int32))

    def _sync_harvest(self, ctx):
        """Block on the dispatched chunk's flags; harvest finished slots."""
        active, n_gen, steps_done = self._sync_flags()
        ctx.stats.decode_s += time.perf_counter() - ctx.t_chunk
        # exact device-side counter: decode forwards actually executed
        # (while_loop early-exits when the pool drains; in speculative
        # mode each counted step is one K-token VERIFY forward)
        ctx.stats.decode_steps = steps_done
        ctx.prev_n_gen = n_gen.copy()
        done = [s for s in ctx.occupant if not active[s]]
        if done:
            # device-side gathers COPY the rows, so slot reuse can't
            # clobber them; they stay lazy (no tunnel readback) until the
            # run finishes. The index vector is PADDED to n_slots so every
            # harvest reuses one compiled gather.
            idx = np.array(done + [done[0]] * (self.n_slots - len(done)), np.int32)
            tok_rows = self._gather(self.state.tokens, idx)
            hid_rows = self._gather(self.state.hidden_out, idx) if self.collect_hidden else None
            for jd, s in enumerate(done):
                q = ctx.occupant.pop(s)
                ng = int(n_gen[s])
                # online length stats for the chunk sizer: EOS'd strictly
                # before budget = an uncensored completion-length observation
                # (budget-stopped lengths are censored — skipped)
                if ng < min(q.max_new_tokens, self.max_new_tokens):
                    ctx.obs_lens.append(ng)
                ctx.results.append(
                    Completion(
                        uid=q.uid,
                        tokens=tok_rows[jd],  # device row; trimmed below
                        n_gen=ng,
                        hidden=None if hid_rows is None else hid_rows[jd],
                        artifacts=ctx.slot_art.pop(s, None),
                    )
                )
                ctx.stats.generated_tokens += ng
                ctx.stats.completions += 1
                ctx.free.append(s)

    def _finish_run(self, ctx) -> Tuple[List[Completion], ServeStats]:
        # serving hands completions off device-resident (e.g. straight into
        # vl_decode); the wall clock stops here and the host materialization
        # below is for the Completion API's numpy contract
        ctx.stats.wall_s = time.perf_counter() - ctx.t_start
        if ctx.results:
            all_tok = np.asarray(jnp.stack([c.tokens for c in ctx.results]))
            for i, c in enumerate(ctx.results):
                c.tokens = all_tok[i, : c.n_gen].copy()
        if ctx.stats.decode_steps:
            ctx.stats.slot_step_utilization = ctx.stats.generated_tokens / (
                ctx.stats.decode_steps * self.n_slots
            )
        return ctx.results, ctx.stats

    def run(
        self, requests: List[Request], schedule: str = "fifo"
    ) -> Tuple[List[Completion], ServeStats]:
        """Process `requests` to completion.

        schedule="longest_first": admit requests in descending max_new_tokens
        so long completions run concurrently with everything else instead of
        draining alone at the end — measured +27% useful tok/s over FIFO on
        the tail-heavy reference mix (BASELINE.md). Use when expected lengths
        are known (in PaDT the task type predicts them: OVD/RIC long, REC
        short); results are per-request identical under any order (greedy
        decoding is prefix-stable and slots are independent)."""
        ctx = self.start_run(requests, schedule)
        while ctx.n_pending or ctx.occupant:
            self._refill(ctx)
            if not ctx.occupant:
                break
            self._dispatch_chunk(ctx)
            self._sync_harvest(ctx)
        return self._finish_run(ctx)


class RunCtx:
    """Per-run host bookkeeping for one engine (see ServeEngine.start_run)."""

    def __init__(self):
        self.pending: Dict[Any, deque] = {}
        self.n_pending = 0
        self.free: List[int] = []
        self.occupant: Dict[int, Request] = {}
        self.slot_art: Dict[int, Any] = {}
        self.results: List[Completion] = []
        self.stats = ServeStats()
        self.prev_n_gen = None
        self.t_start = 0.0
        self.t_chunk = 0.0
        # observed early-EOS completion lengths (uncensored), for the
        # expectation-aware chunk sizer's online p90 fallback
        self.obs_lens: deque = deque(maxlen=256)


class MultiEngine:
    """Data-parallel serving over N devices: one ServeEngine replica per
    device (own params copy, own slot pool), one host scheduler.

    The reference's multi-GPU eval shards the dataset across ranks up front
    (`eval/evaluation_scripts/utils.py:176-266`, one fixed batch per rank);
    here requests are balanced across replicas at admission (greedy
    longest-processing-time assignment) and every replica's decode chunks are
    dispatched BEFORE any replica's flag readback, so all devices compute
    concurrently under one Python loop.

    Per-request outputs are token-identical to a single engine run (greedy
    decoding is prefix-stable; slots and replicas are independent) — see
    tests/test_serve.py::test_multi_engine_matches_single.
    """

    def __init__(self, engines: List["ServeEngine"]):
        assert engines, "need at least one engine"
        self.engines = engines

    @staticmethod
    def for_devices(make_engine, devices) -> "MultiEngine":
        """Build one replica per device: `make_engine(device) -> ServeEngine`
        must place params (jax.device_put) and seed the engine for that
        device; engine state follows params placement on first use."""
        return MultiEngine([make_engine(d) for d in devices])

    def run(
        self, requests: List[Request], schedule: str = "longest_first"
    ) -> Tuple[List[Completion], ServeStats]:
        if schedule == "longest_first":
            requests = sorted(requests, key=lambda q: -q.max_new_tokens)
        elif schedule != "fifo":
            raise ValueError(f"unknown schedule {schedule!r}")
        # greedy LPT balance: next request to the least-loaded replica
        # (requests arrive longest-first, so this is the classic LPT bound).
        # Weight by the CLAMPED budget — the engine caps every request at its
        # own max_new_tokens, so an oversized request costs at most that.
        parts: List[List[Request]] = [[] for _ in self.engines]
        load = [0] * len(self.engines)
        pinned: Dict[Any, int] = {}  # prefix key -> replica (KV-cache affinity)
        for q in requests:
            key = None if q.prefix is None else q.prefix.key
            if key is not None and key in pinned:
                i = pinned[key]  # reuse beats balance: a re-prefill costs more
            else:
                i = int(np.argmin(load))
                if key is not None:
                    pinned[key] = i
            parts[i].append(q)
            load[i] += max(1, min(q.max_new_tokens, self.engines[i].max_new_tokens))
        t0 = time.perf_counter()
        ctxs = [
            eng.start_run(part, "fifo")  # already globally ordered
            for eng, part in zip(self.engines, parts)
        ]
        live = lambda c: c.n_pending or c.occupant
        # Event loop: each replica is re-dispatched IMMEDIATELY after its own
        # sync, so a replica never idles waiting for its peers' chunks (no
        # cross-replica barrier); `outstanding` tracks in-flight dispatches.
        outstanding: List[bool] = [False] * len(self.engines)
        pairs = list(zip(self.engines, ctxs))
        while any(outstanding) or any(live(c) for c in ctxs):
            for i, (eng, ctx) in enumerate(pairs):
                if outstanding[i]:
                    eng._sync_harvest(ctx)
                    outstanding[i] = False
                if live(ctx):
                    eng._refill(ctx)
                    if ctx.occupant:
                        eng._dispatch_chunk(ctx)
                        outstanding[i] = True
        # wall clock stops BEFORE host-side token materialization (same
        # contract as ServeEngine.run: completions hand off device-resident)
        wall_s = time.perf_counter() - t0
        results: List[Completion] = []
        stats = ServeStats()
        for eng, ctx in zip(self.engines, ctxs):
            r, s = eng._finish_run(ctx)
            results.extend(r)
            stats.generated_tokens += s.generated_tokens
            stats.completions += s.completions
            # per-replica prefill_s/decode_s are HOST-side windows that overlap
            # across replicas under this interleaved loop — they bound, not
            # partition, wall_s; per-device timing needs a profiler trace
            stats.prefill_s += s.prefill_s
            stats.decode_s += s.decode_s
            stats.decode_steps += s.decode_steps
            stats.slot_steps += s.decode_steps * eng.n_slots
            stats.prefix_hits += s.prefix_hits
            stats.prefix_misses += s.prefix_misses
            stats.prefill_tokens_saved += s.prefill_tokens_saved
        stats.wall_s = wall_s
        if stats.slot_steps:
            stats.slot_step_utilization = stats.generated_tokens / stats.slot_steps
        return results, stats
