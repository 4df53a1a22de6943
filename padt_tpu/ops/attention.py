"""Attention ops.

TPU-native replacements for the reference's three flash-attn shapes
(SURVEY.md §2.3, `flash_attn_varlen_func` call sites):
  (a) causal LLM attention with KV cache  -> `causal_attention` / `decode_attention`
  (b) vision windowed/full block-diagonal -> `segment_attention` (segment ids
      replace cu_window_seqlens, `padt.py:61-99`)
  (c) PaDT decoder ragged cross-attention -> `masked_cross_attention` (padded
      dense batches replace cu_seqlens, `padt_decoder.py:53-57`)

All entry points are pure-XLA dense attention with boolean masks computed on the
fly (fused by XLA). Pallas flash kernels are dispatched for the large shapes via
`padt_tpu.ops.pallas_attention` when enabled and running on TPU; the XLA path is
the correctness reference and the CPU-test path.

Softmax runs in fp32. Fully-masked rows (padding) use a large-finite negative
fill so they produce uniform-but-finite garbage that downstream masks discard —
no NaNs (the varlen kernels in the reference simply never see padding).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _sdpa(q, k, v, mask, scale):
    """q: (B,H,Lq,D) k,v: (B,H,Lk,D) mask: broadcastable (B,1|H,Lq,Lk) bool."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, Hkv, L, D) -> (B, Hkv*n_rep, L, D) for GQA."""
    if n_rep == 1:
        return x
    b, h, l, d = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, h, n_rep, l, d))
    return x.reshape(b, h * n_rep, l, d)


def segment_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    seg: jnp.ndarray,  # (B, S) int32; tokens attend within equal ids; -1 = pad
) -> jnp.ndarray:
    """Block-diagonal attention over segments (vision windows / whole image)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    mask = (seg[:, None, :, None] == seg[:, None, None, :]) & (seg[:, None, None, :] >= 0)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _sdpa(qt, kt, vt, mask, scale)
    return out.transpose(0, 2, 1, 3)


def causal_attention(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,  # (B, L, Hkv, D)
    v: jnp.ndarray,
    valid: jnp.ndarray,  # (B, L) bool — attention mask (left padding)
) -> jnp.ndarray:
    """Causal self-attention for the LLM prefill (no cache history)."""
    b, l, h, d = q.shape
    n_rep = h // k.shape[2]
    scale = 1.0 / (d**0.5)
    causal = jnp.tril(jnp.ones((l, l), dtype=bool))
    mask = causal[None, None] & valid[:, None, None, :]
    out = _sdpa(
        q.transpose(0, 2, 1, 3),
        repeat_kv(k.transpose(0, 2, 1, 3), n_rep),
        repeat_kv(v.transpose(0, 2, 1, 3), n_rep),
        mask,
        scale,
    )
    return out.transpose(0, 2, 1, 3)


def decode_attention(
    q: jnp.ndarray,  # (B, 1, H, D) — current step query
    k_cache: jnp.ndarray,  # (B, C, Hkv, D)
    v_cache: jnp.ndarray,
    valid: jnp.ndarray,  # (B, C) bool — which cache slots are live
) -> jnp.ndarray:
    """Single-step attention over the static KV cache."""
    b, _, h, d = q.shape
    n_rep = h // k_cache.shape[2]
    scale = 1.0 / (d**0.5)
    mask = valid[:, None, None, :]
    out = _sdpa(
        q.transpose(0, 2, 1, 3),
        repeat_kv(k_cache.transpose(0, 2, 1, 3), n_rep),
        repeat_kv(v_cache.transpose(0, 2, 1, 3), n_rep),
        mask,
        scale,
    )
    return out.transpose(0, 2, 1, 3)


def masked_cross_attention(
    q: jnp.ndarray,  # (B, Lq, H, D)
    k: jnp.ndarray,  # (B, Lk, H, D)
    v: jnp.ndarray,
    q_valid: jnp.ndarray,  # (B, Lq) bool
    k_valid: jnp.ndarray,  # (B, Lk) bool
) -> jnp.ndarray:
    """Dense cross-attention with per-side validity masks (PaDT decoder:
    padded queries x padded per-object image memory)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    mask = q_valid[:, None, :, None] & k_valid[:, None, None, :]
    out = _sdpa(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        mask,
        scale,
    )
    return out.transpose(0, 2, 1, 3)
