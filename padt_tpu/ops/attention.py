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
import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def use_pallas() -> bool:
    """Dispatch policy: Pallas flash kernels on TPU unless PADT_PALLAS=0
    (PADT_PALLAS=1 forces them on, e.g. interpret-mode tests)."""
    mode = os.environ.get("PADT_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def _pad_seq(x: jnp.ndarray, target: int, axis: int = 1) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad)


def _flash_segment(q, k, v, q_seg, k_seg, causal: bool, scale: Optional[float] = None):
    """Pad sequence dims to 128 multiples and run the Pallas flash kernel."""
    from .pallas_attention import flash_attention

    s_q, s_k = q.shape[1], k.shape[1]
    sq_p = -(-s_q // 128) * 128
    sk_p = -(-s_k // 128) * 128
    qp = _pad_seq(q, sq_p)
    kp = _pad_seq(k, sk_p)
    vp = _pad_seq(v, sk_p)
    qsp = _pad_seq(q_seg, sq_p).at[:, s_q:].set(-1) if sq_p != s_q else q_seg
    ksp = _pad_seq(k_seg, sk_p).at[:, s_k:].set(-2) if sk_p != s_k else k_seg
    out = flash_attention(qp, kp, vp, qsp, ksp, causal, scale)
    return out[:, :s_q]


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
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Block-diagonal attention over segments (vision windows / whole image)."""
    if use_pallas():
        return _flash_segment(q, k, v, seg, seg, causal=False, scale=scale)
    scale = (1.0 / (q.shape[-1] ** 0.5)) if scale is None else scale
    mask = (seg[:, None, :, None] == seg[:, None, None, :]) & (seg[:, None, None, :] >= 0)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _sdpa(qt, kt, vt, mask, scale)
    return out.transpose(0, 2, 1, 3)


def fused_vision_attention(
    q: jnp.ndarray,  # (B, S, H, D) PRE-rope
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,  # (B, S, D) fp32 rope tables
    sin: jnp.ndarray,
    seg: jnp.ndarray,  # (B, S) int32; -1 = pad
    scale: Optional[float] = None,
    rope_dim: Optional[int] = None,  # real rotary width when D is lane-padded
) -> jnp.ndarray:
    """Vision-tower attention with the fp32 rotary rotation fused in.

    TPU: one Pallas kernel applies rope on VMEM tiles and consumes the packed
    (B, S, H*D) qkv-projection layout directly (no transposes, no rope HBM
    chain — ~2x vision-forward win at 3B/batch-96, BASELINE.md round 2).
    CPU/debug: XLA rope + dense segment attention (the correctness oracle)."""
    if use_pallas():
        from .pallas_attention import vision_flash_attention

        d = q.shape[-1]
        rd = rope_dim or d
        if scale is None:
            scale = 1.0 / (rd**0.5)
        if d % 128 != 0:
            # lane-pad activations for callers that didn't pre-align heads
            # (the vision tower pads at the WEIGHT level and skips this)
            d_p = -(-d // 128) * 128
            padl = [(0, 0), (0, 0), (0, 0), (0, d_p - d)]
            q, k, v = jnp.pad(q, padl), jnp.pad(k, padl), jnp.pad(v, padl)
            cos = jnp.pad(cos, padl[:2] + padl[3:])
            sin = jnp.pad(sin, padl[:2] + padl[3:])
        s = q.shape[1]
        s_p = -(-s // 128) * 128
        if s_p != s:
            qp, kp, vp = _pad_seq(q, s_p), _pad_seq(k, s_p), _pad_seq(v, s_p)
            cosp, sinp = _pad_seq(cos, s_p), _pad_seq(sin, s_p)
            segp = _pad_seq(seg, s_p).at[:, s:].set(-1)
            out = vision_flash_attention(qp, kp, vp, cosp, sinp, segp, scale, rd)[:, :s]
        else:
            out = vision_flash_attention(q, k, v, cos, sin, seg, scale, rd)
        return out[..., :d]
    from .pallas_attention import _rot_half_lanes

    rd = rope_dim or q.shape[-1]
    real_scale = (1.0 / (rd**0.5)) if scale is None else scale
    cq, sq = cos.astype(jnp.float32)[:, :, None, :], sin.astype(jnp.float32)[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        return (xf * cq + _rot_half_lanes(xf, rd) * sq).astype(x.dtype)

    out = segment_attention(rot(q), rot(k), v, seg, scale=real_scale)
    return out


def fused_vision_attention_qkv(
    qkv: jnp.ndarray,  # (B, S, 3*H*D) fused qkv-projection output, PRE-rope
    cos: jnp.ndarray,  # (B, S, D) fp32
    sin: jnp.ndarray,
    seg: jnp.ndarray,  # (B, S) int32; -1 = pad
    num_heads: int,
    scale: Optional[float] = None,
    rope_dim: Optional[int] = None,
) -> jnp.ndarray:
    """`fused_vision_attention` on the un-split qkv buffer -> (B, S, H*D).

    TPU fast path reads q/k/v via lane-block offsets (no slice copies); falls
    back to slicing + the standard paths when off-TPU or on odd shapes."""
    b, s, dh3 = qkv.shape
    d = dh3 // (3 * num_heads)
    if use_pallas() and s % 128 == 0 and (d % 128 == 0 or d < 128):
        # d < 128 (hd=80 heads): the kernel unpacks the UNPADDED qkv and pads
        # each head to a 128-lane tile in its rope pass — output is
        # (B, S, H*128); callers keep the output-projection rows zero-padded
        # (models/vision.py::_pad_head_lanes)
        from .pallas_attention import vision_flash_attention_qkv

        rd = rope_dim or d
        real_scale = (1.0 / (rd**0.5)) if scale is None else scale
        return vision_flash_attention_qkv(qkv, cos, sin, seg, num_heads, real_scale, rd)
    q, k, v = (x.reshape(b, s, num_heads, d) for x in jnp.split(qkv, 3, axis=-1))
    out = fused_vision_attention(q, k, v, cos, sin, seg, scale, rope_dim)
    return out.reshape(b, s, num_heads * d)


def window_attention_qkv(
    qkv: jnp.ndarray,  # (B, S, 3*H*D) fused qkv-projection output, PRE-rope
    cos: jnp.ndarray,  # (B, S, D) fp32
    sin: jnp.ndarray,
    seg: jnp.ndarray,  # (B, S) int32 window ids; -1 = pad. SLOT layout: each
    #                    64-token slot holds exactly one window (+ tail pad)
    num_heads: int,
    win: int = 64,
    scale: Optional[float] = None,
    rope_dim: Optional[int] = None,
) -> jnp.ndarray:
    """Windowed vision attention on the 64-token-ALIGNED slot layout
    (vision_geom.py `window_slots`): every window lives in its own `win`-token
    slot, so attention is BATCHED dense (B*W, win, win) with only a k-validity
    mask — no segment comparisons, and ~12x less score work than masking
    windows inside 768-token flash tiles. Returns (B, S, H*D)."""
    b, s, dh3 = qkv.shape
    d = dh3 // (3 * num_heads)
    assert s % win == 0, (s, win)
    rd = rope_dim or d
    real_scale = (1.0 / (rd**0.5)) if scale is None else scale
    if use_pallas() and s % 128 == 0 and (d % 128 == 0 or d < 128):
        # d < 128: unpadded fused qkv; kernel pads heads to 128-lane tiles
        # (see fused_vision_attention_qkv above) — output is (B, S, H*128)
        from .pallas_attention import vision_window_attention_qkv

        return vision_window_attention_qkv(qkv, cos, sin, seg, num_heads, win, real_scale, rd)
    from .pallas_attention import _rot_half_lanes

    q, k, v = (x.reshape(b, s, num_heads, d) for x in jnp.split(qkv, 3, axis=-1))
    cq, sq = cos.astype(jnp.float32)[:, :, None, :], sin.astype(jnp.float32)[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        return (xf * cq + _rot_half_lanes(xf, rd) * sq).astype(x.dtype)

    nw = s // win
    qw = rot(q).reshape(b, nw, win, num_heads, d)
    kw = rot(k).reshape(b, nw, win, num_heads, d)
    vw = v.reshape(b, nw, win, num_heads, d)
    kvalid = (seg >= 0).reshape(b, nw, 1, 1, win)
    scores = jnp.einsum("bwqhd,bwkhd->bwhqk", qw, kw, preferred_element_type=jnp.float32)
    scores = jnp.where(kvalid, scores * real_scale, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # fully-masked (pad) q rows give uniform junk; downstream masks drop them
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", probs.astype(v.dtype), vw)
    return out.reshape(b, s, num_heads * d)


def causal_attention(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,  # (B, L, Hkv, D)
    v: jnp.ndarray,
    valid: jnp.ndarray,  # (B, L) bool — attention mask (left padding)
) -> jnp.ndarray:
    """Causal self-attention for the LLM prefill (no cache history)."""
    if use_pallas():
        seg = jnp.where(valid, 0, -1).astype(jnp.int32)
        return _flash_segment(q, k, v, seg, seg, causal=True)
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
    """Single-step attention over the static KV cache.

    Grouped-query einsum formulation: no materialized repeat_kv expansion —
    at batch 32 / 3B shapes the repeat would copy ~6.6 GB per decode step."""
    b, _, h, d = q.shape
    hkv = k_cache.shape[2]
    n_rep = h // hkv
    scale = 1.0 / (d**0.5)
    qg = q.reshape(b, hkv, n_rep, d)  # (B, Hkv, G, D) — single query step
    scores = jnp.einsum(
        "bkgd,bckd->bkgc", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale  # (B, Hkv, G, C)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgc,bckd->bkgd", probs.astype(v_cache.dtype), v_cache)
    return out.reshape(b, 1, h, d)


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
