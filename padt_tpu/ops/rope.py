"""Rotary position embeddings: 2D vision RoPE and 3D multimodal RoPE (M-RoPE).

Numerics parity notes:
  - vision rope cos/sin are computed in fp32 and the rotation is applied in fp32
    then cast back — this mirrors the reference FA2 bug-fix monkey patch
    (`qwen2_5vl_monkey_patch.py:29-30`).
  - "half" rotation convention (rotate_half, non-interleaved), matching both the
    Qwen text stack and flash-attn's `apply_rotary_emb` used by the PaDT decoder
    (`padt_decoder.py:38-51`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., L, D); cos/sin: broadcastable (..., L, D). fp32 internally."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos.astype(jnp.float32) + rotate_half(xf) * sin.astype(jnp.float32)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Vision 2D rope (transformers Qwen2_5_VisionRotaryEmbedding + rot_pos_emb)
# ---------------------------------------------------------------------------

def vision_rope_cos_sin(
    hpos: jnp.ndarray, wpos: jnp.ndarray, head_dim: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) int positions -> cos/sin of shape (B, S, head_dim).

    freqs dim = head_dim//4 per axis; concat(h_freqs, w_freqs) gives head_dim//2,
    duplicated (cat(emb, emb)) to head_dim — the `position_embeddings` the
    reference vision forward returns (`padt.py:76-77`).
    """
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))  # (dim//2,)
    inv_freq = jnp.asarray(inv_freq)
    fh = hpos.astype(jnp.float32)[..., None] * inv_freq  # (B, S, dim//2)
    fw = wpos.astype(jnp.float32)[..., None] * inv_freq
    freqs = jnp.concatenate([fh, fw], axis=-1)  # (B, S, dim)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, S, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


# ---------------------------------------------------------------------------
# Text M-RoPE (transformers Qwen2_5_VLRotaryEmbedding + apply_multimodal_rotary_pos_emb)
# ---------------------------------------------------------------------------

def mrope_cos_sin(
    position_ids: jnp.ndarray,  # (3, B, L) int32 — t/h/w position streams
    head_dim: int,
    mrope_section: Tuple[int, int, int],
    theta: float = 1_000_000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns cos/sin (B, L, head_dim) with frequency slots interleaved across
    the t/h/w position streams per `mrope_section` (sums to head_dim//2)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))  # (half,)
    inv_freq = jnp.asarray(inv_freq)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (3, B, L, half)

    # select which of the 3 streams supplies each frequency slot
    sec = np.zeros((half,), dtype=np.int32)
    start = 0
    for axis, width in enumerate(mrope_section):
        sec[start : start + width] = axis
        start += width
    assert start == half, "mrope_section must sum to head_dim//2"
    onehot = jnp.asarray(
        np.eye(3, dtype=np.float32)[sec]
    )  # (half, 3): onehot[k, s] = 1 iff slot k reads stream s
    freqs = jnp.einsum("sblh,hs->blh", freqs, onehot)  # (B, L, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, L, head_dim)
    return jnp.cos(emb), jnp.sin(emb)
