"""Int8 KV cache: quantization + fused decode attention with in-kernel dequant.

At the serving batch sizes that matter (>=96), decode is KV-bandwidth-bound:
reading the bf16 cache is ~2.7 GB per step at 3B/B96/C768 (BASELINE.md). An
int8 cache halves that stream — but only if dequantization happens INSIDE the
attention kernel; an XLA-level dequant materializes a bf16 copy in HBM and
negates the win (round-1 finding, VERDICT #2). This replaces what flash-attn's
fused decode path does for the reference (`eval/evaluation_scripts/utils.py:233-236`).

Scheme: per-token, per-kv-head symmetric int8 (scale = amax/127 over head_dim)
for both K and V. Scales are fp32; the added stream is hd/4 = 3% of the int8
payload. Dequant is folded into small tensors inside the kernel:
  scores = (q @ k8^T) * (k_scale / sqrt(hd))   -- per-column f32 row scale
  out    = (softmax(scores) * v_scale) @ v8    -- scale folded into probs

Cache layout is (layers, B, Hkv, C, hd) — per-(sample, kv-head) K/V slices are
contiguous (C, hd) tiles for the kernel grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., hd) -> (int8 values, fp32 scales (...,)) per-token symmetric."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# XLA reference path (CPU tests / correctness oracle)
# ---------------------------------------------------------------------------

def _decode_attention_int8_xla(q, k8, ks, v8, vs, valid):
    """q: (B, Hkv, G, hd) bf16; k8/v8: (B, Hkv, C, hd) int8;
    ks/vs: (B, Hkv, C) f32; valid: (B, C) bool -> (B, Hkv, G, hd)."""
    hd = q.shape[-1]
    scale = 1.0 / (hd**0.5)
    scores = jnp.einsum(
        "bkgd,bkcd->bkgc", q.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scores = scores * (ks * scale)[:, :, None, :]
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bkgc,bkcd->bkgd", pv, v8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: grid (B, Hkv); one (C, hd) K/V tile per step, fully in VMEM
# ---------------------------------------------------------------------------

def _decode_kernel(q_ref, k8_ref, ks_ref, v8_ref, vs_ref, valid_ref, o_ref, *, sm_scale):
    q = q_ref[0, 0]  # (G, hd) bf16
    k = k8_ref[0, 0].astype(jnp.bfloat16)  # (C, hd) — int8 -> bf16 is exact
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (G, C)
    scores = scores * (ks_ref[0, 0] * sm_scale)  # ks block (1, C) broadcasts
    scores = jnp.where(valid_ref[0] > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * vs_ref[0, 0]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, v8_ref[0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )  # (G, hd)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _decode_attention_int8_pallas(q, k8, ks, v8, vs, valid):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hkv, g, hd = q.shape
    c = k8.shape[2]
    # reshape scale/valid so every block's trailing dims satisfy the Mosaic
    # divisible-or-equal rule: (.., 1, C) blocks with C in lanes
    ks4 = ks.reshape(b, hkv, 1, c)
    vs4 = vs.reshape(b, hkv, 1, c)
    valid3 = valid.reshape(b, 1, c)
    kern = functools.partial(_decode_kernel, sm_scale=1.0 / (hd**0.5))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, hd), q.dtype),
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    )(q, k8, ks4, v8, vs4, valid3)


def decode_attention_int8(
    q: jnp.ndarray,  # (B, 1, H, hd) — current step query
    k8: jnp.ndarray,  # (B, Hkv, C, hd) int8
    ks: jnp.ndarray,  # (B, Hkv, C) f32
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    valid: jnp.ndarray,  # (B, C) bool
) -> jnp.ndarray:
    """Single-step grouped-query attention over the int8 cache -> (B, 1, H, hd)."""
    from .attention import use_pallas

    b, _, h, hd = q.shape
    hkv = k8.shape[1]
    qg = q.reshape(b, hkv, h // hkv, hd)  # kv head j serves q heads [jG, (j+1)G)
    valid_i = valid.astype(jnp.int32)
    if use_pallas():
        out = _decode_attention_int8_pallas(qg, k8, ks, v8, vs, valid_i)
    else:
        out = _decode_attention_int8_xla(qg, k8, ks, v8, vs, valid.astype(bool))
    return out.reshape(b, 1, h, hd)
