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
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# int8-native score dots (quantized q, PADT_DECODE_QI8=1): read once at import
# (an env read inside jitted dispatch would silently pin the first value seen
# per trace — round-3 advisor finding on pallas_attention's env gate)
_QI8_DEFAULT = os.environ.get("PADT_DECODE_QI8", "0") == "1"


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

def _decode_attention_int8_xla(q, k8, ks, v8, vs, valid, quantize_q: bool = False):
    """q: (B, Hkv, G, hd) bf16; k8/v8: (B, Hkv, C, hd) int8;
    ks/vs: (B, Hkv, C) f32; valid: (B, C) bool -> (B, Hkv, G, hd).

    quantize_q=True defines the int8-native score-dot semantics (the MXU
    int8xint8 kernel path, PADT_DECODE_QI8): q is per-row symmetric-quantized
    with the same scheme as the cache (`quantize_kv`) and the score dot runs
    on integer values; the products are exact in f32 (|sums| < 2^24), so this
    oracle IS the kernel's bit-level reference for the score matrix."""
    hd = q.shape[-1]
    scale = 1.0 / (hd**0.5)
    if quantize_q:
        q8, qs = quantize_kv(q)  # (B, Hkv, G, hd) int8, (B, Hkv, G) f32
        scores = jnp.einsum(
            "bkgd,bkcd->bkgc", q8.astype(jnp.float32), k8.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * qs[..., None]
    else:
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


def _decode_kernel_stacked(
    li_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, valid_ref, o_ref, *, sm_scale
):
    """`_decode_kernel` addressing ONE layer of the stacked (layers, B, Hkv,
    C, hd) cache via a scalar-prefetch layer index: the caller's per-layer
    scan can then keep the whole cache in its carry (updated in place by a
    one-row XLA dynamic_update_slice) instead of threading per-layer slices
    through scan xs/ys — which XLA restacks with full-cache copies every
    decode step (~2x the decode step's HBM traffic at 3B/b96/C1280; see
    BASELINE.md round-3 decode-path analysis)."""
    q = q_ref[0, 0]  # (G, hd) bf16
    k = k8_ref[0, 0, 0].astype(jnp.bfloat16)  # (C, hd)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (G, C)
    scores = scores * (ks_ref[0, 0, 0] * sm_scale)  # (1, C) broadcast
    scores = jnp.where(valid_ref[0] > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * vs_ref[0, 0, 0]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, v8_ref[0, 0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )  # (G, hd)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _quantize_q_rows(q):
    """In-kernel per-row symmetric q quantization, same scheme as
    `quantize_kv`: (G, hd) float -> (int8 (G, hd), f32 scales (G, 1))."""
    qf = q.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    return q8, qs


def _scores_vs_cache(q, k8_tile, ks_row, sm_scale, quantize_q):
    """(G, C) scaled attention scores + the effective (dequantized) f32 query
    used for the fresh-column VPU reduction.

    quantize_q=True: q is per-row int8-quantized in-kernel and the score dot
    runs int8 x int8 -> int32 on the MXU — no (C, hd) int8->bf16 K convert
    (the dominant VPU cost of this kernel: BASELINE.md round-4 decomposition
    measured it compute-bound at 255 GB/s) and the MXU runs at its doubled
    int8 rate. Semantics defined by `_decode_attention_int8_xla(quantize_q=
    True)`; opt-in via PADT_DECODE_QI8 (greedy parity re-gated in
    tests/test_kv_cache.py)."""
    if quantize_q:
        q8, qs = _quantize_q_rows(q)
        # precision MUST be pinned: the suite's parity tests set the global
        # matmul precision to 'highest', and an inherited fp32 contract
        # precision on an int8 x int8 Mosaic matmul fails to compile
        # ("Bad lhs type") — the CLAUDE.md test-order trap, int8 edition.
        scores = jax.lax.dot_general(
            q8, k8_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(jnp.float32) * qs  # (G, C)
        q_eff = q8.astype(jnp.float32) * qs
    else:
        scores = jax.lax.dot_general(
            q, k8_tile.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (G, C)
        q_eff = q.astype(jnp.float32)
    return scores * (ks_row * sm_scale), q_eff


def _decode_kernel_stacked_fresh(
    li_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
    valid_ref, o_ref, *, sm_scale, quantize_q=False,
):
    """`_decode_kernel_stacked` reading the PRE-update cache, with the current
    token's K/V passed separately and composited into the softmax in-kernel
    (an extra virtual column). Lets the caller's cache row-write be a pure
    in-place dynamic_update_slice whose value the kernel never consumes —
    XLA copies the full cache when a Pallas read depends on the updated
    buffer inside a scan carry (measured +7.5 ms/step at 3B/b96/C1280)."""
    q = q_ref[0, 0]  # (G, hd) bf16
    scores, q_eff = _scores_vs_cache(q, k8_ref[0, 0, 0], ks_ref[0, 0, 0], sm_scale, quantize_q)
    scores = jnp.where(valid_ref[0] > 0, scores, NEG_INF)  # valid EXCLUDES pos
    # fresh column: the token being decoded attends to itself. A (G,hd)x(1,hd)
    # dot_general trips a Mosaic bf16->f32 broadcast verification bug; an
    # elementwise VPU reduction over hd is tiny (G x hd) and exact in f32.
    kn = kn_ref[0, 0].astype(jnp.float32)  # (1, hd)
    s_f = jnp.sum(q_eff * kn, axis=-1, keepdims=True) * (
        ksn_ref[0, 0] * sm_scale
    )  # (G, 1)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_f)
    p = jnp.exp(scores - m)  # (G, C)
    p_f = jnp.exp(s_f - m)  # (G, 1)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_f
    pv = (p / denom * vs_ref[0, 0, 0]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, v8_ref[0, 0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )  # (G, hd)
    vn = vn_ref[0, 0].astype(jnp.float32) * vsn_ref[0, 0]  # (1, hd)
    out = out + (p_f / denom) * vn
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _decode_attention_int8_pallas_stacked_fresh(
    q, k8, ks, v8, vs, k8n, ksn, v8n, vsn, valid, layer, quantize_q=False
):
    """q: (B, Hkv, G, hd); k8/v8: (L, B, Hkv, C, hd) PRE-update stacks;
    k8n/v8n: (B, Hkv, 1, hd) current-token rows; ksn/vsn: (B, Hkv, 1);
    valid: (B, C) WITHOUT the current position."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hkv, g, hd = q.shape
    nl, _, _, c, _ = k8.shape
    ks5 = ks.reshape(nl, b, hkv, 1, c)
    vs5 = vs.reshape(nl, b, hkv, 1, c)
    valid3 = valid.reshape(b, 1, c)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    kern = functools.partial(
        _decode_kernel_stacked_fresh, sm_scale=1.0 / (hd**0.5), quantize_q=quantize_q
    )
    at_layer = lambda i, j, li_r: (li_r[0], i, j, 0, 0)
    at_bh = lambda i, j, li_r: (i, j, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), at_bh),
            pl.BlockSpec((1, 1, 1, c, hd), at_layer),
            pl.BlockSpec((1, 1, 1, 1, c), at_layer),
            pl.BlockSpec((1, 1, 1, c, hd), at_layer),
            pl.BlockSpec((1, 1, 1, 1, c), at_layer),
            pl.BlockSpec((1, 1, 1, hd), at_bh),
            pl.BlockSpec((1, 1, 1, 1), at_bh),
            pl.BlockSpec((1, 1, 1, hd), at_bh),
            pl.BlockSpec((1, 1, 1, 1), at_bh),
            pl.BlockSpec((1, 1, c), lambda i, j, li_r: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, hd), at_bh),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(li, q, k8, ks5, v8, vs5, k8n, ksn.reshape(b, hkv, 1, 1), v8n,
      vsn.reshape(b, hkv, 1, 1), valid3)


def _decode_kernel_stacked_fresh_bb(
    li_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
    valid_ref, o_ref, *, sm_scale: float, bb: int, hkv: int, quantize_q=False,
):
    """Batch-blocked `_decode_kernel_stacked_fresh`: one program covers `bb`
    batch rows x ALL kv heads, so the per-program cache DMA is one contiguous
    (bb, hkv, C, hd) burst instead of a (1, 1, C, hd) sliver. Motivation
    (measured, scripts/micro_decode_decomp.py at 3B/b96/C1280): the (B, Hkv)
    grid ran 192 ~330 KB programs per layer and achieved only ~255 GB/s on
    the KV stream while the step's weight matmuls hit ~600 GB/s — grid
    iteration overhead, not bandwidth, was the decode attention bound."""
    for ib in range(bb):
        valid_row = valid_ref[ib] > 0  # (1, C)
        for j in range(hkv):
            q = q_ref[ib, j]  # (G, hd) bf16
            scores, q_eff = _scores_vs_cache(
                q, k8_ref[0, ib, j], ks_ref[0, ib, j], sm_scale, quantize_q
            )
            scores = jnp.where(valid_row, scores, NEG_INF)  # valid EXCLUDES pos
            # fresh column: see _decode_kernel_stacked_fresh (the (G,hd)x(1,hd)
            # dot trips a Mosaic broadcast bug; VPU reduction is exact f32)
            kn = kn_ref[ib, j].astype(jnp.float32)  # (1, hd)
            s_f = jnp.sum(q_eff * kn, axis=-1, keepdims=True) * (
                ksn_ref[ib, j] * sm_scale
            )  # (G, 1)
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_f)
            p = jnp.exp(scores - m)  # (G, C)
            p_f = jnp.exp(s_f - m)  # (G, 1)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_f
            pv = (p / denom * vs_ref[0, ib, j]).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                pv, v8_ref[0, ib, j].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (G, hd)
            vn = vn_ref[ib, j].astype(jnp.float32) * vsn_ref[ib, j]  # (1, hd)
            out = out + (p_f / denom) * vn
            o_ref[ib, j] = out.astype(o_ref.dtype)


def _decode_attention_int8_pallas_stacked_fresh_bb(
    q, k8, ks, v8, vs, k8n, ksn, v8n, vsn, valid, layer, bb, quantize_q=False
):
    """Batch-blocked dispatch of the fresh-column stacked kernel: grid is
    (B // bb,); each program DMAs one contiguous (bb, Hkv, C, hd) cache
    chunk per K and V. Requires B % bb == 0 (callers fall back to the
    per-(b, hkv) kernel otherwise)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hkv, g, hd = q.shape
    nl, _, _, c, _ = k8.shape
    assert b % bb == 0, (b, bb)
    ks5 = ks.reshape(nl, b, hkv, 1, c)
    vs5 = vs.reshape(nl, b, hkv, 1, c)
    valid3 = valid.reshape(b, 1, c)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    kern = functools.partial(
        _decode_kernel_stacked_fresh_bb, sm_scale=1.0 / (hd**0.5), bb=bb, hkv=hkv,
        quantize_q=quantize_q,
    )
    at_layer = lambda i, li_r: (li_r[0], i, 0, 0, 0)
    at_b = lambda i, li_r: (i, 0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, hkv, g, hd), at_b),
            pl.BlockSpec((1, bb, hkv, c, hd), at_layer),
            pl.BlockSpec((1, bb, hkv, 1, c), at_layer),
            pl.BlockSpec((1, bb, hkv, c, hd), at_layer),
            pl.BlockSpec((1, bb, hkv, 1, c), at_layer),
            pl.BlockSpec((bb, hkv, 1, hd), at_b),
            pl.BlockSpec((bb, hkv, 1, 1), at_b),
            pl.BlockSpec((bb, hkv, 1, hd), at_b),
            pl.BlockSpec((bb, hkv, 1, 1), at_b),
            pl.BlockSpec((bb, 1, c), lambda i, li_r: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, hkv, g, hd), at_b),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # double-buffered (bb, hkv, C, hd) K+V blocks overflow the 16 MB
            # default scoped-vmem limit at bb>=16/C1280; v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(li, q, k8, ks5, v8, vs5, k8n, ksn.reshape(b, hkv, 1, 1), v8n,
      vsn.reshape(b, hkv, 1, 1), valid3)


def _decode_bb(b: int, hkv: int, c: int, hd: int) -> int:
    """Batch-block size for the fresh-column decode kernel. Largest of
    {16, 8, 4, 2} dividing B whose double-buffered K+V block fits a 64 MB
    VMEM budget (the kernel raises its scoped limit to 100 MB; headroom is
    left for compute temporaries); 1 disables (falls back to the (B, Hkv)
    grid). Override: PADT_DECODE_BB (0/1 = off)."""
    import os

    env = os.environ.get("PADT_DECODE_BB")
    if env is not None:
        bb = int(env)
        return bb if bb > 1 and b % bb == 0 else 1
    # preference order measured at 3B/b96/C1280 (scripts/micro_decode_decomp):
    # full step 17.82 ms (bb=8) vs 18.27 (16) vs 18.60 (32) vs 22.70 (off)
    for bb in (8, 16, 4, 2):
        if b % bb == 0 and 2 * 2 * bb * hkv * c * (hd + 4) <= 64 * 1024 * 1024:
            return bb
    return 1


def _decode_kernel_multi_stacked_fresh(
    li_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
    valid_ref, o_ref, *, sm_scale: float, kq: int,
):
    """`_decode_kernel_multi_stacked` reading the PRE-update cache: the K
    verify-step tokens' K/V arrive as separate rows and are composited as K
    virtual softmax columns with intra-block causality (query i sees fresh
    column j iff j <= i). The cache mask is `valid` alone — the caller
    guarantees it excludes the K new positions, so no per-query write_pos
    limit is needed on the cache side."""
    q = q_ref[0, 0]  # (G*kq, hd) bf16
    gk, _ = q.shape
    k = k8_ref[0, 0, 0].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (G*kq, C)
    scores = scores * (ks_ref[0, 0, 0] * sm_scale)
    scores = jnp.where(valid_ref[0] > 0, scores, NEG_INF)
    # fresh columns, one VPU reduction per static j (a (G*kq,hd)x(kq,hd)
    # dot_general risks the same Mosaic broadcast-verification bug as the
    # single-row case; kq is 4-8, so kq reductions are tiny)
    qf = q.astype(jnp.float32)
    kn = kn_ref[0, 0].astype(jnp.float32)  # (kq, hd)
    ksn = ksn_ref[0, 0]  # (kq, 1) f32
    row_i = jax.lax.broadcasted_iota(jnp.int32, (gk, 1), 0) % kq
    s_f = []
    for j in range(kq):
        sj = jnp.sum(qf * kn[j : j + 1, :], axis=-1, keepdims=True) * (
            ksn[j, 0] * sm_scale
        )  # (G*kq, 1)
        s_f.append(jnp.where(row_i >= j, sj, NEG_INF))
    m = jnp.max(scores, axis=-1, keepdims=True)
    for sj in s_f:
        m = jnp.maximum(m, sj)
    p = jnp.exp(scores - m)  # (G*kq, C)
    p_f = [jnp.exp(sj - m) for sj in s_f]  # kq x (G*kq, 1)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    for pj in p_f:
        denom = denom + pj
    pv = (p / denom * vs_ref[0, 0, 0]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, v8_ref[0, 0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )  # (G*kq, hd)
    vn = vn_ref[0, 0].astype(jnp.float32)  # (kq, hd)
    vsn = vsn_ref[0, 0]  # (kq, 1)
    for j, pj in enumerate(p_f):
        # round pv through bf16 like the stored-row path (pv matmul operand)
        pvj = ((pj / denom) * vsn[j, 0]).astype(jnp.bfloat16).astype(jnp.float32)
        out = out + pvj * vn[j : j + 1, :]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _decode_attention_int8_pallas_multi_stacked_fresh(
    qg, k8, ks, v8, vs, k8n, ksn, v8n, vsn, valid, layer, kq: int
):
    """qg: (B, Hkv, G*kq, hd); k8/v8: (L, B, Hkv, C, hd) PRE-update stacks;
    k8n/v8n: (B, Hkv, kq, hd); ksn/vsn: (B, Hkv, kq); valid: (B, C) WITHOUT
    the kq new positions."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hkv, gk, hd = qg.shape
    nl, _, _, c, _ = k8.shape
    ks5 = ks.reshape(nl, b, hkv, 1, c)
    vs5 = vs.reshape(nl, b, hkv, 1, c)
    valid3 = valid.astype(jnp.int32).reshape(b, 1, c)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    kern = functools.partial(
        _decode_kernel_multi_stacked_fresh, sm_scale=1.0 / (hd**0.5), kq=kq
    )
    at_layer = lambda i, j, li_r: (li_r[0], i, j, 0, 0)
    at_bh = lambda i, j, li_r: (i, j, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, gk, hd), at_bh),
            pl.BlockSpec((1, 1, 1, c, hd), at_layer),
            pl.BlockSpec((1, 1, 1, 1, c), at_layer),
            pl.BlockSpec((1, 1, 1, c, hd), at_layer),
            pl.BlockSpec((1, 1, 1, 1, c), at_layer),
            pl.BlockSpec((1, 1, kq, hd), at_bh),
            pl.BlockSpec((1, 1, kq, 1), at_bh),
            pl.BlockSpec((1, 1, kq, hd), at_bh),
            pl.BlockSpec((1, 1, kq, 1), at_bh),
            pl.BlockSpec((1, 1, c), lambda i, j, li_r: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, gk, hd), at_bh),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gk, hd), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(li, qg, k8, ks5, v8, vs5, k8n, ksn.reshape(b, hkv, kq, 1), v8n,
      vsn.reshape(b, hkv, kq, 1), valid3)


def _decode_attention_int8_pallas_stacked(q, k8, ks, v8, vs, valid, layer):
    """q: (B, Hkv, G, hd); k8/v8: (LAYERS, B, Hkv, C, hd) int8 full stacks;
    ks/vs: (LAYERS, B, Hkv, C) f32; layer: () int32. Only layer `layer`'s
    blocks are DMA'd — no slice materialization."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hkv, g, hd = q.shape
    nl, _, _, c, _ = k8.shape
    ks5 = ks.reshape(nl, b, hkv, 1, c)
    vs5 = vs.reshape(nl, b, hkv, 1, c)
    valid3 = valid.reshape(b, 1, c)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    kern = functools.partial(_decode_kernel_stacked, sm_scale=1.0 / (hd**0.5))
    at_layer = lambda i, j, li_r: (li_r[0], i, j, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda i, j, li_r: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c, hd), at_layer),
            pl.BlockSpec((1, 1, 1, 1, c), at_layer),
            pl.BlockSpec((1, 1, 1, c, hd), at_layer),
            pl.BlockSpec((1, 1, 1, 1, c), at_layer),
            pl.BlockSpec((1, 1, c), lambda i, j, li_r: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, hd), lambda i, j, li_r: (i, j, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(li, q, k8, ks5, v8, vs5, valid3)


_KV_TILE = 256  # k-tile rows for the length-aware decode kernel


def _decode_kernel_tiled(
    hi_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, valid_ref, o_ref,
    m_ref, l_ref, acc_ref, *, sm_scale: float,
):
    """Flash-style tiled variant of `_decode_kernel`: the k-range grid dim
    walks only the tiles below each sample's live length (`hi_ref`); the
    caller's clamped index map re-presents the last live tile for the padding
    steps, so dead capacity rows are never DMA'd from HBM (at 640-token
    prompts in a 1280-capacity cache that is ~45% of the KV stream)."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    kt = pl.program_id(2)
    nt = pl.num_programs(2)

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kt < hi_ref[bi])
    def _():
        q = q_ref[0, 0]  # (G, hd) bf16
        k = k8_ref[0, 0].astype(jnp.bfloat16)  # (T, hd)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (G, T)
        s = s * (ks_ref[0, 0] * sm_scale)
        s = jnp.where(valid_ref[0] > 0, s, NEG_INF)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_ref[:], m_blk)
        p = jnp.exp(s - m_new)
        p = jnp.where(valid_ref[0] > 0, p, 0.0)
        corr = jnp.exp(m_ref[:] - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs_ref[0, 0]).astype(jnp.bfloat16)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            pv, v8_ref[0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )
        m_ref[:] = m_new

    @pl.when(kt == nt - 1)
    def _():
        l = l_ref[:]
        o_ref[0, 0] = jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0).astype(
            o_ref.dtype
        )


def _decode_attention_int8_pallas_tiled(q, k8, ks, v8, vs, valid, n_valid):
    """`_decode_attention_int8_pallas` reading only live k-tiles.

    n_valid: (B,) int32 — positions >= n_valid[b] are dead for sample b (they
    may be skipped regardless of `valid`, which still masks left padding and
    holes below n_valid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hkv, g, hd = q.shape
    c = k8.shape[2]
    t = _KV_TILE
    if c % t != 0:
        return _decode_attention_int8_pallas(q, k8, ks, v8, vs, valid)
    nt = c // t
    hi = jnp.clip((n_valid.astype(jnp.int32) + t - 1) // t, 1, nt)  # (B,) tiles needed
    ks4 = ks.reshape(b, hkv, 1, c)
    vs4 = vs.reshape(b, hkv, 1, c)
    valid3 = valid.reshape(b, 1, c)

    # clamped k-tile index: padding grid steps re-present the last live tile
    # (same block index as the previous step -> Mosaic skips the DMA)
    kt_idx = lambda i, j, kt, hi_r: (i, j, jnp.minimum(kt, hi_r[i] - 1), 0)
    kt_idx3 = lambda i, j, kt, hi_r: (i, 0, jnp.minimum(kt, hi_r[i] - 1))
    fixed = lambda i, j, kt, hi_r: (i, j, 0, 0)
    kern = functools.partial(_decode_kernel_tiled, sm_scale=1.0 / (hd**0.5))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, nt),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), fixed),
            pl.BlockSpec((1, 1, t, hd), kt_idx),
            pl.BlockSpec((1, 1, 1, t), lambda i, j, kt, hi_r: (i, j, 0, jnp.minimum(kt, hi_r[i] - 1))),
            pl.BlockSpec((1, 1, t, hd), kt_idx),
            pl.BlockSpec((1, 1, 1, t), lambda i, j, kt, hi_r: (i, j, 0, jnp.minimum(kt, hi_r[i] - 1))),
            pl.BlockSpec((1, 1, t), kt_idx3),
        ],
        out_specs=pl.BlockSpec((1, 1, g, hd), fixed),
        scratch_shapes=[
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(hi, q, k8, ks4, v8, vs4, valid3)


# ---------------------------------------------------------------------------
# Per-sample KV row store (serve engine): each slot writes its new token at
# its OWN cache position. A vmapped dynamic_update_slice lowers to an XLA
# scatter — measured +20 ms/step at 3B/64 slots (~2x decode cost). This kernel
# aliases the cache buffers in place and DMAs only the 32-row tile containing
# each slot's position (scalar-prefetch index map), ~17 KB per (slot, head).
# ---------------------------------------------------------------------------

_STORE_ROWS = 32  # int8 sublane tile granularity


def _store_rows_kernel(
    pos_ref, k8_ref, ks_ref, v8_ref, vs_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref,
    k8o_ref, kso_ref, v8o_ref, vso_ref,
):
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    r = pos_ref[bi] % _STORE_ROWS
    # row select instead of a dynamic sublane store (Mosaic requires stores to
    # be provably 8-aligned in the sublane dim; a (32, d) masked where is free)
    def put(o_ref, cur_ref, new_ref):
        cur = cur_ref[0, 0]  # (R, d)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0) == r
        o_ref[0, 0] = jnp.where(rowmask, new_ref[0, 0], cur)

    put(k8o_ref, k8_ref, k8n_ref)
    put(kso_ref, ks_ref, ksn_ref)
    put(v8o_ref, v8_ref, v8n_ref)
    put(vso_ref, vs_ref, vsn_ref)


def _store_rows_kernel_stacked(
    pos_ref, li_ref, k8_ref, ks_ref, v8_ref, vs_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref,
    k8o_ref, kso_ref, v8o_ref, vso_ref,
):
    """`_store_rows_kernel` over the stacked (layers, ...) cache: blocks are
    rank 5 with the layer picked by the scalar-prefetch index map."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    r = pos_ref[bi] % _STORE_ROWS

    def put(o_ref, cur_ref, new_ref):
        cur = cur_ref[0, 0, 0]  # (R, d)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0) == r
        o_ref[0, 0, 0] = jnp.where(rowmask, new_ref[0, 0], cur)

    put(k8o_ref, k8_ref, k8n_ref)
    put(kso_ref, ks_ref, ksn_ref)
    put(v8o_ref, v8_ref, v8n_ref)
    put(vso_ref, vs_ref, vsn_ref)


def _store_kv_rows_stacked(k8, ks, v8, vs, k8n, ksn4, v8n, vsn4, pos, layer):
    """In-place per-sample row store into layer `layer` of the stacked cache.
    k8/v8: (L, B, Hkv, C, hd); ks/vs passed 5D (L, B, Hkv, C, 1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nl, b, hkv, c, hd = k8.shape
    R = _STORE_ROWS
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    tile = lambda bi, hi, pos_r, li_r: (li_r[0], bi, hi, pos_r[bi] // R, 0)
    row = lambda bi, hi, pos_r, li_r: (bi, hi, 0, 0)
    spec_c8 = pl.BlockSpec((1, 1, 1, R, hd), tile)
    spec_cs = pl.BlockSpec((1, 1, 1, R, 1), tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            spec_c8,
            spec_cs,
            spec_c8,
            spec_cs,
            pl.BlockSpec((1, 1, 1, hd), row),
            pl.BlockSpec((1, 1, 1, 1), row),
            pl.BlockSpec((1, 1, 1, hd), row),
            pl.BlockSpec((1, 1, 1, 1), row),
        ],
        out_specs=[spec_c8, spec_cs, spec_c8, spec_cs],
    )
    return pl.pallas_call(
        _store_rows_kernel_stacked,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct((nl, b, hkv, c, 1), ks.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct((nl, b, hkv, c, 1), vs.dtype),
        ],
        # flat input indices INCLUDE the two scalar-prefetch args (pos=0, li=1)
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(pos, li, k8, ks, v8, vs, k8n, ksn4, v8n, vsn4)


def _store_rows_kernel_all_layers(
    pos_ref, k8_ref, ks_ref, v8_ref, vs_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref,
    k8o_ref, kso_ref, v8o_ref, vso_ref,
):
    """`_store_rows_kernel_stacked` with the layer as grid dim 0 instead of a
    scalar-prefetch index: one launch writes EVERY layer's new row (the
    post-scan write for the serve engine's read-only-cache decode step)."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(1)
    r = pos_ref[bi] % _STORE_ROWS

    def put(o_ref, cur_ref, new_ref):
        cur = cur_ref[0, 0, 0]  # (R, d)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0) == r
        o_ref[0, 0, 0] = jnp.where(rowmask, new_ref[0, 0, 0], cur)

    put(k8o_ref, k8_ref, k8n_ref)
    put(kso_ref, ks_ref, ksn_ref)
    put(v8o_ref, v8_ref, v8n_ref)
    put(vso_ref, vs_ref, vsn_ref)


def store_kv_rows_all_layers(
    k8: jnp.ndarray,  # (L, B, Hkv, C, hd) int8 full stack
    ks: jnp.ndarray,  # (L, B, Hkv, C) f32
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    k8r: jnp.ndarray,  # (L, B, Hkv, 1, hd) int8 — every layer's new row
    ksr: jnp.ndarray,  # (L, B, Hkv, 1) f32
    v8r: jnp.ndarray,
    vsr: jnp.ndarray,
    pos: jnp.ndarray,  # (B,) int32 — per-sample cache position (all layers)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Write each sample's new KV row at its own position in EVERY layer, in
    place. Pairs with `decode_attention_int8(..., layer=, fresh_kv=)`: the
    scan's attention reads the pre-update stack (loop-invariant — no carry
    copies), each layer's fresh row leaves as stacked ys, and this single
    aliased launch lands all of them."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .attention import use_pallas

    nl, b, hkv, c, hd = k8.shape
    if not use_pallas():
        upd = jax.vmap(
            lambda bufL, kvL: jax.vmap(
                lambda buf, kv, p: jax.lax.dynamic_update_slice(buf, kv, (0, p, 0))
            )(bufL, kvL, pos)
        )
        upd_s = jax.vmap(
            lambda bufL, sL: jax.vmap(
                lambda buf, s, p: jax.lax.dynamic_update_slice(buf, s, (0, p))
            )(bufL, sL, pos)
        )
        return upd(k8, k8r), upd_s(ks, ksr), upd(v8, v8r), upd_s(vs, vsr)

    R = _STORE_ROWS
    tile = lambda l, bi, hi, pos_r: (l, bi, hi, pos_r[bi] // R, 0)
    row = lambda l, bi, hi, pos_r: (l, bi, hi, 0, 0)
    spec_c8 = pl.BlockSpec((1, 1, 1, R, hd), tile)
    spec_cs = pl.BlockSpec((1, 1, 1, R, 1), tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, b, hkv),
        in_specs=[
            spec_c8,
            spec_cs,
            spec_c8,
            spec_cs,
            pl.BlockSpec((1, 1, 1, 1, hd), row),
            pl.BlockSpec((1, 1, 1, 1, 1), row),
            pl.BlockSpec((1, 1, 1, 1, hd), row),
            pl.BlockSpec((1, 1, 1, 1, 1), row),
        ],
        out_specs=[spec_c8, spec_cs, spec_c8, spec_cs],
    )
    k8o, ks5o, v8o, vs5o = pl.pallas_call(
        _store_rows_kernel_all_layers,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct((nl, b, hkv, c, 1), ks.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct((nl, b, hkv, c, 1), vs.dtype),
        ],
        # flat input indices INCLUDE the scalar-prefetch arg (pos=0)
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(
        pos,
        k8,
        ks.reshape(nl, b, hkv, c, 1),
        v8,
        vs.reshape(nl, b, hkv, c, 1),
        k8r,
        ksr.reshape(nl, b, hkv, 1, 1),
        v8r,
        vsr.reshape(nl, b, hkv, 1, 1),
    )
    return k8o, ks5o.reshape(nl, b, hkv, c), v8o, vs5o.reshape(nl, b, hkv, c)


def _store_rows_k_kernel_all_layers(
    meta_ref, k8_ref, ks_ref, v8_ref, vs_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref,
    k8o_ref, kso_ref, v8o_ref, vso_ref, *, offset: int, kq: int,
):
    """`_store_rows_k_kernel_stacked` with the layer as grid dim 0 instead of
    a scalar-prefetch index: one two-pass launch writes EVERY layer's K new
    rows (the post-scan write for the serve engine's speculative verify).

    meta_ref (2, B): row 0 = per-sample first store position, row 1 = how many
    of the K rows to store (rows >= count leave the cache byte-identical —
    the prefix-cache suffix pass runs pool-wide and slots outside the
    admission MUST NOT have live rows physically overwritten)."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(1)
    r = meta_ref[0, bi] % _STORE_ROWS - offset * _STORE_ROWS
    n = meta_ref[1, bi]
    ii = jax.lax.broadcasted_iota(jnp.int32, (_STORE_ROWS, kq), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_STORE_ROWS, kq), 1)
    sel = ((ii == r + jj) & (jj < n)).astype(jnp.float32)
    rowmask = (jnp.sum(sel, axis=1, keepdims=True) > 0)

    def put(o_ref, cur_ref, new_ref):
        cur = cur_ref[0, 0, 0]  # (R, d)
        new = new_ref[0, 0, 0].astype(jnp.float32)  # (K, d)
        shifted = jax.lax.dot_general(
            sel, new, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_ref[0, 0, 0] = jnp.where(rowmask, shifted.astype(cur.dtype), cur)

    put(k8o_ref, k8_ref, k8n_ref)
    put(kso_ref, ks_ref, ksn_ref)
    put(v8o_ref, v8_ref, v8n_ref)
    put(vso_ref, vs_ref, vsn_ref)


def store_kv_rows_k_all_layers(
    k8: jnp.ndarray,  # (L, B, Hkv, C, hd) int8 full stack
    ks: jnp.ndarray,  # (L, B, Hkv, C) f32
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    k8r: jnp.ndarray,  # (L, B, Hkv, K, hd) int8 — every layer's K new rows
    ksr: jnp.ndarray,  # (L, B, Hkv, K) f32
    v8r: jnp.ndarray,
    vsr: jnp.ndarray,
    pos: jnp.ndarray,  # (B,) int32 — first row position per sample
    n_rows: Optional[jnp.ndarray] = None,  # (B,) int32 — rows to store (default K)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`store_kv_rows_all_layers` for K consecutive rows per (layer, sample)
    (the speculative verify step's post-scan write). Two aliased passes cover
    the straddled 32-row tile pair, exactly like `store_kv_rows_k`.

    `n_rows`: per-sample count of rows actually stored; rows >= n_rows leave
    the cache byte-identical. The prefix-cache suffix prefill passes its
    per-slot suffix lengths here so slots OUTSIDE the admission (n_rows 0)
    are never physically written — their store position is clamped and could
    otherwise land on live rows of a near-capacity slot."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .attention import use_pallas

    nl, b, hkv, c, hd = k8.shape
    kq = k8r.shape[3]
    assert kq <= _STORE_ROWS
    if n_rows is None:
        n_rows = jnp.full((b,), kq, jnp.int32)
    if not use_pallas():
        jj = jnp.arange(kq)

        def merge(buf, kv, p, n):  # buf (Hkv, C, d), kv (Hkv, K, d)
            cur = jax.lax.dynamic_slice(buf, (0, p, 0), (buf.shape[0], kq, buf.shape[2]))
            kv = jnp.where((jj < n)[None, :, None], kv, cur)
            return jax.lax.dynamic_update_slice(buf, kv, (0, p, 0))

        def merge_s(buf, s, p, n):  # buf (Hkv, C), s (Hkv, K)
            cur = jax.lax.dynamic_slice(buf, (0, p), (buf.shape[0], kq))
            s = jnp.where((jj < n)[None, :], s, cur)
            return jax.lax.dynamic_update_slice(buf, s, (0, p))

        upd = jax.vmap(lambda bufL, kvL: jax.vmap(merge)(bufL, kvL, pos, n_rows))
        upd_s = jax.vmap(lambda bufL, sL: jax.vmap(merge_s)(bufL, sL, pos, n_rows))
        return upd(k8, k8r), upd_s(ks, ksr), upd(v8, v8r), upd_s(vs, vsr)

    R = _STORE_ROWS
    n_tiles = c // R
    ks5 = ks.reshape(nl, b, hkv, c, 1)
    vs5 = vs.reshape(nl, b, hkv, c, 1)
    ksr5 = ksr.reshape(nl, b, hkv, kq, 1)
    vsr5 = vsr.reshape(nl, b, hkv, kq, 1)

    for offset in (0, 1):
        tile = (
            (lambda l, bi, hi, meta_r: (l, bi, hi, meta_r[0, bi] // R, 0))
            if offset == 0
            else (lambda l, bi, hi, meta_r: (l, bi, hi, jnp.minimum(meta_r[0, bi] // R + 1, n_tiles - 1), 0))
        )
        row = lambda l, bi, hi, meta_r: (l, bi, hi, 0, 0)
        spec_c8 = pl.BlockSpec((1, 1, 1, R, hd), tile)
        spec_cs = pl.BlockSpec((1, 1, 1, R, 1), tile)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nl, b, hkv),
            in_specs=[
                spec_c8, spec_cs, spec_c8, spec_cs,
                pl.BlockSpec((1, 1, 1, kq, hd), row),
                pl.BlockSpec((1, 1, 1, kq, 1), row),
                pl.BlockSpec((1, 1, 1, kq, hd), row),
                pl.BlockSpec((1, 1, 1, kq, 1), row),
            ],
            out_specs=[spec_c8, spec_cs, spec_c8, spec_cs],
        )
        pos_eff = pos if offset == 0 else jnp.where(pos // R + 1 <= n_tiles - 1, pos, 0)
        # second pass: samples whose rows don't straddle into a next tile
        # store ZERO rows there (pos_eff falls back to tile 0 — it must not
        # re-store, n=0 makes the pass a pure copy for them)
        n_eff = n_rows if offset == 0 else jnp.where(pos // R + 1 <= n_tiles - 1, n_rows, 0)
        meta = jnp.stack([pos_eff.astype(jnp.int32), n_eff.astype(jnp.int32)])
        k8, ks5, v8, vs5 = pl.pallas_call(
            functools.partial(_store_rows_k_kernel_all_layers, offset=offset, kq=kq),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(k8.shape, k8.dtype),
                jax.ShapeDtypeStruct(ks5.shape, ks5.dtype),
                jax.ShapeDtypeStruct(v8.shape, v8.dtype),
                jax.ShapeDtypeStruct(vs5.shape, vs5.dtype),
            ],
            # flat input indices INCLUDE the scalar-prefetch arg (meta=0)
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
        )(meta, k8, ks5, v8, vs5, k8r, ksr5, v8r, vsr5)
    return k8, ks5.reshape(nl, b, hkv, c), v8, vs5.reshape(nl, b, hkv, c)


def store_kv_rows(
    k8: jnp.ndarray,  # (B, Hkv, C, hd) int8; (L, B, Hkv, C, hd) with layer=
    ks: jnp.ndarray,  # (B, Hkv, C) f32;     (L, B, Hkv, C) with layer=
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    k8n: jnp.ndarray,  # (B, Hkv, 1, hd) int8 — new token rows
    ksn: jnp.ndarray,  # (B, Hkv, 1) f32
    v8n: jnp.ndarray,
    vsn: jnp.ndarray,
    pos: jnp.ndarray,  # (B,) int32 — per-sample cache position
    layer=None,  # () int32 — if given, k8/ks/v8/vs are FULL layer stacks and
    #              the rows are stored into layer `layer` in place
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Write each sample's new KV row at its own position, in place."""
    from .attention import use_pallas

    if layer is not None:
        nl, b, hkv, c, hd = k8.shape
        if use_pallas():
            k8o, ks5o, v8o, vs5o = _store_kv_rows_stacked(
                k8, ks.reshape(nl, b, hkv, c, 1), v8, vs.reshape(nl, b, hkv, c, 1),
                k8n, ksn.reshape(b, hkv, 1, 1), v8n, vsn.reshape(b, hkv, 1, 1),
                pos, layer,
            )
            return k8o, ks5o.reshape(nl, b, hkv, c), v8o, vs5o.reshape(nl, b, hkv, c)
        li = jnp.asarray(layer, jnp.int32)
        # one-row-per-sample scatter into layer li (CPU/test fallback)
        upd = jax.vmap(
            lambda buf, kv, p: jax.lax.dynamic_update_slice(buf, kv, (0, p, 0)), (0, 0, 0), 0
        )
        upd_s = jax.vmap(
            lambda buf, s, p: jax.lax.dynamic_update_slice(buf, s, (0, p)), (0, 0, 0), 0
        )
        pick = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
        put = lambda a, upd_l: jax.lax.dynamic_update_index_in_dim(a, upd_l, li, 0)
        return (
            put(k8, upd(pick(k8), k8n, pos)),
            put(ks, upd_s(pick(ks), ksn, pos)),
            put(v8, upd(pick(v8), v8n, pos)),
            put(vs, upd_s(pick(vs), vsn, pos)),
        )

    b, hkv, c, hd = k8.shape
    if not use_pallas():
        upd = jax.vmap(
            lambda buf, kv, p: jax.lax.dynamic_update_slice(buf, kv, (0, p, 0)), (0, 0, 0), 0
        )
        upd_s = jax.vmap(
            lambda buf, s, p: jax.lax.dynamic_update_slice(buf, s, (0, p)), (0, 0, 0), 0
        )
        return upd(k8, k8n, pos), upd_s(ks, ksn, pos), upd(v8, v8n, pos), upd_s(vs, vsn, pos)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ks4 = ks.reshape(b, hkv, c, 1)
    vs4 = vs.reshape(b, hkv, c, 1)
    ksn4 = ksn.reshape(b, hkv, 1, 1)
    vsn4 = vsn.reshape(b, hkv, 1, 1)
    R = _STORE_ROWS
    tile = lambda bi, hi, pos_r: (bi, hi, pos_r[bi] // R, 0)
    row = lambda bi, hi, pos_r: (bi, hi, 0, 0)
    spec_c8 = pl.BlockSpec((1, 1, R, hd), tile)
    spec_cs = pl.BlockSpec((1, 1, R, 1), tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            spec_c8,
            spec_cs,
            spec_c8,
            spec_cs,
            pl.BlockSpec((1, 1, 1, hd), row),
            pl.BlockSpec((1, 1, 1, 1), row),
            pl.BlockSpec((1, 1, 1, hd), row),
            pl.BlockSpec((1, 1, 1, 1), row),
        ],
        out_specs=[spec_c8, spec_cs, spec_c8, spec_cs],
    )
    k8o, ks4o, v8o, vs4o = pl.pallas_call(
        _store_rows_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(ks4.shape, ks4.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(vs4.shape, vs4.dtype),
        ],
        # flat input indices INCLUDE the scalar-prefetch arg (pos=0)
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(pos, k8, ks4, v8, vs4, k8n, ksn4, v8n, vsn4)
    return k8o, ks4o.reshape(b, hkv, c), v8o, vs4o.reshape(b, hkv, c)


def _store_rows_k_kernel(
    pos_ref, k8_ref, ks_ref, v8_ref, vs_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref,
    k8o_ref, kso_ref, v8o_ref, vso_ref, *, offset: int, kq: int,
):
    """K consecutive new rows into a 32-row tile. `offset`=0 writes the tile
    containing `pos`, offset=1 the next tile (rows that spill across the
    boundary). Row placement via a 0/1 selection matmul — Mosaic has no
    dynamic sublane scatter, and (R,K)@(K,d) is one tiny MXU op."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    r = pos_ref[bi] % _STORE_ROWS - offset * _STORE_ROWS  # in [-R+1, R-1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (_STORE_ROWS, kq), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_STORE_ROWS, kq), 1)
    sel = (ii == r + jj).astype(jnp.float32)  # (R, K) one-hot rows
    rowmask = (jnp.sum(sel, axis=1, keepdims=True) > 0)

    def put(o_ref, cur_ref, new_ref):
        cur = cur_ref[0, 0]  # (R, d)
        new = new_ref[0, 0].astype(jnp.float32)  # (K, d)
        shifted = jax.lax.dot_general(
            sel, new, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # exact: 0/1 x int8-range values
        o_ref[0, 0] = jnp.where(rowmask, shifted.astype(cur.dtype), cur)

    put(k8o_ref, k8_ref, k8n_ref)
    put(kso_ref, ks_ref, ksn_ref)
    put(v8o_ref, v8_ref, v8n_ref)
    put(vso_ref, vs_ref, vsn_ref)


def store_kv_rows_k(
    k8: jnp.ndarray,  # (B, Hkv, C, hd) int8; (L, B, Hkv, C, hd) with layer=
    ks: jnp.ndarray,  # (B, Hkv, C) f32;     (L, B, Hkv, C) with layer=
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    k8n: jnp.ndarray,  # (B, Hkv, K, hd) int8 — K consecutive new rows
    ksn: jnp.ndarray,  # (B, Hkv, K) f32
    v8n: jnp.ndarray,
    vsn: jnp.ndarray,
    pos: jnp.ndarray,  # (B,) int32 — first row position per sample
    layer=None,  # () int32 — rows go into layer `layer` of the full stack
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`store_kv_rows` for K<=32 consecutive rows per sample (speculative
    verify step). Two aliased kernel passes cover the straddled tile pair."""
    from .attention import use_pallas

    if layer is not None:
        li = jnp.asarray(layer, jnp.int32)
        if not use_pallas():
            upd = jax.vmap(
                lambda buf, kv, p: jax.lax.dynamic_update_slice(buf, kv, (0, p, 0)), (0, 0, 0), 0
            )
            upd_s = jax.vmap(
                lambda buf, s, p: jax.lax.dynamic_update_slice(buf, s, (0, p)), (0, 0, 0), 0
            )
            pick = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
            put = lambda a, u: jax.lax.dynamic_update_index_in_dim(a, u, li, 0)
            return (
                put(k8, upd(pick(k8), k8n, pos)),
                put(ks, upd_s(pick(ks), ksn, pos)),
                put(v8, upd(pick(v8), v8n, pos)),
                put(vs, upd_s(pick(vs), vsn, pos)),
            )
        return _store_kv_rows_k_stacked(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, li)

    b, hkv, c, hd = k8.shape
    kq = k8n.shape[2]
    assert kq <= _STORE_ROWS
    if not use_pallas():
        upd = jax.vmap(
            lambda buf, kv, p: jax.lax.dynamic_update_slice(buf, kv, (0, p, 0)), (0, 0, 0), 0
        )
        upd_s = jax.vmap(
            lambda buf, s, p: jax.lax.dynamic_update_slice(buf, s, (0, p)), (0, 0, 0), 0
        )
        return upd(k8, k8n, pos), upd_s(ks, ksn, pos), upd(v8, v8n, pos), upd_s(vs, vsn, pos)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = _STORE_ROWS
    n_tiles = c // R
    ks4 = ks.reshape(b, hkv, c, 1)
    vs4 = vs.reshape(b, hkv, c, 1)
    ksn4 = ksn.reshape(b, hkv, kq, 1)
    vsn4 = vsn.reshape(b, hkv, kq, 1)

    for offset in (0, 1):
        tile = (
            (lambda bi, hi, pos_r: (bi, hi, pos_r[bi] // R, 0))
            if offset == 0
            else (lambda bi, hi, pos_r: (bi, hi, jnp.minimum(pos_r[bi] // R + 1, n_tiles - 1), 0))
        )
        row = lambda bi, hi, pos_r: (bi, hi, 0, 0)
        spec_c8 = pl.BlockSpec((1, 1, R, hd), tile)
        spec_cs = pl.BlockSpec((1, 1, R, 1), tile)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv),
            in_specs=[
                spec_c8, spec_cs, spec_c8, spec_cs,
                pl.BlockSpec((1, 1, kq, hd), row),
                pl.BlockSpec((1, 1, kq, 1), row),
                pl.BlockSpec((1, 1, kq, hd), row),
                pl.BlockSpec((1, 1, kq, 1), row),
            ],
            out_specs=[spec_c8, spec_cs, spec_c8, spec_cs],
        )
        # when the offset-1 tile is clamped (pos already in the LAST tile there
        # can be no spill: pos+K<=C), force an empty row selection (r=-R)
        pos_eff = pos if offset == 0 else jnp.where(pos // R + 1 <= n_tiles - 1, pos, 0)
        k8, ks4, v8, vs4 = pl.pallas_call(
            functools.partial(_store_rows_k_kernel, offset=offset, kq=kq),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(k8.shape, k8.dtype),
                jax.ShapeDtypeStruct(ks4.shape, ks4.dtype),
                jax.ShapeDtypeStruct(v8.shape, v8.dtype),
                jax.ShapeDtypeStruct(vs4.shape, vs4.dtype),
            ],
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(pos_eff, k8, ks4, v8, vs4, k8n, ksn4, v8n, vsn4)
    return k8, ks4.reshape(b, hkv, c), v8, vs4.reshape(b, hkv, c)


def _store_rows_k_kernel_stacked(
    pos_ref, li_ref, k8_ref, ks_ref, v8_ref, vs_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref,
    k8o_ref, kso_ref, v8o_ref, vso_ref, *, offset: int, kq: int,
):
    """`_store_rows_k_kernel` over the stacked (layers, ...) cache."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    r = pos_ref[bi] % _STORE_ROWS - offset * _STORE_ROWS
    ii = jax.lax.broadcasted_iota(jnp.int32, (_STORE_ROWS, kq), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_STORE_ROWS, kq), 1)
    sel = (ii == r + jj).astype(jnp.float32)
    rowmask = (jnp.sum(sel, axis=1, keepdims=True) > 0)

    def put(o_ref, cur_ref, new_ref):
        cur = cur_ref[0, 0, 0]
        new = new_ref[0, 0].astype(jnp.float32)
        shifted = jax.lax.dot_general(
            sel, new, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_ref[0, 0, 0] = jnp.where(rowmask, shifted.astype(cur.dtype), cur)

    put(k8o_ref, k8_ref, k8n_ref)
    put(kso_ref, ks_ref, ksn_ref)
    put(v8o_ref, v8_ref, v8n_ref)
    put(vso_ref, vs_ref, vsn_ref)


def _store_kv_rows_k_stacked(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, li):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nl, b, hkv, c, hd = k8.shape
    kq = k8n.shape[2]
    assert kq <= _STORE_ROWS
    R = _STORE_ROWS
    n_tiles = c // R
    ks5 = ks.reshape(nl, b, hkv, c, 1)
    vs5 = vs.reshape(nl, b, hkv, c, 1)
    ksn4 = ksn.reshape(b, hkv, kq, 1)
    vsn4 = vsn.reshape(b, hkv, kq, 1)
    li1 = li.reshape(1)

    for offset in (0, 1):
        tile = (
            (lambda bi, hi, pos_r, li_r: (li_r[0], bi, hi, pos_r[bi] // R, 0))
            if offset == 0
            else (lambda bi, hi, pos_r, li_r: (li_r[0], bi, hi, jnp.minimum(pos_r[bi] // R + 1, n_tiles - 1), 0))
        )
        row = lambda bi, hi, pos_r, li_r: (bi, hi, 0, 0)
        spec_c8 = pl.BlockSpec((1, 1, 1, R, hd), tile)
        spec_cs = pl.BlockSpec((1, 1, 1, R, 1), tile)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv),
            in_specs=[
                spec_c8, spec_cs, spec_c8, spec_cs,
                pl.BlockSpec((1, 1, kq, hd), row),
                pl.BlockSpec((1, 1, kq, 1), row),
                pl.BlockSpec((1, 1, kq, hd), row),
                pl.BlockSpec((1, 1, kq, 1), row),
            ],
            out_specs=[spec_c8, spec_cs, spec_c8, spec_cs],
        )
        pos_eff = pos if offset == 0 else jnp.where(pos // R + 1 <= n_tiles - 1, pos, 0)
        k8, ks5, v8, vs5 = pl.pallas_call(
            functools.partial(_store_rows_k_kernel_stacked, offset=offset, kq=kq),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(k8.shape, k8.dtype),
                jax.ShapeDtypeStruct(ks5.shape, ks5.dtype),
                jax.ShapeDtypeStruct(v8.shape, v8.dtype),
                jax.ShapeDtypeStruct(vs5.shape, vs5.dtype),
            ],
            # flat input indices INCLUDE the two scalar-prefetch args
            input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(pos_eff, li1, k8, ks5, v8, vs5, k8n, ksn4, v8n, vsn4)
    return k8, ks5.reshape(nl, b, hkv, c), v8, vs5.reshape(nl, b, hkv, c)


def _decode_kernel_multi(
    wp_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, valid_ref, o_ref,
    *, sm_scale: float, kq: int,
):
    """Multi-token (speculative verify) variant of `_decode_kernel`: q rows
    are (G, kq) flattened; row g*kq+i attends cache positions
    valid & (pos <= write_pos + i) — causal over the kq new tokens whose KVs
    were just stored at write_pos..write_pos+kq-1."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    wp = wp_ref[bi]
    q = q_ref[0, 0]  # (G*kq, hd) bf16
    gk, _ = q.shape
    c = k8_ref.shape[2]
    k = k8_ref[0, 0].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (G*kq, C)
    scores = scores * (ks_ref[0, 0] * sm_scale)
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (gk, c), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (gk, c), 0) % kq
    mask = (valid_ref[0] > 0) & (pos_c <= wp + row_i)
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * vs_ref[0, 0]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, v8_ref[0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _decode_kernel_multi_stacked(
    wp_ref, li_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, valid_ref, o_ref,
    *, sm_scale: float, kq: int,
):
    """`_decode_kernel_multi` over the stacked (layers, ...) cache."""
    from jax.experimental import pallas as pl

    bi = pl.program_id(0)
    wp = wp_ref[bi]
    q = q_ref[0, 0]  # (G*kq, hd) bf16
    gk, _ = q.shape
    c = k8_ref.shape[3]
    k = k8_ref[0, 0, 0].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    scores = scores * (ks_ref[0, 0, 0] * sm_scale)
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (gk, c), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (gk, c), 0) % kq
    mask = (valid_ref[0] > 0) & (pos_c <= wp + row_i)
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * vs_ref[0, 0, 0]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, v8_ref[0, 0, 0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def decode_attention_int8_multi(
    q: jnp.ndarray,  # (B, K, H, hd) — K speculative-step queries
    k8: jnp.ndarray,  # (B, Hkv, C, hd) int8 (new K rows already stored);
    #                   (LAYERS, B, Hkv, C, hd) with layer=
    ks: jnp.ndarray,
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    valid: jnp.ndarray,  # (B, C) bool — INCLUDING the K new positions
    #                      (EXCLUDING them with fresh_kv=)
    write_pos: jnp.ndarray,  # (B,) int32 — first new position
    layer=None,  # () int32 — read layer `layer` of the full stack
    fresh_kv=None,  # (k8n, ksn, v8n, vsn) with k8n/v8n (B, Hkv, K, hd) and
    #              ksn/vsn (B, Hkv, K): the K verify-step tokens' own K/V,
    #              composited in-kernel with intra-block causality. The cache
    #              args must then be PRE-update and `valid` must EXCLUDE the
    #              K new positions — the caller's row store happens once,
    #              post-scan, on a stack the kernels never read (see
    #              decode_attention_int8's fresh_kv note).
    quantize_q=None,  # int8-native score dots (PADT_DECODE_QI8). NOT
    #              implemented for the multi-query kernels: quantized-q decode
    #              mixed with bf16-q verify would make speculative decoding
    #              non-equivalent to plain decode, so this raises instead of
    #              silently ignoring the flag (advisor r4, medium).
) -> jnp.ndarray:
    """Grouped K-token attention over the int8 cache -> (B, K, H, hd).
    Query i attends valid positions <= write_pos + i (causal over the new
    block). One cache read serves all K queries — the HBM economics that make
    speculative decoding pay on a bandwidth-bound decode."""
    from .attention import use_pallas

    if quantize_q is None:
        quantize_q = _QI8_DEFAULT
    if quantize_q:
        raise NotImplementedError(
            "quantize_q (PADT_DECODE_QI8) is only implemented for the "
            "single-step fresh_kv decode paths; the multi-query (speculative "
            "verify / suffix prefill) kernels run bf16 score dots. Unset "
            "PADT_DECODE_QI8 for engine/spec-decode workloads."
        )

    b, kq, h, hd = q.shape
    hkv = k8.shape[1] if layer is None else k8.shape[2]
    g = h // hkv
    # row r = gi*kq + i (head-major): q (B,K,H,hd) -> (B,Hkv,G,K,hd) -> flat
    qg = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, kq, hd).reshape(b, hkv, g * kq, hd)
    if fresh_kv is not None:
        assert layer is not None, "fresh_kv requires the stacked-cache layout"
        k8n, ksn, v8n, vsn = fresh_kv
        if use_pallas():
            out = _decode_attention_int8_pallas_multi_stacked_fresh(
                qg, k8, ks, v8, vs, k8n, ksn, v8n, vsn, valid, layer, kq
            )
        else:
            li = jnp.asarray(layer, jnp.int32)
            pick = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
            k8l, ksl, v8l, vsl = pick(k8), pick(ks), pick(v8), pick(vs)
            hd_scale = 1.0 / (hd**0.5)
            scores = jnp.einsum(
                "bkrd,bkcd->bkrc", qg.astype(jnp.bfloat16), k8l.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * (ksl * hd_scale)[:, :, None, :]
            scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
            s_f = jnp.einsum(
                "bkrd,bkjd->bkrj", qg.astype(jnp.float32), k8n.astype(jnp.float32),
            ) * (ksn * hd_scale)[:, :, None, :]  # (B, Hkv, G*kq, kq)
            row_i = (jnp.arange(g * kq) % kq)[None, None, :, None]
            s_f = jnp.where(row_i >= jnp.arange(kq)[None, None, None, :], s_f, NEG_INF)
            full = jnp.concatenate([scores, s_f], axis=-1)
            probs = jax.nn.softmax(full, axis=-1)
            p_c, p_f = probs[..., : scores.shape[-1]], probs[..., scores.shape[-1] :]
            # fresh pv rounds through bf16 exactly like the stored-row path
            out = jnp.einsum(
                "bkrc,bkcd->bkrd", (p_c * vsl[:, :, None, :]).astype(jnp.bfloat16),
                v8l.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "bkrj,bkjd->bkrd", (p_f * vsn[:, :, None, :]).astype(jnp.bfloat16),
                v8n.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
            )
            out = out.astype(q.dtype)
        return out.reshape(b, hkv, g, kq, hd).transpose(0, 3, 1, 2, 4).reshape(b, kq, h, hd)
    if layer is not None and use_pallas():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nl, _, _, c, _ = k8.shape
        ks5 = ks.reshape(nl, b, hkv, 1, c)
        vs5 = vs.reshape(nl, b, hkv, 1, c)
        valid3 = valid.astype(jnp.int32).reshape(b, 1, c)
        li = jnp.asarray(layer, jnp.int32).reshape(1)
        kern = functools.partial(_decode_kernel_multi_stacked, sm_scale=1.0 / (hd**0.5), kq=kq)
        at_layer = lambda i, j, wp_r, li_r: (li_r[0], i, j, 0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec((1, 1, g * kq, hd), lambda i, j, *r: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, c, hd), at_layer),
                pl.BlockSpec((1, 1, 1, 1, c), at_layer),
                pl.BlockSpec((1, 1, 1, c, hd), at_layer),
                pl.BlockSpec((1, 1, 1, 1, c), at_layer),
                pl.BlockSpec((1, 1, c), lambda i, j, *r: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, g * kq, hd), lambda i, j, *r: (i, j, 0, 0)),
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, hkv, g * kq, hd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(write_pos.astype(jnp.int32), li, qg, k8, ks5, v8, vs5, valid3)
        return out.reshape(b, hkv, g, kq, hd).transpose(0, 3, 1, 2, 4).reshape(b, kq, h, hd)
    if layer is not None:
        li = jnp.asarray(layer, jnp.int32)
        pick = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
        k8, ks, v8, vs = pick(k8), pick(ks), pick(v8), pick(vs)
    if use_pallas():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c = k8.shape[2]
        ks4 = ks.reshape(b, hkv, 1, c)
        vs4 = vs.reshape(b, hkv, 1, c)
        valid3 = valid.astype(jnp.int32).reshape(b, 1, c)
        kern = functools.partial(_decode_kernel_multi, sm_scale=1.0 / (hd**0.5), kq=kq)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec((1, 1, g * kq, hd), lambda i, j, *r: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, c, hd), lambda i, j, *r: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, c), lambda i, j, *r: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, c, hd), lambda i, j, *r: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, c), lambda i, j, *r: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, c), lambda i, j, *r: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, g * kq, hd), lambda i, j, *r: (i, j, 0, 0)),
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, hkv, g * kq, hd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(write_pos.astype(jnp.int32), qg, k8, ks4, v8, vs4, valid3)
    else:
        hd_scale = 1.0 / (hd**0.5)
        scores = jnp.einsum(
            "bkrd,bkcd->bkrc", qg.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * (ks * hd_scale)[:, :, None, :]
        c = k8.shape[2]
        pos_c = jnp.arange(c)[None, None, None, :]
        row_i = (jnp.arange(g * kq) % kq)[None, None, :, None]
        mask = valid[:, None, None, :] & (pos_c <= write_pos[:, None, None, None] + row_i)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum(
            "bkrc,bkcd->bkrd", pv, v8.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    # (B,Hkv,G,K,hd) -> (B,K,Hkv,G,hd) -> (B,K,H,hd): head index = hkv*G + g
    return out.reshape(b, hkv, g, kq, hd).transpose(0, 3, 1, 2, 4).reshape(b, kq, h, hd)


def decode_attention_int8(
    q: jnp.ndarray,  # (B, 1, H, hd) — current step query
    k8: jnp.ndarray,  # (B, Hkv, C, hd) int8; (LAYERS, B, Hkv, C, hd) w/ layer=
    ks: jnp.ndarray,  # (B, Hkv, C) f32;     (LAYERS, B, Hkv, C) w/ layer=
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    valid: jnp.ndarray,  # (B, C) bool
    n_valid=None,  # (B,) or () int32 — live length per sample; positions
    #               beyond it are skipped WITHOUT reading them from HBM
    layer=None,  # () int32 — if given, k8/ks/v8/vs are FULL layer stacks and
    #              only `layer`'s blocks are read (kernel-side indexing; lets
    #              the caller keep the stacked cache in a scan carry with
    #              in-place row updates instead of xs/ys restacking)
    fresh_kv=None,  # (k8n, ksn, v8n, vsn) with k8n/v8n (B, Hkv, 1, hd) and
    #              ksn/vsn (B, Hkv, 1): the CURRENT token's K/V, composited
    #              in-kernel. The cache args must then be PRE-update and
    #              `valid` must EXCLUDE the current position — the caller's
    #              row write stays a pure in-place update the kernel never
    #              reads (a kernel read of the updated carry makes XLA copy
    #              the full cache: +7.5 ms/step at 3B/b96/C1280). Requires
    #              layer=.
    quantize_q=None,  # True: per-row int8-quantize q in-kernel and run the
    #              score dot int8 x int8 on the MXU (no K dequant convert —
    #              the kernel's dominant VPU cost). Semantics:
    #              `_decode_attention_int8_xla(quantize_q=True)`. Default:
    #              the PADT_DECODE_QI8 env (module import time).
) -> jnp.ndarray:
    """Single-step grouped-query attention over the int8 cache -> (B, 1, H, hd)."""
    from .attention import use_pallas

    if quantize_q is None:
        quantize_q = _QI8_DEFAULT
    if quantize_q and fresh_kv is None:
        # only the fresh_kv kernels implement the int8-native score dot; a
        # silent bf16 fallback here would mix semantics across paths under
        # one flag (advisor r4, medium) — fail loudly instead
        raise NotImplementedError(
            "quantize_q (PADT_DECODE_QI8) is only implemented for the "
            "fresh_kv decode paths; this stacked/tiled/plain path would "
            "silently run bf16 score dots."
        )
    b, _, h, hd = q.shape
    hkv = k8.shape[1] if layer is None else k8.shape[2]
    qg = q.reshape(b, hkv, h // hkv, hd)  # kv head j serves q heads [jG, (j+1)G)
    valid_i = valid.astype(jnp.int32)
    if fresh_kv is not None:
        assert layer is not None
        k8n, ksn, v8n, vsn = fresh_kv
        if use_pallas():
            bb = _decode_bb(b, hkv, k8.shape[3], hd)
            if bb > 1:
                out = _decode_attention_int8_pallas_stacked_fresh_bb(
                    qg, k8, ks, v8, vs, k8n, ksn, v8n, vsn, valid_i, layer, bb,
                    quantize_q=quantize_q,
                )
            else:
                out = _decode_attention_int8_pallas_stacked_fresh(
                    qg, k8, ks, v8, vs, k8n, ksn, v8n, vsn, valid_i, layer,
                    quantize_q=quantize_q,
                )
        else:
            li = jnp.asarray(layer, jnp.int32)
            pick = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
            k8l, ksl, v8l, vsl = pick(k8), pick(ks), pick(v8), pick(vs)
            scale = 1.0 / (hd**0.5)
            if quantize_q:
                # integer-valued f32 products are exact (|sums| < 2^24):
                # matches the kernel's int8 x int8 -> int32 dot bit-for-bit
                q8g, qsg = quantize_kv(qg)
                scores = jnp.einsum(
                    "bkgd,bkcd->bkgc", q8g.astype(jnp.float32), k8l.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ) * qsg[..., None]
                s_f = jnp.einsum(
                    "bkgd,bkrd->bkgr",
                    (q8g.astype(jnp.float32) * qsg[..., None]), k8n.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            else:
                scores = jnp.einsum(
                    "bkgd,bkcd->bkgc", qg.astype(jnp.bfloat16), k8l.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                s_f = jnp.einsum(
                    "bkgd,bkrd->bkgr", qg.astype(jnp.bfloat16), k8n.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            scores = scores * (ksl * scale)[:, :, None, :]
            scores = jnp.where(valid.astype(bool)[:, None, None, :], scores, NEG_INF)
            s_f = s_f * (ksn * scale)[:, :, None, :]  # (B, Hkv, G, 1)
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_f)
            p = jnp.exp(scores - m)
            p_f = jnp.exp(s_f - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_f
            pv = (p / denom * vsl[:, :, None, :]).astype(jnp.bfloat16)
            out = jnp.einsum(
                "bkgc,bkcd->bkgd", pv, v8l.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            out = out + (p_f / denom) * (
                v8n.astype(jnp.float32) * vsn[:, :, None]
            )
        return out.reshape(b, 1, h, hd).astype(q.dtype)
    if layer is not None:
        if use_pallas():
            out = _decode_attention_int8_pallas_stacked(qg, k8, ks, v8, vs, valid_i, layer)
        else:
            li = jnp.asarray(layer, jnp.int32)
            pick = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
            out = _decode_attention_int8_xla(
                qg, pick(k8), pick(ks), pick(v8), pick(vs), valid.astype(bool)
            )
        return out.reshape(b, 1, h, hd)
    if use_pallas():
        if n_valid is not None:
            nv = jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (b,))
            out = _decode_attention_int8_pallas_tiled(qg, k8, ks, v8, vs, valid_i, nv)
        else:
            out = _decode_attention_int8_pallas(qg, k8, ks, v8, vs, valid_i)
    else:
        out = _decode_attention_int8_xla(qg, k8, ks, v8, vs, valid.astype(bool))
    return out.reshape(b, 1, h, hd)
