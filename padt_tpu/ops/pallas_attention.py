"""Pallas TPU flash attention.

One kernel covers the reference's flash-attn shapes (SURVEY.md §2.3):
  - vision windowed/full block-diagonal attention -> segment-id masking
    (replaces `flash_attn_varlen_func` + cu_window_seqlens),
  - causal LLM prefill with left padding -> causal flag + segment ids
    (padding tokens carry segment -1 and match nothing),
  - GQA via query-head -> kv-head mapping.

Design (guided by /opt/skills/guides/pallas_guide.md):
  - grid (B, H, S/blk_q); full K/V for the (batch, kv-head) resident in VMEM
    (<=2304 tokens x 128 dims x bf16 = 590 KB each), streaming softmax over
    blk_k chunks in fp32 with running (m, l, acc),
  - head_dim padded to a multiple of 128 at the call site (zero-pad is exact:
    zero q/k dims add nothing to scores, zero v dims are sliced off),
  - fully-masked rows (padding) produce zeros (l==0 guard), no NaNs,
  - O(S) memory instead of XLA's O(S^2) score materialization — this is what
    lifts the batch-16 prefill OOM.

Backward uses the standard two-pass flash VJP (recompute probs per block).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(
    lo_ref, hi_ref, q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, o_ref,
    *, blk_k: int, causal: bool, scale: float,
):
    """lo/hi (scalar-prefetch, (B, n_qb)): the k-block range whose segments can
    intersect this q block. Windowed vision layers touch ~1-2 of ~18 blocks —
    the skip is most of the kernel's win over dense XLA attention."""
    blk_q, d = q_ref.shape[2], q_ref.shape[3]
    qi = pl.program_id(2)
    bi = pl.program_id(0)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (blk_q, D)
    qseg = q_seg_ref[0, 0].reshape(blk_q, 1)  # (blk_q, 1)

    m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc0 = jnp.zeros((blk_q, d), jnp.float32)

    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)  # (blk_k, D)
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        kseg = k_seg_ref[0, 0, pl.ds(kb * blk_k, blk_k)].reshape(1, blk_k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (blk_q, blk_k)
        mask = (qseg == kseg) & (kseg >= 0)
        if causal:
            k_pos = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
            mask = mask & (q_pos >= k_pos)
        s = jnp.where(mask, s, NEG_INF)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    lo = lo_ref[bi, qi]
    hi = hi_ref[bi, qi]
    m, l, acc = jax.lax.fori_loop(lo, hi, body, (m0, l0, acc0))
    out = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_raw(
    q: jnp.ndarray,  # (B, H, S_q, Dp)
    k: jnp.ndarray,  # (B, Hkv, S_k, Dp)
    v: jnp.ndarray,
    q_seg: jnp.ndarray,  # (B, S_q) int32
    k_seg: jnp.ndarray,  # (B, S_k) int32
    causal: bool,
    scale: float,
    blk_q: Optional[int] = None,
    blk_k: Optional[int] = None,
) -> jnp.ndarray:
    def pick_block(s):
        # largest tile dividing s: fewer grid programs -> less launch overhead
        # (at 3B vision shapes, 128-blocks cost 41 ms/layer vs 18 ms at 768)
        # candidates must be multiples of 128 (lane dim of the seg blocks)
        for c in (768, 640, 512, 384, 256, 128):
            if s % c == 0:
                return c
        return min(s, 128)

    blk_q = blk_q or pick_block(q.shape[2])
    blk_k = blk_k or pick_block(k.shape[2])
    b, h, s_q, d = q.shape
    hkv = k.shape[1]
    n_rep = h // hkv
    s_k = k.shape[2]
    n_qb = s_q // blk_q
    n_kb = s_k // blk_k

    # per-block segment ranges -> contiguous k-block window per q block.
    # Valid segments are non-decreasing along the sequence (window order /
    # causal all-zeros) with -1 padding, so the intersecting set is contiguous.
    def blk_minmax(seg, blk):
        segb = seg.reshape(b, -1, blk)
        valid = segb >= 0
        big = jnp.int32(2**30)
        bmin = jnp.min(jnp.where(valid, segb, big), axis=-1)  # (B, nb)
        bmax = jnp.max(segb, axis=-1)  # (B, nb); all-invalid -> -1
        return bmin, bmax

    qmin, qmax = blk_minmax(q_seg, blk_q)
    kmin, kmax = blk_minmax(k_seg, blk_k)
    inter = (kmax[:, None, :] >= qmin[:, :, None]) & (kmin[:, :, None] <= qmax[:, None, :])
    inter = inter & (kmax[:, None, :] >= 0) & (qmax[:, :, None] >= 0)
    lo = jnp.argmax(inter, axis=-1).astype(jnp.int32)  # (B, n_qb)
    hi = (n_kb - jnp.argmax(inter[:, :, ::-1], axis=-1)).astype(jnp.int32)
    any_hit = inter.any(axis=-1)
    lo = jnp.where(any_hit, lo, 0)
    hi = jnp.where(any_hit, hi, 0)
    if causal:
        causal_hi = ((jnp.arange(n_qb, dtype=jnp.int32) + 1) * blk_q + blk_k - 1) // blk_k
        hi = jnp.minimum(hi, jnp.minimum(causal_hi, n_kb)[None, :])

    grid = (b, h, n_qb)
    kernel = functools.partial(_fwd_kernel, blk_k=blk_k, causal=causal, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q), lambda bi, hi_, qi, *refs: (bi, 0, qi)),  # q_seg
            pl.BlockSpec((1, 1, s_k), lambda bi, hi_, qi, *refs: (bi, 0, 0)),  # k_seg
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi_, qi, *refs: (bi, hi_, qi, 0)),
            pl.BlockSpec((1, 1, s_k, d), lambda bi, hi_, qi, *refs: (bi, hi_ // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, s_k, d), lambda bi, hi_, qi, *refs: (bi, hi_ // n_rep, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi_, qi, *refs: (bi, hi_, qi, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lo, hi, q_seg[:, None, :], k_seg[:, None, :], q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention(q, k, v, q_seg, k_seg, causal: bool = False, scale: Optional[float] = None):
    """q (B, S_q, H, D); k/v (B, S_k, Hkv, D); segs (B, S) int32 (-1 = pad).
    Returns (B, S_q, H, D). Fully-masked query rows return 0."""
    out, _ = _flash_fwd(q, k, v, q_seg, k_seg, causal, scale)
    return out


def _prep(q, k, v):
    """(B, S, H, D) -> (B, H, S, D). No head-dim padding: a Pallas block whose
    last dim equals the full array dim is legal, and padding 80->128 costs +60%
    memory on the vision tower's q/k/v."""
    b, s_q, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    return qt, kt, vt, d


def _flash_fwd(q, k, v, q_seg, k_seg, causal, scale):
    qt, kt, vt, d = _prep(q, k, v)
    real_scale = (1.0 / (d**0.5)) if scale is None else scale
    out = _flash_raw(qt, kt, vt, q_seg.astype(jnp.int32), k_seg.astype(jnp.int32), causal, real_scale)
    out = out.transpose(0, 2, 1, 3)[..., :d]
    return out, (q, k, v, q_seg, k_seg, out)


def _flash_bwd(causal, scale, res, g):
    """Reference-style recompute backward in plain XLA but CHUNKED over query
    blocks to bound memory (O(S*blk) scores). Simpler than a hand-written
    Pallas backward and still avoids the O(S^2) full materialization."""
    q, k, v, q_seg, k_seg, out = res
    d = q.shape[-1]
    real_scale = (1.0 / (d**0.5)) if scale is None else scale

    b, s_q, h, _ = q.shape
    hkv = k.shape[2]
    n_rep = h // hkv
    kf = jnp.repeat(k, n_rep, axis=2).astype(jnp.float32)
    vf = jnp.repeat(v, n_rep, axis=2).astype(jnp.float32)

    blk = 256 if s_q >= 256 else s_q
    nblk = _round_up(s_q, blk) // blk
    s_pad = nblk * blk
    qp = jnp.pad(q, [(0, 0), (0, s_pad - s_q), (0, 0), (0, 0)]).astype(jnp.float32)
    gp = jnp.pad(g, [(0, 0), (0, s_pad - s_q), (0, 0), (0, 0)]).astype(jnp.float32)
    qsegp = jnp.pad(q_seg, [(0, 0), (0, s_pad - s_q)], constant_values=-1)

    def chunk(qi, carry):
        dq_acc, dk_acc, dv_acc = carry
        qs = jax.lax.dynamic_slice_in_dim(qp, qi * blk, blk, axis=1)
        gs = jax.lax.dynamic_slice_in_dim(gp, qi * blk, blk, axis=1)
        qseg_s = jax.lax.dynamic_slice_in_dim(qsegp, qi * blk, blk, axis=1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qs, kf) * real_scale
        mask = (qseg_s[:, None, :, None] == k_seg[:, None, None, :]) & (
            k_seg[:, None, None, :] >= 0
        )
        if causal:
            qpos = qi * blk + jnp.arange(blk)
            mask = mask & (qpos[None, None, :, None] >= jnp.arange(k.shape[1])[None, None, None, :])
        scores = jnp.where(mask, scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        p = jnp.where(mask, p, 0.0)
        dv = jnp.einsum("bhqk,bqhd->bkhd", p, gs)
        dp = jnp.einsum("bqhd,bkhd->bhqk", gs, vf)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * real_scale
        dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
        dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qs)
        dq_acc = jax.lax.dynamic_update_slice_in_dim(dq_acc, dq, qi * blk, axis=1)
        return dq_acc, dk_acc + dk, dv_acc + dv

    dq0 = jnp.zeros((b, s_pad, h, d), jnp.float32)
    dkh0 = jnp.zeros((b, k.shape[1], h, d), jnp.float32)
    dvh0 = jnp.zeros((b, k.shape[1], h, d), jnp.float32)
    dq, dkh, dvh = jax.lax.fori_loop(0, nblk, chunk, (dq0, dkh0, dvh0))
    dq = dq[:, :s_q]
    # fold GQA head groups back
    dk = dkh.reshape(b, k.shape[1], hkv, n_rep, d).sum(3)
    dv = dvh.reshape(b, k.shape[1], hkv, n_rep, d).sum(3)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        None,
        None,
    )


flash_attention.defvjp(_flash_fwd, _flash_bwd)
