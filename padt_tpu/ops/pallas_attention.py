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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Vision-kernel block-size override for experiments. Read ONCE at import: a
# trace-time read would be silently ignored after a caller's jit cache is warm,
# which misleads block-size sweeps (set it before importing padt_tpu).
_VIS_BLK_OVERRIDE = int(os.environ.get("PADT_VIS_BLK", "0"))

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot_precision(dtype):
    """bf16 inputs under a global 'highest' matmul default break Mosaic
    lowering (it tries to emulate multi-pass precision on low-precision
    storage — the round-1 int8-kernel failure mode, resurfaced when the fp32
    upcasts were removed from these kernels). Pin DEFAULT for bf16; fp32
    inherits the global setting (the exact-parity tests rely on 'highest')."""
    return jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16 else None


def _flash_bwd_impl() -> str:
    """Backward implementation: 'pallas' (true flash backward kernels, saves
    the fwd LSE) or 'xla' (chunked recompute — the CPU-test oracle). Read at
    trace time; PADT_FLASH_BWD overrides for experiments/tests."""
    mode = os.environ.get("PADT_FLASH_BWD", "auto")
    if mode in ("pallas", "xla"):
        return mode
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _fwd_kernel(
    lo_ref, hi_ref, q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, o_ref,
    *extra_outs, blk_k: int, causal: bool, scale: float,
):
    """lo/hi (scalar-prefetch, (B, n_qb)): the k-block range whose segments can
    intersect this q block. Windowed vision layers touch ~1-2 of ~18 blocks —
    the skip is most of the kernel's win over dense XLA attention."""
    blk_q, d = q_ref.shape[2], q_ref.shape[3]
    qi = pl.program_id(2)
    bi = pl.program_id(0)

    # inputs stay in their storage dtype for the dots (bf16 in production):
    # fp32 MXU passes run at ~1/8 the bf16 rate, and fp32 accumulation via
    # preferred_element_type keeps the softmax math exact enough (standard
    # flash practice; this one cast was worth ~8x on the scores matmul)
    q = q_ref[0, 0]  # (blk_q, D)
    qseg = q_seg_ref[0, 0].reshape(blk_q, 1)  # (blk_q, 1)

    m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc0 = jnp.zeros((blk_q, d), jnp.float32)

    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]  # (blk_k, D)
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
        kseg = k_seg_ref[0, 0, pl.ds(kb * blk_k, blk_k)].reshape(1, blk_k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        ) * scale  # (blk_q, blk_k) f32
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
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v.dtype),
        )
        return m_new, l_new, acc_new

    lo = lo_ref[bi, qi]
    hi = hi_ref[bi, qi]
    m, l, acc = jax.lax.fori_loop(lo, hi, body, (m0, l0, acc0))
    out = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    if extra_outs:
        # logsumexp per row for the flash backward; fully-masked (pad) rows
        # get +big so exp(s - lse) underflows to exactly 0 downstream
        (lse_ref,) = extra_outs
        lse = jnp.where(l > 0, m + jnp.log(jnp.where(l > 0, l, 1.0)), 1e30)
        lse_ref[0] = lse.reshape(1, blk_q).astype(jnp.float32)


def _pick_block(s: int) -> int:
    # largest tile dividing s: fewer grid programs -> less launch overhead
    # (at 3B vision shapes, 128-blocks cost 41 ms/layer vs 18 ms at 768)
    # candidates must be multiples of 128 (lane dim of the seg blocks)
    for c in (768, 640, 512, 384, 256, 128):
        if s % c == 0:
            return c
    return min(s, 128)


def _kblock_ranges(q_seg, k_seg, blk_q, blk_k, causal: bool):
    """Per-q-block contiguous k-block [lo, hi) windows whose segments can
    intersect. Valid segments are non-decreasing along the sequence (window
    order / causal all-zeros) with -1 padding, so the set is contiguous."""
    b = q_seg.shape[0]
    n_qb = q_seg.shape[1] // blk_q
    n_kb = k_seg.shape[1] // blk_k

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
    return lo, hi


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
    return_lse: bool = False,
) -> jnp.ndarray:
    blk_q = blk_q or _pick_block(q.shape[2])
    blk_k = blk_k or _pick_block(k.shape[2])
    b, h, s_q, d = q.shape
    hkv = k.shape[1]
    n_rep = h // hkv
    s_k = k.shape[2]
    n_qb = s_q // blk_q
    n_kb = s_k // blk_k

    lo, hi = _kblock_ranges(q_seg, k_seg, blk_q, blk_k, causal)

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
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi_, qi, *refs: (bi, hi_, qi, 0)),
            # lse rides in a (B*H, 1, S) layout: a (1, 1, blk_q) block on a
            # (B, H, S) array is Mosaic-illegal (second-to-last block dim 1 !=
            # array dim H) — same trick as the (B, 1, S) segment inputs
        ] + ([pl.BlockSpec((1, 1, blk_q), lambda bi, hi_, qi, *refs: (bi * h + hi_, 0, qi))]
             if return_lse else []),
    )
    out_shape = [jax.ShapeDtypeStruct((b, h, s_q, d), q.dtype)]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((b * h, 1, s_q), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lo, hi, q_seg[:, None, :], k_seg[:, None, :], q, k, v)
    return tuple(res) if return_lse else res[0]


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
    if _flash_bwd_impl() == "pallas":
        out, lse = _flash_raw(
            qt, kt, vt, q_seg.astype(jnp.int32), k_seg.astype(jnp.int32),
            causal, real_scale, return_lse=True,
        )
    else:
        out = _flash_raw(qt, kt, vt, q_seg.astype(jnp.int32), k_seg.astype(jnp.int32), causal, real_scale)
        lse = None
    out = out.transpose(0, 2, 1, 3)[..., :d]
    return out, (q, k, v, q_seg, k_seg, out, lse)


def _flash_bwd(causal, scale, res, g):
    q, k, v, q_seg, k_seg, out, lse = res
    if lse is None:
        return _flash_bwd_xla(causal, scale, (q, k, v, q_seg, k_seg, out), g)
    return _flash_bwd_pallas(causal, scale, (q, k, v, q_seg, k_seg, out, lse), g)


def _flash_bwd_xla(causal, scale, res, g):
    """Reference-style recompute backward in plain XLA but CHUNKED over query
    blocks to bound memory (O(S*blk) scores). The CPU-test oracle for the
    Pallas backward kernels, and the path the vision backward reuses."""
    q, k, v, q_seg, k_seg, out = res
    d = q.shape[-1]
    real_scale = (1.0 / (d**0.5)) if scale is None else scale

    b, s_q, h, _ = q.shape
    hkv = k.shape[2]
    n_rep = h // hkv
    # matmul operands stay in the STORAGE dtype (bf16 in training, f32 in the
    # CPU tests) with fp32 accumulation — fp32 operands ran the whole backward
    # at the MXU's 1/8 fp32 rate; softmax/ds elementwise math stays fp32
    mm = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
    kf = jnp.repeat(k, n_rep, axis=2)
    vf = jnp.repeat(v, n_rep, axis=2)

    blk = 256 if s_q >= 256 else s_q
    nblk = _round_up(s_q, blk) // blk
    s_pad = nblk * blk
    qp = jnp.pad(q, [(0, 0), (0, s_pad - s_q), (0, 0), (0, 0)])
    gp = jnp.pad(g, [(0, 0), (0, s_pad - s_q), (0, 0), (0, 0)]).astype(q.dtype)
    qsegp = jnp.pad(q_seg, [(0, 0), (0, s_pad - s_q)], constant_values=-1)

    def chunk(qi, carry):
        dq_acc, dk_acc, dv_acc = carry
        qs = jax.lax.dynamic_slice_in_dim(qp, qi * blk, blk, axis=1)
        gs = jax.lax.dynamic_slice_in_dim(gp, qi * blk, blk, axis=1)
        qseg_s = jax.lax.dynamic_slice_in_dim(qsegp, qi * blk, blk, axis=1)
        scores = mm("bqhd,bkhd->bhqk", qs, kf) * real_scale
        mask = (qseg_s[:, None, :, None] == k_seg[:, None, None, :]) & (
            k_seg[:, None, None, :] >= 0
        )
        if causal:
            qpos = qi * blk + jnp.arange(blk)
            mask = mask & (qpos[None, None, :, None] >= jnp.arange(k.shape[1])[None, None, None, :])
        scores = jnp.where(mask, scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        p = jnp.where(mask, p, 0.0)
        dv = mm("bhqk,bqhd->bkhd", p.astype(q.dtype), gs)
        dp = mm("bqhd,bkhd->bhqk", gs, vf)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * real_scale
        dq = mm("bhqk,bkhd->bqhd", ds.astype(q.dtype), kf)
        dk = mm("bhqk,bqhd->bkhd", ds.astype(q.dtype), qs)
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


# ---------------------------------------------------------------------------
# True flash backward (TPU): two Pallas kernels consuming the forward's saved
# logsumexp. Versus the chunked XLA recompute (`_flash_bwd_xla`) this keeps the
# O(S^2) probs/score-grad tensors in VMEM (the recompute writes ~3 score-sized
# fp32 buffers per layer through HBM — ~90 ms/step at the 3B SFT bench shapes)
# and folds GQA head groups in-kernel instead of materializing
# `jnp.repeat`-expanded K/V and (B, S, H, D) dk/dv accumulators.
#   dq kernel:  grid (B, H, n_qb), streams k-blocks like the forward.
#   dkv kernel: grid (B, Hkv, n_kb, n_rep) — rep INNERMOST so the (bi, hkv, kb)
#     output block stays VMEM-resident across the consecutive revisits that
#     accumulate the head group's contributions (legal Pallas output pattern).
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    lo_ref, hi_ref, q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, g_ref,
    lse_ref, delta_ref, dq_ref, *, blk_k: int, causal: bool, scale: float,
):
    blk_q, d = q_ref.shape[2], q_ref.shape[3]
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # (blk_q, d) storage dtype
    g = g_ref[0, 0]
    qseg = q_seg_ref[0, 0].reshape(blk_q, 1)
    lse = lse_ref[0, 0].reshape(blk_q, 1)
    delta = delta_ref[0, 0].reshape(blk_q, 1)
    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
    prec = _dot_precision(q.dtype)

    def body(kb, acc):
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
        kseg = k_seg_ref[0, 0, pl.ds(kb * blk_k, blk_k)].reshape(1, blk_k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale
        mask = (qseg == kseg) & (kseg >= 0)
        if causal:
            k_pos = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
            mask = mask & (q_pos >= k_pos)
        # p = softmax prob exactly: lse = m + log(l); pad rows carry lse=+big
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(v.dtype),
        )
        ds_ = (p * (dp - delta) * scale).astype(q.dtype)
        return acc + jax.lax.dot_general(
            ds_, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    acc = jax.lax.fori_loop(lo_ref[bi, qi], hi_ref[bi, qi], body, acc0)
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    qlo_ref, qhi_ref, q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, g_ref,
    lse_ref, delta_ref, dk_ref, dv_ref, *, blk_q: int, causal: bool, scale: float,
):
    blk_k, d = k_ref.shape[2], k_ref.shape[3]
    bi = pl.program_id(0)
    kb = pl.program_id(2)
    rep = pl.program_id(3)
    k = k_ref[0, 0]  # (blk_k, d)
    v = v_ref[0, 0]
    kseg = k_seg_ref[0, 0].reshape(blk_k, 1)
    k_pos = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 0)
    prec = _dot_precision(k.dtype)

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(qb * blk_q, blk_q), :]
        g = g_ref[0, 0, pl.ds(qb * blk_q, blk_q), :]
        qseg = q_seg_ref[0, 0, pl.ds(qb * blk_q, blk_q)].reshape(1, blk_q)
        lse = lse_ref[0, 0, pl.ds(qb * blk_q, blk_q)].reshape(1, blk_q)
        delta = delta_ref[0, 0, pl.ds(qb * blk_q, blk_q)].reshape(1, blk_q)
        s_t = jax.lax.dot_general(  # (blk_k, blk_q) transposed scores
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale
        mask = (kseg == qseg) & (kseg >= 0)
        if causal:
            q_pos = qb * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 1)
            mask = mask & (q_pos >= k_pos)
        p_t = jnp.where(mask, jnp.exp(s_t - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t.astype(g.dtype), g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_dot_precision(g.dtype),
        )
        dp_t = jax.lax.dot_general(
            v, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(v.dtype),
        )
        ds_t = (p_t * (dp_t - delta) * scale).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )
        return dk_acc, dv_acc

    z = jnp.zeros((blk_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(
        qlo_ref[bi, kb], qhi_ref[bi, kb], body, (z, z)
    )

    @pl.when(rep == 0)
    def _init():
        dk_ref[0, 0] = dk_acc
        dv_ref[0, 0] = dv_acc

    @pl.when(rep > 0)
    def _accum():
        dk_ref[0, 0] += dk_acc
        dv_ref[0, 0] += dv_acc


def _flash_bwd_pallas(causal, scale, res, g):
    q, k, v, q_seg, k_seg, out, lse = res
    d = q.shape[-1]
    real_scale = (1.0 / (d**0.5)) if scale is None else scale
    qt, kt, vt, _ = _prep(q, k, v)
    gt = g.astype(q.dtype).transpose(0, 2, 1, 3)
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1).transpose(0, 2, 1)
    ).reshape(-1, 1, q.shape[1])  # (B*H, 1, S_q) f32 — lse's Mosaic-legal layout
    q_seg = q_seg.astype(jnp.int32)
    k_seg = k_seg.astype(jnp.int32)

    b, h, s_q, _ = qt.shape
    hkv, s_k = kt.shape[1], kt.shape[2]
    n_rep = h // hkv
    blk_q, blk_k = _pick_block(s_q), _pick_block(s_k)
    n_qb, n_kb = s_q // blk_q, s_k // blk_k

    lo, hi = _kblock_ranges(q_seg, k_seg, blk_q, blk_k, causal)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q), lambda bi, hi_, qi, *r: (bi, 0, qi)),  # q_seg
            pl.BlockSpec((1, 1, s_k), lambda bi, hi_, qi, *r: (bi, 0, 0)),  # k_seg
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi_, qi, *r: (bi, hi_, qi, 0)),  # q
            pl.BlockSpec((1, 1, s_k, d), lambda bi, hi_, qi, *r: (bi, hi_ // n_rep, 0, 0)),  # k
            pl.BlockSpec((1, 1, s_k, d), lambda bi, hi_, qi, *r: (bi, hi_ // n_rep, 0, 0)),  # v
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi_, qi, *r: (bi, hi_, qi, 0)),  # g
            pl.BlockSpec((1, 1, blk_q), lambda bi, hi_, qi, *r: (bi * h + hi_, 0, qi)),  # lse
            pl.BlockSpec((1, 1, blk_q), lambda bi, hi_, qi, *r: (bi * h + hi_, 0, qi)),  # delta
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi_, qi, *r: (bi, hi_, qi, 0)),
    )
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, blk_k=blk_k, causal=causal, scale=real_scale),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lo, hi, q_seg[:, None, :], k_seg[:, None, :], qt, kt, vt, gt, lse, delta)

    # per-k-block q-block ranges: segment intersection transposed, causal
    # adds the lower bound q_pos >= k_pos
    qlo, qhi = _kblock_ranges(k_seg, q_seg, blk_k, blk_q, causal=False)
    if causal:
        causal_lo = (jnp.arange(n_kb, dtype=jnp.int32) * blk_k) // blk_q
        qlo = jnp.maximum(qlo, causal_lo[None, :])
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, n_kb, n_rep),
        in_specs=[
            pl.BlockSpec((1, 1, s_q), lambda bi, hk, kb, rep, *r: (bi, 0, 0)),  # q_seg
            pl.BlockSpec((1, 1, blk_k), lambda bi, hk, kb, rep, *r: (bi, 0, kb)),  # k_seg
            pl.BlockSpec((1, 1, s_q, d), lambda bi, hk, kb, rep, *r: (bi, hk * n_rep + rep, 0, 0)),  # q
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hk, kb, rep, *r: (bi, hk, kb, 0)),  # k
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hk, kb, rep, *r: (bi, hk, kb, 0)),  # v
            pl.BlockSpec((1, 1, s_q, d), lambda bi, hk, kb, rep, *r: (bi, hk * n_rep + rep, 0, 0)),  # g
            pl.BlockSpec((1, 1, s_q), lambda bi, hk, kb, rep, *r: (bi * h + hk * n_rep + rep, 0, 0)),  # lse
            pl.BlockSpec((1, 1, s_q), lambda bi, hk, kb, rep, *r: (bi * h + hk * n_rep + rep, 0, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hk, kb, rep, *r: (bi, hk, kb, 0)),
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hk, kb, rep, *r: (bi, hk, kb, 0)),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, blk_q=blk_q, causal=causal, scale=real_scale),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, s_k, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, s_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
    )(qlo, qhi, q_seg[:, None, :], k_seg[:, None, :], qt, kt, vt, gt, lse, delta)

    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3).astype(k.dtype),
        dv.transpose(0, 2, 1, 3).astype(v.dtype),
        None,
        None,
    )


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Fused vision attention: rope applied IN-KERNEL on the matmul's natural
# (B, S, H*hd) layout.
#
# Profiling at bench shapes (BASELINE.md round 2) showed the vision tower's
# attention path costing ~3.05 s of a 4.95 s forward at 3B/batch-96 while the
# matmul floor is 1.9 s: the fp32 rope chain (x4 elementwise HBM passes over
# q/k per layer) and the four (B,S,H,D)<->(B,H,S,D) relayouts around the
# generic kernel dominate. This kernel removes both:
#   - q/k/v are consumed as (1, blk, hd) column slices of the packed
#     (B, S, H*hd) qkv-projection output (BlockSpec indexes the head axis in
#     the LANE dimension) — zero transposes in or out;
#   - the fp32 "half" rotation (qwen2_5vl_monkey_patch.py:29-30 parity) runs
#     on VMEM-resident tiles inside the kernel — the rope never touches HBM.
# Same segment masking / k-block skipping as `flash_attention`; vision has no
# GQA (H == Hkv) and is never causal.
# ---------------------------------------------------------------------------


def _rot_half_lanes(x, rope_dim: Optional[int] = None):
    """rotate_half over the first `rope_dim` lanes; trailing (zero-padded rope)
    lanes pass through — their sin is 0, so their rotated content never lands."""
    rd = rope_dim or x.shape[-1]
    half = rd // 2
    parts = [-x[..., half:rd], x[..., :half]]
    if rd != x.shape[-1]:
        parts.append(x[..., rd:])
    return jnp.concatenate(parts, axis=-1)


def _rope_pair_kernel(q_ref, k_ref, cos_ref, sin_ref, oq_ref, ok_ref, *, rope_dim: int, d: int):
    """Rotate one (blk, HB*d) multi-head tile of q AND k — each element touched
    once. Tiles span HB heads (128-lane groups) so each DMA row is HB*256 B
    contiguous: single-head tiles sit exactly at the 256 B DMA-efficiency
    cliff (~3x kernel slowdown measured at 3B shapes)."""
    c, s = cos_ref[0], sin_ref[0]  # (blk, d) — one head's table

    def rot_tile(x_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)
        parts = []
        for g in range(xf.shape[-1] // d):
            xg = xf[:, g * d : (g + 1) * d]
            parts.append(xg * c + _rot_half_lanes(xg, rope_dim) * s)
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        o_ref[0] = out.astype(o_ref.dtype)

    rot_tile(q_ref, oq_ref)
    rot_tile(k_ref, ok_ref)


def _rope_pair(
    qp, kp, cos, sin, h: int, rope_dim: int, k_blk_offset: int = 0,
    h_k: Optional[int] = None,
):
    """One fused fp32 rope pass over packed (B, S, H*d) q and k.

    XLA leaves the rotate_half chain unfused at these shapes (~1.3 s of HBM
    traffic per vision forward at 3B/batch-96); a first attempt that rotated K
    inside the attention kernel recomputed it once per (head, q-block) grid
    step — ~48x redundant VPU work that cost MORE than it saved. One explicit
    single-pass kernel is the fix: q/k each read+written exactly once.

    `k_blk_offset`: lane-block offset of k's heads inside `kp` — lets the
    kernel read q and k straight out of the FUSED (B, S, 3*H*d) qkv-projection
    output (pass qp=kp=qkv, k_blk_offset=h) with no XLA slice copies.

    `h_k`: k's head count when it differs from q's (GQA text stack, Hkv < H):
    grid steps beyond k's blocks redundantly re-rotate its last block
    (idempotent, tiny) so one grid covers both tensors."""
    b, s, _ = qp.shape
    d = cos.shape[-1]
    h_k = h if h_k is None else h_k
    blk = _pick_block(s)
    # heads per tile: widest power-of-two grouping both tensors allow — wide
    # tiles turn the 256 B/row strided DMA into HB*256 B contiguous rows
    hb = 1
    while hb * 2 <= 8 and h % (hb * 2) == 0 and h_k % (hb * 2) == 0 and k_blk_offset % (hb * 2) == 0:
        hb *= 2
    n_qb_h, n_kb_h, k_off = h // hb, h_k // hb, k_blk_offset // hb
    # h innermost: consecutive grid steps revisit the same cos/sin block, so
    # the pipeline loads each (blk, d) table once per (b, s-block) instead of
    # once per head group (16x overread measured as ~2x on this kernel)
    grid = (b, s // blk, n_qb_h)
    k_idx = lambda hi_: k_off + jnp.minimum(hi_, n_kb_h - 1)
    spec_q = pl.BlockSpec((1, blk, hb * d), lambda bi, si, hi_: (bi, si, hi_))
    spec_k = pl.BlockSpec((1, blk, hb * d), lambda bi, si, hi_: (bi, si, k_idx(hi_)))
    spec_cs = pl.BlockSpec((1, blk, d), lambda bi, si, hi_: (bi, si, 0))
    spec_oq = pl.BlockSpec((1, blk, hb * d), lambda bi, si, hi_: (bi, si, hi_))
    spec_ok = pl.BlockSpec((1, blk, hb * d), lambda bi, si, hi_: (bi, si, jnp.minimum(hi_, n_kb_h - 1)))
    kernel = functools.partial(_rope_pair_kernel, rope_dim=rope_dim, d=d)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_q, spec_k, spec_cs, spec_cs],
        out_specs=[spec_oq, spec_ok],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, h * d), qp.dtype),
            jax.ShapeDtypeStruct((b, s, h_k * d), kp.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qp, kp, cos, sin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rope_pair_packed(q, k, cos, sin, num_q_heads: int, num_k_heads: int):
    """Fused rope for the GQA text stack: q (B, L, H*hd) and k (B, L, Hkv*hd)
    rotated in one Pallas pass. hd must be a lane multiple (text head_dim is
    128). Differentiable: the rotation is orthogonal and the cos/sin tables
    repeat halves (mrope_cos_sin), so the VJP is the SAME kernel with sin
    negated — training's text stack uses this instead of the unfused XLA
    rotate_half chain. cos/sin cotangents are zeros (positions are integers)."""
    out, _ = _rope_pair_pk_fwd(q, k, cos, sin, num_q_heads, num_k_heads)
    return out


def _rope_pair_pk_fwd(q, k, cos, sin, h, h_k):
    out = _rope_pair(
        q, k, cos.astype(jnp.float32), sin.astype(jnp.float32),
        h, cos.shape[-1], h_k=h_k,
    )
    return out, (cos, sin)


def _rope_pair_pk_bwd(h, h_k, res, g):
    cos, sin = res
    gq, gk = g
    dq, dk = _rope_pair(
        gq, gk, cos.astype(jnp.float32), -sin.astype(jnp.float32),
        h, cos.shape[-1], h_k=h_k,
    )
    return dq, dk, jnp.zeros_like(cos), jnp.zeros_like(sin)


rope_pair_packed.defvjp(_rope_pair_pk_fwd, _rope_pair_pk_bwd)


def rope_pair_fused_qkv(qkv, cos, sin, num_q_heads: int, num_k_heads: int):
    """Rope q and k straight out of the FUSED (B, L, (H+2*Hkv)*hd) qkv
    projection output (the packed inference weight layout,
    `padt.pack_inference_params`): q occupies lane-blocks [0, H), k
    [H, H+Hkv) — both addressed via `k_blk_offset`, no XLA slice copies.
    Returns (q_rot (B,L,H*hd), k_rot (B,L,Hkv*hd)). Inference-only (no VJP;
    training keeps the unfused weight layout)."""
    return _rope_pair(
        qkv, qkv, cos.astype(jnp.float32), sin.astype(jnp.float32),
        num_q_heads, cos.shape[-1], k_blk_offset=num_q_heads, h_k=num_k_heads,
    )


# Lane width each head is padded to for the attention kernels' BlockSpec
# lane-block indexing (Mosaic lane tile = 128)
_PAD_LANE = 128


def _unpack_rope_kernel(
    qkv_ref, cos_ref, sin_ref, oq_ref, ok_ref, ov_ref,
    *, h: int, hd: int, rope_dim: int,
):
    """Unpack H heads of `hd` (<128) lanes from the UNPADDED fused qkv tile,
    apply fp32 rope to q/k, and emit q_rot/k_rot/v with each head zero-padded
    to a 128-lane tile. The 80-lane head slices are static-offset lane
    relayouts on VMEM-resident data (VPU); measured cheaper than the padded
    rope pass it replaces while the qkv projection runs at unpadded FLOPs
    (scripts/micro_vis_unpack.py: rope 3.73 -> 3.38 ms, projection
    4.31 -> 3.28 ms at 1/6 of the 3B/b96 token count)."""
    x = qkv_ref[0]  # (blk, 3*H*hd) storage dtype
    c = cos_ref[0].astype(jnp.float32)  # (blk, hd)
    s = sin_ref[0].astype(jnp.float32)
    blk = x.shape[0]
    odt = oq_ref.dtype
    pad = jnp.zeros((blk, _PAD_LANE - hd), odt)

    # rope math per head in fp32, but every concat PIECE is cast back to the
    # output dtype first — fp32 concat buffers at H=16 blew the 16 MB scoped
    # VMEM limit at 3B prefill shapes (17.56M with blk 256); v is never upcast
    def rot(v):
        vf = v.astype(jnp.float32)
        return (vf * c + _rot_half_lanes(vf, rope_dim) * s).astype(odt)

    qs, ks, vs = [], [], []
    for i in range(h):
        q_i = x[:, hd * i : hd * (i + 1)]
        k_i = x[:, (h + i) * hd : (h + i + 1) * hd]
        v_i = x[:, (2 * h + i) * hd : (2 * h + i + 1) * hd]
        qs += [rot(q_i), pad]
        ks += [rot(k_i), pad]
        vs += [v_i.astype(odt), pad]
    oq_ref[0] = jnp.concatenate(qs, axis=-1)
    ok_ref[0] = jnp.concatenate(ks, axis=-1)
    ov_ref[0] = jnp.concatenate(vs, axis=-1)


def _unpack_rope_pad(qkv, cos, sin, h: int, rope_dim: int):
    """(B, S, 3*H*hd) UNPADDED fused qkv-projection output + (B, S, hd) fp32
    tables -> (q_rot, k_rot, v) each (B, S, H*128). One HBM pass; replaces
    both the weight-level 80->128 lane padding (1.6x projection FLOPs) and
    the separate rope pass."""
    b, s, dh3 = qkv.shape
    hd = dh3 // (3 * h)
    assert hd <= _PAD_LANE and cos.shape[-1] == hd, (qkv.shape, h, cos.shape)
    # blk 256: double-buffered in+3 outs ~10 MB VMEM (768 OOMs at 24+ MB)
    blk = 256 if s % 256 == 0 else 128
    assert s % blk == 0, (s, blk)
    kernel = functools.partial(
        _unpack_rope_kernel, h=h, hd=hd, rope_dim=rope_dim
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((1, blk, dh3), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, blk, hd), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, blk, hd), lambda bi, si: (bi, si, 0)),
        ],
        out_specs=[pl.BlockSpec((1, blk, h * _PAD_LANE), lambda bi, si: (bi, si, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, s, h * _PAD_LANE), qkv.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qkv, cos.astype(jnp.float32), sin.astype(jnp.float32))
    return out


def _vis_fwd_kernel(
    lo_ref, hi_ref, q_seg_ref, k_seg_ref, q_ref, k_ref, v_ref, o_ref,
    *, blk_k: int, scale: float,
):
    blk_q, d = q_ref.shape[1], q_ref.shape[2]
    bi = pl.program_id(0)
    qi = pl.program_id(2)

    q = q_ref[0]  # (blk_q, d) — storage dtype; see _fwd_kernel dtype note
    qseg = q_seg_ref[0, 0].reshape(blk_q, 1)

    m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc0 = jnp.zeros((blk_q, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * blk_k, blk_k), :]  # (blk_k, d)
        v = v_ref[0, pl.ds(kb * blk_k, blk_k), :]
        kseg = k_seg_ref[0, 0, pl.ds(kb * blk_k, blk_k)].reshape(1, blk_k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        ) * scale
        mask = (qseg == kseg) & (kseg >= 0)
        s = jnp.where(mask, s, NEG_INF)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(v.dtype),
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(lo_ref[bi, qi], hi_ref[bi, qi], body, (m0, l0, acc0))
    out = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _vis_flash_raw(qp, kp, vp, cos, sin, seg, scale, h: int, rope_dim: int,
                   v_blk_offset: int = 0):
    """qp/kp: (B, S, H*hd) packed (or the fused qkv buffer, see _rope_pair);
    vp: (B, S, >=H*hd) with v heads starting at lane-block `v_blk_offset`;
    cos/sin: (B, S, hd) fp32; seg: (B, S)."""
    d = cos.shape[-1]
    k_off = h if v_blk_offset else 0  # fused qkv buffer: k heads follow q heads
    q_rot, k_rot = _rope_pair(qp, kp, cos, sin, h, rope_dim, k_blk_offset=k_off)
    return _vis_attn_call(q_rot, k_rot, vp, seg, scale, h, d, v_blk_offset)


def _vis_attn_call(q_rot, k_rot, vp, seg, scale, h: int, d: int,
                   v_blk_offset: int = 0):
    """Segment flash attention over PRE-ROTATED packed (B, S, H*d) q/k.
    `d` is the per-head lane width (a 128 multiple); v heads start at
    lane-block `v_blk_offset` of vp."""
    b, s, _ = q_rot.shape
    dh = h * d
    blk_env = _VIS_BLK_OVERRIDE
    blk_q = blk_k = (blk_env if blk_env and s % blk_env == 0 else _pick_block(s))
    n_qb = s // blk_q
    lo, hi = _kblock_ranges(seg, seg, blk_q, blk_k, causal=False)

    grid = (b, h, n_qb)
    kernel = functools.partial(_vis_fwd_kernel, blk_k=blk_k, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q), lambda bi, hi_, qi, *r: (bi, 0, qi)),  # q_seg
            pl.BlockSpec((1, 1, s), lambda bi, hi_, qi, *r: (bi, 0, 0)),  # k_seg
            pl.BlockSpec((1, blk_q, d), lambda bi, hi_, qi, *r: (bi, qi, hi_)),  # q
            pl.BlockSpec((1, s, d), lambda bi, hi_, qi, *r: (bi, 0, hi_)),  # k
            pl.BlockSpec((1, s, d), lambda bi, hi_, qi, *r: (bi, 0, v_blk_offset + hi_)),  # v
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda bi, hi_, qi, *r: (bi, qi, hi_)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, dh), q_rot.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lo, hi, seg[:, None, :], seg[:, None, :], q_rot, k_rot, vp)


def _vis_win_kernel(q_ref, k_ref, v_ref, kval_ref, o_ref, *, scale: float, win: int):
    """Diagonal-window attention on the 64-token-aligned SLOT layout: the
    q-block's windows attend only within themselves, so each window's score
    tile is computed exactly — no flash accumulator, no cross-block k loop.

    Windows are processed in PAIRS (128-row chunks): a 64x64 score tile uses a
    quarter of a 128x128 MXU pass, a 2-window 128x128 tile with a
    block-diagonal mask uses half — 2x the MXU utilization for the same
    result (off-diagonal probs are exactly 0 going into probs @ v)."""
    blk, d = q_ref.shape[1], q_ref.shape[2]
    pair = 2 * win  # 128-row MXU-aligned chunk
    nc = blk // pair
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kval = kval_ref[0, 0]  # (blk,) int32: 1 = valid token
    prec_q = _dot_precision(q.dtype)
    # same-window mask for a 2-window chunk: (i // win) == (j // win)
    ri = jax.lax.broadcasted_iota(jnp.int32, (pair, pair), 0) // win
    ci = jax.lax.broadcasted_iota(jnp.int32, (pair, pair), 1) // win
    diag = ri == ci
    outs = []
    for c_ in range(nc):  # static unroll (6 chunks at blk=768)
        sl = slice(c_ * pair, (c_ + 1) * pair)
        qs, ks, vs = q[sl], k[sl], v[sl]
        kv = kval[sl].reshape(1, pair) > 0
        mask = diag & kv
        s = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec_q,
        ) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(mask, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_dot_precision(vs.dtype),
        )
        outs.append(jnp.where(l > 0, o / jnp.where(l > 0, l, 1.0), 0.0))
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


def _vis_win_raw(qkv, cos, sin, seg, scale, h: int, rope_dim: int, win: int):
    """Slot-layout windowed attention over the fused (B, S, 3*H*d) qkv buffer
    (same packed-lane-block layout as `_vis_flash_raw(v_blk_offset=2h)`)."""
    d = cos.shape[-1]
    q_rot, k_rot = _rope_pair(qkv, qkv, cos, sin, h, rope_dim, k_blk_offset=h)
    return _vis_win_call(q_rot, k_rot, qkv, seg, scale, h, d, win, v_blk_offset=2 * h)


def _vis_win_call(q_rot, k_rot, vp, seg, scale, h: int, d: int, win: int,
                  v_blk_offset: int = 0):
    """Windowed-slot attention launch over PRE-ROTATED packed (B, S, H*d)
    q/k; v heads start at lane-block `v_blk_offset` of vp."""
    b, s, _ = q_rot.shape
    blk = _pick_block(s)
    assert blk % (2 * win) == 0 and s % blk == 0, (s, blk, win)
    n_qb = s // blk
    kval = (seg >= 0).astype(jnp.int32)[:, None, :]  # (B, 1, S)

    grid = (b, h, n_qb)
    kernel = functools.partial(_vis_win_kernel, scale=scale, win=win)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda bi, hi_, qi: (bi, qi, hi_)),  # q
            pl.BlockSpec((1, blk, d), lambda bi, hi_, qi: (bi, qi, hi_)),  # k
            pl.BlockSpec((1, blk, d), lambda bi, hi_, qi: (bi, qi, v_blk_offset + hi_)),  # v
            pl.BlockSpec((1, 1, blk), lambda bi, hi_, qi: (bi, 0, qi)),  # kval
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda bi, hi_, qi: (bi, qi, hi_)),
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), q_rot.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(q_rot, k_rot, vp, kval)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def vision_window_attention_qkv(
    qkv, cos, sin, seg, h: int, win: int = 64,
    scale: Optional[float] = None, rope_dim: Optional[int] = None,
):
    """Windowed vision attention for the SLOT token layout (vision_geom.py
    `window_slots`): fused qkv input, in-pass fp32 rope, per-window exact
    (win, win) attention. Backward reuses the segment-flash recompute path
    (slot seg ids express the same mask)."""
    out, _ = _vis_win_fwd(qkv, cos, sin, seg, h, win, scale, rope_dim)
    return out


def _vis_win_fwd(qkv, cos, sin, seg, h, win, scale, rope_dim):
    d = cos.shape[-1]
    assert qkv.shape[-1] == 3 * h * d, (qkv.shape, h, d)
    rd = rope_dim or d
    real_scale = (1.0 / (rd**0.5)) if scale is None else scale
    if d % _PAD_LANE != 0:
        # UNPADDED fused qkv (hd=80 heads): unpack+rope+pad in one kernel,
        # attention on 128-lane head tiles; output is (B, S, H*128) with
        # zero pad lanes per head (callers keep proj weights row-padded)
        q_rot, k_rot, v_pad = _unpack_rope_pad(qkv, cos, sin, h, rd)
        out = _vis_win_call(
            q_rot, k_rot, v_pad, seg.astype(jnp.int32), real_scale, h,
            _PAD_LANE, win,
        )
    else:
        out = _vis_win_raw(
            qkv, cos.astype(jnp.float32), sin.astype(jnp.float32), seg.astype(jnp.int32),
            real_scale, h, rd, win,
        )
    return out, (qkv, cos, sin, seg)


def _vis_win_bwd(h, win, scale, rope_dim, res, g):
    dqkv, dcos, dsin, _ = _vis_qkv_bwd(h, scale, rope_dim, res, g)
    return dqkv, dcos, dsin, None


vision_window_attention_qkv.defvjp(_vis_win_fwd, _vis_win_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def vision_flash_attention(
    q, k, v, cos, sin, seg,
    scale: Optional[float] = None, rope_dim: Optional[int] = None,
):
    """Segment attention with the rotary rotation fused into the kernel.

    q/k/v: (B, S, H, hd) PRE-rope (straight off the qkv projection);
    cos/sin: (B, S, hd) fp32; seg: (B, S) int32 (-1 = pad).
    Returns (B, S, H, hd). H == Hkv (the vision tower has no GQA).

    `rope_dim`: real rotary width when hd carries zero-padded lanes (the
    vision tower's hd=80 heads are padded to 128 at the WEIGHT level so the
    qkv projection emits Mosaic-legal 128-lane tiles for free — zero q/k pad
    lanes add nothing to scores, zero v pad lanes stay zero in the output,
    and zero-padded cos/sin keep the rotation inert on pad lanes).
    `scale` defaults to rope_dim**-0.5 (the REAL head dim)."""
    out, _ = _vis_fwd(q, k, v, cos, sin, seg, scale, rope_dim)
    return out


def _vis_fwd(q, k, v, cos, sin, seg, scale, rope_dim):
    b, s, h, d = q.shape
    rd = rope_dim or d
    real_scale = (1.0 / (rd**0.5)) if scale is None else scale
    out = _vis_flash_raw(
        q.reshape(b, s, h * d),
        k.reshape(b, s, h * d),
        v.reshape(b, s, h * d),
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
        seg.astype(jnp.int32),
        real_scale,
        h,
        rd,
    ).reshape(b, s, h, d)
    return out, (q, k, v, cos, sin, seg)


def _vis_bwd(scale, rope_dim, res, g):
    """Recompute-based backward: rotate q/k in XLA, reuse the chunked segment
    backward, then pull the grads back through the rotation (R is orthogonal:
    dx = dy*cos - rotate_half(dy)*sin)."""
    q, k, v, cos, sin, seg = res
    d = q.shape[-1]
    rd = rope_dim or d
    real_scale = (1.0 / (rd**0.5)) if scale is None else scale
    cq = cos.astype(jnp.float32)[:, :, None, :]
    sq = sin.astype(jnp.float32)[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        return (xf * cq + _rot_half_lanes(xf, rd) * sq).astype(x.dtype)

    def unrot(dy):
        dyf = dy.astype(jnp.float32)
        return (dyf * cq - _rot_half_lanes(dyf, rd) * sq).astype(dy.dtype)

    dq_r, dk_r, dv, _, _ = _flash_bwd_xla(
        False, real_scale, (rot(q), rot(k), v, seg, seg, None), g
    )
    return unrot(dq_r), unrot(dk_r), dv, jnp.zeros_like(cos), jnp.zeros_like(sin), None


vision_flash_attention.defvjp(_vis_fwd, _vis_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def vision_flash_attention_qkv(
    qkv, cos, sin, seg, h: int,
    scale: Optional[float] = None, rope_dim: Optional[int] = None,
):
    """`vision_flash_attention` reading q/k/v straight from the FUSED
    (B, S, 3*H*hd) qkv-projection output via lane-block offsets — the three
    (B, S, H*hd) slice copies XLA would otherwise materialize per layer
    (~0.4 s/forward at 3B/batch-96) never exist. Returns (B, S, H*hd)."""
    out, _ = _vis_qkv_fwd(qkv, cos, sin, seg, h, scale, rope_dim)
    return out


def _vis_qkv_fwd(qkv, cos, sin, seg, h, scale, rope_dim):
    d = cos.shape[-1]
    assert qkv.shape[-1] == 3 * h * d, (qkv.shape, h, d)
    rd = rope_dim or d
    real_scale = (1.0 / (rd**0.5)) if scale is None else scale
    if d % _PAD_LANE != 0:
        # UNPADDED fused qkv (hd=80 heads): see _vis_win_fwd
        q_rot, k_rot, v_pad = _unpack_rope_pad(qkv, cos, sin, h, rd)
        out = _vis_attn_call(
            q_rot, k_rot, v_pad, seg.astype(jnp.int32), real_scale, h, _PAD_LANE
        )
    else:
        out = _vis_flash_raw(
            qkv, qkv, qkv,
            cos.astype(jnp.float32), sin.astype(jnp.float32), seg.astype(jnp.int32),
            real_scale, h, rd, v_blk_offset=2 * h,
        )
    return out, (qkv, cos, sin, seg)


def _vis_qkv_bwd(h, scale, rope_dim, res, g):
    qkv, cos, sin, seg = res
    b, s, _ = qkv.shape
    d = cos.shape[-1]
    if g.shape[-1] != h * d:
        # unpadded-input path: the forward output carries 128-lane padded
        # heads; the pad lanes are zeros fed into zero proj rows, so their
        # cotangents are simply dropped
        g = g.reshape(b, s, h, -1)[..., :d]
    else:
        g = g.reshape(b, s, h, d)
    q, k, v = (x.reshape(b, s, h, d) for x in jnp.split(qkv, 3, axis=-1))
    dq, dk, dv, dcos, dsin, _ = _vis_bwd(
        scale, rope_dim, (q, k, v, cos, sin, seg), g
    )
    dqkv = jnp.concatenate(
        [x.reshape(b, s, h * d) for x in (dq, dk, dv)], axis=-1
    )
    return dqkv, dcos, dsin, None


vision_flash_attention_qkv.defvjp(_vis_qkv_fwd, _vis_qkv_bwd)
