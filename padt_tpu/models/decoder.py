"""PaDT perception decoder: VRT hidden states -> boxes / scores / masks.

Rebuilds `PaDTDecoder` (reference `src/PaDT/models/padt_decoder.py:131-275`):
  - learned `vp_embedding` added to every VRT query and 3 learned
    bbox/score/mask query tokens per object (`padt_decoder.py:139-140,201-202`),
  - `input_projection` RMSNorm+MLP from LLM hidden to decoder hidden
    (`padt_decoder.py:142-147`),
  - 1 low-res + 2 high-res two-way blocks, all with memory update
    (`padt_decoder.py:151-153`),
  - box MLP -> sigmoid (cx,cy,w,h), score linear, and the 4x4-per-patch mask
    assembly (`padt_decoder.py:158-184,238-274`).

TPU-first divergences:
  - ragged (object, VRT-run) structure is padded to static
    (N_obj, 3 + K_max) query grids and (N_obj, S/M) memory grids with boolean
    validity masks — replaces flash_attn_varlen cu_seqlens batching;
  - the mask scatter writes into a static (N, H_max, W_max, 4, 4) canvas with
    out-of-range drops — replaces the dynamic `masks_padded` allocation
    (`padt_decoder.py:269-271`).

Order quirks preserved deliberately (released checkpoints trained with them):
  - memory tokens are WINDOW-ordered while the mask scatter treats sequence
    position as raster (`padt_decoder.py:250-262` + `padt.py:101-106`);
  - low-res additive pairing: raster-ordered prototype feats paired with
    window-ordered rope PE (`padt_decoder.py:212` + `padt.py:365-367`).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.attention import masked_cross_attention
from ..ops.norms import rms_norm
from ..ops.rope import apply_rotary


def _lin(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _init_lin(key, din, dout, dtype, bias=True, scale=0.02):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32) * scale).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _init_attn(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": _init_lin(ks[0], d, d, dtype),
        "k": _init_lin(ks[1], d, d, dtype),
        "v": _init_lin(ks[2], d, d, dtype),
        "o": _init_lin(ks[3], d, d, dtype),
    }


def _init_block(key, cfg: DecoderConfig, dtype):
    d, ff = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 6)
    return {
        "norm1_w": jnp.ones((d,), dtype),
        "norm2_w": jnp.ones((d,), dtype),
        "norm3_w": jnp.ones((d,), dtype),
        "norm4_w": jnp.ones((d,), dtype),
        "norm5_w": jnp.ones((d,), dtype),
        "norm6_w": jnp.ones((d,), dtype),
        "self_attn": _init_attn(ks[0], d, dtype),
        "cross_q2i": _init_attn(ks[1], d, dtype),
        "cross_i2q": _init_attn(ks[2], d, dtype),
        "mlp_fc1": _init_lin(ks[3], d, ff, dtype),
        "mlp_fc2": _init_lin(ks[4], ff, d, dtype),
    }


def init_decoder_params(cfg: DecoderConfig, key, dtype=jnp.bfloat16):
    d = cfg.hidden_size
    ks = jax.random.split(key, 16)
    return {
        "vp_embedding": (jax.random.normal(ks[0], (d,), jnp.float32) * 0.02).astype(dtype),
        "bbox_score_mask_tokens": (jax.random.normal(ks[1], (3, d), jnp.float32) * 0.02).astype(dtype),
        "input_proj": {
            "norm_w": jnp.ones((cfg.llm_hidden_size,), dtype),
            "fc1": _init_lin(ks[2], cfg.llm_hidden_size, d, dtype),
            "fc2": _init_lin(ks[3], d, d, dtype),
        },
        "low_res": _init_block(ks[4], cfg, dtype),
        "high_res1": _init_block(ks[5], cfg, dtype),
        "high_res2": _init_block(ks[6], cfg, dtype),
        "high_res_norm_w": jnp.ones((d,), dtype),
        "bbox_fc1": _init_lin(ks[7], d, d, dtype),
        "bbox_fc2": _init_lin(ks[8], d, d, dtype),
        "bbox_fc3": _init_lin(ks[9], d, 4, dtype),
        "score": _init_lin(ks[10], d, 1, dtype),
        "mask_up1": {**_init_lin(ks[11], d, d // 4 * 4, dtype), "norm_w": jnp.ones((d // 4 * 4,), dtype)},
        "mask_up2": _init_lin(ks[12], d // 4, d // 16 * 4, dtype),
        "mask_mlp_fc1": _init_lin(ks[13], d, d, dtype),
        "mask_mlp_fc2": _init_lin(ks[14], d, d, dtype),
        "mask_mlp_fc3": _init_lin(ks[15], d, d // 16, dtype),
    }


def input_projection(params, cfg: DecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """RMSNorm -> Linear -> GELU -> Linear (padt_decoder.py:142-147)."""
    p = params["input_proj"]
    y = rms_norm(x, p["norm_w"], cfg.rms_norm_eps)
    y = jax.nn.gelu(_lin(p["fc1"], y), approximate=False)
    return _lin(p["fc2"], y)


def _attn(
    ap,
    cfg: DecoderConfig,
    query,  # (N, Lq, D)
    key,  # (N, Lk, D)
    q_valid,
    k_valid,
    q_pos,  # additive (N,Lq,D) or rotary (cos,sin) (N,Lq,hd)
    k_pos,
    is_rotary: Tuple[bool, bool],
):
    n, lq, d = query.shape
    lk = key.shape[1]
    h, hd = cfg.num_heads, cfg.head_dim
    q_in = query if is_rotary[0] else query + q_pos
    k_in = key if is_rotary[1] else key + k_pos
    q = _lin(ap["q"], q_in).reshape(n, lq, h, hd)
    k = _lin(ap["k"], k_in).reshape(n, lk, h, hd)
    v = _lin(ap["v"], key).reshape(n, lk, h, hd)
    if is_rotary[0]:
        cos, sin = q_pos
        q = apply_rotary(q, cos[:, :, None, :], sin[:, :, None, :])
    if is_rotary[1]:
        cos, sin = k_pos
        k = apply_rotary(k, cos[:, :, None, :], sin[:, :, None, :])
    out = masked_cross_attention(q, k, v, q_valid, k_valid).reshape(n, lq, d)
    return _lin(ap["o"], out)


def _block(
    bp,
    cfg: DecoderConfig,
    query,
    memory,
    q_valid,
    m_valid,
    q_pos,  # additive: the ORIGINAL query tensor (padt_decoder.py:216,224-225)
    m_pe,  # rotary (cos, sin) per memory token
):
    """Two-way block with memory update (padt_decoder.py:68-128)."""
    qn = rms_norm(query, bp["norm1_w"], cfg.rms_norm_eps)
    query = query + _attn(bp["self_attn"], cfg, qn, qn, q_valid, q_valid, q_pos, q_pos, (False, False))

    qn = rms_norm(query, bp["norm2_w"], cfg.rms_norm_eps)
    mn = rms_norm(memory, bp["norm3_w"], cfg.rms_norm_eps)
    query = query + _attn(bp["cross_q2i"], cfg, qn, mn, q_valid, m_valid, q_pos, m_pe, (False, True))

    qn = rms_norm(query, bp["norm4_w"], cfg.rms_norm_eps)
    query = query + _lin(bp["mlp_fc2"], jax.nn.gelu(_lin(bp["mlp_fc1"], qn), approximate=False))

    qn = rms_norm(query, bp["norm5_w"], cfg.rms_norm_eps)
    mn = rms_norm(memory, bp["norm6_w"], cfg.rms_norm_eps)
    memory = memory + _attn(bp["cross_i2q"], cfg, mn, qn, m_valid, q_valid, m_pe, q_pos, (True, False))
    return query, memory


class DecoderOutput(NamedTuple):
    pred_boxes: jnp.ndarray  # (N, 4) normalized (cx, cy, w, h)
    pred_score: jnp.ndarray  # (N, 1) pre-sigmoid
    pred_mask: jnp.ndarray  # (N, 4*H_max, 4*W_max) logits
    mask_hw: jnp.ndarray  # (N, 2) valid (grid_h, grid_w) per object
    obj_valid: jnp.ndarray  # (N,) bool


def decoder_forward(
    params,
    cfg: DecoderConfig,
    vrt_feats: jnp.ndarray,  # (N, K_max, D_llm) per-object VRT hidden states
    vrt_counts: jnp.ndarray,  # (N,) int32
    obj_valid: jnp.ndarray,  # (N,) bool
    obj_sample: jnp.ndarray,  # (N,) int32 sample index per object
    proto: jnp.ndarray,  # (B, M, D_llm) raster (low-res memory source, padt.py:365)
    high_res: jnp.ndarray,  # (B, S, D_dec) window order
    pe_cos: jnp.ndarray,  # (B, S, head_dim)
    pe_sin: jnp.ndarray,
    num_merged: jnp.ndarray,  # (B,)
    num_patches: jnp.ndarray,  # (B,)
    grid_thw: jnp.ndarray,  # (B, 3)
    canvas_hw: Tuple[int, int],  # static (H_max, W_max) merged... 14px-grid bucket
    compute_mask: bool = True,
) -> DecoderOutput:
    n, k_max, _ = vrt_feats.shape
    b, m, _ = proto.shape
    s = high_res.shape[1]
    d = cfg.hidden_size
    unit = cfg.spatial_merge_size**2
    dtype = high_res.dtype

    # ---- queries: [bbox, score, mask] + (proj(vrt) + vp_embedding) ----
    proj_feats = input_projection(params, cfg, vrt_feats.astype(dtype))
    queries = jnp.concatenate(
        [
            jnp.broadcast_to(params["bbox_score_mask_tokens"][None], (n, 3, d)),
            proj_feats + params["vp_embedding"],
        ],
        axis=1,
    )  # (N, 3+K, D)
    q_valid = jnp.concatenate(
        [
            jnp.broadcast_to(obj_valid[:, None], (n, 3)),
            jnp.arange(k_max)[None, :] < vrt_counts[:, None],
        ],
        axis=1,
    )
    q_pos = queries  # additive PE = initial queries (padt_decoder.py:216)

    # ---- per-object memory gathers ----
    low_mem = input_projection(params, cfg, proto.astype(dtype))[obj_sample]  # (N, M, D)
    low_valid = jnp.arange(m)[None, :] < num_merged[obj_sample][:, None]
    # low-res PE: first token of each merge group, WINDOW order (padt_decoder.py:212)
    low_cos = pe_cos.reshape(b, m, unit, -1)[:, :, 0][obj_sample]
    low_sin = pe_sin.reshape(b, m, unit, -1)[:, :, 0][obj_sample]

    out = queries
    out, low_mem = _block(
        params["low_res"], cfg, out, low_mem, q_valid, low_valid, q_pos, (low_cos, low_sin)
    )

    # ---- high-res memory: broadcast-add updated low-res into high-res ----
    hi_mem = high_res[obj_sample]  # (N, S, D)
    hi_valid = jnp.arange(s)[None, :] < num_patches[obj_sample][:, None]
    lifted = jnp.repeat(low_mem, unit, axis=1)  # (N, S, D) interleaved 4x (padt_decoder.py:220)
    hi_mem = rms_norm(lifted + hi_mem, params["high_res_norm_w"], cfg.rms_norm_eps)
    hi_cos = pe_cos[obj_sample]
    hi_sin = pe_sin[obj_sample]

    out, hi_mem = _block(
        params["high_res1"], cfg, out, hi_mem, q_valid, hi_valid, q_pos, (hi_cos, hi_sin)
    )
    out, hi_mem = _block(
        params["high_res2"], cfg, out, hi_mem, q_valid, hi_valid, q_pos, (hi_cos, hi_sin)
    )

    # ---- heads ----
    bbox_tok, score_tok, mask_tok = out[:, 0], out[:, 1], out[:, 2]
    y = jax.nn.gelu(_lin(params["bbox_fc1"], bbox_tok), approximate=False)
    y = jax.nn.gelu(_lin(params["bbox_fc2"], y), approximate=False)
    pred_boxes = jax.nn.sigmoid(_lin(params["bbox_fc3"], y).astype(jnp.float32))
    pred_score = _lin(params["score"], score_tok).astype(jnp.float32)

    hs = grid_thw[obj_sample, 1]  # (N,) 14px-grid height
    ws = grid_thw[obj_sample, 2]
    mask_hw = jnp.stack([hs, ws], axis=-1)

    if not compute_mask:
        hc, wc = canvas_hw
        empty = jnp.zeros((n, 4 * hc, 4 * wc), jnp.float32)
        return DecoderOutput(pred_boxes, pred_score, empty, mask_hw, obj_valid)

    # ---- mask assembly (padt_decoder.py:238-274) ----
    mo = jax.nn.gelu(_lin(params["mask_mlp_fc1"], mask_tok), approximate=False)
    mo = jax.nn.gelu(_lin(params["mask_mlp_fc2"], mo), approximate=False)
    mask_output = _lin(params["mask_mlp_fc3"], mo)  # (N, D/16)

    up1 = params["mask_up1"]
    me = _lin({k: up1[k] for k in ("w", "b")}, hi_mem)  # (N, S, D)
    me = rms_norm(me, up1["norm_w"], cfg.rms_norm_eps)
    me = jax.nn.gelu(me, approximate=False)
    me = me.reshape(n, s, 2, 2, d // 4)  # (N,S,a,b,D/4)
    me = jax.nn.gelu(_lin(params["mask_up2"], me), approximate=False)  # (N,S,a,b,D/16*4)
    me = me.reshape(n, s, 2, 2, 2, 2, d // 16)  # (N,S,a,b,c,d,f)
    me = me.transpose(0, 1, 2, 4, 3, 5, 6)  # (N,S,a,c,b,d,f): row=a*2+c, col=b*2+d
    me = me.reshape(n, s, 4, 4, d // 16)

    logit = jnp.einsum("nsrcf,nf->nsrc", me.astype(jnp.float32), mask_output.astype(jnp.float32))

    canvas = assemble_mask_canvas(
        logit, ws, num_patches[obj_sample], obj_valid, canvas_hw
    )
    return DecoderOutput(pred_boxes, pred_score, canvas, mask_hw, obj_valid)


def assemble_mask_canvas(
    logit: jnp.ndarray,  # (N, S, 4, 4) per-token 4x4 sub-grid logits
    ws: jnp.ndarray,  # (N,) grid width (14px patches) per object
    n_tokens: jnp.ndarray,  # (N,) valid tokens per object
    obj_valid: jnp.ndarray,  # (N,)
    canvas_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Scatter token p's 4x4 block to raster cell (p // W, p % W) on a static
    (N, 4*H_max, 4*W_max) canvas (padt_decoder.py:246-274 semantics — sequence
    position treated as raster regardless of the tokens' window ordering)."""
    n, s = logit.shape[:2]
    hc, wc = canvas_hw
    pos = jnp.arange(s)[None, :]
    w_per = jnp.maximum(ws, 1)[:, None]
    row = pos // w_per
    col = pos % w_per
    in_range = (pos < n_tokens[:, None]) & obj_valid[:, None]
    row = jnp.where(in_range, row, hc)  # out-of-range rows dropped by scatter
    n_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, s))
    canvas = jnp.zeros((n, hc, wc, 4, 4), jnp.float32)
    canvas = canvas.at[n_idx, row, col].set(logit, mode="drop")
    return canvas.transpose(0, 1, 3, 2, 4).reshape(n, hc * 4, wc * 4)
