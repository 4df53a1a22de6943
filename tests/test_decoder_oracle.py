"""Perception-decoder numerics oracle.

An independent CPU-torch implementation of the reference decoder
(`/root/reference/src/PaDT/models/padt_decoder.py:131-275`), with plain SDPA
standing in for `flash_attn_varlen_func` (mathematically identical on a single
segment), is run on the SAME random weights and ragged inputs as the JAX
decoder (`padt_tpu/models/decoder.py`). Box / score / mask logits must match.

The oracle follows the reference's exact op order — per-object ragged loops,
`chunk(2)[0]` rotary recipe, the (2,2,N,..) permute chain of the mask
upscaler, the (N,4,4,H,W) scatter — so any wiring divergence in the padded
static JAX rewrite (PE pairing, memory-update order, upscale permute,
raster/window mixing) fails this test.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import torch

from padt_tpu.config import DecoderConfig
from padt_tpu.models.decoder import decoder_forward, init_decoder_params
from padt_tpu.models.vision_geom import vision_geometry
from padt_tpu.ops.rope import vision_rope_cos_sin

pytestmark = pytest.mark.smoke

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch oracle (reference semantics, per-object ragged loops)
# ---------------------------------------------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def t_lin(p, x):
    y = x @ _t(p["w"])
    if "b" in p:
        y = y + _t(p["b"])
    return y


def t_rms(x, w, eps=1e-6):
    v = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return _t(w) * v


def t_gelu(x):
    return torch.nn.functional.gelu(x, approximate="none")


def t_rotary(x, cos_full, sin_full):
    """Reference recipe (padt_decoder.py:38-51): full-head-dim cos/sin ->
    chunk(2)[0], then flash-attn apply_rotary_emb (non-interleaved)."""
    hd = x.shape[-1]
    c = cos_full[..., : hd // 2].unsqueeze(-2)  # (L, 1, hd/2) over heads
    s = sin_full[..., : hd // 2].unsqueeze(-2)
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    return torch.cat([x1 * c - x2 * s, x1 * s + x2 * c], dim=-1)


def t_attn(ap, h, query, key, q_pos, k_pos, is_rotary):
    """Single-segment SDPA == flash_attn_varlen on one (q_seg, k_seg) pair."""
    lq, d = query.shape
    lk = key.shape[0]
    hd = d // h
    q_in = query if is_rotary[0] else query + q_pos
    k_in = key if is_rotary[1] else key + k_pos
    q = t_lin(ap["q"], q_in).reshape(lq, h, hd)
    k = t_lin(ap["k"], k_in).reshape(lk, h, hd)
    v = t_lin(ap["v"], key).reshape(lk, h, hd)
    if is_rotary[0]:
        q = t_rotary(q, *q_pos)
    if is_rotary[1]:
        k = t_rotary(k, *k_pos)
    scores = torch.einsum("qhd,khd->hqk", q, k) / hd**0.5
    out = torch.einsum("hqk,khd->qhd", scores.softmax(-1), v).reshape(lq, d)
    return t_lin(ap["o"], out)


def t_block(bp, h, query, memory, q_pos, m_pe):
    qn = t_rms(query, bp["norm1_w"])
    query = query + t_attn(bp["self_attn"], h, qn, qn, q_pos, q_pos, (False, False))
    qn = t_rms(query, bp["norm2_w"])
    mn = t_rms(memory, bp["norm3_w"])
    query = query + t_attn(bp["cross_q2i"], h, qn, mn, q_pos, m_pe, (False, True))
    qn = t_rms(query, bp["norm4_w"])
    query = query + t_lin(bp["mlp_fc2"], t_gelu(t_lin(bp["mlp_fc1"], qn)))
    qn = t_rms(query, bp["norm5_w"])
    mn = t_rms(memory, bp["norm6_w"])
    memory = memory + t_attn(bp["cross_i2q"], h, mn, qn, m_pe, q_pos, (True, False))
    return query, memory


def t_input_proj(P, x):
    p = P["input_proj"]
    return t_lin(p["fc2"], t_gelu(t_lin(p["fc1"], t_rms(x, p["norm_w"]))))


def oracle_decoder(P, cfg, vp_feats, low_feats, high_feats, pes, grids, hw_max):
    """vp_feats: list of (k_i, D_llm); low_feats: (m_i, D_llm); high_feats:
    (s_i, D); pes: (cos_i, sin_i) each (s_i, hd); grids: (t,h,w) per object."""
    h, unit = cfg.num_heads, cfg.spatial_merge_size**2
    boxes, scores, logits = [], [], []
    for vp, low, hi, (cos, sin), thw in zip(vp_feats, low_feats, high_feats, pes, grids):
        q = torch.cat([_t(P["bbox_score_mask_tokens"]), t_input_proj(P, _t(vp)) + _t(P["vp_embedding"])])
        q_pos = q.clone()  # additive PE = the initial query (padt_decoder.py:216)
        low_mem = t_input_proj(P, _t(low))
        low_pe = (cos.reshape(-1, unit, cos.shape[-1])[:, 0], sin.reshape(-1, unit, sin.shape[-1])[:, 0])
        out, low_mem = t_block(P["low_res"], h, q, low_mem, q_pos, low_pe)
        hi_mem = t_rms(
            low_mem.unsqueeze(1).repeat_interleave(unit, dim=1).flatten(0, 1) + _t(hi),
            P["high_res_norm_w"],
        )
        out, hi_mem = t_block(P["high_res1"], h, out, hi_mem, q_pos, (cos, sin))
        out, hi_mem = t_block(P["high_res2"], h, out, hi_mem, q_pos, (cos, sin))

        y = t_gelu(t_lin(P["bbox_fc1"], out[0]))
        y = t_gelu(t_lin(P["bbox_fc2"], y))
        boxes.append(torch.sigmoid(t_lin(P["bbox_fc3"], y)))
        scores.append(t_lin(P["score"], out[1]))

        mo = t_gelu(t_lin(P["mask_mlp_fc1"], out[2]))
        mo = t_gelu(t_lin(P["mask_mlp_fc2"], mo))
        mo = t_lin(P["mask_mlp_fc3"], mo)  # (D/16,)

        n_tok, d = hi_mem.shape
        up1 = P["mask_up1"]
        me = t_gelu(t_rms(t_lin({k: up1[k] for k in ("w", "b")}, hi_mem), up1["norm_w"]))
        # exact reference permute chain (padt_decoder.py:241-244)
        me = me.reshape(n_tok, 2, 2, d // 4).permute(1, 2, 0, 3)  # (a,b,N,D/4)
        me = t_lin(P["mask_up2"], me).reshape(2, 2, n_tok, 2, 2, d // 16)
        me = t_gelu(me).permute(0, 3, 1, 4, 2, 5).flatten(0, 1).flatten(1, 2)  # (4,4,N,f)
        me = me.permute(2, 0, 1, 3).contiguous()  # (N,4,4,f)
        logit = (me * mo[None, None, None, :]).sum(-1)  # (n_tok, 4, 4)

        hmax, wmax = hw_max
        w_grid = thw[2]
        idx = torch.arange(n_tok)
        canvas = torch.zeros((4, 4, hmax, wmax))
        canvas[:, :, idx // w_grid, idx % w_grid] = logit.permute(1, 2, 0)
        logits.append(canvas.permute(2, 0, 3, 1).reshape(hmax * 4, wmax * 4))
    return torch.stack(boxes), torch.stack(scores), torch.stack(logits)


# ---------------------------------------------------------------------------
# shared inputs: 2 samples, 3 real objects (multi-VRT, ragged) + 1 pad slot
# ---------------------------------------------------------------------------

def _make_params(cfg):
    params = jax.tree.map(
        np.asarray, init_decoder_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    )
    # Amplify q/k projections so attention softmax is non-uniform: with the
    # tiny 0.02-scale init, logits are near zero and the comparison is blind
    # to PE mispairing (measured: rolled PE moved scores only ~1e-6; with 8x
    # amplification it moves them ~4e-3, 200x the assert tolerance).
    for blk in ("low_res", "high_res1", "high_res2"):
        for att in ("self_attn", "cross_q2i", "cross_i2q"):
            for m in ("q", "k"):
                params[blk][att][m]["w"] = params[blk][att][m]["w"] * 8
    return params


def _run_both(cfg, params, pe_roll=0):
    """Run jax decoder (PE optionally corrupted by a 1-token roll) and the
    torch oracle (always clean PE) on shared ragged inputs."""

    grids = [(1, 4, 6), (1, 2, 4)]
    s_bucket, m_bucket = 32, 8
    geom = vision_geometry(grids, s_bucket)
    n_patch = [t * h * w for t, h, w in grids]  # [24, 8]
    n_merged = [p // 4 for p in n_patch]

    rng = np.random.RandomState(7)
    # padded regions get large garbage: masking bugs must surface
    proto = rng.randn(2, m_bucket, cfg.llm_hidden_size).astype(np.float32) * 1.0
    proto[0, n_merged[0] :] = 50.0
    proto[1, n_merged[1] :] = 50.0
    high = rng.randn(2, s_bucket, cfg.hidden_size).astype(np.float32)
    high[0, n_patch[0] :] = 50.0
    high[1, n_patch[1] :] = 50.0
    cos, sin = vision_rope_cos_sin(jnp.asarray(geom.hpos), jnp.asarray(geom.wpos), cfg.head_dim)
    cos, sin = np.asarray(cos), np.asarray(sin)

    n_obj, k_max = 4, 4
    counts = np.array([2, 1, 3, 0], np.int32)
    samples = np.array([0, 1, 0, 0], np.int32)
    valid = counts > 0
    vrt = rng.randn(n_obj, k_max, cfg.llm_hidden_size).astype(np.float32)

    cos_j = np.roll(cos, pe_roll, axis=1) if pe_roll else cos
    sin_j = np.roll(sin, pe_roll, axis=1) if pe_roll else sin
    out = decoder_forward(
        jax.tree.map(jnp.asarray, params),
        cfg,
        jnp.asarray(vrt),
        jnp.asarray(counts),
        jnp.asarray(valid),
        jnp.asarray(samples),
        jnp.asarray(proto),
        jnp.asarray(high),
        jnp.asarray(cos_j),
        jnp.asarray(sin_j),
        jnp.asarray(np.array(n_merged)),
        jnp.asarray(np.array(n_patch)),
        jnp.asarray(np.array(grids)),
        canvas_hw=(4, 6),
    )

    o_boxes, o_scores, o_logits = oracle_decoder(
        params,
        cfg,
        [vrt[i, : counts[i]] for i in range(3)],
        [proto[samples[i], : n_merged[samples[i]]] for i in range(3)],
        [high[samples[i], : n_patch[samples[i]]] for i in range(3)],
        [
            (torch.from_numpy(cos[samples[i], : n_patch[samples[i]]].copy()),
             torch.from_numpy(sin[samples[i], : n_patch[samples[i]]].copy()))
            for i in range(3)
        ],
        [grids[samples[i]] for i in range(3)],
        hw_max=(4, 6),
    )
    return out, (o_boxes, o_scores, o_logits)


def test_decoder_matches_torch_oracle():
    cfg = DecoderConfig(hidden_size=64, intermediate_size=128, num_heads=4, llm_hidden_size=96)
    out, (o_boxes, o_scores, o_logits) = _run_both(cfg, _make_params(cfg))
    np.testing.assert_allclose(np.asarray(out.pred_boxes[:3]), o_boxes.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.pred_score[:3]), o_scores.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.pred_mask[:3]), o_logits.numpy(), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out.mask_hw[:3]), [[4, 6], [2, 4], [4, 6]])


def test_oracle_is_sensitive_to_pe_mispairing():
    """Guard against a vacuous oracle: corrupting the PE pairing on the jax
    side (1-token roll — what a window/raster ordering bug would look like)
    must break score parity by orders of magnitude over the tolerance."""
    cfg = DecoderConfig(hidden_size=64, intermediate_size=128, num_heads=4, llm_hidden_size=96)
    out, (_, o_scores, _) = _run_both(cfg, _make_params(cfg), pe_roll=1)
    diff = np.abs(np.asarray(out.pred_score[:3]) - o_scores.numpy()).max()
    assert diff > 1e-4, f"oracle blind to PE mispairing (score diff {diff})"
