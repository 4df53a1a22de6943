"""Training losses — box, mask, score, and robust token CE.

Formula parity with the reference trainer (`padt_sft_trainer.py:252-328,
490-539`), adapted to static padded shapes with validity masks:
  - box IoU/GIoU computed elementwise (the reference builds the pairwise
    matrix and takes the diagonal, `padt_sft_trainer.py:521-522`),
  - dice + sigmoid-focal mask losses keep the reference's exact denominators
    (including the `(count>0)+1e-5` per-element quirk, `:316,:328`),
  - robust per-token CE: VRT positions don't penalize OTHER ground-truth
    patches of the same object — those logits are masked out of the softmax
    (`padt_sft_trainer.py:443-457,473-475`),
  - score loss: MSE(sigmoid(score)*2-1, stop_grad(GIoU)) (`:531-537`).

All reductions in fp32.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# boxes (normalized coordinates)
# ---------------------------------------------------------------------------

def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def elementwise_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IoU + union of aligned box pairs, xyxy."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / (union + 1e-9), union


def elementwise_giou(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized IoU (diag of the reference's pairwise matrix)."""
    iou, union = elementwise_box_iou(a, b)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / (hull + 1e-9), iou


def bbox_losses(
    pred_cxcywh: jnp.ndarray,  # (N, 4)
    gt_xyxy: jnp.ndarray,  # (N, 4)
    valid: jnp.ndarray,  # (N,) bool
) -> Dict[str, jnp.ndarray]:
    """(1 - GIoU) + L1 on cxcywh, averaged over valid objects
    (padt_sft_trainer.py:516-529)."""
    pred = pred_cxcywh.astype(jnp.float32)
    gt = gt_xyxy.astype(jnp.float32)
    n = valid.sum().astype(jnp.float32)
    vf = valid.astype(jnp.float32)
    giou, iou = elementwise_giou(box_cxcywh_to_xyxy(pred), gt)
    giou = giou * vf
    iou = iou * vf
    giou_loss = 1.0 - giou.sum() / (n + 1e-4)
    l1 = (jnp.abs(pred - box_xyxy_to_cxcywh(gt)) * vf[:, None]).sum() / (n + 1e-4)
    return {
        "bbox_loss": giou_loss + l1,
        "giou": giou,  # (N,) per-object, zeroed on invalid (score-loss target)
        "iou_mean": iou.sum() / (n + 1e-4),
        "giou_mean": giou.sum() / (n + 1e-4),
    }


def score_loss(
    pred_score: jnp.ndarray,  # (N, 1) pre-sigmoid
    giou: jnp.ndarray,  # (N,) detached target
    valid: jnp.ndarray,
) -> jnp.ndarray:
    n = valid.sum().astype(jnp.float32)
    p = jax.nn.sigmoid(pred_score[:, 0].astype(jnp.float32)) * 2.0 - 1.0
    err = (p - jax.lax.stop_gradient(giou)) ** 2 * valid
    return err.sum() / (n + 1e-4)


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, loss_mask: jnp.ndarray) -> jnp.ndarray:
    """inputs: logits (N, H, W); targets/loss_mask same (padt_sft_trainer.py:305-316)."""
    p = jax.nn.sigmoid(inputs.astype(jnp.float32)).reshape(inputs.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(inputs.shape[0], -1)
    m = loss_mask.astype(jnp.float32).reshape(inputs.shape[0], -1)
    num = 2.0 * (p * t * m).sum(-1)
    den = (p * m).sum(-1) + (t * m).sum(-1)
    loss = 1.0 - (num + 1.0) / (den + 1.0)
    obj_count = ((m.sum(-1) > 0).astype(jnp.float32) + 1e-5).sum()
    # objects with no valid mask contribute their constant `1 - 1/1 = 0`... the
    # reference sums ALL rows; rows with empty mask give 1-(0+1)/(0+1)=0, so
    # masking is implicit. Keep the same.
    return loss.sum() / obj_count


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    loss_mask: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """(padt_sft_trainer.py:318-328)"""
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    m = loss_mask.astype(jnp.float32)
    prob = jax.nn.sigmoid(x)
    ce = jnp.clip(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))  # BCE-with-logits
    p_t = prob * t + (1 - prob) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    loss = alpha_t * loss
    per_obj = (loss * m).sum(axis=(1, 2)) / (m.sum(axis=(1, 2)) + 1e-5)
    obj_count = ((m.sum(axis=(1, 2)) > 0).astype(jnp.float32) + 1e-5).sum()
    return per_obj.sum() / obj_count


# ---------------------------------------------------------------------------
# robust token cross-entropy
# ---------------------------------------------------------------------------

def sft_token_loss(
    logits,  # (B, Lc, V + M) fp32 extended logits, OR the ((B,Lc,V), (B,Lc,M)) pair
    target_ids: jnp.ndarray,  # (B, Lc) int32 (local VRT convention)
    completion_mask: jnp.ndarray,  # (B, Lc) {0,1}
    vrt_penalty_mask: jnp.ndarray,  # (B, Lc, M) bool — True = exclude this patch slot
    vocab_size: int,
    use_vp_mask: bool = True,
) -> jnp.ndarray:
    """Per-sample mean NLL over completion tokens with the robust VP mask
    (`use_sft_vp_mask`): at a VRT target position, the object's OTHER ground
    truth patches are removed from the softmax so they aren't penalized
    (padt_sft_trainer.py:443-457,473-475,509-514). Returns (B,) loss.

    The pair form (from `forward_train(split_logits=True)`) never slices or
    concatenates the vocab axis: the softmax is assembled via logaddexp and
    the target via a masked two-way gather. Saves a (B,Lc,V+M) fp32 copy and
    keeps GSPMD cotangents clean on multi-chip meshes."""
    tgt_idx = target_ids.astype(jnp.int32)
    is_vrt = tgt_idx >= vocab_size
    if isinstance(logits, tuple):
        lt, lv = logits
        lt = lt.astype(jnp.float32)
        lv = lv.astype(jnp.float32)
    else:
        full = logits.astype(jnp.float32)
        lt, lv = full[..., :vocab_size], full[..., vocab_size:]
    if use_vp_mask:
        penalty = vrt_penalty_mask & is_vrt[:, :, None]
        # -1e30, not -inf: an all-(-inf) lv row (text-only sample, or every
        # slot penalized) would make logsumexp(lv) = -inf with a NaN gradient
        lv = jnp.where(penalty, -1e30, lv)
    logz = jnp.logaddexp(jax.nn.logsumexp(lt, axis=-1), jax.nn.logsumexp(lv, axis=-1))
    tgt_t = jnp.take_along_axis(lt, jnp.clip(tgt_idx, 0, vocab_size - 1)[:, :, None], axis=-1)
    tgt_v = jnp.take_along_axis(
        lv, jnp.clip(tgt_idx - vocab_size, 0, lv.shape[-1] - 1)[:, :, None], axis=-1
    )
    tgt = jnp.where(is_vrt, tgt_v[..., 0], tgt_t[..., 0])
    nll = (logz - tgt) * completion_mask
    return nll.sum(-1) / (completion_mask.sum(-1) + 1e-4)
