"""Loss formula unit tests (reference `padt_sft_trainer.py:252-328,509-539`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from padt_tpu.train import losses as L


pytestmark = pytest.mark.smoke

def test_box_conversions_roundtrip():
    b = jnp.asarray([[0.1, 0.2, 0.5, 0.8]])
    np.testing.assert_allclose(
        np.asarray(L.box_cxcywh_to_xyxy(L.box_xyxy_to_cxcywh(b))), np.asarray(b), atol=1e-6
    )


def test_giou_known_values():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    # identical boxes
    g, i = L.elementwise_giou(a, a)
    assert abs(float(g[0]) - 1.0) < 1e-6 and abs(float(i[0]) - 1.0) < 1e-6
    # disjoint boxes inside hull 3x1: iou 0, giou = -(hull-union)/hull = -(3-2)/3
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b2 = jnp.asarray([[2.0, 0.0, 3.0, 1.0]])
    g, i = L.elementwise_giou(b1, b2)
    assert abs(float(i[0])) < 1e-6
    assert abs(float(g[0]) + 1.0 / 3.0) < 1e-5


def test_bbox_losses_perfect():
    gt = jnp.asarray([[0.2, 0.2, 0.6, 0.8]])
    pred = L.box_xyxy_to_cxcywh(gt)
    out = L.bbox_losses(pred, gt, jnp.asarray([True]))
    assert float(out["bbox_loss"]) < 1e-3
    assert abs(float(out["iou_mean"]) - 1.0) < 1e-3


def test_bbox_losses_ignores_invalid():
    gt = jnp.asarray([[0.2, 0.2, 0.6, 0.8], [0.0, 0.0, 1.0, 1.0]])
    pred = jnp.asarray([[0.4, 0.5, 0.4, 0.6], [0.9, 0.9, 0.1, 0.1]])  # 2nd is garbage
    full = L.bbox_losses(pred, gt, jnp.asarray([True, False]))
    only = L.bbox_losses(pred[:1], gt[:1], jnp.asarray([True]))
    np.testing.assert_allclose(float(full["bbox_loss"]), float(only["bbox_loss"]), rtol=1e-4)


def test_dice_loss_reference_denominator():
    # one perfect object + one empty-mask object: empty rows contribute 0 loss
    # and are excluded from the (count>0)+1e-5 denominator
    logits = jnp.asarray(np.full((2, 4, 4), 20.0, np.float32))  # sigmoid ~ 1
    targets = jnp.ones((2, 4, 4))
    m = jnp.stack([jnp.ones((4, 4)), jnp.zeros((4, 4))])
    val = float(L.dice_loss(logits, targets, m))
    assert val < 0.1  # ~0 / ~1 object


def test_focal_loss_zero_when_correct():
    logits = jnp.asarray(np.full((1, 4, 4), 20.0, np.float32))
    targets = jnp.ones((1, 4, 4))
    m = jnp.ones((1, 4, 4))
    assert float(L.sigmoid_focal_loss(logits, targets, m)) < 1e-6


def test_score_loss():
    giou = jnp.asarray([0.5, -0.2])
    # pred sigmoid*2-1 == giou  =>  loss 0
    p = jnp.log((giou / 2 + 0.5) / (1 - (giou / 2 + 0.5)))[:, None]
    assert float(L.score_loss(p, giou, jnp.asarray([True, True]))) < 1e-6


def test_sft_token_loss_vp_mask():
    """Robust CE: masking a competing high-logit GT patch recovers low loss."""
    v, m = 8, 4
    logits = np.full((1, 2, v + m), -10.0, np.float32)
    # position 0: target = VRT slot 1 (id v+1); slot 2 is another GT patch with
    # even higher logit — without the mask the NLL is high
    logits[0, 0, v + 1] = 5.0
    logits[0, 0, v + 2] = 8.0
    logits[0, 1, 3] = 5.0  # text token target
    targets = np.asarray([[v + 1, 3]], np.int32)
    cm = np.ones((1, 2), np.float32)
    penalty = np.zeros((1, 2, m), bool)
    penalty[0, 0, 2] = True  # exclude the competing patch
    with_mask = L.sft_token_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(cm), jnp.asarray(penalty), v, True
    )
    without = L.sft_token_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(cm), jnp.asarray(penalty), v, False
    )
    assert float(with_mask[0]) < float(without[0]) - 1.0
    assert float(with_mask[0]) < 0.1
