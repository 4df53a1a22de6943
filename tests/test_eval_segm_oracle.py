"""Differential hardening of the SEGM scoring stack against the independent
oracle in tests/cocoeval_reference.py (own RLE string parser, dense
column-major decode, dense-mask IoU, straight-line segm COCOeval).

What bbox mAP got in round 3, segm/RES get here — the reference's RES numbers
hinge on exact RLE IoU semantics
(`/root/reference/eval/evaluation_scripts/eval_refcoco.py:121-134`):
  - production encode -> ORACLE decode == source mask (codec differential:
    the oracle shares no code with padt_tpu.eval.rle or native/maskops.cc),
  - production mask_iou (native run-walk AND numpy decode path) vs dense
    oracle, including iscrowd,
  - COCOEvaluator('segm') 12 stats vs the oracle transcription on fuzzed
    scenes (crowds, ties, empty masks, area ranges),
  - score_refcoco cIoU / mask_ap50 vs an independent dense accumulation.
"""

import numpy as np
import pytest

from cocoeval_reference import (
    cocoeval_segm,
    mask_area_oracle,
    mask_iou_dense_oracle,
    rle_string_to_counts_oracle,
    rle_to_dense_oracle,
)
from padt_tpu.eval import rle as rle_codec
from padt_tpu.eval.coco_map import COCOEvaluator
from padt_tpu.eval.refcoco_eval import score_refcoco

pytestmark = pytest.mark.smoke


def _random_mask(rng, h, w):
    """Mixed generator: blobs, rectangles, empty, full, single pixel, stripes
    (stripes produce long run chains; single pixels produce 1-runs)."""
    kind = rng.randint(6)
    m = np.zeros((h, w), np.uint8)
    if kind == 0:  # blobby threshold field
        base = rng.rand(h // 3 + 1, w // 3 + 1)
        up = np.kron(base, np.ones((3, 3)))[:h, :w]
        m = (up > 0.7).astype(np.uint8)
    elif kind == 1:  # union of rectangles
        for _ in range(rng.randint(1, 4)):
            y, x = rng.randint(0, h), rng.randint(0, w)
            hh, ww = rng.randint(1, h), rng.randint(1, w)
            m[y : y + hh, x : x + ww] = 1
    elif kind == 2:
        pass  # empty
    elif kind == 3:
        m[:] = 1  # full
    elif kind == 4:
        m[rng.randint(h), rng.randint(w)] = 1  # single pixel
    else:  # row stripes (many runs per column)
        m[:: rng.randint(2, 4)] = 1
    return m


def test_production_encode_vs_oracle_decode():
    """Codec differential: production encode (python + native) -> independent
    oracle string parser + dense fill must reproduce the source mask."""
    rng = np.random.RandomState(11)
    for case in range(40):
        h, w = rng.randint(1, 70), rng.randint(1, 70)
        m = _random_mask(rng, h, w)
        enc = rle_codec.encode(m)
        # oracle parser vs production parser on the same string
        assert rle_string_to_counts_oracle(enc["counts"]) == rle_codec.string_to_counts(
            enc["counts"]
        )
        np.testing.assert_array_equal(rle_to_dense_oracle(enc), m.astype(bool))
        assert mask_area_oracle(enc) == float(m.sum())
        assert rle_codec.area(enc) == int(m.sum())


def test_mask_iou_vs_dense_oracle():
    """Production mask_iou — the native compressed-domain run-walk when built,
    and the numpy decode fallback — vs the oracle's dense IoU, incl. crowd."""
    rng = np.random.RandomState(23)
    for case in range(30):
        h, w = rng.randint(1, 60), rng.randint(1, 60)
        a = _random_mask(rng, h, w)
        b = _random_mask(rng, h, w)
        ra, rb = rle_codec.encode(a), rle_codec.encode(b)
        for crowd in (False, True):
            want = mask_iou_dense_oracle(ra, rb, crowd)
            got = rle_codec.mask_iou(ra, rb, iscrowd=crowd)
            assert abs(got - want) < 1e-9, (case, crowd, got, want)
            # numpy fallback path (list counts bypass the native fast path)
            ra_list = {"size": ra["size"], "counts": rle_codec.string_to_counts(ra["counts"])}
            got_np = rle_codec.mask_iou(ra_list, rb, iscrowd=crowd)
            assert abs(got_np - want) < 1e-9, (case, crowd, got_np, want)


def _scene(rng, n_img, n_cat, h, w):
    gts, dts = [], []
    score_grid = [0.25, 0.5, 0.75]  # ties on purpose
    for img in range(1, n_img + 1):
        for cat in range(1, n_cat + 1):
            for _ in range(rng.randint(0, 3)):
                m = _random_mask(rng, h, w)
                gts.append(
                    {
                        "image_id": img,
                        "category_id": cat,
                        "segmentation": rle_codec.encode(m),
                        "area": float(m.sum()),
                        "iscrowd": int(rng.rand() < 0.2),
                        "bbox": list(rle_codec.to_bbox(rle_codec.encode(m))),
                    }
                )
            for _ in range(rng.randint(0, 4)):
                m = _random_mask(rng, h, w)
                dts.append(
                    {
                        "image_id": img,
                        "category_id": cat,
                        "segmentation": rle_codec.encode(m),
                        "score": float(rng.choice(score_grid)),
                    }
                )
    # clone half the gts into detections so TPs exist; perturb every other
    # clone (random pixel flips) so IoUs land INSIDE the 0.5:0.95 threshold
    # band, not just at 1.0
    for j, g in enumerate(gts[::2]):
        seg = dict(g["segmentation"])
        if j % 2 == 1:
            m = rle_codec.decode(seg)
            flips = rng.randint(1, max(2, m.size // 12), size=2)
            ys = rng.randint(0, m.shape[0], flips[0])
            xs = rng.randint(0, m.shape[1], flips[0])
            m[ys, xs] ^= 1
            seg = rle_codec.encode(m)
        dts.append(
            {
                "image_id": g["image_id"],
                "category_id": g["category_id"],
                "segmentation": seg,
                "score": float(rng.choice(score_grid)),
            }
        )
    return gts, dts


def test_segm_map_fuzz_vs_oracle():
    """COCOEvaluator('segm') vs the straight-line segm transcription: all 12
    stats must match exactly on fuzzed scenes (crowd masks, tied scores,
    empty masks, mask-area range assignment)."""
    rng = np.random.RandomState(37)
    ran = 0
    for case in range(12):
        # small canvases keep area ranges interesting (some masks > 32^2)
        h, w = rng.randint(20, 80), rng.randint(20, 80)
        gts, dts = _scene(rng, rng.randint(1, 3), rng.randint(1, 3), h, w)
        if not gts and not dts:
            continue
        ours = COCOEvaluator("segm").evaluate(gts, dts)
        ref = cocoeval_segm(gts, dts)
        for k in ref:
            assert abs(ours[k] - ref[k]) < 1e-9, (case, k, ours[k], ref[k])
        ran += 1
    assert ran >= 8


def test_ciou_vs_independent_accumulation():
    """score_refcoco's cIoU and mask_ap50 vs a from-scratch accumulation using
    the ORACLE dense decode (exercises best-box selection + cumulative I/U
    semantics of eval_refcoco.py:121-134)."""
    rng = np.random.RandomState(51)
    h, w = 48, 64
    gts, preds = [], []
    inter_sum = union_sum = 0.0
    mask_hits = mask_total = 0
    for i in range(12):
        gm = _random_mask(rng, h, w)
        g_rle = rle_codec.encode(gm)
        label = f"obj {i}"
        gx = rle_codec.to_bbox(g_rle)
        gts.append({"image_id": i, "label": label, "bbox": gx, "rle": g_rle})
        # 0-2 predictions; best-IoU BOX decides which mask is scored
        cands = []
        for _ in range(rng.randint(0, 3)):
            pm = _random_mask(rng, h, w)
            p_rle = rle_codec.encode(pm)
            bbox = rle_codec.to_bbox(p_rle)
            cands.append(
                {
                    "image_id": i,
                    "category": label,
                    "bbox": bbox,
                    "score": float(rng.rand()),
                    "mask": p_rle,
                }
            )
        preds.extend(cands)
        # independent expectation: pick max-box-IoU candidate (ties -> later
        # one, matching the scorer's >= update rule)
        def _biou(a, b):
            ax2, ay2 = a[0] + a[2], a[1] + a[3]
            bx2, by2 = b[0] + b[2], b[1] + b[3]
            ix = max(0.0, min(ax2, bx2) - max(a[0], b[0]))
            iy = max(0.0, min(ay2, by2) - max(a[1], b[1]))
            inter = ix * iy
            un = a[2] * a[3] + b[2] * b[3] - inter
            return inter / un if un > 0 else 0.0

        best, best_iou = None, 0.0
        for c in cands:
            v = _biou(c["bbox"], gx)
            if v >= best_iou:
                best_iou, best = v, c
        mask_total += 1
        gdense = rle_to_dense_oracle(g_rle)
        if best is not None:
            pdense = rle_to_dense_oracle(best["mask"])
            inter = float(np.logical_and(pdense, gdense).sum())
            union = float(np.logical_or(pdense, gdense).sum())
            if union > 0 and inter / union >= 0.5:
                mask_hits += 1
        else:
            inter, union = 0.0, float(gdense.sum())
        inter_sum += inter
        union_sum += union

    s = score_refcoco(gts, preds)
    want_ciou = inter_sum / union_sum if union_sum > 0 else 0.0
    assert abs(s["ciou"] - want_ciou) < 1e-9, (s["ciou"], want_ciou)
    assert abs(s["mask_ap50"] - (mask_hits / mask_total)) < 1e-9
