"""Evaluator tests: COCO mAP known cases, RefCOCO scorer, harness e2e (tiny)."""

import os
import numpy as np
import pytest

from padt_tpu.eval import rle as rle_codec
from padt_tpu.eval.coco_map import COCOEvaluator, box_iou_xywh
from padt_tpu.eval.refcoco_eval import score_refcoco


def _gt(img, cat, box, area=None, crowd=0, seg=None):
    d = {
        "image_id": img,
        "category_id": cat,
        "bbox": list(box),
        "area": area if area is not None else box[2] * box[3],
        "iscrowd": crowd,
    }
    if seg:
        d["segmentation"] = seg
    return d


def _dt(img, cat, box, score, seg=None):
    d = {"image_id": img, "category_id": cat, "bbox": list(box), "score": score}
    if seg:
        d["segmentation"] = seg
    return d


@pytest.mark.smoke
def test_box_iou():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    iou = box_iou_xywh(d, g, [False, False])
    assert abs(iou[0, 0] - 1.0) < 1e-9
    assert abs(iou[0, 1] - 25 / 175) < 1e-9


@pytest.mark.smoke
def test_perfect_detections_ap1():
    gts = [_gt(1, 1, (10, 10, 50, 50)), _gt(1, 2, (30, 30, 40, 40)), _gt(2, 1, (0, 0, 20, 20))]
    dts = [_dt(1, 1, (10, 10, 50, 50), 0.9), _dt(1, 2, (30, 30, 40, 40), 0.8), _dt(2, 1, (0, 0, 20, 20), 0.7)]
    stats = COCOEvaluator("bbox").evaluate(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-6
    assert abs(stats["AP50"] - 1.0) < 1e-6
    assert abs(stats["AR100"] - 1.0) < 1e-6


@pytest.mark.smoke
def test_missed_and_false_positive():
    gts = [_gt(1, 1, (10, 10, 50, 50)), _gt(1, 1, (100, 100, 50, 50))]
    # one perfect hit (high score), one clean miss + one fp (low score)
    dts = [_dt(1, 1, (10, 10, 50, 50), 0.9), _dt(1, 1, (200, 200, 10, 10), 0.5)]
    stats = COCOEvaluator("bbox").evaluate(gts, dts)
    # precision@recall<=0.5 is 1.0; recall never reaches beyond 0.5
    assert 0.49 < stats["AP50"] < 0.51
    assert abs(stats["AR100"] - 0.5) < 1e-6


@pytest.mark.smoke
def test_iou_threshold_sensitivity():
    gts = [_gt(1, 1, (0, 0, 100, 100))]
    dts = [_dt(1, 1, (0, 0, 100, 60), 0.9)]  # IoU = 0.6
    stats = COCOEvaluator("bbox").evaluate(gts, dts)
    assert abs(stats["AP50"] - 1.0) < 1e-6  # matched at 0.5
    assert stats["AP75"] == 0.0  # not at 0.75
    # AP over 10 thresholds: matched at .5, .55, .6 -> 3/10
    assert abs(stats["AP"] - 0.3) < 1e-6


@pytest.mark.smoke
def test_crowd_gt_not_penalized():
    gts = [_gt(1, 1, (0, 0, 50, 50)), _gt(1, 1, (60, 0, 1000, 50), area=50000, crowd=1)]
    dts = [
        _dt(1, 1, (0, 0, 50, 50), 0.9),
        _dt(1, 1, (60, 0, 100, 50), 0.8),  # falls inside the crowd -> ignored
    ]
    stats = COCOEvaluator("bbox").evaluate(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-6


@pytest.mark.smoke
def test_segm_iou_type():
    a = np.zeros((50, 50), np.uint8)
    a[10:40, 10:40] = 1
    seg = rle_codec.encode(a)
    gts = [_gt(1, 1, (10, 10, 30, 30), seg=seg)]
    dts = [_dt(1, 1, (10, 10, 30, 30), 0.9, seg=seg)]
    stats = COCOEvaluator("segm").evaluate(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-6


@pytest.mark.smoke
def test_refcoco_scorer():
    m = np.zeros((100, 100), np.uint8)
    m[20:60, 20:60] = 1
    gt_rle = rle_codec.encode(m)
    gts = [
        {"image_id": 1, "label": "red car", "bbox": (20, 20, 40, 40), "rle": gt_rle},
        {"image_id": 2, "label": "dog", "bbox": (0, 0, 50, 50)},
    ]
    preds = [
        {"image_id": 1, "category": "red car", "bbox": (22, 22, 38, 38), "score": 0.9,
         "mask": rle_codec.encode(m)},
        {"image_id": 2, "category": "dog", "bbox": (60, 60, 10, 10), "score": 0.8},  # miss
    ]
    s = score_refcoco(gts, preds)
    assert abs(s["ap50"] - 0.5) < 1e-9
    assert s["ciou"] > 0.99  # perfect mask on the only mask GT
    assert s["num_gt"] == 2


def test_harness_end_to_end_tiny(tmp_path):
    """InferenceEngine + infer_dataset on the tiny random model with a real
    image file: exercises preprocessing, generation, parsing, decoding, JSONL."""
    import PIL.Image

    import jax
    import jax.numpy as jnp

    from padt_tpu.config import padt_tiny
    from padt_tpu.eval.harness import InferenceEngine, infer_dataset
    from padt_tpu.models import padt as P
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=cfg.max_image_patches)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    img_path = tmp_path / "img.png"
    rng = np.random.RandomState(0)
    PIL.Image.fromarray(rng.randint(0, 255, (64, 96, 3), np.uint8)).save(img_path)

    engine = InferenceEngine(params, cfg, proc, max_new_tokens=8, canvas_hw=(9, 9))
    dataset = [
        {"id": 7, "image_path": str(img_path), "problem": 'find "x"'},
        {"id": 8, "image_path": str(img_path), "problem": 'find "y"'},
        {"id": 9, "image_path": str(img_path), "problem": 'find "z"'},
    ]
    # 3 rows at batch_size=2: the trailing PARTIAL batch is padded to the full
    # batch dim (no recompile) and the padding row's results are dropped
    res_path, comp_path = infer_dataset(
        engine, dataset, str(tmp_path), batch_size=2, datasetname="unit", max_side=None
    )
    comps = [l for l in open(comp_path)]
    assert len(comps) == 3
    import json

    row = json.loads(comps[0])
    assert row["image_id"] == 7 and isinstance(row["completion"], str)


@pytest.mark.smoke
def test_check_golden_gate():
    """scripts/demo.py --check-golden logic: pass/fail branches."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("demo", os.path.join(root, "scripts", "demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    class Obj:
        bbox_xywh_px = (10.0, 10.0, 50.0, 40.0)
        score = 0.9
        mask_rle = None

    good = 'The "car" refers to <|VRT_122|><|VRT_107|><|VRT_138|><|VRT_256|><|VRT_135|> here.'
    assert demo.check_golden(good, [Obj()], (100, 100)) == []
    # wrong sequence
    fails = demo.check_golden(good.replace("256", "257"), [Obj()], (100, 100))
    assert any("golden VRT sequence" in f for f in fails)
    # no objects
    assert any("no objects" in f for f in demo.check_golden(good, [], (100, 100)))
    # degenerate box
    class Bad(Obj):
        bbox_xywh_px = (10.0, 10.0, -5.0, 40.0)
    assert any("degenerate" in f for f in demo.check_golden(good, [Bad()], (100, 100)))
    # sanity-only mode (empty golden_vrts)
    assert demo.check_golden("no vrts at all", [Obj()], (100, 100), golden_vrts="") == []


# ---------------------------------------------------------------------------
# Differential hardening vs a straight-line COCOeval transcription
# (tests/cocoeval_reference.py): adversarial fixtures with hand-computed
# expectations + seeded fuzz. Targets the divergences that would silently
# shift the headline stats[0] (reference eval_coco.py:84-93): score-tie
# ordering, crowd handling, per-category NaN averaging, maxDets truncation
# order, area-range interactions.
# ---------------------------------------------------------------------------

from cocoeval_reference import cocoeval_bbox


def _assert_stats_equal(gts, dts, atol=1e-9):
    ours = COCOEvaluator("bbox").evaluate(gts, dts)
    ref = cocoeval_bbox(gts, dts)
    for k in ref:
        assert abs(ours[k] - ref[k]) < atol, (k, ours[k], ref[k])
    return ours


@pytest.mark.smoke
def test_score_ties_cross_image_order():
    """Tied scores: accumulate breaks ties by image-id concat order
    (mergesort). Image 1's FP and image 2's TP share score 0.5 — the FP must
    sort FIRST (image order), making the curve [FP, TP] not [TP, FP]."""
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(2, 1, (0, 0, 10, 10))]
    dts = [
        _dt(1, 1, (50, 50, 10, 10), 0.5),  # clean FP on image 1
        _dt(2, 1, (0, 0, 10, 10), 0.5),  # perfect TP on image 2, SAME score
        _dt(1, 1, (0, 0, 10, 10), 0.9),  # perfect TP on image 1
    ]
    stats = _assert_stats_equal(gts, dts)
    # curve: TP(0.9) -> FP(0.5, img1 first) -> TP(0.5): rc=[.5,.5,1], pr=[1,.5,2/3]
    # envelope [1, 2/3, 2/3]; AP = (51*1 + 50*(2/3))/101 at every IoU thr
    expect = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert abs(stats["AP"] - expect) < 1e-9


@pytest.mark.smoke
def test_crowd_absorbs_extra_detection():
    """A dt whose only overlap is a crowd GT is IGNORED (not an FP), and a
    crowd GT can absorb multiple dts (gtm>0 + iscrowd skip-rule)."""
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(1, 1, (100, 100, 50, 50), crowd=1)]
    dts = [
        _dt(1, 1, (0, 0, 10, 10), 0.9),  # TP on the real gt
        _dt(1, 1, (100, 100, 50, 50), 0.8),  # inside crowd -> ignored
        _dt(1, 1, (110, 110, 40, 40), 0.7),  # ALSO inside crowd -> ignored
    ]
    stats = _assert_stats_equal(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-9  # crowd dts neither help nor hurt
    assert abs(stats["AR100"] - 1.0) < 1e-9  # npig counts only the real gt


@pytest.mark.smoke
def test_category_without_gt_is_nan_not_zero():
    """A category with detections but NO ground truth has npig=0 -> its
    precision stays -1 and is EXCLUDED from the mean (NaN semantics), not
    averaged in as 0. One perfect category must still give AP=1."""
    gts = [_gt(1, 1, (0, 0, 20, 20))]
    dts = [_dt(1, 1, (0, 0, 20, 20), 0.9), _dt(1, 2, (5, 5, 10, 10), 0.8)]
    stats = _assert_stats_equal(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-9
    assert abs(stats["AP50"] - 1.0) < 1e-9


@pytest.mark.smoke
def test_maxdets_truncation_order():
    """maxDets truncates by SCORE RANK (top-k after the mergesort), not list
    order: 10 high-score FPs push the low-score TP out of AR10 but not AR100."""
    gts = [_gt(1, 1, (0, 0, 10, 10))]
    dts = [_dt(1, 1, (200 + 15 * i, 200, 10, 10), 0.9 - 0.01 * i) for i in range(10)]
    dts.append(_dt(1, 1, (0, 0, 10, 10), 0.1))  # the only TP, lowest score
    stats = _assert_stats_equal(gts, dts)
    assert abs(stats["AR10"] - 0.0) < 1e-9
    assert abs(stats["AR100"] - 1.0) < 1e-9
    assert abs(stats["AR1"] - 0.0) < 1e-9
    # AP: TP arrives at rank 11 -> precision 1/11 from recall 0+ onward
    assert abs(stats["AP"] - 1 / 11) < 1e-9


@pytest.mark.smoke
def test_area_range_gt_ignore_and_match():
    """In the 'small' range a LARGE gt is ignored; a dt matching it is ignored
    too (matched-to-ignored), so AP_small is driven only by the small pair."""
    gts = [
        _gt(1, 1, (0, 0, 10, 10)),  # area 100 -> small
        _gt(1, 1, (100, 100, 50, 50)),  # area 2500 -> medium
    ]
    dts = [
        _dt(1, 1, (0, 0, 10, 10), 0.9),  # small TP
        _dt(1, 1, (100, 100, 50, 50), 0.8),  # medium TP
    ]
    stats = _assert_stats_equal(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-9
    assert abs(stats["AP_small"] - 1.0) < 1e-9
    assert abs(stats["AP_medium"] - 1.0) < 1e-9
    assert stats["AP_large"] == -1.0  # no large gt anywhere -> NaN slot


@pytest.mark.smoke
def test_out_of_range_unmatched_dt_ignored():
    """An UNMATCHED dt whose area is outside the range is ignored (not FP) in
    that range's accumulation — a medium-size clean-miss FP must not drag
    AP_small down."""
    gts = [_gt(1, 1, (0, 0, 10, 10))]  # small
    dts = [
        _dt(1, 1, (0, 0, 10, 10), 0.5),  # small TP
        _dt(1, 1, (300, 300, 50, 50), 0.9),  # medium FP, matches nothing
    ]
    stats = _assert_stats_equal(gts, dts)
    assert abs(stats["AP_small"] - 1.0) < 1e-9  # medium FP ignored in 'small'
    # in 'all', the higher-scored FP precedes the TP: envelope 0.5 everywhere
    assert abs(stats["AP"] - 0.5) < 1e-9


@pytest.mark.smoke
def test_interpolation_envelope_exact():
    """101-point interpolation with a non-monotone precision curve: TP, FP,
    TP, FP -> envelope must back-fill the max-to-the-right, and recThrs
    strictly above final recall read precision 0."""
    gts = [_gt(1, 1, (0, 0, 10, 10)), _gt(1, 1, (50, 50, 10, 10)), _gt(1, 1, (200, 0, 10, 10))]
    dts = [
        _dt(1, 1, (0, 0, 10, 10), 0.9),  # TP  rc 1/3 pr 1
        _dt(1, 1, (400, 400, 5, 5), 0.8),  # FP  rc 1/3 pr 1/2
        _dt(1, 1, (50, 50, 10, 10), 0.7),  # TP  rc 2/3 pr 2/3
        _dt(1, 1, (420, 420, 5, 5), 0.6),  # FP  rc 2/3 pr 1/2
    ]
    stats = _assert_stats_equal(gts, dts)
    # envelope: [1, 2/3, 2/3, 1/2]; rc=[1/3,1/3,2/3,2/3]
    # recThr<=1/3 (searchsorted-left -> idx0 -> 1.0): thr 0..0.33 = 34 pts
    # 1/3<thr<=2/3 -> idx 2 -> 2/3: thr 0.34..0.66 = 33 pts; rest 0
    expect = (34 * 1.0 + 33 * (2 / 3)) / 101
    assert abs(stats["AP"] - expect) < 1e-9
    assert abs(stats["AR100"] - 2 / 3) < 1e-9


@pytest.mark.smoke
def test_fuzz_against_reference_transcription():
    """Seeded fuzz: random small scenes with score ties (discrete score grid),
    crowds, mixed areas, >maxDet piles — every one of the 12 stats must match
    the straight-line COCOeval transcription exactly."""
    rng = np.random.RandomState(7)
    score_grid = [0.2, 0.4, 0.6, 0.8]  # forces plenty of ties
    for case in range(25):
        n_img = rng.randint(1, 4)
        n_cat = rng.randint(1, 3)
        gts, dts = [], []
        for img in range(1, n_img + 1):
            for cat in range(1, n_cat + 1):
                for _ in range(rng.randint(0, 4)):
                    x, y = rng.randint(0, 200, 2)
                    w, h = rng.randint(4, 120, 2)
                    gts.append(_gt(img, cat, (x, y, w, h), crowd=int(rng.rand() < 0.2)))
                for _ in range(rng.randint(0, 6)):
                    x, y = rng.randint(0, 200, 2)
                    w, h = rng.randint(4, 120, 2)
                    dts.append(_dt(img, cat, (x, y, w, h), float(rng.choice(score_grid))))
        if not gts and not dts:
            continue
        # half the cases: clone a gt box into a near-perfect detection so TPs exist
        for g in gts[:: 2]:
            dts.append(_dt(g["image_id"], g["category_id"], g["bbox"], float(rng.choice(score_grid))))
        _assert_stats_equal(gts, dts)
