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
