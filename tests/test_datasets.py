"""Preprocessing tests: patch occupancy recipe, COCO OVD JSONL, RIC repair,
plus the data->train-batch pipeline round trip."""

import json

import numpy as np
import pytest

from padt_tpu.eval import rle as rle_codec
from padt_tpu.preprocess.datasets import (
    CocoIndex,
    patch_occupancy,
    process_coco,
    process_ric,
    repair_ric_caption,
)


pytestmark = pytest.mark.smoke

def _mk_coco(tmp_path, with_captions=False):
    h, w = 112, 140  # 4 x 5 grid of 28px cells
    seg_mask = np.zeros((h, w), np.uint8)
    seg_mask[30:80, 30:80] = 1
    seg_rle = rle_codec.encode(seg_mask)
    data = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": h, "width": w},
            {"id": 2, "file_name": "b.jpg", "height": 2000, "width": 100},  # res filter
        ],
        "categories": [{"id": 10, "name": "cat"}, {"id": 20, "name": "dog"}],
        "annotations": [
            {"id": 100, "image_id": 1, "category_id": 10, "bbox": [28, 28, 56, 56],
             "area": 3136, "iscrowd": 0, "segmentation": {"size": seg_rle["size"], "counts": seg_rle["counts"]}},
            {"id": 101, "image_id": 1, "category_id": 20, "bbox": [0, 0, 56, 28],
             "area": 1568, "iscrowd": 0},
        ],
    }
    if with_captions:
        data["images"][0]["captions"] = [
            "A cat (<box_id: 100/>) sits near a dog (<box_id: 101/>).",
        ]
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_patch_occupancy_square():
    m = np.zeros((112, 140), np.uint8)
    m[28:56, 28:56] = 1  # exactly cell (1, 1)
    patches = patch_occupancy(m)
    assert patches.tolist() == [1 * 5 + 1]


def test_patch_occupancy_threshold():
    m = np.zeros((112, 140), np.uint8)
    m[0, 0] = 1  # single pixel: mean*255 < 255/28
    assert patch_occupancy(m) is None


def test_process_coco(tmp_path):
    src = _mk_coco(tmp_path)
    out = tmp_path / "ovd.jsonl"
    stats = process_coco(src, str(out))
    rows = [json.loads(l) for l in open(out)]
    assert stats["skip_resolution"] == 1
    assert len(rows) == 1
    row = rows[0]
    assert row["task"] == "ovd"
    assert "<|Obj_0|>" in row["answer_template"] and "<|Obj_1|>" in row["answer_template"]
    assert '2 "' not in row["answer_template"]  # one object per category here
    assert len(row["objects"]) == 2
    # segmentation object has an RLE; box-only object doesn't
    assert "rle" in row["objects"][0] and "rle" not in row["objects"][1]
    # bbox normalized xyxy
    np.testing.assert_allclose(row["objects"][0]["bbox"], [28 / 140, 28 / 112, 84 / 140, 84 / 112])
    # prompt lists the categories
    assert "cat" in row["conversations"][0]["value"] and "dog" in row["conversations"][0]["value"]


def test_ric_repair_passes():
    valid = [405710, 714044]
    assert repair_ric_caption("(405710)", valid) == "(<box_id: 405710/>)"
    assert repair_ric_caption("<box_id: x714044/>", valid) == "<box_id: 714044/>"
    assert (
        repair_ric_caption("<box_id: 405710/, 714044/>", valid)
        == "<box_id: 405710/>, <box_id: 714044/>"
    )


def test_process_ric(tmp_path):
    src = _mk_coco(tmp_path, with_captions=True)
    out = tmp_path / "ric.jsonl"
    stats = process_ric(src, str(out))
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1
    assert rows[0]["answer_template"] == "A cat (<|Obj_0|>) sits near a dog (<|Obj_1|>)."
    assert rows[0]["conversations"][0]["value"] == "Please describe this image."


def test_train_batch_from_processed(tmp_path):
    """End-to-end: preprocess -> load_jsonl_datasets -> build_train_batch."""
    import PIL.Image

    from padt_tpu.config import padt_tiny
    from padt_tpu.train.data import build_train_batch, load_jsonl_datasets
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    src = _mk_coco(tmp_path)
    out = tmp_path / "ovd.jsonl"
    process_coco(src, str(out))
    rng = np.random.RandomState(0)
    PIL.Image.fromarray(rng.randint(0, 255, (112, 140, 3), np.uint8)).save(tmp_path / "a.jpg")

    samples = load_jsonl_datasets([str(out)], [str(tmp_path)])
    assert samples[0]["solution"]["objects"]

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=64, patch_bucket=cfg.max_image_patches)
    proc.prepare(cfg.text.vocab_size)
    batch = build_train_batch(samples, proc, cfg, rng, canvas_hw=(8, 12))
    d = batch.model
    assert d["obj_valid"].sum() == 2
    assert d["vrt_counts"][0] == 5  # extremes+center picking
    v = cfg.text.vocab_size
    comp = d["input_ids"][:, batch.prompt_length:]
    assert (comp >= v).sum() == 10  # 2 objects x 5 picked VRTs
    # penalty mask rows exist exactly at VRT positions
    vrt_rows = d["vrt_penalty_mask"].any(-1)
    assert vrt_rows.sum() > 0
    # gt mask canvas has content for the segmented object
    assert d["gt_mask"][0].sum() > 0
    assert d["gt_mask_valid"][0].sum() > 0


def test_load_jsonl_hub_fallback(tmp_path, monkeypatch):
    """Nonexistent local path routes to datasets.load_dataset(repo, data_files=...)
    (reference sft_train.py:33-44)."""
    import sys
    import types

    from padt_tpu.train import data as D

    captured = {}

    class FakeSplit:
        def to_list(self):
            return [{
                "id": 1, "image": "im.jpg",
                "conversations": [{"from": "human", "value": "<image>find"}],
                "answer_template": "t", "objects": [],
            }]

    def fake_load_dataset(repo, data_files=None):
        captured["repo"], captured["file"] = repo, data_files
        return {"train": FakeSplit()}

    monkeypatch.setitem(sys.modules, "datasets", types.SimpleNamespace(load_dataset=fake_load_dataset))
    out = D.load_jsonl_datasets(["someorg/somerepo/train.jsonl"], [str(tmp_path)])
    assert captured == {"repo": "someorg/somerepo", "file": "train.jsonl"}
    assert out[0]["problem"] == "find"
    assert out[0]["image_path"] == [str(tmp_path / "im.jpg")]
