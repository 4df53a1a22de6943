#!/usr/bin/env python
"""Dataset preprocessing CLI (reference `src/preprocess/*` entry points).

  python scripts/process_datasets.py coco --input instances_val2017.json --output out.jsonl [--train]
  python scripts/process_datasets.py refcoco --data_root dataset/RefCOCO --dataset refcoco --split val --output out.jsonl
  python scripts/process_datasets.py ric --input captions.json --output out.jsonl
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("coco")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--train", action="store_true")
    c.add_argument("--max_per_class", type=int, default=50)
    c.add_argument("--seed", type=int, default=None)

    r = sub.add_parser("refcoco")
    r.add_argument("--data_root", required=True)
    r.add_argument("--dataset", default="refcoco", choices=["refcoco", "refcoco+", "refcocog"])
    r.add_argument("--split", default="val")
    r.add_argument("--output", required=True)

    i = sub.add_parser("ric")
    i.add_argument("--input", required=True)
    i.add_argument("--output", required=True)

    a = ap.parse_args()
    if a.cmd == "coco":
        from padt_tpu.preprocess.datasets import process_coco

        stats = process_coco(a.input, a.output, max_bboxes_per_class_per_image=a.max_per_class,
                             is_train=a.train, seed=a.seed)
    elif a.cmd == "refcoco":
        from padt_tpu.preprocess.refer_api import process_refcoco

        stats = process_refcoco(a.data_root, a.dataset, a.split, a.output)
    else:
        from padt_tpu.preprocess.datasets import process_ric

        stats = process_ric(a.input, a.output)
    print(stats)


if __name__ == "__main__":
    main()
