"""End-to-end rehearsal of scripts/real_weights_pipeline.sh.

Real-checkpoint parity is environment-blocked (no egress), so the pipeline
that must run the moment the released weights are stageable is rehearsed here
with a tiny synthetic HF checkpoint: every stage of the script — convert ->
golden demo gate -> COCO infer+score -> RefCOCO infer+score — executes for
real (subprocesses, the script itself), with the tiny model's own greedy VRT
output injected as the golden sequence (PADT_GOLDEN_VRTS).

The checkpoint is ENGINEERED to emit VRT tokens under greedy decode: text
logits are shrunk (tied embed scaled down) and the vision merger output is
amplified so the prototype dot products dominate the extended vocab
(models/padt.py::extended_logits). That makes the demo's object-formation
path (parser run -> decoder box/mask) deterministic and non-degenerate.

Runs on CPU (JAX_PLATFORM_NAME=cpu in every subprocess) — no TPU contention.
Reference flow being rehearsed: eval/test_demo.py + evaluation_scripts/
{inference_coco,eval_coco,inference_refcoco,eval_refcoco}.py.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    # CPU-only: strip the axon TPU plugin (a hung tunnel would stall jax
    # backend init in every subprocess — CLAUDE.md environment notes)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    return env


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    """Synthetic release staging: tiny HF checkpoint (VRT-biased), demo image,
    COCO + RefCOCO processed JSONLs, image folder, COCO annotations json."""
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    root = tmp_path_factory.mktemp("staged")
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=96, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            out_hidden_size=64, fullatt_block_indexes=[1], spatial_merge_size=2,
        ),
        image_token_id=500, video_token_id=501, vision_start_token_id=498,
        tie_word_embeddings=True,
        # demo.py loads the checkpoint WITHOUT id overrides (the real-weights
        # flow) — the config itself must carry in-vocab special ids
        eos_token_id=510, pad_token_id=509, bos_token_id=508,
    )
    cfg.vl_decoder = {
        "name": "PaDTDecoder", "hidden_size": 32, "intermediate_size": 64,
        "llm_hidden_state": 64, "num_heads": 2, "spatial_merge_size": 2,
        "use_mask_loss": True,
    }
    cfg.use_visual_prototype_projection = False
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg)
    with torch.no_grad():
        # VRT-biased generation: tiny text logits, large prototype norms
        model.model.language_model.embed_tokens.weight.mul_(1e-3)
        model.model.visual.merger.mlp[2].weight.mul_(30.0)
    ckpt = root / "hf_ckpt"
    model.save_pretrained(ckpt, safe_serialization=True)

    import PIL.Image

    rng = np.random.RandomState(3)
    imgdir = root / "images"
    imgdir.mkdir()
    for name, wh in [("demo.png", (96, 64)), ("a.png", (84, 56)), ("b.png", (56, 84))]:
        PIL.Image.fromarray(rng.randint(0, 255, (wh[1], wh[0], 3), np.uint8)).save(imgdir / name)

    def rec(i, img, prob, objs):
        return {
            "id": i, "image": img, "answer_template": "ANS",
            "conversations": [{"from": "human", "value": f"<image> {prob}"}],
            "objects": objs,
        }

    def obj(label, hw):
        h, w = hw
        mask = np.zeros((h, w), np.uint8)
        mask[2 : h // 2, 3 : w // 2] = 1
        sys.path.insert(0, ROOT)
        from padt_tpu.eval import rle as rle_codec

        return {
            "bbox": [0.1, 0.1, 0.5, 0.6], "area": float(mask.sum()), "iscrowd": 0,
            "label": label, "rle": rle_codec.encode(mask),
        }

    coco_jsonl = root / "instances_val_tiny.jsonl"
    with open(coco_jsonl, "w") as f:
        f.write(json.dumps(rec(1, "a.png", 'detect "person"', [obj("person", (56, 84))])) + "\n")
        f.write(json.dumps(rec(2, "b.png", 'detect "dog"', [obj("dog", (84, 56))])) + "\n")
    coco_json = root / "instances_val_tiny.json"
    with open(coco_json, "w") as f:
        json.dump(
            {
                "categories": [{"id": 1, "name": "person"}, {"id": 18, "name": "dog"}],
                "images": [
                    {"id": 1, "height": 56, "width": 84},
                    {"id": 2, "height": 84, "width": 56},
                ],
            },
            f,
        )
    refdir = root / "refcoco"
    refdir.mkdir()
    with open(refdir / "refcoco_val.jsonl", "w") as f:
        f.write(json.dumps(rec(1, "a.png", 'the "person" on the left', [obj("person", (56, 84))])) + "\n")
        f.write(json.dumps(rec(2, "b.png", 'the "dog" lying down', [obj("dog", (84, 56))])) + "\n")
    return {
        "ckpt": str(ckpt), "imgdir": str(imgdir), "demo_img": str(imgdir / "demo.png"),
        "coco_jsonl": str(coco_jsonl), "coco_json": str(coco_json), "refdir": str(refdir),
        "root": str(root),
    }


@pytest.mark.slow
def test_real_weights_pipeline_rehearsal(staged, tmp_path):
    env = _cpu_env()
    out = tmp_path / "out"
    native = tmp_path / "native"

    # Stage 0 (rehearsal only): capture the tiny model's greedy VRT output on
    # the demo image — this becomes the injected golden sequence, proving the
    # gate MECHANICS (the real run keeps the reference's 122,107,138,256,135)
    r = subprocess.run(
        [sys.executable, "scripts/demo.py", "--model", staged["ckpt"],
         "--image", staged["demo_img"], "--max_new_tokens", "8",
         "--output_dir", str(out / "demo0")],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    comp = open(out / "demo0" / "completion.txt").read()
    vrts = re.findall(r"<\|VRT_(\d+)\|>", comp)
    assert vrts, f"engineered checkpoint emitted no VRT tokens: {comp!r}"

    env.update(
        PADT_HF_CKPT=staged["ckpt"],
        PADT_DEMO_IMG=staged["demo_img"],
        PADT_NATIVE_DIR=str(native),
        PADT_GOLDEN_VRTS=",".join(vrts),
        PADT_DEMO_ARGS="--max_new_tokens 8 --output_dir " + str(out / "demo"),
        PADT_COCO_VAL=staged["coco_jsonl"],
        PADT_REFCOCO=staged["refdir"],
        PADT_INFER_ARGS="--max_new_tokens 8 --batch_size 2",
        # eval_coco.sh / eval_refcoco.sh env
        IMAGES=staged["imgdir"],
        COCO_JSON=staged["coco_json"],
        OUT=str(out / "evals"),
        SUFFIX="rehearsal",
    )
    r = subprocess.run(
        ["bash", "scripts/real_weights_pipeline.sh"],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=1800,
    )
    tail = (r.stdout + "\n" + r.stderr)[-4000:]
    assert r.returncode == 0, tail
    assert "ALL GATES PASSED" in r.stdout, tail
    assert "GOLDEN PASS" in r.stdout, tail
    # both scorers actually ran and printed metrics
    assert "Mean Average Precision" in r.stdout, tail
    assert '"ciou"' in r.stdout and '"ap50"' in r.stdout, tail
    # prediction JSONLs in the reference schema landed on disk
    preds = list((out / "evals").glob("coco_*_pred_results_rehearsal.json"))
    assert preds, list((out / "evals").iterdir())
