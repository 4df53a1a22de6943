"""Dataset-scale eval throughput: >=1k COCO-shaped images through the
production inference harness (scripts/infer_eval.py infer --engine stream).

VERDICT r3 #7: the eval harness had only been verified at toy scale; with one
CPU core, host-side image IO/preprocessing is the likely real-eval bottleneck
at COCO-val scale (5k images) — this measures it instead of guessing.
`infer_dataset` prints the host-vs-engine time split (harness.py
infer_dataset_stats); this script generates the synthetic dataset, runs the
harness in-process, and forwards that line plus images/s.

Reference flow mirrored: eval/evaluation_scripts/inference_coco.py over
val2017 (5k images, batched REC/OVD prompts).

Env: PADT_EVAL_N (1024), PADT_EVAL_MODEL (random:3b), PADT_EVAL_ENGINE
(stream), PADT_EVAL_BATCH (32), PADT_EVAL_SLOTS (16), PADT_EVAL_MAXNEW (25),
PADT_EVAL_DIR (reuse an already-generated image dir), PADT_EVAL_SIDE (640),
PADT_EVAL_PASSES (1; 2 = report warm steady-state on the cached engine),
PADT_EVAL_PREFILL_BUCKET (4), PADT_EVAL_CHUNK_STEPS (8),
PADT_EVAL_PROMPT_BUCKET (unset), PADT_EVAL_SHARE_PREFIX (0).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PADT_EVAL_N", "1024"))
MODEL = os.environ.get("PADT_EVAL_MODEL", "random:3b")
ENGINE = os.environ.get("PADT_EVAL_ENGINE", "stream")
BATCH = int(os.environ.get("PADT_EVAL_BATCH", "32"))
SLOTS = int(os.environ.get("PADT_EVAL_SLOTS", "16"))
MAXNEW = int(os.environ.get("PADT_EVAL_MAXNEW", "25"))
SIDE = int(os.environ.get("PADT_EVAL_SIDE", "640"))


def generate(root):
    """COCO-val-shaped synthetic set: mixed aspect ratios, JPEG, one REC-style
    prompt per image (the dominant eval shape)."""
    import PIL.Image

    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    jsonl = os.path.join(root, "synthetic_val.jsonl")
    rng = np.random.RandomState(0)
    shapes = [(SIDE, SIDE * 3 // 4), (SIDE * 3 // 4, SIDE), (SIDE, SIDE * 9 // 16)]
    labels = ["person", "dog", "car", "chair", "bottle"]
    t0 = time.perf_counter()
    with open(jsonl, "w") as f:
        for i in range(N):
            name = f"{i:012d}.jpg"
            p = os.path.join(imgdir, name)
            if not os.path.exists(p):
                w, h = shapes[i % len(shapes)]
                # smooth gradients compress fast; pure noise JPEGs are slow to
                # encode AND unrepresentatively large
                yy, xx = np.mgrid[0:h, 0:w]
                base = (yy[..., None] * 0.3 + xx[..., None] * 0.2) % 255
                noise = rng.randint(0, 64, (h, w, 3))
                PIL.Image.fromarray(((base + noise) % 255).astype(np.uint8)).save(p, quality=85)
            lab = labels[i % len(labels)]
            f.write(json.dumps({
                "id": i, "image": name, "answer_template": "ANS",
                "conversations": [{
                    "from": "human",
                    "value": f'<image> Please detect the object this sentence describes: "{lab}".',
                }],
                "objects": [{"label": lab, "bbox": [0.1, 0.1, 0.6, 0.7],
                             "area": 100.0, "iscrowd": 0}],
            }) + "\n")
    return imgdir, jsonl, time.perf_counter() - t0


def main():
    root = os.environ.get("PADT_EVAL_DIR", "/tmp/padt_eval_scale")
    imgdir, jsonl, gen_s = generate(root)
    print(json.dumps({"generated": N, "gen_s": round(gen_s, 1), "dir": root}))

    sys.argv = [
        "infer_eval.py", "infer", "--model", MODEL, "--data", jsonl,
        "--image_folder", imgdir, "--dataset", "scale", "--batch_size", str(BATCH),
        "--max_new_tokens", str(MAXNEW), "--engine", ENGINE,
        "--n_slots", str(SLOTS), "--output_dir", os.path.join(root, "out"),
        "--suffix", "scale",
        "--passes", os.environ.get("PADT_EVAL_PASSES", "1"),
        "--prefill_bucket", os.environ.get("PADT_EVAL_PREFILL_BUCKET", "4"),
        "--chunk_steps", os.environ.get("PADT_EVAL_CHUNK_STEPS", "8"),
    ]
    if os.environ.get("PADT_EVAL_PROMPT_BUCKET"):
        sys.argv += ["--prompt_bucket", os.environ["PADT_EVAL_PROMPT_BUCKET"]]
    if os.environ.get("PADT_EVAL_SHARE_PREFIX", "0") == "1":
        sys.argv += ["--share_prefix"]
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "infer_eval", os.path.join(os.path.dirname(os.path.abspath(__file__)), "infer_eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


if __name__ == "__main__":
    main()
