#!/usr/bin/env python
"""Convert an HF-format PaDT / Qwen2.5-VL checkpoint to PaDT-TPU native format
(orbax). Native checkpoints load faster (no torch->JAX transpose pass) and
carry the PaDTConfig in metadata — the reference's "model carries its decoder
config" property (`padt_sft_trainer.py:149-162`).

  python scripts/convert_checkpoint.py --src /ckpts/PaDT_Pro_3B --dst ckpts/padt_pro_3b_tpu
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="HF checkpoint dir")
    ap.add_argument("--dst", required=True, help="output orbax dir")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from padt_tpu.convert.hf_to_padt import load_padt_checkpoint

    dtype = getattr(jnp, args.dtype)
    cfg, params = load_padt_checkpoint(args.src, dtype=dtype)

    dst = os.path.abspath(args.dst)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(dst, "params"), params, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(dst, "padt_config.json"), "w") as f:
        f.write(cfg.to_json())
    # copy tokenizer files so the native dir is self-contained
    import shutil

    for fname in os.listdir(args.src):
        if any(k in fname for k in ("tokenizer", "vocab", "merges", "special_tokens", "chat_template", "preprocessor")):
            shutil.copy(os.path.join(args.src, fname), os.path.join(dst, fname))
    print("wrote", dst)


if __name__ == "__main__":
    main()
