#!/usr/bin/env python
"""Checkpoint format conversion, both directions.

HF -> native (orbax):  native checkpoints load faster (no torch->JAX
transpose pass) and carry the PaDTConfig in metadata — the reference's
"model carries its decoder config" property (`padt_sft_trainer.py:149-162`).

  python scripts/convert_checkpoint.py --src /ckpts/PaDT_Pro_3B --dst ckpts/padt_pro_3b_tpu

native/HF -> HF (--to-hf): emits a deployable HF safetensors checkpoint —
the reference's save-path property (DeepSpeed gather-16bit, `zero3.json:32`
+ `sft_train.py:112`), so PaDT-TPU-trained models round-trip into the
reference's toolchain.

  python scripts/convert_checkpoint.py --to-hf --src outputs/sft/checkpoint-900 --dst ckpts/padt_hf
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOKENIZER_HINTS = ("tokenizer", "vocab", "merges", "special_tokens", "chat_template", "preprocessor")


def copy_tokenizer_files(src: str, dst: str) -> None:
    for fname in os.listdir(src):
        if any(k in fname for k in TOKENIZER_HINTS):
            shutil.copy(os.path.join(src, fname), os.path.join(dst, fname))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="source checkpoint dir (HF or native)")
    ap.add_argument("--dst", required=True, help="output dir")
    ap.add_argument("--dtype", default=None, help="cast (default: keep; HF->native defaults bfloat16)")
    ap.add_argument("--to-hf", action="store_true", help="export HF safetensors instead of native orbax")
    args = ap.parse_args()

    import jax.numpy as jnp

    dst = os.path.abspath(args.dst)
    if args.to_hf:
        from padt_tpu.api import load_model
        from padt_tpu.convert.padt_to_hf import save_hf_checkpoint

        # use_mask_head=None: keep whatever the checkpoint config says
        cfg, params, _ = load_model(
            args.src,
            dtype=getattr(jnp, args.dtype) if args.dtype else None,
            use_mask_head=None,
        )
        save_hf_checkpoint(dst, params, cfg)
        copy_tokenizer_files(args.src, dst)
        print("wrote HF checkpoint:", dst)
        return

    import orbax.checkpoint as ocp

    from padt_tpu.convert.hf_to_padt import load_padt_checkpoint

    dtype = getattr(jnp, args.dtype or "bfloat16")
    cfg, params = load_padt_checkpoint(args.src, dtype=dtype)

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(dst, "params"), params, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(dst, "padt_config.json"), "w") as f:
        f.write(cfg.to_json())
    copy_tokenizer_files(args.src, dst)
    print("wrote", dst)


if __name__ == "__main__":
    main()
