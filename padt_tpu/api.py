"""High-level user API — the PaDT-TPU equivalents of the reference's public
surface (`PaDTForConditionalGeneration.from_pretrained` + `AutoProcessor` +
`VisonTextProcessingClass`, see `eval/test_demo.py:20-31`).

`load_model(path)` loads an HF-format PaDT (or stock Qwen2.5-VL) checkpoint
directory: config.json (+ embedded vl_decoder dict), safetensors weights, and
the tokenizer — returning (cfg, params, processor) ready for the inference
harness or trainer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import numpy as np

from .config import PaDTConfig
from .vrt.processor import VisionTextProcessor


def load_tokenizer(model_path: str):
    """HF tokenizer from a local checkpoint dir (pure data dep; falls back to
    the offline mock for random-weight demos)."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(model_path, trust_remote_code=False)
    except Exception:
        return None


def load_model(
    model_path: str,
    dtype: Optional[Any] = None,
    min_pixels: int = 3136,
    max_pixels: int = 12_845_056,
    use_mask_head: Optional[bool] = True,
    **config_overrides,
) -> Tuple[PaDTConfig, Any, VisionTextProcessor]:
    """Checkpoint dir -> (cfg, params, processor).

    Mirrors `eval/evaluation_scripts/utils.py:57-84` (load_model) minus the
    DeepSpeed engine: params are plain JAX arrays; shard them with
    parallel.mesh.shard_params for multi-chip. `use_mask_head=True` replicates
    the eval-time `config.vl_decoder['use_mask_loss'] = True` (utils.py:59).
    """
    import dataclasses

    import jax.numpy as jnp

    from .convert.hf_to_padt import load_padt_checkpoint

    dtype = dtype if dtype is not None else jnp.bfloat16
    if os.path.exists(os.path.join(model_path, "padt_config.json")):
        # native (orbax) format written by scripts/convert_checkpoint.py
        import orbax.checkpoint as ocp

        with open(os.path.join(model_path, "padt_config.json")) as f:
            cfg = PaDTConfig.from_json(f.read())
        if config_overrides:
            cfg = cfg.replace(**config_overrides)
        # restore device-agnostically: the saved sharding metadata names the
        # writer's devices (e.g. TFRT_CPU_0 from a CPU-forced conversion), which
        # need not exist in this process — restore to shape/dtype targets on the
        # current default device instead
        import jax

        ckptr = ocp.StandardCheckpointer()
        ppath = os.path.join(os.path.abspath(model_path), "params")
        meta = ckptr.metadata(ppath).item_metadata.tree
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding), meta
        )
        params = ckptr.restore(ppath, target=target)
    else:
        cfg, params = load_padt_checkpoint(model_path, dtype=dtype, **config_overrides)
    if use_mask_head is not None:
        cfg = cfg.replace(decoder=dataclasses.replace(cfg.decoder, use_mask_head=use_mask_head))

    # PaDT extras may be absent in stock Qwen2.5-VL checkpoints -> random init
    if "decoder" not in params or ("proto" not in params and cfg.use_visual_prototype_projection):
        import jax

        from .models.padt import init_padt_params

        fresh = init_padt_params(cfg, jax.random.PRNGKey(0), dtype)
        params.setdefault("decoder", fresh["decoder"])
        if cfg.use_visual_prototype_projection:
            params.setdefault("proto", fresh["proto"])

    tokenizer = load_tokenizer(model_path)
    if tokenizer is None:
        from .utils.mock_tokenizer import make_tiny_tokenizer

        tokenizer = make_tiny_tokenizer(cfg)
    processor = VisionTextProcessor(tokenizer, cfg, min_pixels=min_pixels, max_pixels=max_pixels)
    processor.prepare(params["text"]["embed"].shape[0])
    return cfg, params, processor
