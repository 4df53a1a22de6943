"""PaDT core model: dynamic Visual Reference Token vocabulary on Qwen2.5-VL.

Rebuilds `PaDTForConditionalGeneration` (reference `src/PaDT/models/padt.py`):
  - visual prototype projection: zero-init LayerNorm + rank-64 bottleneck
    residual (`padt.py:117-125,134-139,187-191`),
  - extended embedding table & extended-vocab LM head with per-sample logit
    masking (`padt.py:193-204,292-301`),
  - `<|image_pad|>` embedding splice (`padt.py:212-219`),
  - greedy/sampling generation with KV cache and per-step final-hidden capture
    (`padt.py:618-800`).

TPU-first divergences (documented per SURVEY.md §7):
  - Per-sample prototype tables `(B, M_max, D)` instead of one batch-packed
    table with global VRT ids: VRT token id == vocab_size + LOCAL patch id for
    every sample. This makes the extended vocab a static shape, removes the
    reference's `assign_to_global/local_vrt_id` device round-trip, and each
    sample's logit mask reduces to `patch_id < num_merged[b]`.
  - The whole decode loop is ONE jitted `lax.while_loop` (vs. one Python-driven
    HF forward per token): zero host round-trips, early-exits when every
    sequence hits EOS (SPMD-safe — replaces `synced_gpus` lockstep hacks).
  - Hidden states are captured into a preallocated (B, T, D) buffer inside the
    loop carry (vs. the reference's "store all hidden states of every step"
    tuple, `padt.py:732-737`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import PaDTConfig
from ..ops.norms import layer_norm
from . import language
from .language import KVCache
from .vision import init_vision_params, vision_forward

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_padt_params(cfg: PaDTConfig, key, dtype=jnp.bfloat16) -> Dict[str, Any]:
    from .decoder import init_decoder_params  # local import to avoid cycle

    kv, kt, kp, kd = jax.random.split(key, 4)
    params: Dict[str, Any] = {
        "vision": init_vision_params(cfg.vision, kv, dtype),
        "text": language.init_text_params(cfg.text, kt, dtype),
        "decoder": init_decoder_params(cfg.decoder, kd, dtype),
    }
    if cfg.use_visual_prototype_projection:
        d = cfg.text.hidden_size
        r = cfg.prototype_proj_rank
        k1, k2 = jax.random.split(kp)
        params["proto"] = {
            # ZeroInitLayerNorm: weight AND bias zero-init (padt.py:134-139)
            "ln_w": jnp.zeros((d,), dtype),
            "ln_b": jnp.zeros((d,), dtype),
            "down_w": (jax.random.normal(k1, (d, r), jnp.float32) * 0.02).astype(dtype),
            "up_w": (jax.random.normal(k2, (r, d), jnp.float32) * 0.02).astype(dtype),
        }
    return params


def init_padt_params_quantized(
    cfg: PaDTConfig, key, dtype=jnp.bfloat16, packed: bool = False
) -> Dict[str, Any]:
    """Random init with the LLM layer weights DIRECTLY in per-channel int8
    (+f32 scales), the `quantize_params` layout. For 7B benches on one chip:
    bf16 7B params are 15.2 GB — they cannot be materialized and THEN
    quantized inside 15.75 GB HBM, so the quantized layout is built straight
    away (int8 layers ~6.5 GB + bf16 embed/vision/decoder).

    packed=True builds the fused qkv_w_q/gateup_w_q serving layout
    (`pack_inference_params` result) DIRECTLY — on-device packing of int8 7B
    needs a ~4.3 GB concat transient next to the live unfused stacks and
    OOMs one v5e chip; building fused avoids the transient entirely (random
    int8 columns are distribution-identical either way)."""
    params = None
    tc = cfg.text
    kq, rest = jax.random.split(key)

    # build the non-layer parts with a depth-0 text stack, then add int8 layers
    slim = cfg.replace(text=__import__("dataclasses").replace(tc, num_hidden_layers=0))
    params = init_padt_params(slim, rest, dtype)

    nl, d, ff = tc.num_hidden_layers, tc.hidden_size, tc.intermediate_size
    qd = tc.num_attention_heads * tc.head_dim
    kvd = tc.num_key_value_heads * tc.head_dim
    if packed:
        shapes = {
            "qkv_w": (d, qd + 2 * kvd), "o_w": (qd, d),
            "gateup_w": (d, 2 * ff), "down_w": (ff, d),
        }
        layers = {
            "input_ln_w": jnp.ones((nl, d), dtype),
            "post_ln_w": jnp.ones((nl, d), dtype),
            "qkv_b": jnp.zeros((nl, qd + 2 * kvd), dtype),
        }
    else:
        shapes = {
            "q_w": (d, qd), "k_w": (d, kvd), "v_w": (d, kvd), "o_w": (qd, d),
            "gate_w": (d, ff), "up_w": (d, ff), "down_w": (ff, d),
        }
        layers = {
            "input_ln_w": jnp.ones((nl, d), dtype),
            "post_ln_w": jnp.ones((nl, d), dtype),
            "q_b": jnp.zeros((nl, qd), dtype),
            "k_b": jnp.zeros((nl, kvd), dtype),
            "v_b": jnp.zeros((nl, kvd), dtype),
        }
    # uniform int8 in [-127,127] has std ~73; scale so dequantized weights
    # match the 0.02-std random init of the dense path
    scale = 0.02 / 73.0
    ks = jax.random.split(kq, len(shapes))
    # per-layer generation: randint materializes uint32 random bits of the
    # FULL output shape (7.6 GB for 7B's stacked mlp weights) — lax.map keeps
    # the transient to one layer (~271 MB)
    gen = jax.jit(
        lambda k, shp: jax.lax.map(
            lambda kk: jax.random.randint(kk, shp, -127, 128, jnp.int8),
            jax.random.split(k, nl),
        ),
        static_argnums=(1,),
    )
    for k_i, (name, shp) in zip(ks, shapes.items()):
        layers[name + "_q"] = gen(k_i, shp)
        layers[name + "_s"] = jnp.full((nl, 1, shp[1]), scale, jnp.float32)
    params["text"]["layers"] = layers
    return params


def image_prototypes(params, cfg: PaDTConfig, merged: jnp.ndarray) -> jnp.ndarray:
    """merged (B, M, D) raster order -> prototypes (B, M, D) (padt.py:187-191)."""
    if not cfg.use_visual_prototype_projection:
        return merged
    p = params["proto"]
    x = layer_norm(merged, p["ln_w"], p["ln_b"], eps=1e-5)
    return x + (x @ p["down_w"]) @ p["up_w"]


# ---------------------------------------------------------------------------
# Embedding / logits over the extended (text + per-sample VRT) vocabulary
# ---------------------------------------------------------------------------

def extended_embed(
    params,
    cfg: PaDTConfig,
    input_ids: jnp.ndarray,  # (B, L) int32; VRT ids are vocab_size + local patch id
    proto: jnp.ndarray,  # (B, M, D)
    merged: Optional[jnp.ndarray] = None,  # (B, M, D) raster merged embeds for image_pad splice
) -> jnp.ndarray:
    v = cfg.text.vocab_size
    embed = params["text"]["embed"]
    is_vrt = input_ids >= v
    text_e = embed[jnp.clip(input_ids, 0, v - 1)]
    local = jnp.clip(input_ids - v, 0, proto.shape[1] - 1)
    vrt_e = jnp.take_along_axis(proto, local[:, :, None], axis=1)
    out = jnp.where(is_vrt[:, :, None], vrt_e.astype(text_e.dtype), text_e)
    if merged is not None:
        # splice raster-order image embeds over <|image_pad|> / <|video_pad|>
        # runs (padt.py:212-219; video inherits the same splice from Qwen2.5-VL)
        is_img = (input_ids == cfg.image_token_id) | (input_ids == cfg.video_token_id)
        slot = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
        img_e = jnp.take_along_axis(merged, jnp.clip(slot, 0, merged.shape[1] - 1)[:, :, None], axis=1)
        out = jnp.where(is_img[:, :, None], img_e.astype(out.dtype), out)
    return out


def extended_logits_pair(
    params,
    cfg: PaDTConfig,
    hidden: jnp.ndarray,  # (B, L, D)
    proto: jnp.ndarray,  # (B, M, D)
    num_merged: jnp.ndarray,  # (B,) valid patch count per sample
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Text-vocab and VRT logits as a PAIR ((B,L,V), (B,L,M)); invalid VRT
    slots masked to NEG_INF (reference extended-vocab head + logit mask,
    padt.py:292-301,196-201). The training loss consumes the pair directly —
    concatenating first costs an extra (B,L,V+M) fp32 copy and makes GSPMD
    reshard the cotangent across the vocab-axis split (involuntary full
    rematerialization on multi-chip meshes)."""
    w = params["text"]["embed"] if cfg.text.tie_word_embeddings else params["text"]["lm_head"]
    lt = jnp.einsum("bld,vd->blv", hidden, w, preferred_element_type=jnp.float32)
    lv = jnp.einsum("bld,bmd->blm", hidden, proto, preferred_element_type=jnp.float32)
    slot_ok = jnp.arange(proto.shape[1])[None, :] < num_merged[:, None]  # (B, M)
    lv = jnp.where(slot_ok[:, None, :], lv, NEG_INF)
    return lt, lv


def extended_logits(
    params,
    cfg: PaDTConfig,
    hidden: jnp.ndarray,  # (B, L, D)
    proto: jnp.ndarray,  # (B, M, D)
    num_merged: jnp.ndarray,  # (B,) valid patch count per sample
) -> jnp.ndarray:
    """(B, L, V + M) concatenated extended logits (decode/generate path)."""
    lt, lv = extended_logits_pair(params, cfg, hidden, proto, num_merged)
    return jnp.concatenate([lt, lv], axis=-1)


# ---------------------------------------------------------------------------
# Teacher-forced forward (training & prefill building block)
# ---------------------------------------------------------------------------

class VisionArtifacts(NamedTuple):
    """Vision-side tensors the PaDT decoder consumes, carried through
    generation (the reference shuttles these as `past_*` kwargs,
    `padt.py:330-339,677-706`)."""

    merged: jnp.ndarray  # (B, M, D_llm) raster order
    proto: jnp.ndarray  # (B, M, D_llm) raster order (low-res memory + VRT embeds)
    high_res: jnp.ndarray  # (B, S, D_vis) WINDOW order
    pe_cos: jnp.ndarray  # (B, S, head_dim_vis) WINDOW order
    pe_sin: jnp.ndarray
    num_merged: jnp.ndarray  # (B,)
    num_patches: jnp.ndarray  # (B,)
    grid_thw: jnp.ndarray  # (B, 3)


_VISION_BATCH_KEYS = (
    "pixel_patches", "pixel_patches_u8", "window_index", "inv_window_index",
    "seg_win", "seg_full",
    "hpos", "wpos", "num_merged", "num_patches", "grid_thw", "pack_index",
)  # pack_index present only with the window-SLOT layout (vision_geom.py)

# batch keys consumed ONLY by the vision tower forward — a batch carrying
# cached `vis_*` features (see vision_features) can drop these entirely
_VISION_ONLY_KEYS = (
    "pixel_patches", "pixel_patches_u8", "window_index", "inv_window_index",
    "seg_win", "seg_full",
    "hpos", "wpos", "pack_index",
)

_VISION_CACHE_KEYS = ("vis_merged", "vis_high_res", "vis_pe_cos", "vis_pe_sin")
# int8 cached-feature layout: merged/high_res (the ~7.6 MB/sample bulk) as
# per-row symmetric int8 + f32 row scales; the small rope tables stay exact
# (they feed attention phase math — see vision_features(quant="int8"))
_VISION_CACHE_KEYS_INT8 = (
    "vis_merged_q", "vis_merged_s", "vis_high_res_q", "vis_high_res_s",
    "vis_pe_cos", "vis_pe_sin",
)


def vision_cache_keys(quant: str = "none") -> Tuple[str, ...]:
    return _VISION_CACHE_KEYS_INT8 if quant == "int8" else _VISION_CACHE_KEYS


def _quant_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric int8: q in [-127,127], f32 scales shaped
    (..., 1). Rows are feature vectors — one outlier channel only costs its
    own row's resolution."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _dequant_rows(q: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * s).astype(dtype)


def vision_features(
    params, cfg: PaDTConfig, batch: Dict[str, jnp.ndarray], remat: bool = False,
    quant: str = "none",
) -> Dict[str, jnp.ndarray]:
    """Run the (frozen) vision tower once and return the `vis_*` batch keys
    that make `forward_train`/`run_vision` skip it.

    Under `freeze_vision` the training graph is cut by stop_gradient at
    exactly these tensors (the reference freezes the same module set via
    requires_grad_(False), `padt_sft_trainer.py:166-170`), so feeding them
    back as batch data is EXACTLY gradient- and loss-equivalent — while the
    trainable prototype projection (`image_prototypes`) is recomputed from
    `merged` every step. Tower FLOPs per step drop to zero: ~35% of the
    measured 3B frozen-vision step (BASELINE.md training table).

    Size: ~10 MB/sample bf16 at 3B/644px (merged (M,2048) + high_res (S,1280)
    + rope tables) — cache on the HOST and stream per batch (needs ~batch x
    10 MB/step of host->device feed, trivial on a real PCIe host).

    quant="int8": merged/high_res returned as per-row int8 + f32 scales
    (~2x smaller cache AND host<->device stream; the b16-cached OOM was 38 MB
    over budget, BASELINE.md round-4). Rope tables stay exact. Features are
    stop_gradient INPUTS, so quantization is a bounded forward perturbation,
    not a gradient-path change — parity gated in tests/test_train_cache.py."""
    art = run_vision(params, cfg, batch, remat=remat, freeze=True)
    if quant == "int8":
        mq, ms = _quant_rows(art.merged)
        hq, hs = _quant_rows(art.high_res)
        return {
            "vis_merged_q": mq, "vis_merged_s": ms,
            "vis_high_res_q": hq, "vis_high_res_s": hs,
            "vis_pe_cos": art.pe_cos,
            "vis_pe_sin": art.pe_sin,
        }
    return {
        "vis_merged": art.merged,
        "vis_high_res": art.high_res,
        "vis_pe_cos": art.pe_cos,
        "vis_pe_sin": art.pe_sin,
    }


def run_vision(
    params, cfg: PaDTConfig, batch: Dict[str, jnp.ndarray], remat: bool = False,
    freeze: bool = False,
) -> VisionArtifacts:
    if "vis_merged" in batch or "vis_merged_q" in batch:
        # precomputed frozen-tower features (vision_features): skip the tower,
        # recompute only the trainable prototype projection
        if not freeze:
            raise ValueError(
                "cached vision features (vis_* batch keys) are exact only under "
                "freeze_vision=True: the tower graph is skipped entirely, so an "
                "unfrozen tower's gradients would be silently zero"
            )
        if "vis_merged_q" in batch:
            # int8 feature cache: dequant fuses into the first consumer pass
            dt = batch["vis_pe_cos"].dtype
            merged = _dequant_rows(batch["vis_merged_q"], batch["vis_merged_s"], dt)
            high_res = _dequant_rows(batch["vis_high_res_q"], batch["vis_high_res_s"], dt)
        else:
            merged = batch["vis_merged"]
            high_res = batch["vis_high_res"]
        return VisionArtifacts(
            merged=merged,
            proto=image_prototypes(params, cfg, merged),
            high_res=high_res,
            pe_cos=batch["vis_pe_cos"],
            pe_sin=batch["vis_pe_sin"],
            num_merged=batch["num_merged"],
            num_patches=batch["num_patches"],
            grid_thw=batch["grid_thw"],
        )
    pix_key = "pixel_patches" if "pixel_patches" in batch else "pixel_patches_u8"
    b = batch[pix_key].shape[0]
    cs = cfg.vision_chunk_size
    if cs and b > cs and b % cs == 0:
        # chunked execution: vision activation transients dominate HBM at large
        # batch (7.75 GB at 3B/B48); lax.map over chunks bounds them to one
        # chunk's worth at the cost of serializing chunks (same total FLOPs)
        nc = b // cs
        vb = {
            k: batch[k].reshape(nc, cs, *batch[k].shape[1:])
            for k in _VISION_BATCH_KEYS if k in batch
        }
        art = jax.lax.map(lambda bc: _run_vision_once(params, cfg, bc, remat, freeze), vb)
        return jax.tree.map(lambda x: x.reshape(b, *x.shape[2:]), art)
    return _run_vision_once(params, cfg, batch, remat, freeze)


def _pixel_u8_lut(dtype=jnp.float32) -> jnp.ndarray:
    """(3, 256) per-channel normalization table: lut[c, v] =
    (f32(v)/255 - mean[c]) / std[c], computed on the HOST with the exact
    numpy expression `process_image` uses — so the device expansion below is
    a pure gather and matches the host pipeline bitwise by construction
    (TPU f32 divide can differ from numpy by 1 ulp; a LUT cannot)."""
    import numpy as np

    from ..preprocess.vision_process import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

    v = np.arange(256, dtype=np.float32) / np.float32(255.0)  # (256,)
    mean = np.asarray(OPENAI_CLIP_MEAN, np.float32)[:, None]
    std = np.asarray(OPENAI_CLIP_STD, np.float32)[:, None]
    return jnp.asarray((v[None, :] - mean) / std, dtype)


def _expand_pixels_u8(
    u8: jnp.ndarray, num_patches: jnp.ndarray, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Compact uint8 patch rows (B, S, C*P*P) -> normalized `pixel_patches`
    (B, S, C*tP*P*P): per-channel LUT gather + temporal duplication (images
    have t=1, both temporal copies are the same frame) + zeroing of padding
    rows (the host pipeline pads AFTER normalization with 0.0). Runs inside
    the vision jit so only the 4x-smaller uint8 rows cross the host<->device
    link (preprocess/vision_process.py::process_image(u8_rows=True))."""
    b, s, d = u8.shape
    c = 3
    pp = d // c
    lut = _pixel_u8_lut(dtype)  # (3, 256)
    x = lut[jnp.arange(c)[None, None, :, None], u8.reshape(b, s, c, pp).astype(jnp.int32)]
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, c, 2, pp)).reshape(b, s, 2 * d)
    valid = (jnp.arange(s)[None, :] < num_patches[:, None])[:, :, None]
    return jnp.where(valid, x, jnp.zeros((), dtype))


def _run_vision_once(
    params, cfg: PaDTConfig, batch: Dict[str, jnp.ndarray], remat: bool = False,
    freeze: bool = False,
) -> VisionArtifacts:
    pix = batch.get("pixel_patches")
    if pix is None:
        # compact uint8 wire format: expand per vision-chunk (the full-batch
        # bf16 stack is never materialized — in-jit memory is LOWER than the
        # classic path, which receives the bf16 stack as an input). bf16 to
        # match what the harness/engine feed on the classic path exactly.
        pix = _expand_pixels_u8(
            batch["pixel_patches_u8"], batch["num_patches"], dtype=jnp.bfloat16
        )
    merged, high_res, (cos, sin) = vision_forward(
        params["vision"],
        cfg.vision,
        pix,
        batch["window_index"],
        batch["inv_window_index"],
        batch["seg_win"],
        batch["seg_full"],
        batch["hpos"],
        batch["wpos"],
        remat=remat,
        pack_index=batch.get("pack_index"),
    )
    if freeze:
        # `--freeze_vision_modules` (reference padt_sft_trainer.py:166-170) the
        # TPU way: cut the graph at the tower outputs so the whole ViT backward
        # is never built (vs. the reference's requires_grad_(False), which
        # zeroes grads after the fact). The prototype projection below stays
        # trainable — only "visual"-module params are frozen in the reference.
        merged, high_res, cos, sin = jax.lax.stop_gradient((merged, high_res, cos, sin))
    proto = image_prototypes(params, cfg, merged)
    return VisionArtifacts(
        merged=merged,
        proto=proto,
        high_res=high_res,
        pe_cos=cos,
        pe_sin=sin,
        num_merged=batch["num_merged"],
        num_patches=batch["num_patches"],
        grid_thw=batch["grid_thw"],
    )


def forward_train(
    params,
    cfg: PaDTConfig,
    batch: Dict[str, jnp.ndarray],
    logits_slice: Optional[Tuple[int, int]] = None,
    remat: bool = False,
    freeze_vision: bool = False,
    split_logits: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, VisionArtifacts]:
    """Teacher-forced forward (reference forward_main, padt.py:147-340).

    batch keys: pixel_patches, window_index, inv_window_index, seg_win, seg_full,
    hpos, wpos, num_merged, num_patches, grid_thw, input_ids (B,L),
    attention_mask (B,L), position_ids (3,B,L).

    logits_slice=(start, length): compute extended logits only for hidden
    positions [start, start+length) — the completion region — instead of the
    full sequence (the reference materializes full-sequence extended logits and
    slices after, `padt_sft_trainer.py:471`).

    Returns (logits (B, Lc, V+M) fp32, hidden (B, L, D), artifacts).
    """
    art = run_vision(params, cfg, batch, remat=remat, freeze=freeze_vision)
    embeds = extended_embed(params, cfg, batch["input_ids"], art.proto, art.merged)
    hidden, _ = language.text_forward(
        params["text"], cfg.text, embeds, batch["position_ids"],
        batch["attention_mask"].astype(bool), remat=remat,
    )
    h = hidden
    if logits_slice is not None:
        start, length = logits_slice
        h = jax.lax.dynamic_slice_in_dim(hidden, start, length, axis=1)
    if split_logits:
        logits = extended_logits_pair(params, cfg, h, art.proto, art.num_merged)
    else:
        logits = extended_logits(params, cfg, h, art.proto, art.num_merged)
    return logits, hidden, art


# ---------------------------------------------------------------------------
# Generation (prefill + fused while_loop decode)
# ---------------------------------------------------------------------------

def sample_token(
    logits: jnp.ndarray,  # (B, Vext)
    key,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jnp.ndarray:
    """Greedy or temperature/top-k/top-p sampling over one step's logits
    (reference HF sampling surface, `padt.py:618-800`). Shared by `generate`
    and the serve engine's decode loop."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k is not None and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p is not None and top_p < 1.0:
        # nucleus: drop tokens outside the smallest set with cum prob >= top_p
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p  # always keep the argmax
        threshold = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class GenerateOutput(NamedTuple):
    tokens: jnp.ndarray  # (B, T) int32 — generated tokens (pad after EOS)
    hidden: jnp.ndarray  # (B, T, D) — final-layer hidden that PRODUCED each token
    num_generated: jnp.ndarray  # (B,) int32 — tokens before (and incl.) EOS
    artifacts: VisionArtifacts


def generate(
    params,
    cfg: PaDTConfig,
    batch: Dict[str, jnp.ndarray],
    max_new_tokens: int,
    rope_deltas: jnp.ndarray,  # (B,) from mrope_index.get_rope_index
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[jax.Array] = None,
    eos_token_id: Optional[int] = None,
    kv_cache_dtype: str = "bf16",
    prefill_batch_chunk: Optional[int] = None,
) -> GenerateOutput:
    """Greedy/sampled generation. Everything device-resident; per-token cost is
    one fused decode step (the hot loop the reference runs through HF
    `_sample_vision_token`, one Python iteration + kwargs shuttling per token).

    kv_cache_dtype="int8": per-token int8 KV cache with dequant fused into the
    Pallas decode kernel (ops/kv_cache.py) — halves the dominant decode HBM
    stream at large batch. Capacity is rounded up to a 128 multiple (kernel
    lane alignment).

    prefill_batch_chunk: run each prefill layer over batch sub-chunks
    (language.prefill batch_chunk) — bounds the per-layer prefill activation
    transients so decode batches past 112 fit one chip (the decode pool is
    weight-stream-bound and keeps amortizing with B; prefill rows are
    independent, so the math is identical)."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    tcfg = cfg.text
    b, l = batch["input_ids"].shape
    capacity = l + max_new_tokens
    if kv_cache_dtype == "int8":
        capacity = -(-capacity // 128) * 128
    dtype = params["text"]["embed"].dtype

    if kv_cache_dtype not in ("bf16", "int8"):
        raise ValueError(f"unknown kv_cache_dtype {kv_cache_dtype!r}")
    art = run_vision(params, cfg, batch)
    embeds = extended_embed(params, cfg, batch["input_ids"], art.proto, art.merged)
    valid = batch["attention_mask"].astype(bool)
    # int8: quantized inside the prefill scan — the full bf16 cache stack
    # (2.7 GB at 3B/b96/C768) is never materialized (the b128 OOM blocker)
    hidden, cache = language.prefill(
        params["text"], tcfg, embeds, batch["position_ids"], valid, capacity,
        kv_dtype=kv_cache_dtype, batch_chunk=prefill_batch_chunk,
    )
    last_hidden = hidden[:, -1:, :]  # (B,1,D) — predicts the first new token

    if rng is None:
        rng = jax.random.PRNGKey(0)

    tokens_buf = jnp.full((b, max_new_tokens), cfg.pad_token_id, jnp.int32)
    hidden_buf = jnp.zeros((b, max_new_tokens, tcfg.hidden_size), dtype)
    finished = jnp.zeros((b,), bool)
    num_gen = jnp.zeros((b,), jnp.int32)

    def select_token(h, key):
        logits = extended_logits(params, cfg, h, art.proto, art.num_merged)[:, 0]  # (B, Vext)
        return sample_token(logits, key, do_sample, temperature, top_k, top_p)

    def cond(carry):
        step, finished, *_ = carry
        return (step < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        step, finished, num_gen, cur_hidden, cache, tokens_buf, hidden_buf, key = carry
        key, sub = jax.random.split(key)
        tok = select_token(cur_hidden, sub)
        tok = jnp.where(finished, cfg.pad_token_id, tok)
        tokens_buf = jax.lax.dynamic_update_slice_in_dim(tokens_buf, tok[:, None], step, axis=1)
        hidden_buf = jax.lax.dynamic_update_slice_in_dim(hidden_buf, cur_hidden, step, axis=1)
        num_gen = num_gen + (~finished).astype(jnp.int32)
        finished = finished | (tok == eos)
        # next-step embedding + positions
        emb = extended_embed(params, cfg, tok[:, None], art.proto)
        pos = (l + step + rope_deltas).astype(jnp.int32)  # (B,) text stream; all 3 equal
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, b, 1))
        new_hidden, cache = language.decode_step(params["text"], tcfg, emb, pos3, cache)
        return step + 1, finished, num_gen, new_hidden, cache, tokens_buf, hidden_buf, key

    carry = (jnp.asarray(0, jnp.int32), finished, num_gen, last_hidden, cache, tokens_buf, hidden_buf, rng)
    step, finished, num_gen, _, _, tokens_buf, hidden_buf, _ = jax.lax.while_loop(cond, body, carry)
    return GenerateOutput(tokens=tokens_buf, hidden=hidden_buf, num_generated=num_gen, artifacts=art)


# ---------------------------------------------------------------------------
# int8 weight-only quantization (serving)
# ---------------------------------------------------------------------------

_QUANT_LAYER_WEIGHTS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the LLM layer weights to per-channel int8 (inference only).

    Embeddings / lm head / vision / decoder stay bf16 (embed rows are gathered,
    the head is ~10% of weight traffic, vision is compute-bound). Halves decode
    weight traffic and frees ~2.4 GB HBM at 3B."""
    from ..ops.quant import quantize_weight

    layers = dict(params["text"]["layers"])
    for name in _QUANT_LAYER_WEIGHTS:
        w = layers.pop(name)  # (L, in, out)
        # sequential over layers: vmap would materialize an all-layer fp32
        # copy (~12 GB at 3B) and OOM during quantization
        qd = jax.jit(lambda w: jax.lax.map(quantize_weight, w))(w)
        layers[name + "_q"] = qd["q"]
        layers[name + "_s"] = qd["s"]
    out = dict(params)
    out["text"] = dict(params["text"], layers=layers)
    return out


def pack_inference_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse the LLM per-layer weight streams for serving: q|k|v -> one
    `qkv_w` (L, d, (H+2*Hkv)*hd) and gate|up -> one `gateup_w` (L, d, 2*ff).

    Decode is weight-bandwidth-bound (BASELINE.md round-4 decomposition:
    602 GB/s achieved on 7 separate streams/layer); fusing cuts that to 4
    larger contiguous streams. Mathematically exact: each output column of a
    matmul depends only on its own weight column (x @ concat(A, B) ==
    concat(x @ A, x @ B)); XLA's accumulation tiling can still differ at
    bf16, so parity is gated by greedy-token tests (tests/test_packed_params.py).

    Works on both the dense bf16 layout and the int8 `quantize_params` /
    `init_padt_params_quantized` layout (per-out-channel scales concat the
    same way). Inference-only: training, checkpoints, and converters keep the
    unfused HF-shaped names. Idempotent."""
    layers = dict(params["text"]["layers"])
    if "qkv_w" in layers or "qkv_w_q" in layers:
        return params
    cat = lambda names: jnp.concatenate([layers.pop(n) for n in names], axis=-1)
    if "q_w_q" in layers:
        layers["qkv_w_q"] = cat(("q_w_q", "k_w_q", "v_w_q"))
        layers["qkv_w_s"] = cat(("q_w_s", "k_w_s", "v_w_s"))
        layers["gateup_w_q"] = cat(("gate_w_q", "up_w_q"))
        layers["gateup_w_s"] = cat(("gate_w_s", "up_w_s"))
    else:
        layers["qkv_w"] = cat(("q_w", "k_w", "v_w"))
        layers["gateup_w"] = cat(("gate_w", "up_w"))
    layers["qkv_b"] = cat(("q_b", "k_b", "v_b"))
    out = dict(params)
    out["text"] = dict(params["text"], layers=layers)
    return out


# ---------------------------------------------------------------------------
# vl_decode glue: per-object VRT hidden groups -> perception decoder
# ---------------------------------------------------------------------------

def vl_decode(
    params,
    cfg: PaDTConfig,
    vrt_feats: jnp.ndarray,  # (N, K_max, D_llm) — parser-gathered VRT hidden states
    vrt_counts: jnp.ndarray,  # (N,)
    obj_valid: jnp.ndarray,  # (N,) bool
    obj_sample: jnp.ndarray,  # (N,) int32
    art: VisionArtifacts,
    canvas_hw: Optional[Tuple[int, int]] = None,
    compute_mask: bool = True,
):
    """Reference `vl_decode` (padt.py:342-412). The reference repeats each
    image's feats per object into a ragged cu_seqlens batch and runs a dummy
    decoder pass when there are no objects (ZeRO-3 sync); here objects index
    their sample's padded memory directly and padding objects are masked —
    under SPMD the decoder always executes with static shapes."""
    from .decoder import decoder_forward

    if canvas_hw is None:
        # static bucket: worst-case grid dims given the patch budget
        side = int(cfg.max_image_patches**0.5) + 1
        canvas_hw = (side, side)
    return decoder_forward(
        params["decoder"],
        cfg.decoder,
        vrt_feats,
        vrt_counts,
        obj_valid,
        obj_sample,
        art.proto,
        art.high_res,
        art.pe_cos,
        art.pe_sin,
        art.num_merged,
        art.num_patches,
        art.grid_thw,
        canvas_hw,
        compute_mask=compute_mask and cfg.decoder.use_mask_head,
    )
