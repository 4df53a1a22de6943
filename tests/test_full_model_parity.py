"""Full-model parity vs transformers Qwen2.5-VL (tiny random weights):
vision tower + image-pad splice + M-RoPE + LLM + logits, and greedy generation.

PaDT reduces to stock Qwen2.5-VL when no VRT token is consumed, so the stock HF
model is an end-to-end oracle for everything except the PaDT extras (covered by
their own tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

VOCAB = 512
IMAGE_TOKEN = 500
VIDEO_TOKEN = 501
VISION_START = 502


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            intermediate_size=96,
            rms_norm_eps=1e-6,
            rope_theta=1_000_000.0,
            max_position_embeddings=2048,
            tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        ),
        vision_config=dict(
            depth=2,
            hidden_size=32,
            intermediate_size=64,
            num_heads=2,
            out_hidden_size=64,
            fullatt_block_indexes=[1],
            spatial_merge_size=2,
        ),
        image_token_id=IMAGE_TOKEN,
        video_token_id=VIDEO_TOKEN,
        vision_start_token_id=VISION_START,
        tie_word_embeddings=True,
    )
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg)
    model.eval()
    return model


def _my_cfg():
    from padt_tpu.config import DecoderConfig, PaDTConfig, TextConfig, VisionConfig

    return PaDTConfig(
        vision=VisionConfig(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            out_hidden_size=64, fullatt_block_indexes=(1,),
        ),
        text=TextConfig(
            vocab_size=VOCAB, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=96, mrope_section=(2, 3, 3), tie_word_embeddings=True,
        ),
        decoder=DecoderConfig(hidden_size=32, intermediate_size=64, num_heads=2, llm_hidden_size=64),
        use_visual_prototype_projection=False,  # stock model has no prototyper
        image_token_id=IMAGE_TOKEN,
        video_token_id=VIDEO_TOKEN,
        vision_start_token_id=VISION_START,
        eos_token_id=VOCAB - 1,
        pad_token_id=VOCAB - 2,
        max_image_patches=128,
    )


def _convert(hf_model, cfg):
    from padt_tpu.convert.hf_to_padt import convert_checkpoint

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_checkpoint(sd, cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    # stock checkpoint: no decoder/proto — random-init decoder (unused here)
    from padt_tpu.models.decoder import init_decoder_params

    params["decoder"] = init_decoder_params(cfg.decoder, jax.random.PRNGKey(0), jnp.float32)
    return params


def _build_inputs(cfg, grids, text_lens, seed=0):
    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    rng = np.random.RandomState(seed)
    b = len(grids)
    s_max = cfg.max_image_patches
    geom = vision_geometry(grids, s_max)
    pix_list = [rng.randn(t * h * w, cfg.vision.patch_input_dim).astype(np.float32) * 0.5 for t, h, w in grids]
    pix = np.zeros((b, s_max, cfg.vision.patch_input_dim), np.float32)
    seqs = []
    for i, ((t, h, w), tl) in enumerate(zip(grids, text_lens)):
        pix[i, : t * h * w] = pix_list[i]
        nm = t * h * w // 4
        seqs.append([VISION_START] + [IMAGE_TOKEN] * nm + list(rng.randint(5, 400, tl)))
    l = max(len(s) for s in seqs)
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    for i, s in enumerate(seqs):
        ids[i, l - len(s):] = s
        am[i, l - len(s):] = 1
    pos, deltas = get_rope_index(ids, am, np.asarray(grids), IMAGE_TOKEN)
    batch = dict(
        pixel_patches=jnp.asarray(pix),
        window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index),
        seg_win=jnp.asarray(geom.seg_win),
        seg_full=jnp.asarray(geom.seg_full),
        hpos=jnp.asarray(geom.hpos),
        wpos=jnp.asarray(geom.wpos),
        num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches),
        grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
    )
    return batch, deltas, pix_list, ids, am


def test_forward_logits_match_hf(hf_model):
    import torch

    from padt_tpu.models import padt as P

    cfg = _my_cfg()
    params = _convert(hf_model, cfg)
    grids = [(1, 4, 6), (1, 4, 4)]
    batch, deltas, pix_list, ids, am = _build_inputs(cfg, grids, [7, 5])

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(am),
            pixel_values=torch.from_numpy(np.concatenate(pix_list)),
            image_grid_thw=torch.tensor(grids),
        ).logits.numpy()

    logits, hidden, art = P.forward_train(params, cfg, batch)
    mine = np.asarray(logits[:, :, :VOCAB])
    valid = am.astype(bool)
    np.testing.assert_allclose(hf_out[valid], mine[valid], rtol=4e-4, atol=4e-4)


def test_greedy_generation_matches_hf(hf_model):
    import torch

    from padt_tpu.models import padt as P

    cfg = _my_cfg()
    params = _convert(hf_model, cfg)
    grids = [(1, 4, 6), (1, 4, 4)]
    batch, deltas, pix_list, ids, am = _build_inputs(cfg, grids, [7, 5], seed=3)
    n_new = 8

    with torch.no_grad():
        hf_seq = hf_model.generate(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(am),
            pixel_values=torch.from_numpy(np.concatenate(pix_list)),
            image_grid_thw=torch.tensor(grids),
            max_new_tokens=n_new,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=cfg.pad_token_id,
        ).numpy()
    hf_new = hf_seq[:, ids.shape[1]:]

    out = P.generate(params, cfg, batch, n_new, jnp.asarray(deltas), eos_token_id=-1)
    np.testing.assert_array_equal(hf_new, np.asarray(out.tokens))
