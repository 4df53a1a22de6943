"""Text decoder (M-RoPE Qwen2.5) parity vs transformers on a tiny config, plus
KV-cache decode-step consistency and get_rope_index parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

TINY = dict(
    vocab_size=512,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=96,
    rms_norm_eps=1e-6,
    rope_theta=1_000_000.0,
    max_position_embeddings=2048,
    tie_word_embeddings=True,
)
MROPE_SECTION = [2, 3, 3]  # head_dim 16 -> half 8


@pytest.fixture(scope="module")
def hf_text():
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLTextConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import Qwen2_5_VLTextModel

    cfg = Qwen2_5_VLTextConfig(
        **TINY, rope_scaling={"type": "mrope", "mrope_section": MROPE_SECTION}
    )
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = Qwen2_5_VLTextModel(cfg)
    model.eval()
    return model


def _my_cfg():
    from padt_tpu.config import TextConfig

    return TextConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=96,
        mrope_section=tuple(MROPE_SECTION),
    )


def _convert(hf_model):
    from padt_tpu.convert.hf_to_padt import convert_text, normalize_keys

    sd = {f"model.{k}": v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_text(sd, _my_cfg())
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def _random_positions(rng, b, l):
    # arbitrary (3, B, L) position ids exercising divergent t/h/w streams
    base = rng.randint(0, 50, size=(1, b, 1))
    offs = rng.randint(0, 5, size=(3, b, l))
    return np.cumsum(offs, axis=-1) + base


def test_text_forward_matches_hf(hf_text):
    import torch

    from padt_tpu.models.language import text_forward

    params = _convert(hf_text)
    cfg = _my_cfg()
    rng = np.random.RandomState(0)
    b, l = 2, 12
    ids = rng.randint(0, 512, size=(b, l))
    pos = _random_positions(rng, b, l)
    mask = np.ones((b, l), np.int64)
    mask[1, :3] = 0  # left padding

    with torch.no_grad():
        hf_out = hf_text(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            position_ids=torch.from_numpy(pos),
        ).last_hidden_state.numpy()

    embeds = np.asarray(params["embed"])[ids]
    hidden, _ = text_forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(pos), jnp.asarray(mask, bool)
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(hf_out[valid], np.asarray(hidden)[valid], rtol=3e-4, atol=3e-4)


def test_decode_step_consistency(hf_text):
    """prefill + N decode steps == full forward over the concatenated sequence."""
    from padt_tpu.models.language import decode_step, prefill, text_forward

    params = _convert(hf_text)
    cfg = _my_cfg()
    rng = np.random.RandomState(1)
    b, lp, n_steps = 2, 8, 4
    l = lp + n_steps
    ids = rng.randint(0, 512, size=(b, l))
    mask = np.ones((b, l), np.int64)
    mask[0, :2] = 0
    pos = _random_positions(rng, b, l)
    embeds = np.asarray(params["embed"])[ids]

    full_hidden, _ = text_forward(
        params, cfg, jnp.asarray(embeds), jnp.asarray(pos), jnp.asarray(mask, bool)
    )

    hid, cache = prefill(
        params,
        cfg,
        jnp.asarray(embeds[:, :lp]),
        jnp.asarray(pos[:, :, :lp]),
        jnp.asarray(mask[:, :lp], bool),
        capacity=l,
    )
    pre_valid = mask[:, :lp].astype(bool)  # pad rows are garbage by design
    np.testing.assert_allclose(
        np.asarray(full_hidden[:, :lp])[pre_valid], np.asarray(hid)[pre_valid], rtol=2e-5, atol=2e-5
    )
    for t in range(n_steps):
        hid, cache = decode_step(
            params,
            cfg,
            jnp.asarray(embeds[:, lp + t : lp + t + 1]),
            jnp.asarray(pos[:, :, lp + t : lp + t + 1]),
            cache,
        )
        np.testing.assert_allclose(
            np.asarray(full_hidden[:, lp + t]), np.asarray(hid[:, 0]), rtol=3e-4, atol=3e-4
        )


def test_get_rope_index_matches_hf():
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLTextConfig,
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import Qwen2_5_VLModel

    from padt_tpu.models.mrope_index import get_rope_index

    vis = dict(
        depth=1, hidden_size=16, intermediate_size=16, num_heads=2, out_hidden_size=32,
        fullatt_block_indexes=[0], spatial_merge_size=2,
    )
    cfg = Qwen2_5_VLConfig(
        text_config={**TINY, "rope_scaling": {"type": "mrope", "mrope_section": MROPE_SECTION}},
        vision_config=vis,
        image_token_id=500,
        video_token_id=501,
        vision_start_token_id=502,
    )
    cfg._attn_implementation = "sdpa"
    model = Qwen2_5_VLModel(cfg)

    b, l = 2, 32
    grids = np.array([[1, 4, 6], [1, 4, 4]])
    ids = np.full((b, l), 7, np.int64)
    mask = np.ones((b, l), np.int64)
    for i in range(b):
        n = grids[i].prod() // 4
        seq = [502] + [500] * n + list(range(10, 18))
        pad = l - len(seq)
        ids[i, pad:] = seq
        ids[i, :pad] = 3
        mask[i, :pad] = 0

    hf_pos, hf_delta = model.get_rope_index(
        torch.from_numpy(ids), torch.from_numpy(grids), None, None, torch.from_numpy(mask)
    )
    pos, delta = get_rope_index(ids, mask, grids, image_token_id=500)
    valid = np.broadcast_to(mask.astype(bool)[None], (3, b, l))
    np.testing.assert_array_equal(hf_pos.numpy()[valid], pos[valid])
    np.testing.assert_array_equal(hf_delta.numpy().reshape(-1), delta)
