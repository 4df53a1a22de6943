"""Vision tower numerical parity vs transformers Qwen2.5-VL on a tiny config.

The HF model is the substrate the reference monkey-patches (`padt.py:48-108`);
matching its stock forward on random weights validates patch embed, window
reorder, rope, segment attention, and the merger end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

TINY_VISION = dict(
    depth=4,
    hidden_size=64,
    intermediate_size=128,
    num_heads=4,
    in_channels=3,
    patch_size=14,
    temporal_patch_size=2,
    spatial_merge_size=2,
    out_hidden_size=96,
    window_size=112,
    fullatt_block_indexes=[1, 3],
)


@pytest.fixture(scope="module")
def hf_vision():
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLVisionConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    cfg = Qwen2_5_VLVisionConfig(**TINY_VISION)
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel(cfg)
    model.eval()
    return model


def _my_cfg():
    from padt_tpu.config import VisionConfig

    return VisionConfig(
        depth=4,
        hidden_size=64,
        intermediate_size=128,
        num_heads=4,
        out_hidden_size=96,
        fullatt_block_indexes=(1, 3),
    )


def _convert(hf_model, cfg):
    from padt_tpu.convert.hf_to_padt import convert_vision

    sd = {f"visual.{k}": v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_vision(sd, cfg)
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def test_window_index_matches_hf(hf_vision):
    import torch

    from padt_tpu.models.vision_geom import _single_image_geometry

    for t, h, w in [(1, 8, 12), (1, 16, 16), (1, 10, 22), (1, 8, 8)]:
        hf_idx, hf_cu = hf_vision.get_window_index(torch.tensor([[t, h, w]]))
        wi, win_id, hp, wp, _ = _single_image_geometry(t, h, w)
        np.testing.assert_array_equal(hf_idx.numpy(), wi)
        # segment boundaries == unique_consecutive(cu_window_seqlens)
        hf_cu = np.unique(np.asarray(hf_cu))
        seg_sizes = np.bincount(win_id) * 4
        seg_sizes = seg_sizes[seg_sizes > 0]  # empty pad windows contribute no tokens
        np.testing.assert_array_equal(np.cumsum(seg_sizes), hf_cu[1:])


def test_rot_pos_emb_matches_hf(hf_vision):
    import torch

    from padt_tpu.models.vision_geom import _single_image_geometry
    from padt_tpu.ops.rope import vision_rope_cos_sin

    t, h, w = 1, 8, 12
    rpe = hf_vision.rot_pos_emb(torch.tensor([[t, h, w]])).numpy()  # (S, hd/2) pre-window order
    emb = np.concatenate([rpe, rpe], axis=-1)
    wi, _, hp, wp, _ = _single_image_geometry(t, h, w)
    # permute HF (pre-window) to window order at group granularity
    emb_win = emb.reshape(-1, 4, emb.shape[-1])[wi].reshape(-1, emb.shape[-1])
    cos, sin = vision_rope_cos_sin(jnp.asarray(hp)[None], jnp.asarray(wp)[None], head_dim=16)
    np.testing.assert_allclose(np.cos(emb_win), np.asarray(cos[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.sin(emb_win), np.asarray(sin[0]), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grids", [[(1, 8, 12)], [(1, 8, 12), (1, 6, 8)]])
def test_vision_forward_matches_hf(hf_vision, grids):
    import torch

    from padt_tpu.models.vision import vision_forward
    from padt_tpu.models.vision_geom import vision_geometry

    cfg = _my_cfg()
    params = _convert(hf_vision, cfg)

    rng = np.random.RandomState(0)
    pixels = [rng.randn(t * h * w, cfg.patch_input_dim).astype(np.float32) for t, h, w in grids]

    # HF: packed varlen
    with torch.no_grad():
        hf_out = hf_vision(
            torch.from_numpy(np.concatenate(pixels)), torch.tensor(list(grids))
        ).numpy()

    # mine: per-sample padded batch
    s_max = 128
    geom = vision_geometry(grids, s_max)
    pix = np.zeros((len(grids), s_max, cfg.patch_input_dim), np.float32)
    for i, p in enumerate(pixels):
        pix[i, : p.shape[0]] = p
    merged, high_res, (cos, sin) = vision_forward(
        params,
        cfg,
        jnp.asarray(pix),
        jnp.asarray(geom.window_index),
        jnp.asarray(geom.inv_window_index),
        jnp.asarray(geom.seg_win),
        jnp.asarray(geom.seg_full),
        jnp.asarray(geom.hpos),
        jnp.asarray(geom.wpos),
        pack_index=None if geom.pack_index is None else jnp.asarray(geom.pack_index),
    )
    off = 0
    for i, (t, h, w) in enumerate(grids):
        nm = t * h * w // 4
        np.testing.assert_allclose(
            hf_out[off : off + nm], np.asarray(merged[i, :nm]), rtol=2e-4, atol=2e-4
        )
        off += nm


@pytest.mark.parametrize("grids", [[(1, 8, 12)], [(1, 8, 12), (1, 6, 8)], [(2, 8, 12)]])
def test_window_slot_layout_matches_packed(grids):
    """The 64-aligned window-SLOT layout (vision_geom window_slots) is a pure
    internal relayout: merged (raster), high_res + rope PE (packed window
    order) must match the packed layout bit-for-bit in fp32."""
    from padt_tpu.models.vision import vision_forward
    from padt_tpu.models.vision_geom import vision_geometry

    from padt_tpu.models.vision import init_vision_params

    cfg = _my_cfg()
    params = init_vision_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    s_max = 256
    rng = np.random.RandomState(1)
    pix = np.zeros((len(grids), s_max, cfg.patch_input_dim), np.float32)
    for i, (t, h, w) in enumerate(grids):
        pix[i, : t * h * w] = rng.randn(t * h * w, cfg.patch_input_dim)

    outs = {}
    for mode in (False, True):
        geom = vision_geometry(grids, s_max, window_slots=mode)
        assert (geom.pack_index is not None) == mode
        merged, high_res, (cos, sin) = vision_forward(
            params,
            cfg,
            jnp.asarray(pix),
            jnp.asarray(geom.window_index),
            jnp.asarray(geom.inv_window_index),
            jnp.asarray(geom.seg_win),
            jnp.asarray(geom.seg_full),
            jnp.asarray(geom.hpos),
            jnp.asarray(geom.wpos),
            pack_index=None if geom.pack_index is None else jnp.asarray(geom.pack_index),
        )
        outs[mode] = (np.asarray(merged), np.asarray(high_res), np.asarray(cos), np.asarray(sin))

    for i, (t, h, w) in enumerate(grids):
        n, nm = t * h * w, t * h * w // 4
        for a, b_ in zip(outs[False], outs[True]):
            valid = nm if a.shape[1] == s_max // 4 else n
            np.testing.assert_allclose(
                a[i, :valid], b_[i, :valid], rtol=1e-6, atol=1e-6,
                err_msg=f"sample {i} grid {(t,h,w)}",
            )
