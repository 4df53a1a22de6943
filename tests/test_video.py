"""Video (t > 1) inputs: rope-index parity with transformers' video branch,
per-frame full-attention geometry, processing, and end-to-end generation.

The reference inherits video handling from Qwen2.5-VL (PaDT tasks are
image-only but the base VLM supports video); this rebuilds the same surface:
`process_video` framing (reference qwen_vl_utils), time-aligned M-RoPE t
stream (transformers Qwen2_5_VLModel.get_rope_index), per-frame fullatt
cu_seqlens (transformers Qwen2_5_VisionTransformer.forward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.models.mrope_index import get_rope_index
from padt_tpu.models.vision_geom import vision_geometry


@pytest.mark.smoke
def test_video_rope_index_matches_hf():
    """Our video t-stream vs transformers Qwen2.5-VL get_rope_index."""
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import Qwen2_5_VLModel

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
            rope_scaling=dict(type="mrope", mrope_section=[2, 3, 3]),
        ),
        vision_config=dict(
            depth=1, hidden_size=32, intermediate_size=64, num_heads=2,
            out_hidden_size=64,
        ),
        image_token_id=500, video_token_id=501, vision_start_token_id=499,
    )
    model = Qwen2_5_VLModel(cfg)

    t, h, w = 3, 4, 6  # 3 temporal grid steps
    n_vid = t * (h // 2) * (w // 2)
    ids = [1, 2, 499, *([501] * n_vid), 7, 8, 9]
    L = len(ids) + 3  # left padding
    input_ids = np.full((1, L), 0, np.int64)
    am = np.zeros((1, L), np.int64)
    input_ids[0, 3:] = ids
    am[0, 3:] = 1
    spg = 1.5  # seconds per temporal grid step

    hf_pos, hf_delta = model.get_rope_index(
        torch.tensor(input_ids),
        image_grid_thw=None,
        video_grid_thw=torch.tensor([[t, h, w]]),
        second_per_grid_ts=torch.tensor([spg]),
        attention_mask=torch.tensor(am),
    )
    pos, delta = get_rope_index(
        input_ids, am, np.array([[t, h, w]]), image_token_id=500,
        video_token_id=501, second_per_grid_ts=[spg],
        tokens_per_second=cfg.vision_config.tokens_per_second,
    )
    valid = am[0].astype(bool)
    np.testing.assert_array_equal(pos[:, 0, valid], hf_pos.numpy()[:, 0, valid])
    assert int(delta[0]) == int(hf_delta.numpy()[0, 0])


@pytest.mark.smoke
def test_video_geometry_per_frame_segments():
    """t=2: full-attention segments split per frame; window ids never cross
    frames; window order keeps frames contiguous."""
    t, h, w = 2, 8, 12
    n = t * h * w
    geom = vision_geometry([(t, h, w)], max_patches=256, window_slots=False)
    sf = geom.seg_full[0, :n]
    # per-frame spans
    np.testing.assert_array_equal(sf, np.repeat([0, 1], h * w))
    assert (geom.seg_full[0, n:] == -1).all()
    # windowed segments: tokens of one window share a frame
    sw = geom.seg_win[0, :n]
    frame_of_token = np.repeat([0, 1], h * w)
    for wid in np.unique(sw):
        assert len(np.unique(frame_of_token[sw == wid])) == 1
    # window gather covers each frame's merge groups exactly once
    wi = geom.window_index[0, : n // 4]
    assert sorted(wi.tolist()) == list(range(n // 4))
    gpf = (h // 2) * (w // 2)  # merge groups per frame
    assert (wi[:gpf] < gpf).all() and (wi[gpf:] >= gpf).all()


@pytest.mark.smoke
def test_process_video_framing():
    """3 frames at temporal_patch_size 2 -> t=2 grid (last frame repeated);
    second_per_grid_t = temporal/fps; patch rows match process_image on the
    duplicated frame pair."""
    from padt_tpu.preprocess.vision_process import process_video

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (56, 84, 3), np.uint8) for _ in range(3)]
    pv = process_video(frames, fps=2.0, min_pixels=1, max_pixels=10**9)
    t, h, w = pv.grid_thw
    assert (t, h, w) == (2, 4, 6)
    assert pv.is_video and pv.second_per_grid_t == 1.0  # 2 frames/grid / 2 fps
    assert pv.pixel_patches.shape == (t * h * w, 3 * 2 * 14 * 14)


@pytest.mark.smoke
def test_video_generate_end_to_end():
    """Tiny model: greedy generate over a 2-frame video batch runs, splices
    video embeds (positions differ from a same-shape image run)."""
    from padt_tpu.models import padt as P
    from padt_tpu.preprocess.vision_process import ProcessedImage
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=256)
    proc.prepare(cfg.text.vocab_size)
    rng = np.random.RandomState(0)
    vid = ProcessedImage(
        pixel_patches=rng.randn(192, 1176).astype(np.float32),
        grid_thw=(2, 8, 12), second_per_grid_t=1.0, is_video=True,
    )
    img = ProcessedImage(
        pixel_patches=vid.pixel_patches.copy(), grid_thw=(2, 8, 12),
    )
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    outs = {}
    for name, pimg in [("video", vid), ("image", img)]:
        batch = proc.build_batch(["what happens"], [pimg], prompt_bucket=128)
        ids = batch.data["input_ids"][0]
        want = cfg.video_token_id if name == "video" else cfg.image_token_id
        assert (ids == want).sum() == 48  # merged patches spliced
        jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
        out = P.generate(
            params, cfg, jb, max_new_tokens=4,
            rope_deltas=jnp.asarray(batch.rope_deltas),
        )
        assert np.isfinite(np.asarray(out.hidden, np.float32)).all()
        outs[name] = (np.asarray(batch.data["position_ids"]), np.asarray(out.tokens))
    # time-aligned t stream differs from the image t stream at t>1 + spg=1.0
    assert not np.array_equal(outs["video"][0], outs["image"][0])
