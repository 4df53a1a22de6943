"""Model-variant coverage: untied embeddings (7B layout), prototype projection
off, mask head off — the config switches released checkpoints exercise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from padt_tpu.config import padt_tiny


def _batch(cfg, b=1, grid=(1, 8, 8), l=64):
    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    rng = np.random.RandomState(0)
    s = cfg.max_image_patches
    geom = vision_geometry([grid] * b, s)
    pix = rng.randn(b, s, cfg.vision.patch_input_dim).astype(np.float32)
    nm = grid[0] * grid[1] * grid[2] // 4
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + [7, 8, 9]
    for i in range(b):
        ids[i, l - len(seq):] = seq
        am[i, l - len(seq):] = 1
    pos, deltas = get_rope_index(ids, am, np.array([grid] * b), cfg.image_token_id)
    return dict(
        pixel_patches=jnp.asarray(pix), window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index), seg_win=jnp.asarray(geom.seg_win),
        seg_full=jnp.asarray(geom.seg_full), hpos=jnp.asarray(geom.hpos),
        wpos=jnp.asarray(geom.wpos), num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches), grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32), attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
    ), jnp.asarray(deltas)


def test_untied_embeddings_uses_lm_head():
    import dataclasses

    from padt_tpu.models import padt as P

    cfg = padt_tiny()
    cfg = cfg.replace(text=dataclasses.replace(cfg.text, tie_word_embeddings=False))
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    assert "lm_head" in params["text"]
    batch, deltas = _batch(cfg)
    logits, hidden, art = P.forward_train(params, cfg, batch)
    assert np.isfinite(np.asarray(logits[batch["attention_mask"].astype(bool)])).all()
    # logits must differ from the tied computation (different head weights)
    tied = jnp.einsum("bld,vd->blv", hidden, params["text"]["embed"])
    assert not np.allclose(np.asarray(tied), np.asarray(logits[..., : cfg.text.vocab_size]))


def test_prototype_projection_off():
    from padt_tpu.models import padt as P

    cfg = padt_tiny().replace(use_visual_prototype_projection=False)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    assert "proto" not in params
    batch, deltas = _batch(cfg)
    art = P.run_vision(params, cfg, batch)
    # prototypes ARE the merged embeds (padt.py:191 clone)
    np.testing.assert_array_equal(np.asarray(art.proto), np.asarray(art.merged))


def test_zero_init_prototypes_start_at_zero():
    """ZeroInitLayerNorm zero-inits weight AND bias, so prototypes are exactly
    0 at init (padt.py:134-139) — the warm-up rationale."""
    from padt_tpu.models import padt as P

    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch, _ = _batch(cfg)
    art = P.run_vision(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(art.proto), 0.0, atol=1e-6)


def test_mask_head_off():
    from padt_tpu.models import padt as P

    cfg = padt_tiny()
    import dataclasses

    cfg = cfg.replace(decoder=dataclasses.replace(cfg.decoder, use_mask_head=False))
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch, _ = _batch(cfg)
    art = P.run_vision(params, cfg, batch)
    feats = jnp.zeros((4, cfg.max_vrt_per_object, cfg.text.hidden_size))
    dec = P.vl_decode(
        params, cfg, feats, jnp.asarray([1, 1, 0, 0]), jnp.asarray([True, True, False, False]),
        jnp.asarray([0, 0, 0, 0]), art, canvas_hw=(8, 8),
    )
    assert dec.pred_boxes.shape == (4, 4)
    assert float(jnp.abs(dec.pred_mask).sum()) == 0.0  # empty canvas, no mask compute


def test_vision_chunking_equivalence():
    """Chunked vision (lax.map over batch chunks) == whole-batch execution."""
    from padt_tpu.models import padt as P

    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch, _ = _batch(cfg, b=4)
    ref = P.run_vision(params, cfg, batch)
    cfg2 = cfg.replace(vision_chunk_size=2)
    out = P.run_vision(params, cfg2, batch)
    np.testing.assert_allclose(np.asarray(ref.merged), np.asarray(out.merged), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.high_res), np.asarray(out.high_res), rtol=2e-5, atol=2e-5)


@pytest.mark.smoke
def test_mask_canvas_geometry():
    """Token p's 4x4 block lands at raster cell (p//W, p%W) with correct
    sub-pixel layout (reference masks_padded permute, padt_decoder.py:269-274)."""
    from padt_tpu.models.decoder import assemble_mask_canvas

    n, s = 2, 12
    logit = np.zeros((n, s, 4, 4), np.float32)
    # object 0 (W=4): token 5 -> cell (1, 1); put a distinctive sub-grid
    sub = np.arange(16, dtype=np.float32).reshape(4, 4)
    logit[0, 5] = sub
    # object 1 (W=3): token 7 -> cell (2, 1)
    logit[1, 7] = 2 * sub
    canvas = assemble_mask_canvas(
        jnp.asarray(logit), jnp.asarray([4, 3]), jnp.asarray([12, 9]),
        jnp.asarray([True, True]), canvas_hw=(4, 4),
    )
    c = np.asarray(canvas)
    assert c.shape == (2, 16, 16)
    np.testing.assert_array_equal(c[0, 4:8, 4:8], sub)
    assert c[0].sum() == sub.sum()  # nothing else set
    np.testing.assert_array_equal(c[1, 8:12, 4:8], 2 * sub)
    # object 1 token indices >= 9 are out of range (n_tokens=9): set one, expect dropped
    logit2 = logit.copy()
    logit2[1, 10] = 99.0
    canvas2 = assemble_mask_canvas(
        jnp.asarray(logit2), jnp.asarray([4, 3]), jnp.asarray([12, 9]),
        jnp.asarray([True, True]), canvas_hw=(4, 4),
    )
    assert float(np.abs(np.asarray(canvas2[1])).sum()) == float(np.abs(2 * sub).sum())
