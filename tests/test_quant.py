"""Int8 weight-only quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.ops.quant import int8_matmul, linear, quantize_weight

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.skipif(not ON_TPU, reason="Pallas kernel needs TPU")
def test_int8_matmul_close_to_dense():
    rng = np.random.RandomState(0)
    for m, k, n in [(32, 256, 512), (7, 128, 256), (100, 384, 128)]:
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n) * 0.1, jnp.bfloat16)
        qd = quantize_weight(w)
        ref = np.asarray(x @ (qd["q"].astype(jnp.float32) * qd["s"]).astype(jnp.bfloat16), np.float32)
        out = np.asarray(int8_matmul(x, qd["q"], qd["s"]), np.float32)
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(out - ref).max() / denom < 2e-2


@pytest.mark.skipif(not ON_TPU, reason="Pallas kernel needs TPU")
def test_quantized_generate_close():
    """Quantized tiny model: logits close to bf16, generation runs."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    qparams = P.quantize_params(params)
    assert "q_w_q" in qparams["text"]["layers"]
    assert qparams["text"]["layers"]["q_w_q"].dtype == jnp.int8

    rng = np.random.RandomState(0)
    b, grid, l = 1, (1, 8, 8), 64
    s = cfg.max_image_patches
    geom = vision_geometry([grid] * b, s)
    pix = rng.randn(b, s, cfg.vision.patch_input_dim).astype(np.float32)
    nm = grid[1] * grid[2] // 4
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + [7, 8, 9]
    ids[0, l - len(seq):] = seq
    am[0, l - len(seq):] = 1
    pos, deltas = get_rope_index(ids, am, np.array([grid]), cfg.image_token_id)
    batch = dict(
        pixel_patches=jnp.asarray(pix, jnp.bfloat16), window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index), seg_win=jnp.asarray(geom.seg_win),
        seg_full=jnp.asarray(geom.seg_full), hpos=jnp.asarray(geom.hpos),
        wpos=jnp.asarray(geom.wpos), num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches), grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32), attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
    )
    lf, _, _ = P.forward_train(params, cfg, batch)
    lq, _, _ = P.forward_train(qparams, cfg, batch)
    mask = am.astype(bool)
    a = np.asarray(lf)[mask]
    bq = np.asarray(lq)[mask]
    rel = np.abs(a - bq).max() / (np.abs(a).max() + 1e-6)
    assert rel < 0.12, rel  # int8 noise through 4 layers of a random tiny model

    out = P.generate(qparams, cfg, batch, 6, jnp.asarray(deltas))
    assert np.asarray(out.tokens).shape == (1, 6)
