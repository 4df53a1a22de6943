"""Packed inference weight layout (padt.pack_inference_params) parity.

The fused qkv_w / gateup_w streams must be interchangeable with the unfused
HF-shaped layout everywhere inference touches layer weights: generate
(prefill + int8-KV decode + logits), the serve engine's slot decode, and the
bf16 decode path. Greedy tokens must match exactly; hidden states to float
tolerance (the fused dot is mathematically identical, only accumulation
tiling can differ)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.models import padt as P
from padt_tpu.models.mrope_index import get_rope_index
from padt_tpu.models.vision_geom import vision_geometry

pytestmark = pytest.mark.smoke


def _tiny_batch(cfg, b=2, l=64, seed=0):
    rng = np.random.RandomState(seed)
    grid = (1, 8, 8)
    s = cfg.max_image_patches
    geom = vision_geometry([grid] * b, s)
    pix = rng.randn(b, s, cfg.vision.patch_input_dim).astype(np.float32)
    nm = grid[1] * grid[2] // 4
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    for i in range(b):
        seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + list(
            rng.randint(10, 100, size=3 + i)
        )
        ids[i, l - len(seq):] = seq
        am[i, l - len(seq):] = 1
    pos, deltas = get_rope_index(ids, am, np.array([grid] * b), cfg.image_token_id)
    batch = dict(
        pixel_patches=jnp.asarray(pix, jnp.bfloat16),
        window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index),
        seg_win=jnp.asarray(geom.seg_win), seg_full=jnp.asarray(geom.seg_full),
        hpos=jnp.asarray(geom.hpos), wpos=jnp.asarray(geom.wpos),
        num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches),
        grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
    )
    return batch, jnp.asarray(deltas)


def test_pack_layout():
    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    packed = P.pack_inference_params(params)
    lp, lu = packed["text"]["layers"], params["text"]["layers"]
    tcfg = cfg.text
    qd = tcfg.num_attention_heads * tcfg.head_dim
    kvd = tcfg.num_key_value_heads * tcfg.head_dim
    assert lp["qkv_w"].shape == (tcfg.num_hidden_layers, tcfg.hidden_size, qd + 2 * kvd)
    assert lp["gateup_w"].shape == (tcfg.num_hidden_layers, tcfg.hidden_size, 2 * tcfg.intermediate_size)
    np.testing.assert_array_equal(np.asarray(lp["qkv_w"][..., :qd]), np.asarray(lu["q_w"]))
    np.testing.assert_array_equal(np.asarray(lp["qkv_w"][..., qd + kvd:]), np.asarray(lu["v_w"]))
    np.testing.assert_array_equal(
        np.asarray(lp["gateup_w"][..., tcfg.intermediate_size:]), np.asarray(lu["up_w"])
    )
    for gone in ("q_w", "k_w", "v_w", "q_b", "k_b", "v_b", "gate_w", "up_w"):
        assert gone not in lp
    # untouched leaves are shared, idempotent repack is a no-op
    assert lp["o_w"] is lu["o_w"]
    assert P.pack_inference_params(packed) is packed


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_pack_generate_exact(kv_dtype):
    """Greedy generation token parity packed vs unfused (both KV cache paths)."""
    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    batch, deltas = _tiny_batch(cfg)
    out_u = P.generate(params, cfg, batch, 8, deltas, kv_cache_dtype=kv_dtype)
    out_p = P.generate(
        P.pack_inference_params(params), cfg, batch, 8, deltas, kv_cache_dtype=kv_dtype
    )
    np.testing.assert_array_equal(np.asarray(out_u.tokens), np.asarray(out_p.tokens))
    hu = np.asarray(out_u.hidden, np.float32)
    hp = np.asarray(out_p.hidden, np.float32)
    np.testing.assert_allclose(hu, hp, rtol=0, atol=0.05 * (np.abs(hu).max() + 1e-6))


def test_pack_int8_weights_layout_and_generate():
    """quantize_params -> pack: fused int8 weights + concat scales, generation runs
    and matches the unpacked-quantized greedy tokens."""
    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    q = P.quantize_params(params)
    pq = P.pack_inference_params(q)
    lq, lp = q["text"]["layers"], pq["text"]["layers"]
    tcfg = cfg.text
    qd = tcfg.num_attention_heads * tcfg.head_dim
    assert lp["qkv_w_q"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(lp["qkv_w_q"][..., :qd]), np.asarray(lq["q_w_q"]))
    np.testing.assert_array_equal(
        np.asarray(lp["gateup_w_s"][..., : tcfg.intermediate_size]), np.asarray(lq["gate_w_s"])
    )
    batch, deltas = _tiny_batch(cfg)
    out_u = P.generate(q, cfg, batch, 6, deltas, kv_cache_dtype="int8")
    out_p = P.generate(pq, cfg, batch, 6, deltas, kv_cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(out_u.tokens), np.asarray(out_p.tokens))


def test_pack_shardings_resolve():
    """param_shardings covers the packed names (8-device virtual mesh)."""
    from padt_tpu.parallel.mesh import make_mesh, param_shardings

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    packed = P.pack_inference_params(params)
    mesh = make_mesh()
    sh = param_shardings(packed, mesh)
    leaves = jax.tree.leaves(sh)
    assert len(leaves) == len(jax.tree.leaves(packed))
