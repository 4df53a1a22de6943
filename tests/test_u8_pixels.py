"""Compact uint8 pixel wire format: bitwise parity with the classic path.

Eval at dataset scale measured request UPLOAD (bucket-padded bf16
`pixel_patches`, ~5.4 MB/request at 644px) co-dominant with decode over the
host<->device link (BASELINE.md round-5). `process_image(u8_rows=True)` ships
the SAME patch rows as resized uint8 pixels without the temporal duplication
(4x fewer bytes); `models/padt.py::_expand_pixels_u8` re-creates the
normalized rows inside the vision jit via a per-channel 256-entry LUT built
with the host's exact numpy expression — so parity is bitwise BY CONSTRUCTION
(no float math on device), and every downstream consumer is untouched.

Reference behavior being preserved: the HF Qwen2VLImageProcessor row layout
(reference inherits it via `padt_sft_trainer.py:177-180`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.models import padt as P
from padt_tpu.preprocess.vision_process import (
    expand_u8_rows,
    process_image,
)
from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
from padt_tpu.vrt.processor import VisionTextProcessor

pytestmark = pytest.mark.smoke


def _pil_image(h, w, seed=0):
    import PIL.Image

    rng = np.random.RandomState(seed)
    return PIL.Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))


@pytest.mark.parametrize("hw", [(96, 132), (224, 224), (175, 340)])
def test_u8_rows_expand_bitwise_host(hw):
    """u8 rows + host oracle == the classic f32 rows, bit for bit."""
    img = _pil_image(*hw, seed=3)
    classic = process_image(img)
    compact = process_image(img, u8_rows=True)
    assert compact.grid_thw == classic.grid_thw
    assert compact.pixel_patches is None
    assert compact.pixel_patches_u8.dtype == np.uint8
    s, d8 = compact.pixel_patches_u8.shape
    assert (s, d8 * 2) == classic.pixel_patches.shape
    np.testing.assert_array_equal(
        expand_u8_rows(compact.pixel_patches_u8), classic.pixel_patches
    )


def test_device_expand_bitwise():
    """The in-jit LUT expansion == bf16-cast classic rows (incl. zero pad)."""
    imgs = [_pil_image(96, 132, seed=1), _pil_image(140, 112, seed=2)]
    classic = [process_image(i) for i in imgs]
    compact = [process_image(i, u8_rows=True) for i in imgs]
    s_max = 128
    u8 = np.zeros((2, s_max, 588), np.uint8)
    ref = np.zeros((2, s_max, 1176), np.float32)
    n = np.zeros(2, np.int32)
    for i, (c8, cf) in enumerate(zip(compact, classic)):
        n[i] = c8.num_patches
        u8[i, : n[i]] = c8.pixel_patches_u8
        ref[i, : n[i]] = cf.pixel_patches
    got = jax.jit(P._expand_pixels_u8)(jnp.asarray(u8), jnp.asarray(n))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref.astype(jnp.bfloat16), np.float32)
    )


def _proc(cfg, u8_pixels):
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(
        tok, cfg, seq_bucket=32, patch_bucket=128, u8_pixels=u8_pixels
    )
    proc.prepare(cfg.text.vocab_size)
    return proc


def test_build_batch_u8_key_and_fallback():
    """All-u8 batches ship `pixel_patches_u8`; mixed media falls back to one
    f32 `pixel_patches` leaf via the host oracle (identical values)."""
    cfg = padt_tiny()
    img = _pil_image(96, 132, seed=5)
    b8 = _proc(cfg, True).build_batch(["find it"], [img], prompt_bucket=128)
    bf = _proc(cfg, False).build_batch(["find it"], [img], prompt_bucket=128)
    assert "pixel_patches_u8" in b8.data and "pixel_patches" not in b8.data
    assert b8.data["pixel_patches_u8"].dtype == np.uint8
    # mixed: one u8 image + one classic ProcessedImage -> single f32 leaf
    pre = process_image(img, u8_rows=True)
    classic = process_image(img)
    bm = _proc(cfg, False).build_batch(
        ["find it", "find it"], [pre, classic], prompt_bucket=128
    )
    assert "pixel_patches" in bm.data and "pixel_patches_u8" not in bm.data
    np.testing.assert_array_equal(bm.data["pixel_patches"][0], bm.data["pixel_patches"][1])
    np.testing.assert_array_equal(bm.data["pixel_patches"][0], bf.data["pixel_patches"][0])
    # everything non-pixel is identical between the two wire formats
    for k in b8.data:
        if k.startswith("pixel_patches"):
            continue
        np.testing.assert_array_equal(b8.data[k], bf.data[k], err_msg=k)


@pytest.mark.parametrize("vision_chunk", [0, 2])
def test_generate_token_parity_u8(vision_chunk):
    """generate() on the u8 wire format == generate() on bf16-cast classic
    pixels, token for token (covers both the whole-batch and the lax.map
    chunked vision paths)."""
    cfg = padt_tiny().replace(vision_chunk_size=vision_chunk)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    imgs = [_pil_image(96, 132, seed=7), _pil_image(112, 112, seed=8)]
    prompts = ["detect the cat", "segment the dog"]
    b8 = _proc(cfg, True).build_batch(prompts, imgs, prompt_bucket=128, patch_bucket=128)
    bf = _proc(cfg, False).build_batch(prompts, imgs, prompt_bucket=128, patch_bucket=128)

    def run(data):
        jb = {
            k: jnp.asarray(v, jnp.bfloat16) if k == "pixel_patches" else jnp.asarray(v)
            for k, v in data.items()
        }
        out = P.generate(
            params, cfg, jb, max_new_tokens=8,
            rope_deltas=jnp.asarray(b8.rope_deltas), kv_cache_dtype="int8",
        )
        return np.asarray(out.tokens), np.asarray(out.num_generated)

    tok8, ng8 = run(b8.data)
    tokf, ngf = run(bf.data)
    np.testing.assert_array_equal(ng8, ngf)
    np.testing.assert_array_equal(tok8, tokf)
