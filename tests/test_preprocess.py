"""Preprocessing parity vs HF Qwen2VLImageProcessor (the reference's processor
path, `padt_sft_trainer.py:177-180`)."""

import numpy as np
import pytest

from padt_tpu.preprocess.vision_process import (
    ProcessedImage,
    batch_images,
    process_image,
    smart_resize,
)


pytestmark = pytest.mark.smoke

def _pil_image(h, w, seed=0):
    import PIL.Image

    rng = np.random.RandomState(seed)
    return PIL.Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))


@pytest.mark.parametrize("hw", [(100, 200), (640, 480), (28, 28), (333, 517)])
def test_smart_resize_matches_hf(hw):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import smart_resize as hf_smart_resize

    h, w = hw
    assert smart_resize(h, w) == hf_smart_resize(h, w, factor=28)


@pytest.mark.parametrize("hw", [(96, 132), (224, 224), (175, 340)])
def test_process_image_matches_hf(hw):
    from transformers import Qwen2VLImageProcessor

    img = _pil_image(*hw, seed=1)
    proc = Qwen2VLImageProcessor(max_pixels=12845056, min_pixels=3136)
    hf = proc(images=[img], return_tensors="np")
    mine = process_image(img, min_pixels=3136, max_pixels=12845056)

    assert tuple(hf["image_grid_thw"][0]) == mine.grid_thw
    np.testing.assert_allclose(hf["pixel_values"], mine.pixel_patches, rtol=2e-5, atol=2e-5)


def test_batch_images_padding():
    imgs = [
        ProcessedImage(np.ones((8, 6), np.float32), (1, 2, 4)),
        ProcessedImage(np.full((16, 6), 2.0, np.float32), (1, 4, 4)),
    ]
    pix, grids = batch_images(imgs, max_patches=64)
    assert pix.shape == (2, 64, 6)
    assert pix[0, :8].sum() == 48 and pix[0, 8:].sum() == 0
    assert grids.tolist() == [[1, 2, 4], [1, 4, 4]]
