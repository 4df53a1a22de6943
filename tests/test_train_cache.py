"""Frozen-vision feature caching (models/padt.py::vision_features +
PaDTTrainer cache_vision_features): exact loss/grad equivalence with the
full tower forward, trainer-loop parity, and the unfrozen-tower guard.

The reference recomputes the frozen ViT every step
(`padt_sft_trainer.py:166-170` only flips requires_grad); caching its outputs
is a TPU-native training-throughput lever (the tower is ~35% of the frozen
3B step, BASELINE.md) that must stay EXACTLY gradient-equivalent because
stop_gradient already cuts the graph at the cached tensors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.models import padt as P
from padt_tpu.train.train_step import LossConfig, padt_loss


def _tiny_batch():
    from bench_train import _build_batch

    cfg = padt_tiny().replace(max_image_patches=256)
    batch, canvas_hw = _build_batch(cfg, 2, (1, 16, 16), 96, 32)
    batch = {k: jnp.asarray(np.asarray(v), jnp.float32) if v.dtype == jnp.bfloat16 else v
             for k, v in batch.items()}
    return cfg, batch, canvas_hw, 96


def _cached_variant(params, cfg, batch, quant="none"):
    feats = jax.jit(lambda p, b: P.vision_features(p, cfg, b, quant=quant))(
        params, {k: batch[k] for k in P._VISION_BATCH_KEYS if k in batch}
    )
    out = {k: v for k, v in batch.items() if k not in P._VISION_ONLY_KEYS}
    out.update(feats)
    return out


@pytest.mark.smoke
def test_cached_vision_loss_and_grads_match():
    """padt_loss under freeze_vision: full tower forward vs cached vis_*
    batch — loss, metrics, and EVERY grad leaf match."""
    cfg, batch, canvas_hw, lp = _tiny_batch()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    lcfg = LossConfig(freeze_vision=True)

    def lossfn(p, b):
        return padt_loss(p, cfg, b, lp, canvas_hw, lcfg, jnp.asarray(False))

    (l_full, m_full), g_full = jax.value_and_grad(lossfn, has_aux=True)(params, batch)
    cached = _cached_variant(params, cfg, batch)
    (l_cash, m_cash), g_cash = jax.value_and_grad(lossfn, has_aux=True)(params, cached)

    np.testing.assert_allclose(float(l_full), float(l_cash), rtol=1e-6)
    for k in m_full:
        np.testing.assert_allclose(float(m_full[k]), float(m_cash[k]), rtol=1e-5, err_msg=k)
    flat_f = jax.tree_util.tree_leaves_with_path(g_full)
    flat_c = jax.tree_util.tree_leaves_with_path(g_cash)
    assert len(flat_f) == len(flat_c)
    for (path, gf), (_, gc) in zip(flat_f, flat_c):
        # tolerance: the standalone feature jit fuses differently than the
        # full loss graph, so f32 rounding of the tower outputs differs by
        # ~1 ulp; anything structural would be off by orders of magnitude
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gc), rtol=1e-3, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    # the frozen tower's grads are zero in BOTH paths (stop_gradient vs no graph)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(g_full["vision"]))


@pytest.mark.smoke
def test_cached_vision_int8_loss_and_grads_close():
    """int8 feature cache (vision_features(quant='int8')): per-row symmetric
    quantization of the stop_gradient tower outputs is a BOUNDED forward
    perturbation — this gates how bounded. Loss within 2% relative, every
    trainable grad leaf within 5% relative norm + cosine > 0.99 (structural
    breaks would be orders of magnitude off; pure rounding noise is ~1e-3).
    The b16-cached memory lever, VERDICT r4 #6 / BASELINE.md round-5."""
    cfg, batch, canvas_hw, lp = _tiny_batch()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    lcfg = LossConfig(freeze_vision=True)

    def lossfn(p, b):
        return padt_loss(p, cfg, b, lp, canvas_hw, lcfg, jnp.asarray(False))

    (l_ref, _), g_ref = jax.value_and_grad(lossfn, has_aux=True)(
        params, _cached_variant(params, cfg, batch)
    )
    q8 = _cached_variant(params, cfg, batch, quant="int8")
    assert q8["vis_merged_q"].dtype == jnp.int8
    assert q8["vis_high_res_q"].dtype == jnp.int8
    (l_q, _), g_q = jax.value_and_grad(lossfn, has_aux=True)(params, q8)

    np.testing.assert_allclose(float(l_ref), float(l_q), rtol=2e-2)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_q = jax.tree_util.tree_leaves_with_path(g_q)
    assert len(flat_r) == len(flat_q)
    for (path, gr), (_, gq) in zip(flat_r, flat_q):
        nr = float(jnp.linalg.norm(gr.astype(jnp.float32)))
        nq = float(jnp.linalg.norm(gq.astype(jnp.float32)))
        name = jax.tree_util.keystr(path)
        if max(nr, nq) < 1e-8:
            # frozen leaves and numerically-zero bias grads (sums of
            # cancelling rows, norm ~1e-11): relative comparison meaningless
            continue
        assert abs(nq - nr) / nr < 5e-2, (name, nr, nq)
        cos = float(
            jnp.vdot(gr.astype(jnp.float32), gq.astype(jnp.float32)) / (nr * nq)
        )
        assert cos > 0.99, (name, cos)


@pytest.mark.smoke
def test_cached_vision_requires_freeze():
    cfg, batch, canvas_hw, lp = _tiny_batch()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    cached = _cached_variant(params, cfg, batch)
    with pytest.raises(ValueError, match="freeze_vision"):
        padt_loss(params, cfg, cached, lp, canvas_hw, LossConfig(freeze_vision=False),
                  jnp.asarray(False))

    from padt_tpu.train.trainer import TrainArgs, PaDTTrainer

    with pytest.raises(ValueError, match="freeze_vision_modules"):
        from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
        from padt_tpu.vrt.processor import VisionTextProcessor

        tok = make_tiny_tokenizer(cfg)
        proc = VisionTextProcessor(tok, cfg, seq_bucket=64, patch_bucket=cfg.max_image_patches)
        proc.prepare(cfg.text.vocab_size)
        PaDTTrainer(
            cfg, P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32),
            proc, TrainArgs(cache_vision_features=True, output_dir="/tmp/padt_cache_guard"),
            dataset=[],
        )


@pytest.mark.smoke
def test_trainer_cache_vision_matches_uncached(tmp_path):
    """Two 3-step trainer runs from identical params/seed (frozen vision,
    one with cache_vision_features): identical metric streams. The second
    epoch revisits every sample -> pure cache hits."""
    import json

    import PIL.Image

    from padt_tpu.eval import rle as rle_codec
    from padt_tpu.preprocess.datasets import process_coco
    from padt_tpu.train.data import load_jsonl_datasets
    from padt_tpu.train.trainer import PaDTTrainer, TrainArgs
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    h = w = 112
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(4):
        images.append({"id": i, "file_name": f"im{i}.jpg", "height": h, "width": w})
        PIL.Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(tmp_path / f"im{i}.jpg")
        m = np.zeros((h, w), np.uint8)
        m[20:70, 20:70] = 1
        r = rle_codec.encode(m)
        anns.append(
            {"id": 100 + i, "image_id": i, "category_id": 1, "bbox": [20, 20, 50, 50],
             "area": 2500, "iscrowd": 0,
             "segmentation": {"size": r["size"], "counts": r["counts"]}}
        )
    src = tmp_path / "instances.json"
    src.write_text(json.dumps(
        {"images": images, "categories": [{"id": 1, "name": "cat"}], "annotations": anns}
    ))
    out = tmp_path / "train.jsonl"
    process_coco(str(src), str(out))

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=64, patch_bucket=cfg.max_image_patches)
    proc.prepare(cfg.text.vocab_size)
    dataset = load_jsonl_datasets([str(out)], [str(tmp_path)])

    def run(cache: bool):
        args = TrainArgs(
            learning_rate=1e-4, per_device_train_batch_size=2, num_train_epochs=2.0,
            freeze_vision_modules=True, cache_vision_features=cache,
            use_mask_loss=True, save_steps=1000, warmup_steps=0,
            output_dir=str(tmp_path / f"out_{cache}"),
        )
        params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        tr = PaDTTrainer(cfg, params, proc, args, dataset)
        log = tr.train()
        if cache:
            assert len(tr._vis_cache) == len(dataset)  # one entry per sample
        return [m["loss"] for m in log if "loss" in m]

    ref = run(False)
    got = run(True)
    assert len(ref) == len(got) >= 3
    np.testing.assert_allclose(got, ref, rtol=1e-5)
