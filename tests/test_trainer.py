"""Trainer loop tests: sampler semantics, short train run with loss decrease,
checkpoint save/resume round trip."""

import json

import numpy as np
import pytest


@pytest.mark.smoke
def test_repeat_random_sampler_matches_reference_semantics():
    from padt_tpu.train.trainer import repeat_random_sampler

    # grad-accum interleave: chunk [a b c d] with ga=2 -> [a, c] then [b, d]
    idxs = list(repeat_random_sampler(8, 4, seed=0, gradient_accumulation_steps=2))
    assert len(idxs) == 8
    rng = np.random.RandomState(0)
    perm = rng.permutation(8).tolist()
    chunk0, chunk1 = perm[:4], perm[4:]
    expect = chunk0[0::2] + chunk0[1::2] + chunk1[0::2] + chunk1[1::2]
    assert idxs == expect


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    import PIL.Image

    import jax
    import jax.numpy as jnp

    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.preprocess.datasets import process_coco
    from padt_tpu.train.data import load_jsonl_datasets
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    tmp = tmp_path_factory.mktemp("train")
    # build a 4-image dataset
    from padt_tpu.eval import rle as rle_codec

    h, w = 112, 112
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(4):
        images.append({"id": i, "file_name": f"im{i}.jpg", "height": h, "width": w})
        PIL.Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(tmp / f"im{i}.jpg")
        m = np.zeros((h, w), np.uint8)
        m[20:70, 20:70] = 1
        r = rle_codec.encode(m)
        anns.append(
            {"id": 100 + i, "image_id": i, "category_id": 1, "bbox": [20, 20, 50, 50],
             "area": 2500, "iscrowd": 0, "segmentation": {"size": r["size"], "counts": r["counts"]}}
        )
    src = tmp / "instances.json"
    src.write_text(json.dumps({"images": images, "categories": [{"id": 1, "name": "cat"}], "annotations": anns}))
    out = tmp / "train.jsonl"
    process_coco(str(src), str(out))

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=64, patch_bucket=cfg.max_image_patches)
    proc.prepare(cfg.text.vocab_size)
    def make_params():
        # fresh params per test: PaDTTrainer takes ownership (buffer donation)
        return P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    dataset = load_jsonl_datasets([str(out)], [str(tmp)])
    return cfg, proc, make_params, dataset, tmp


def test_train_loop_and_resume(tiny_setup):
    from padt_tpu.train.trainer import PaDTTrainer, TrainArgs

    cfg, proc, make_params, dataset, tmp = tiny_setup
    params = make_params()
    args = TrainArgs(
        learning_rate=1e-4,
        per_device_train_batch_size=2,
        num_train_epochs=2.0,
        save_steps=2,
        use_mask_loss=True,
        output_dir=str(tmp / "out"),
        prompt_bucket=256,
        completion_bucket=64,
        patch_bucket=256,
        canvas_hw=(8, 8),
        seed=0,
    )
    trainer = PaDTTrainer(cfg, params, proc, args, dataset)
    log = trainer.train()
    assert trainer.global_step == 4  # 4 samples / batch 2 * 2 epochs
    losses = [m["loss"] for m in log]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # tiny model overfits 4 samples quickly

    # resume: fresh trainer picks up step + params
    import jax
    import jax.numpy as jnp
    from padt_tpu.models import padt as P

    params2 = P.init_padt_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    trainer2 = PaDTTrainer(cfg, params2, proc, args, dataset)
    assert trainer2.load_latest_checkpoint()
    assert trainer2.global_step == 4
    a = jax.tree.leaves(trainer.params)[0]
    b = jax.tree.leaves(trainer2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gradient_accumulation(tiny_setup):
    """ga=2 accumulates before the optimizer step and matches total step count."""
    from padt_tpu.train.trainer import PaDTTrainer, TrainArgs

    cfg, proc, make_params, dataset, tmp = tiny_setup
    params = make_params()
    args = TrainArgs(
        learning_rate=1e-4,
        per_device_train_batch_size=1,
        gradient_accumulation_steps=2,
        num_train_epochs=1.0,
        save_steps=100,
        output_dir=str(tmp / "out_ga"),
        prompt_bucket=256,
        completion_bucket=64,
        patch_bucket=256,
        canvas_hw=(8, 8),
        seed=0,
    )
    trainer = PaDTTrainer(cfg, params, proc, args, dataset)
    log = trainer.train()
    assert trainer.global_step == 2  # 4 samples / (1 micro x 2 accum)
    assert all(np.isfinite(m["loss"]) for m in log)


def test_in_training_eval(tiny_setup):
    """eval_strategy='steps': val metrics logged every eval_steps with eval_
    prefix; evaluate() is loss-only (params unchanged by an eval pass)."""
    import jax

    from padt_tpu.train.trainer import PaDTTrainer, TrainArgs

    cfg, proc, make_params, dataset, tmp = tiny_setup
    params = make_params()
    args = TrainArgs(
        learning_rate=1e-4,
        per_device_train_batch_size=1,
        num_train_epochs=1.0,
        save_steps=100,
        eval_strategy="steps",
        eval_steps=2,
        output_dir=str(tmp / "out_eval"),
        prompt_bucket=256,
        completion_bucket=64,
        patch_bucket=256,
        canvas_hw=(8, 8),
        seed=0,
    )
    trainer = PaDTTrainer(
        cfg, params, proc, args, dataset[:2], eval_dataset=dataset[2:]
    )
    before = np.asarray(jax.tree.leaves(trainer.params)[0]).copy()
    em = trainer.evaluate()
    assert np.isfinite(em["eval_loss"]) and "eval_sft_loss" in em
    np.testing.assert_array_equal(before, np.asarray(jax.tree.leaves(trainer.params)[0]))

    log = trainer.train()
    eval_entries = [m for m in log if "eval_loss" in m]
    assert len(eval_entries) == 1  # 2 train steps, eval at step 2
    assert eval_entries[0]["step"] == 2
    assert np.isfinite(eval_entries[0]["eval_loss"])
