"""VRT processor + parser tests, and the tiny end-to-end demo-path slice."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.preprocess.vision_process import ProcessedImage
from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
from padt_tpu.vrt.parser import pack_objects, parse_vrt_completions, gather_vrt_feats
from padt_tpu.vrt.processor import VisionTextProcessor


@pytest.fixture(scope="module")
def cfg():
    return padt_tiny()


@pytest.fixture(scope="module")
def processor(cfg):
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    return proc


def _fake_image(grid=(1, 8, 12), dim=1176, seed=0):
    rng = np.random.RandomState(seed)
    n = grid[0] * grid[1] * grid[2]
    return ProcessedImage(rng.randn(n, dim).astype(np.float32), grid)


@pytest.mark.smoke
def test_vrt_token_ids_are_local(processor, cfg):
    processor.ensure_vrt_tokens(24)
    ids = processor.encode(processor.pid2vrt([0, 5, 23]))
    v = cfg.text.vocab_size
    assert ids == [v + 0, v + 5, v + 23]
    # identity global/local mapping (per-sample prototype design)
    arr = np.array([[v + 3, 7]])
    np.testing.assert_array_equal(processor.assign_to_global_vrt_id(arr), arr)


@pytest.mark.smoke
def test_build_batch_shapes(processor, cfg):
    imgs = [_fake_image((1, 8, 12)), _fake_image((1, 6, 8), seed=1)]
    batch = processor.build_batch(["detect the cat", "detect the dog"], imgs)
    d = batch.data
    b, l = d["input_ids"].shape
    assert b == 2 and l % 32 == 0
    # image pad expansion: one <|image_pad|> id per merged patch
    for i, img in enumerate(imgs):
        assert (d["input_ids"][i] == cfg.image_token_id).sum() == img.num_merged_patches
    assert d["pixel_patches"].shape[1] == 128
    assert d["position_ids"].shape == (3, b, l)
    # left padding: first attended token is at the same index as first nonpad
    assert d["attention_mask"][0, -1] == 1


@pytest.mark.smoke
def test_build_batch_with_completions(processor, cfg):
    imgs = [_fake_image((1, 8, 12))]
    comp = 'The "cat" is ' + processor.pid2vrt([1, 2]) + "<|im_end|>"
    batch = processor.build_batch(["find"], imgs, completions=[comp])
    d = batch.data
    lp = batch.prompt_length
    assert d["completion_mask"][:, :lp].sum() == 0
    n_comp = d["completion_mask"][0].sum()
    ids = d["input_ids"][0, lp : lp + n_comp]
    v = cfg.text.vocab_size
    assert (ids >= v).sum() == 2  # the two VRT tokens survived round-trip


@pytest.mark.smoke
def test_parser_extracts_objects(processor, cfg):
    v = cfg.text.vocab_size
    text = 'There are 2 "car" (' + processor.pid2vrt([3, 4, 5]) + ", " + processor.pid2vrt([9]) + ').  And one "dog" ' + processor.pid2vrt([7, 8]) + ".<|im_end|>"
    ids = processor.encode(text)
    toks = processor.token_strings(ids)
    res = parse_vrt_completions([toks], np.array([ids]), v)
    objs = res.objects_per_sample[0]
    assert [o.patch_ids for o in objs] == [[3, 4, 5], [9], [7, 8]]
    assert [o.label for o in objs] == ["car", "car", "dog"]
    assert res.completions[0].startswith("There are 2")


@pytest.mark.smoke
def test_parser_thinking_mode(processor, cfg):
    # hand-built stream matching real-BPE granularity: '<','answer','>' triplets
    v = cfg.text.vocab_size
    toks = ["think", "...", "<", "answer", ">", ' "', "cat", '" ', "<|VRT_2|>", " ", "</", "answer", ">"]
    ids = [5] * len(toks)
    ids[8] = v + 2
    # need_thinking=True: only parse inside <answer> tags
    res = parse_vrt_completions([toks], np.array([ids]), v, need_thinking=[True])
    objs = res.objects_per_sample[0]
    assert len(objs) == 1 and objs[0].patch_ids == [2] and objs[0].label == "cat"
    # pre-answer VRTs must be ignored when thinking is required
    toks2 = ["<|VRT_1|>"] + toks
    ids2 = [v + 1] + ids
    res2 = parse_vrt_completions([toks2], np.array([ids2]), v, need_thinking=[True])
    assert len(res2.objects_per_sample[0]) == 1


@pytest.mark.smoke
def test_parser_eos_stops(processor, cfg):
    v = cfg.text.vocab_size
    ids = processor.encode('"a" <|im_end|>' + processor.pid2vrt([1]))
    toks = processor.token_strings(ids)
    res = parse_vrt_completions([toks], np.array([ids]), v)
    assert res.objects_per_sample[0] == []


@pytest.mark.smoke
def test_pack_and_gather(cfg):
    from padt_tpu.vrt.parser import ParsedObject

    objs = [
        ParsedObject(0, "a", "", positions=[2, 3], patch_ids=[0, 1]),
        ParsedObject(1, "b", "", positions=[5], patch_ids=[9]),
    ]
    obj_sample, pos, counts, valid = pack_objects(objs, max_objects=4, max_vrt_per_object=3)
    assert counts.tolist() == [2, 1, 0, 0]
    hidden = jnp.asarray(np.arange(2 * 8 * 4).reshape(2, 8, 4), jnp.float32)
    feats = gather_vrt_feats(hidden, obj_sample, pos)
    assert feats.shape == (4, 3, 4)
    np.testing.assert_array_equal(np.asarray(feats[0, 0]), np.asarray(hidden[0, 2]))
    np.testing.assert_array_equal(np.asarray(feats[1, 0]), np.asarray(hidden[1, 5]))


def test_end_to_end_tiny_demo(processor, cfg):
    """Minimum end-to-end slice (SURVEY.md §7.6): image + REC prompt ->
    generate -> parse -> vl_decode, random weights."""
    from padt_tpu.models import padt as P

    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    imgs = [_fake_image((1, 8, 12))]
    batch = processor.build_batch(['detect: "the car"'], imgs)
    jbatch = {k: jnp.asarray(v) for k, v in batch.data.items()}
    out = jax.jit(
        lambda p, b, d: P.generate(p, cfg, b, max_new_tokens=8, rope_deltas=d)
    )(params, jbatch, jnp.asarray(batch.rope_deltas))
    assert out.tokens.shape == (1, 8)

    toks = processor.token_strings(np.asarray(out.tokens[0]))
    res = parse_vrt_completions([toks], np.asarray(out.tokens), cfg.text.vocab_size)
    # random weights may or may not emit VRTs; force one object for the decoder path
    from padt_tpu.vrt.parser import ParsedObject

    objs = res.all_objects or [ParsedObject(0, "x", "", [0, 1], [0, 1])]
    obj_sample, pos, counts, valid = pack_objects(objs, cfg.max_objects, cfg.max_vrt_per_object)
    feats = gather_vrt_feats(out.hidden, jnp.asarray(obj_sample), jnp.asarray(pos))
    dec = P.vl_decode(
        params, cfg, feats, jnp.asarray(counts), jnp.asarray(valid), jnp.asarray(obj_sample),
        out.artifacts, canvas_hw=(8, 12),
    )
    assert dec.pred_boxes.shape == (cfg.max_objects, 4)
    assert bool(jnp.isfinite(dec.pred_boxes).all())
    assert dec.pred_mask.shape == (cfg.max_objects, 32, 48)


def test_sampling_modes(processor, cfg):
    """do_sample with temperature/top_k/top_p produces valid tokens and
    respects top_k=1 == greedy."""
    import jax
    import jax.numpy as jnp
    from padt_tpu.models import padt as P

    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    imgs = [_fake_image((1, 8, 12))]
    batch = processor.build_batch(["x"], imgs)
    jbatch = {k: jnp.asarray(v) for k, v in batch.data.items()}
    d = jnp.asarray(batch.rope_deltas)
    greedy = P.generate(params, cfg, jbatch, 6, d)
    topk1 = P.generate(
        params, cfg, jbatch, 6, d, do_sample=True, top_k=1, rng=jax.random.PRNGKey(7)
    )
    np.testing.assert_array_equal(np.asarray(greedy.tokens), np.asarray(topk1.tokens))
    samp = P.generate(
        params, cfg, jbatch, 6, d, do_sample=True, temperature=1.5, top_p=0.9,
        rng=jax.random.PRNGKey(3),
    )
    toks = np.asarray(samp.tokens)
    assert ((toks >= 0) & (toks < cfg.text.vocab_size + jbatch["pixel_patches"].shape[1] // 4)).all()


def test_mixed_image_and_text_only_batch(processor, cfg):
    """Mixed image/text-only batches just work under SPMD static shapes — the
    reference needed an all-reduce image-presence sync + dummy vision forward
    (qwen2_5vl_monkey_patch.py:81-114)."""
    from padt_tpu.models import padt as P

    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch = processor.build_batch(["find the cat", "just text"], [_fake_image(), None])
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    logits, hidden, art = P.forward_train(params, cfg, jb)
    am = batch.data["attention_mask"].astype(bool)
    assert np.isfinite(np.asarray(logits)[am]).all()
    assert int(art.num_merged[1]) == 0
