"""Continuous-batching serve engine: per-request parity with `padt.generate`
under slot recycling, bookkeeping, and hidden-state collection.

The engine (padt_tpu/serve/engine.py) is the TPU-right version of the
reference's fixed-batch eval serving (`inference_coco.py:107`): finished slots
are refilled while the rest of the pool keeps decoding. Greedy decoding is
prefix-stable, so every request's engine output must match a standalone
`generate` run token-for-token regardless of what shared the pool with it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.models import padt as P
from padt_tpu.preprocess.vision_process import ProcessedImage
from padt_tpu.serve import Request, ServeEngine
from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
from padt_tpu.vrt.processor import VisionTextProcessor


def _setup(n_requests=5, seed=0):
    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(seed)
    prompts = ["detect the cat", "find a dog", "locate the car", "what is here", "segment it"]
    batches = []
    for i in range(n_requests):
        img = ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12))
        batches.append(proc.build_batch([prompts[i % len(prompts)]], [img], prompt_bucket=128))
    return cfg, params, batches


def _reference_tokens(cfg, params, batch, max_new):
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    out = P.generate(
        params, cfg, jb, max_new_tokens=max_new,
        rope_deltas=jnp.asarray(batch.rope_deltas), kv_cache_dtype="int8",
    )
    ng = int(out.num_generated[0])
    return np.asarray(out.tokens)[0, :ng], ng, np.asarray(out.hidden, np.float32)[0, :ng]


@pytest.mark.smoke
def test_engine_matches_generate_with_recycling():
    """5 requests with ragged budgets through a 3-slot pool (bucket 1, chunk 2):
    forces several insert->decode->harvest->refill cycles; every completion must
    equal its standalone generate() run."""
    cfg, params, batches = _setup()
    budgets = [4, 9, 3, 8, 6]
    max_new = 12

    prompt_len = batches[0].data["input_ids"].shape[1]
    eng = ServeEngine(
        params, cfg, n_slots=3, max_new_tokens=max_new, prompt_len=prompt_len,
        prefill_bucket=1, chunk_steps=2, collect_hidden=True, patch_bucket=128,
    )
    reqs = [
        Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=bud, uid=i)
        for i, (b, bud) in enumerate(zip(batches, budgets))
    ]
    results, stats = eng.run(reqs)
    assert stats.completions == len(reqs)
    by_uid = {c.uid: c for c in results}

    for i, (batch, budget) in enumerate(zip(batches, budgets)):
        ref_tok, ref_ng, ref_hid = _reference_tokens(cfg, params, batch, budget)
        c = by_uid[i]
        assert c.n_gen == ref_ng, f"req {i}: n_gen {c.n_gen} != {ref_ng}"
        np.testing.assert_array_equal(c.tokens, ref_tok, err_msg=f"req {i} tokens diverged")
        hid = np.asarray(c.hidden, np.float32)[: c.n_gen]
        np.testing.assert_allclose(hid, ref_hid, rtol=2e-2, atol=2e-2)

    # pool accounting: every generated token belongs to exactly one completion
    assert stats.generated_tokens == sum(c.n_gen for c in results)
    assert 0 < stats.slot_step_utilization <= 1.0

    # longest-first admission: identical per-request outputs in any order
    # (greedy is prefix-stable; slots are independent)
    results2, _ = eng.run(reqs, schedule="longest_first")
    by_uid2 = {c.uid: c for c in results2}
    for i in range(len(reqs)):
        np.testing.assert_array_equal(by_uid2[i].tokens, by_uid[i].tokens)


@pytest.mark.smoke
def test_run_stream_matches_run_batch():
    """InferenceEngine.run_stream (serve-engine backend incl. per-request
    artifacts -> vl_decode) vs run_batch on the same inputs: same completions
    and object geometry (int8-KV decode in the stream path is the serving
    default; on the tiny fp32 model greedy tokens match the bf16-cache path)."""
    from padt_tpu.eval.harness import InferenceEngine

    cfg, params, batches = _setup(n_requests=3, seed=11)
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    rng = np.random.RandomState(11)
    imgs = [ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12)) for _ in range(3)]
    prompts = ['find "a"', 'find "b"', 'find "c"']

    eng = InferenceEngine(params, cfg, proc, max_new_tokens=8, canvas_hw=(9, 9))
    ref = eng.run_batch(prompts, imgs, patch_bucket=128, prompt_bucket=128)
    got = eng.run_stream(
        prompts, imgs, n_slots=2, prefill_bucket=1, chunk_steps=3,
        prompt_bucket=128, patch_bucket=128,
    )
    assert [r.completion for r in got] == [r.completion for r in ref]
    for g, r in zip(got, ref):
        assert len(g.objects) == len(r.objects)
        for go, ro in zip(g.objects, r.objects):
            assert go.label == ro.label
            np.testing.assert_allclose(go.bbox_xywh_px, ro.bbox_xywh_px, atol=2)


@pytest.mark.smoke
def test_engine_sampling():
    """Sampled decoding: deterministic under a fixed seed, different across
    seeds (on a flat random-logit model), budget bookkeeping intact."""
    cfg, params, batches = _setup(n_requests=2, seed=3)
    prompt_len = batches[0].data["input_ids"].shape[1]

    def run(seed):
        eng = ServeEngine(
            params, cfg, n_slots=2, max_new_tokens=8, prompt_len=prompt_len,
            prefill_bucket=2, chunk_steps=4, patch_bucket=128,
            do_sample=True, temperature=1.3, top_k=50, seed=seed,
        )
        reqs = [
            Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=6, uid=i)
            for i, b in enumerate(batches)
        ]
        results, _ = run_res = eng.run(reqs)
        return {c.uid: c.tokens.tolist() for c in results}

    a1, a2, b1 = run(11), run(11), run(12)
    assert a1 == a2, "same seed must reproduce"
    assert a1 != b1, "different seeds should sample differently"
    assert all(len(v) <= 6 for v in a1.values())


@pytest.mark.smoke
def test_engine_bucket_padding_and_idle_slots():
    """Bucket 2 with 3 requests: the last refill pads with a budget-0 dummy,
    whose slot must come back free without emitting a completion."""
    cfg, params, batches = _setup(n_requests=3, seed=7)
    prompt_len = batches[0].data["input_ids"].shape[1]
    eng = ServeEngine(
        params, cfg, n_slots=4, max_new_tokens=8, prompt_len=prompt_len,
        prefill_bucket=2, chunk_steps=3, patch_bucket=128,
    )
    reqs = [
        Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=5, uid=i)
        for i, b in enumerate(batches)
    ]
    results, stats = eng.run(reqs)
    assert stats.completions == 3
    assert sorted(c.uid for c in results) == [0, 1, 2]
    for c in results:
        assert c.n_gen <= 5 and len(c.tokens) == c.n_gen


@pytest.mark.smoke
def test_engine_mixed_prompt_buckets():
    """Heterogeneous prompt buckets in ONE pool: requests built at prompt
    buckets 96 and 128 are admitted in shape-uniform buckets (per-shape
    prefill compiles, shared KV capacity/slots) and every completion still
    matches its standalone generate() run token-for-token."""
    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(21)
    batches = []
    for i in range(6):
        proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
        proc.prepare(cfg.text.vocab_size)
        img = ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12))
        pb = 96 if i % 2 == 0 else 128
        batches.append(proc.build_batch([f"find thing {i}"], [img], prompt_bucket=pb))
    budgets = [4, 7, 3, 6, 5, 8]

    eng = ServeEngine(
        params, cfg, n_slots=3, max_new_tokens=10, prompt_len=128,
        prefill_bucket=2, prefill_bucket_small=1, chunk_steps=2, patch_bucket=128,
        collect_hidden=True,
    )
    reqs = [
        Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=bud, uid=i)
        for i, (b, bud) in enumerate(zip(batches, budgets))
    ]
    results, stats = eng.run(reqs)
    assert stats.completions == len(reqs)
    by_uid = {c.uid: c for c in results}
    for i, (batch, budget) in enumerate(zip(batches, budgets)):
        ref_tok, ref_ng, _ = _reference_tokens(cfg, params, batch, budget)
        c = by_uid[i]
        assert c.n_gen == ref_ng, f"req {i}"
        np.testing.assert_array_equal(c.tokens, ref_tok, err_msg=f"req {i} tokens diverged")
    # token accounting: exactly the per-request generated counts, no more
    assert stats.generated_tokens == sum(by_uid[i].n_gen for i in range(6))
    assert stats.decode_steps > 0


@pytest.mark.smoke
def test_engine_speculative_matches_plain():
    """Speculative (prompt-lookup draft + K-token verify) must be
    token-identical to plain greedy decoding for EVERY request — drafts only
    change how many tokens verify per forward, never which tokens win."""
    cfg, params, batches = _setup(n_requests=4, seed=13)
    budgets = [6, 11, 4, 9]
    prompt_len = batches[0].data["input_ids"].shape[1]

    def run(spec):
        eng = ServeEngine(
            params, cfg, n_slots=2, max_new_tokens=12, prompt_len=prompt_len,
            prefill_bucket=1, chunk_steps=3, patch_bucket=128,
            collect_hidden=True, speculative=spec,
        )
        reqs = [
            Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=bud, uid=i)
            for i, (b, bud) in enumerate(zip(batches, budgets))
        ]
        results, stats = eng.run(reqs)
        return {c.uid: c for c in results}, stats

    plain, _ = run(0)
    spec, sstats = run(4)
    assert len(spec) == len(plain) == 4
    for i in range(4):
        assert spec[i].n_gen == plain[i].n_gen, f"req {i}"
        np.testing.assert_array_equal(spec[i].tokens, plain[i].tokens, err_msg=f"req {i}")
        hs = np.asarray(spec[i].hidden, np.float32)[: spec[i].n_gen]
        hp = np.asarray(plain[i].hidden, np.float32)[: plain[i].n_gen]
        np.testing.assert_allclose(hs, hp, rtol=2e-2, atol=2e-2)
    # token accounting under speculation: exactly the per-request counts
    assert sstats.generated_tokens == sum(spec[i].n_gen for i in range(4))


@pytest.mark.smoke
def test_run_stream_heterogeneous_auto_buckets():
    """run_stream with prompt_bucket=None rounds each request to its own
    128-multiple bucket (<=3 distinct); completions must still match
    run_batch on one max-size bucket."""
    from padt_tpu.eval.harness import InferenceEngine

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(3)
    imgs = [ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12)) for _ in range(4)]
    prompts = [
        "find x",
        "find the very long described object " + "word " * 30,
        "a",
        "find the dog near the tree",
    ]
    eng = InferenceEngine(params, cfg, proc, max_new_tokens=6, canvas_hw=(9, 9))
    got = eng.run_stream(prompts, imgs, n_slots=2, prefill_bucket=1, chunk_steps=3, patch_bucket=128)
    ref = eng.run_batch(prompts, imgs, patch_bucket=128, prompt_bucket=384)
    assert [r.completion for r in got] == [r.completion for r in ref]


@pytest.mark.smoke
def test_multi_engine_matches_single():
    """Data-parallel MultiEngine (one replica per device, LPT request
    balancing, interleaved dispatch) must produce token-identical completions
    to a single engine. Runs in a 2-virtual-CPU-device subprocess with the
    axon plugin stripped so it cannot touch (or hang on) the TPU tunnel."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = os.pathsep.join(
        [root] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p]
    )
    env = dict(
        os.environ,
        PYTHONPATH=pythonpath,
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tests", "_multi_engine_child.py")],
        env=env, cwd=root, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "MULTI_ENGINE_OK" in r.stdout, r.stdout[-2000:]


@pytest.mark.smoke
def test_prefix_cache_matches_full_prefill():
    """Prefix KV caching (SharedPrefix + suffix_ids) must produce the same
    completions as full-prompt prefill for every request. 6 requests over 2
    unique images through a small recycling pool: the first occurrence of each
    image pays one prefix prefill, every other request reuses the cached
    prefix KV and runs only its ~25-token suffix. Exercises pool-wide suffix
    passes over slots that are mid-decode (chunk 2, bucket 1)."""
    from padt_tpu.serve import SharedPrefix

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(5)
    imgs = [ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12)) for _ in range(2)]
    prompts = ["detect the cat", "find a dog", "locate it", "what is here", "segment it", "find a car"]
    img_of = [0, 0, 1, 0, 1, 1]  # reuse factor 3 per image
    budgets = [4, 9, 3, 8, 6, 5]

    # full-prompt requests (the parity baseline — itself generate()-parity-tested)
    full = [
        proc.build_batch([p], [imgs[img_of[i]]], prompt_bucket=128, patch_bucket=128)
        for i, p in enumerate(prompts)
    ]
    # prefix/suffix split of the SAME prompts
    pb = [proc.build_prefix_batch(imgs[j], prefix_bucket=96, patch_bucket=128) for j in range(2)]
    prefixes = [SharedPrefix(key=j, batch=pb[j].data, rope_delta=int(pb[j].rope_deltas[0])) for j in range(2)]
    suffixes = [np.asarray(proc.build_suffix_ids(p), np.int32) for p in prompts]

    # tokenization-boundary safety: prefix tokens + suffix tokens == full tokens
    for i in range(len(prompts)):
        fb = full[i].data
        real_full = fb["input_ids"][0][fb["attention_mask"][0].astype(bool)]
        pfb = prefixes[img_of[i]].batch
        real_pfx = pfb["input_ids"][0][pfb["attention_mask"][0].astype(bool)]
        np.testing.assert_array_equal(
            real_full, np.concatenate([real_pfx, suffixes[i]]),
            err_msg=f"req {i}: prefix+suffix tokenization diverged from full prompt",
        )
        assert 1 <= len(suffixes[i]) <= 32

    def make_engine():
        return ServeEngine(
            params, cfg, n_slots=3, max_new_tokens=12, prompt_len=128,
            prefill_bucket=2, prefill_bucket_small=1, chunk_steps=2,
            patch_bucket=128, collect_hidden=True,
        )

    eng_full = make_engine()
    res_full, _ = eng_full.run([
        Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=bud, uid=i)
        for i, (b, bud) in enumerate(zip(full, budgets))
    ])
    eng_pfx = make_engine()
    reqs_pfx = [
        Request(prefix=prefixes[img_of[i]], suffix_ids=suffixes[i],
                max_new_tokens=budgets[i], uid=i)
        for i in range(len(prompts))
    ]
    res_pfx, stats = eng_pfx.run(reqs_pfx)

    by_full = {c.uid: c for c in res_full}
    by_pfx = {c.uid: c for c in res_pfx}
    assert stats.completions == len(prompts)
    for i in range(len(prompts)):
        f, p = by_full[i], by_pfx[i]
        assert p.n_gen == f.n_gen, f"req {i}: n_gen {p.n_gen} != {f.n_gen}"
        np.testing.assert_array_equal(p.tokens, f.tokens, err_msg=f"req {i} tokens diverged")
        hf = np.asarray(f.hidden, np.float32)[: f.n_gen]
        hp = np.asarray(p.hidden, np.float32)[: p.n_gen]
        np.testing.assert_allclose(hp, hf, rtol=2e-2, atol=2e-2)

    # cache economics: 2 misses (one per unique image), 4 hits
    assert stats.prefix_misses == 2
    assert stats.prefix_hits == 4
    plen = int(np.sum(prefixes[0].batch["attention_mask"]))
    assert stats.prefill_tokens_saved == 4 * plen

    # cache persists across runs: a second pass over the same images is all hits
    res2, stats2 = eng_pfx.run(reqs_pfx)
    assert stats2.prefix_misses == 0 and stats2.prefix_hits == len(prompts)
    by2 = {c.uid: c for c in res2}
    for i in range(len(prompts)):
        np.testing.assert_array_equal(by2[i].tokens, by_pfx[i].tokens)


@pytest.mark.smoke
def test_run_stream_share_prefix_matches_run_batch():
    """run_stream(share_prefix=True) with several prompts per image object:
    same completions and object geometry as run_batch's full-prompt path, with
    the full parse -> vl_decode tail on prefix-cached hidden/artifacts."""
    from padt_tpu.eval.harness import InferenceEngine

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(17)
    uniq = [ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12)) for _ in range(2)]
    images = [uniq[0], uniq[0], uniq[1], uniq[0], uniq[1]]  # identity sharing
    prompts = ['find "a"', 'find "b"', 'find "c"', "what is it", "segment it"]

    eng = InferenceEngine(params, cfg, proc, max_new_tokens=8, canvas_hw=(9, 9))
    ref = eng.run_batch(prompts, images, patch_bucket=128, prompt_bucket=128)
    got = eng.run_stream(
        prompts, images, n_slots=2, prefill_bucket=1, chunk_steps=3,
        patch_bucket=128, share_prefix=True,
    )
    assert [r.completion for r in got] == [r.completion for r in ref]
    for g, r in zip(got, ref):
        assert len(g.objects) == len(r.objects)
        for go, ro in zip(g.objects, r.objects):
            assert go.label == ro.label
            np.testing.assert_allclose(go.bbox_xywh_px, ro.bbox_xywh_px, atol=2)


@pytest.mark.smoke
def test_suffix_pass_never_touches_other_slots_kv():
    """Pool-wide suffix prefill vs a NEAR-CAPACITY live slot: the clamped
    store position of non-participant slots (store_pos = min(write_pos,
    cap-32)) lands ON live rows when capacity slack < 32 — those slots must
    not have a single KV byte physically written (n_store_rows masking in
    store_kv_rows_k_all_layers), or they silently decode against garbage.

    Construction: prompt_len=96, max_new=32 -> capacity 128, cap-32 = 96;
    slot A decodes past row 96 before a prefix admission triggers the pass."""
    from collections import deque

    from padt_tpu.serve import SharedPrefix

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(11)
    img = ProcessedImage(rng.randn(32, 1176).astype(np.float32), (1, 4, 8))

    fa = proc.build_batch(["find the very sneaky cat"], [img], prompt_bucket=96, patch_bucket=128)
    reqA = Request(batch=fa.data, rope_delta=int(fa.rope_deltas[0]), max_new_tokens=32, uid=0)
    pb = proc.build_prefix_batch(img, prefix_bucket=64, patch_bucket=128)
    sfx = np.asarray(proc.build_suffix_ids("segment it"), np.int32)
    reqB = Request(
        prefix=SharedPrefix(key=7, batch=pb.data, rope_delta=int(pb.rope_deltas[0])),
        suffix_ids=sfx, max_new_tokens=8, uid=1,
    )

    def make_engine():
        return ServeEngine(
            params, cfg, n_slots=2, max_new_tokens=32, prompt_len=96,
            prefill_bucket=1, prefill_bucket_small=1, chunk_steps=4,
            patch_bucket=128,
        )

    eng = make_engine()
    assert eng.capacity == 128  # the tight-slack configuration under test
    ctx = eng.start_run([reqA])
    eng._refill(ctx)  # A occupies a slot, write_pos = 96
    eng._dispatch_chunk(ctx)
    eng._sync_harvest(ctx)  # A decoded up to 4 tokens: write_pos in (96, 100]
    (slot_a,) = ctx.occupant.keys()
    wp = int(np.asarray(eng.state.write_pos)[slot_a])
    assert wp > 96, "test premise: slot A must be past the clamp boundary"
    snap = {
        k: np.asarray(getattr(eng.state, k))[:, slot_a, :, :wp].copy()
        for k in ("k8", "v8", "ks", "vs")
    }

    eng._admit_prefix(ctx, deque([reqB]), 1)  # pool-wide suffix pass runs here
    for k, before in snap.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(eng.state, k))[:, slot_a, :, :wp], before,
            err_msg=f"{k}: live KV rows of a non-participant slot were rewritten",
        )

    # drive the run to completion: A's tokens must equal a solo-engine run
    while ctx.n_pending or ctx.occupant:
        eng._refill(ctx)
        if not ctx.occupant:
            break
        eng._dispatch_chunk(ctx)
        eng._sync_harvest(ctx)
    comps, _ = eng._finish_run(ctx)
    tok_a = {c.uid: c.tokens for c in comps}[0]

    solo = make_engine()
    ref, _ = solo.run([reqA])
    np.testing.assert_array_equal(tok_a, ref[0].tokens)


@pytest.mark.smoke
def test_engine_video_request_matches_generate():
    """A VIDEO request (grid t=2, per-frame fullatt segments, time-aligned
    M-RoPE via second_per_grid_t) through the slot pool, mixed with an image
    request: the engine is media-agnostic by design (it consumes prebuilt
    batches + rope deltas), and each completion must match its standalone
    generate() run token-for-token. Pins the contract that nothing in the
    pool path (prefill insert, rope_delta handling, artifact capture) assumes
    single-frame geometry. Reference: video inputs inherit the Qwen2.5-VL
    path (SURVEY §2.1 video row; mrope video branch parity in test_video.py)."""
    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(33)

    vid = ProcessedImage(
        rng.randn(2 * 4 * 8, 1176).astype(np.float32), (2, 4, 8),
        second_per_grid_t=1.0, is_video=True,
    )
    img = ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12))
    bv = proc.build_batch(["describe the clip"], [vid], prompt_bucket=128)
    bi = proc.build_batch(["find the cat"], [img], prompt_bucket=128)

    eng = ServeEngine(
        params, cfg, n_slots=2, max_new_tokens=8, prompt_len=128,
        prefill_bucket=1, chunk_steps=3, patch_bucket=128, collect_hidden=True,
    )
    reqs = [
        Request(batch=bv.data, rope_delta=int(bv.rope_deltas[0]), max_new_tokens=7, uid=0),
        Request(batch=bi.data, rope_delta=int(bi.rope_deltas[0]), max_new_tokens=5, uid=1),
    ]
    results, stats = eng.run(reqs)
    assert stats.completions == 2
    by_uid = {c.uid: c for c in results}
    for uid, (b, budget) in enumerate([(bv, 7), (bi, 5)]):
        ref_tok, ref_ng, ref_hid = _reference_tokens(cfg, params, b, budget)
        c = by_uid[uid]
        assert c.n_gen == ref_ng, f"req {uid}"
        np.testing.assert_array_equal(c.tokens, ref_tok, err_msg=f"req {uid} tokens diverged")
        hid = np.asarray(c.hidden, np.float32)[: c.n_gen]
        np.testing.assert_allclose(hid, ref_hid, rtol=2e-2, atol=2e-2)


@pytest.mark.smoke
def test_engine_expected_length_chunking():
    """EOS-aware chunk sizing (Request.expected_new_tokens + budget_blind).

    Regime: budgets are uninformative to the sizer (budget_blind — the
    real-weights serving shape, where every budget is max_new_tokens and EOS
    stops slots) and one long-tail request keeps chunks running. Blind
    max-size chunks strand early-finishing slots until the chunk boundary;
    expectation hints size chunks near the earliest expected finish, so those
    slots harvest + refill promptly: higher slot-step utilization, identical
    tokens."""
    cfg, params, batches = _setup()
    budgets = [14, 3, 3, 4, 3]  # device truth: stands in for early EOS
    max_new = 16
    prompt_len = batches[0].data["input_ids"].shape[1]

    def run(expected, blind):
        eng = ServeEngine(
            params, cfg, n_slots=3, max_new_tokens=max_new, prompt_len=prompt_len,
            prefill_bucket=1, chunk_steps=2, max_chunk_steps=16, patch_bucket=128,
            budget_blind=blind,
        )
        reqs = [
            Request(batch=b.data, rope_delta=int(b.rope_deltas[0]), max_new_tokens=bud,
                    uid=i, expected_new_tokens=(bud if expected else None))
            for i, (b, bud) in enumerate(zip(batches, budgets))
        ]
        results, stats = eng.run(reqs, schedule="longest_first")
        return {c.uid: c for c in results}, stats

    base, s_base = run(expected=False, blind=False)    # budget-aware (today)
    blind, s_blind = run(expected=False, blind=True)   # uninformative budgets
    hinted, s_hint = run(expected=True, blind=True)    # + expectation hints

    for i in range(len(budgets)):
        np.testing.assert_array_equal(blind[i].tokens, base[i].tokens)
        np.testing.assert_array_equal(hinted[i].tokens, base[i].tokens)
        assert hinted[i].n_gen == base[i].n_gen == budgets[i]

    assert s_hint.slot_step_utilization > s_blind.slot_step_utilization
    assert s_hint.decode_steps <= s_blind.decode_steps
    # and hints recover (at least) the budget-aware sizer's packing
    assert s_hint.slot_step_utilization >= s_base.slot_step_utilization - 1e-9


@pytest.mark.smoke
def test_engine_online_length_estimator():
    """Without explicit hints and with uninformative budgets, the sizer falls
    back to an online p90 of observed early-EOS lengths once >=8 uncensored
    completions landed. Outputs stay identical; late-run chunks shrink, so
    utilization beats hint-free blind chunking on a tail-heavy mix."""
    cfg, params, batches = _setup()
    # 12 short requests then one long tail admitted into a 3-slot pool;
    # by the time the tail runs, obs_lens has >=8 entries (p90 ~ 4)
    budgets = [3, 4, 3, 4, 3, 4, 3, 4, 3, 4, 3, 4, 14]
    max_new = 16
    prompt_len = batches[0].data["input_ids"].shape[1]

    def run(blind):
        eng = ServeEngine(
            params, cfg, n_slots=3, max_new_tokens=max_new, prompt_len=prompt_len,
            prefill_bucket=1, chunk_steps=2, max_chunk_steps=16, patch_bucket=128,
            budget_blind=blind,
        )
        reqs = [
            Request(batch=batches[i % len(batches)].data,
                    rope_delta=int(batches[i % len(batches)].rope_deltas[0]),
                    max_new_tokens=bud, uid=i)
            for i, bud in enumerate(budgets)
        ]
        return eng.run(reqs)  # fifo: tail admitted last, after stats built up

    res_base, s_base = run(blind=False)
    res_blind, s_blind = run(blind=True)
    by_base = {c.uid: c for c in res_base}
    for c in res_blind:
        np.testing.assert_array_equal(c.tokens, by_base[c.uid].tokens)
    assert s_blind.completions == len(budgets)
    # estimator-sized chunks while the tail drains: utilization within 15% of
    # the fully-informed budget-aware run (a hint-free blind run with all-max
    # chunks strands two slots for the tail's whole 14 steps)
    assert s_blind.slot_step_utilization >= 0.85 * s_base.slot_step_utilization
