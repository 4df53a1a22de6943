"""Int8 KV cache: quantizer bounds, Pallas kernel vs XLA oracle, and
end-to-end decode parity against the bf16 cache."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.ops import kv_cache as KV

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.smoke
def test_quantize_kv_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 7, 128) * rng.lognormal(size=(3, 5, 7, 1)), jnp.float32)
    q, s = KV.quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5, 7)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq - x))
    # symmetric per-token quant: error bounded by half a quantization step
    bound = np.asarray(s)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()


def _int8_inputs(b=2, hkv=2, g=8, hd=128, c=256, seed=3):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, hkv, g, hd), jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, c)), jnp.float32)
    valid = np.ones((b, c), bool)
    valid[0, :17] = False  # left padding
    valid[:, c // 2 :] = False  # unwritten tail
    return q, k8, ks, v8, vs, jnp.asarray(valid)


@pytest.mark.smoke
def test_int8_kernel_matches_xla_oracle():
    q, k8, ks, v8, vs, valid = _int8_inputs()
    ref = KV._decode_attention_int8_xla(q, k8, ks, v8, vs, valid)
    if ON_TPU:
        out = KV._decode_attention_int8_pallas(q, k8, ks, v8, vs, valid.astype(jnp.int32))
    else:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = KV._decode_attention_int8_pallas(q, k8, ks, v8, vs, valid.astype(jnp.int32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


@pytest.mark.smoke
def test_int8_decode_step_close_to_bf16():
    """One decode step over an int8-quantized cache stays within int8 noise of
    the bf16-cache step (hidden-state relative error)."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import language as L

    cfg = padt_tiny().text
    params = L.init_text_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(1)
    b, l, cap = 2, 24, 128
    embeds = jnp.asarray(rng.randn(b, l, cfg.hidden_size) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(l)[None, None], (3, b, l)).astype(jnp.int32)
    valid = np.ones((b, l), bool)
    valid[0, :5] = False
    hidden, cache = L.prefill(params, cfg, embeds, pos, jnp.asarray(valid), cap)
    qcache = L.quantize_cache(cache)

    step_emb = jnp.asarray(rng.randn(b, 1, cfg.hidden_size) * 0.1, jnp.float32)
    pos1 = jnp.full((3, b, 1), l, jnp.int32)
    h_bf16, cache2 = L.decode_step(params, cfg, step_emb, pos1, cache)
    h_int8, qcache2 = L.decode_step(params, cfg, step_emb, pos1, qcache)

    a, c = np.asarray(h_bf16, np.float32), np.asarray(h_int8, np.float32)
    rel = np.abs(a - c).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, f"int8 cache diverged: rel={rel}"
    # cache bookkeeping advanced identically
    assert int(qcache2.length) == int(cache2.length) == l + 1
    np.testing.assert_array_equal(np.asarray(qcache2.valid), np.asarray(cache2.valid))
    # the freshly written slot dequantizes back to the bf16 slot within a step
    k_new_bf16 = np.asarray(cache2.k[:, :, l], np.float32)  # (layers, B, Hkv, hd)
    k_new_int8 = (
        np.asarray(qcache2.k[:, :, :, l], np.float32)
        * np.asarray(qcache2.k_scale[:, :, :, l])[..., None]
    )
    np.testing.assert_allclose(k_new_int8, k_new_bf16.transpose(0, 1, 2, 3), atol=np.abs(k_new_bf16).max() / 100)


@pytest.mark.smoke
def test_store_kv_rows_matches_scatter():
    """In-place aliased row store (serve engine) vs the XLA scatter oracle:
    every slot's new row lands at its OWN position; everything else intact."""
    rng = np.random.RandomState(4)
    b, hkv, c, hd = 4, 2, 256, 128
    k8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, c)), jnp.float32)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    ksn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    vsn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    pos = jnp.asarray([3, 97, 160, 255], jnp.int32)  # incl. tile-boundary rows

    os.environ["PADT_PALLAS"] = "0"
    try:
        refs = KV.store_kv_rows(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    if ON_TPU:
        outs = KV.store_kv_rows(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos)
    else:
        from jax.experimental.pallas import tpu as pltpu

        os.environ["PADT_PALLAS"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                outs = KV.store_kv_rows(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos)
        finally:
            os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(outs, refs):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


@pytest.mark.skipif(not ON_TPU, reason="fused rope kernel needs TPU")
def test_rope_pair_packed_matches_xla_gqa():
    """The GQA fused rope pass (language.prefill fast path) vs the XLA
    rotation: q has more heads than k (grid steps beyond Hkv redundantly
    re-rotate the last k head; results must still be exact)."""
    from padt_tpu.ops.pallas_attention import rope_pair_packed
    from padt_tpu.ops.rope import apply_rotary

    rng = np.random.RandomState(5)
    b, l, h, hkv, hd = 2, 128, 4, 1, 128
    q = jnp.asarray(rng.randn(b, l, h * hd) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, l, hkv * hd) * 0.3, jnp.float32)
    inv = 1.0 / (10000 ** (np.arange(0, hd // 2) / (hd // 2)))
    ang = np.arange(l)[:, None] * inv[None, :]
    emb = np.concatenate([ang, ang], axis=-1)
    cos = jnp.asarray(np.broadcast_to(np.cos(emb), (b, l, hd)), jnp.float32)
    sin = jnp.asarray(np.broadcast_to(np.sin(emb), (b, l, hd)), jnp.float32)

    qr, kr = rope_pair_packed(q, k, cos, sin, h, hkv)
    q_ref = apply_rotary(q.reshape(b, l, h, hd), cos[:, :, None], sin[:, :, None]).reshape(b, l, h * hd)
    k_ref = apply_rotary(k.reshape(b, l, hkv, hd), cos[:, :, None], sin[:, :, None]).reshape(b, l, hkv * hd)
    np.testing.assert_allclose(np.asarray(qr), np.asarray(q_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), np.asarray(k_ref), atol=1e-5)


@pytest.mark.smoke
def test_rope_pair_packed_grad_matches_xla():
    """The rope custom VJP (same kernel, sin negated) vs autodiff through the
    XLA rotation — enables the fused rope on the TRAINING text stack
    (language.text_forward fast path). Nontrivial downstream weights so the
    q/k cotangents are not rotation-invariant. Runs natively on TPU and in
    interpret mode on CPU (smoke)."""
    import contextlib

    from padt_tpu.ops.pallas_attention import rope_pair_packed
    from padt_tpu.ops.rope import apply_rotary

    rng = np.random.RandomState(11)
    b, l, h, hkv, hd = 2, 128, 4, 1, 128
    q = jnp.asarray(rng.randn(b, l, h * hd) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, l, hkv * hd) * 0.3, jnp.float32)
    wq = jnp.asarray(rng.randn(b, l, h * hd) * 0.5, jnp.float32)
    wk = jnp.asarray(rng.randn(b, l, hkv * hd) * 0.5, jnp.float32)
    inv = 1.0 / (10000 ** (np.arange(0, hd // 2) / (hd // 2)))
    ang = np.arange(l)[:, None] * inv[None, :]
    emb = np.concatenate([ang, ang], axis=-1)
    cos = jnp.asarray(np.broadcast_to(np.cos(emb), (b, l, hd)), jnp.float32)
    sin = jnp.asarray(np.broadcast_to(np.sin(emb), (b, l, hd)), jnp.float32)

    def loss_pallas(q, k):
        qr, kr = rope_pair_packed(q, k, cos, sin, h, hkv)
        return jnp.sum(jnp.tanh(qr) * wq) + jnp.sum(jnp.tanh(kr) * wk)

    def loss_xla(q, k):
        qr = apply_rotary(q.reshape(b, l, h, hd), cos[:, :, None], sin[:, :, None])
        kr = apply_rotary(k.reshape(b, l, hkv, hd), cos[:, :, None], sin[:, :, None])
        return jnp.sum(jnp.tanh(qr.reshape(b, l, -1)) * wq) + jnp.sum(
            jnp.tanh(kr.reshape(b, l, -1)) * wk
        )

    if ON_TPU:
        ctx = contextlib.nullcontext()
    else:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        (lp, (dqp, dkp)) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(q, k)
    (lx, (dqx, dkx)) = jax.value_and_grad(loss_xla, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqp), np.asarray(dqx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dkp), np.asarray(dkx), atol=2e-5)


def test_int8_generate_runs_tiny():
    """Full generate() with kv_cache_dtype='int8' on the tiny model: correct
    shapes, finite outputs, EOS bookkeeping intact."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.preprocess.vision_process import ProcessedImage
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    rng = np.random.RandomState(0)
    img = ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12))
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch = proc.build_batch(["detect the cat"], [img])
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    out = P.generate(
        params, cfg, jb, max_new_tokens=6, rope_deltas=jnp.asarray(batch.rope_deltas),
        kv_cache_dtype="int8",
    )
    assert out.tokens.shape == (1, 6)
    assert np.isfinite(np.asarray(out.hidden, np.float32)).all()
    assert (np.asarray(out.tokens) >= 0).all()


def test_int8_generate_greedy_matches_bf16_full_generation():
    """Serving-default accuracy gate (int8 KV is bench/serve default): a FULL
    64-step greedy generation over the int8 cache must be token-for-token
    identical to the bf16-cache generation on the tiny parity model.

    Policy (BASELINE.md): int8 KV is safe for greedy serving — per-token
    quantization noise stays well below the logit margins of a trained model
    (and, per this gate, below even a random-weight model's margins over 64
    steps). Fall back to bf16 KV (PADT_BENCH_KV=bf16 / kv_cache_dtype='bf16')
    for logprob-sensitive uses: temperature sampling at T>~1, logit-level
    distillation, or eval protocols that score logprobs rather than tokens."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.preprocess.vision_process import ProcessedImage
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=64, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    rng = np.random.RandomState(5)
    imgs = [
        ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12)),
        ProcessedImage(rng.randn(64, 1176).astype(np.float32), (1, 8, 8)),
    ]
    params = P.init_padt_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    batch = proc.build_batch(["find the dog", "describe"], imgs)
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    deltas = jnp.asarray(batch.rope_deltas)
    n_steps = 64
    # eos disabled: every sequence must run the full 64 steps so the caches
    # diverge as much as they ever could
    ref = P.generate(params, cfg, jb, n_steps, deltas, eos_token_id=-1)
    out = P.generate(params, cfg, jb, n_steps, deltas, eos_token_id=-1, kv_cache_dtype="int8")
    tok_ref = np.asarray(ref.tokens)
    tok_int8 = np.asarray(out.tokens)
    mismatch = np.nonzero(tok_ref != tok_int8)
    assert tok_ref.shape == (2, n_steps)
    assert (tok_ref == tok_int8).all(), (
        f"int8 KV diverged from bf16 at positions {mismatch}: "
        f"{tok_ref[mismatch]} vs {tok_int8[mismatch]}"
    )
    # hidden states (the vl_decode input) stay within int8 noise too
    h_ref = np.asarray(ref.hidden, np.float32)
    h_int8 = np.asarray(out.hidden, np.float32)
    rel = np.abs(h_int8 - h_ref).max() / (np.abs(h_ref).max() + 1e-9)
    assert rel < 0.05, rel


def _interp():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


@pytest.mark.smoke
def test_store_kv_rows_k_matches_dynamic_slice():
    """K-row aliased store (speculative verify): straddling 32-row tile
    boundaries and last-tile positions must match per-sample dynamic slices."""
    import contextlib

    rng = np.random.RandomState(0)
    b, hkv, c, hd, kq = 4, 2, 128, 128, 5
    k8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.rand(b, hkv, c), jnp.float32)
    vs = jnp.asarray(rng.rand(b, hkv, c), jnp.float32)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, kq, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, kq, hd)), jnp.int8)
    ksn = jnp.asarray(rng.rand(b, hkv, kq), jnp.float32)
    vsn = jnp.asarray(rng.rand(b, hkv, kq), jnp.float32)
    # positions: in-tile, straddling, tile-start, last legal
    pos = jnp.asarray([3, 30, 64, c - kq], jnp.int32)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = KV.store_kv_rows_k(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out = KV.store_kv_rows_k(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for a, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


@pytest.mark.smoke
def test_decode_attention_int8_multi_matches_oracle():
    """K-query verify attention: per-query causal limits over the cache; the
    Pallas kernel must match the XLA formulation, and query i must equal a
    plain single-step call on a cache truncated at write_pos+i."""
    import contextlib

    rng = np.random.RandomState(1)
    b, hkv, g, hd, c, kq = 2, 2, 4, 128, 128, 4
    h = hkv * g
    q = jnp.asarray(rng.randn(b, kq, h, hd) * 0.3, jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.3, (b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.3, (b, hkv, c)), jnp.float32)
    wp = jnp.asarray([40, 70], jnp.int32)
    valid = np.zeros((b, c), bool)
    for i in range(b):
        valid[i, 2 : int(wp[i]) + kq] = True  # history + the K new rows
    valid = jnp.asarray(valid)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = KV.decode_attention_int8_multi(q, k8, ks, v8, vs, valid, wp)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out = KV.decode_attention_int8_multi(q, k8, ks, v8, vs, valid, wp)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )
    # cross-check vs the single-step path at each query position
    for i in range(kq):
        vi = np.asarray(valid).copy()
        for bi in range(b):
            vi[bi, int(wp[bi]) + i + 1 :] = False
        one = KV.decode_attention_int8(
            q[:, i : i + 1], k8, ks, v8, vs, jnp.asarray(vi)
        )
        np.testing.assert_allclose(
            np.asarray(out[:, i], np.float32), np.asarray(one[:, 0], np.float32),
            atol=2e-2, rtol=2e-2,
        )


def _stacked_int8_inputs(nl=3, b=2, hkv=2, g=8, hd=128, c=256, seed=7):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, 1, hkv * g, hd) * 0.3, jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, c)), jnp.float32)
    valid = np.ones((b, c), bool)
    valid[0, :11] = False
    valid[:, c // 2 :] = False
    return q, k8, ks, v8, vs, jnp.asarray(valid)


@pytest.mark.smoke
def test_stacked_decode_attention_matches_sliced():
    """Layer-indexed decode attention over the full (L, ...) cache stack must
    equal the plain kernel on the manually sliced layer, for every layer
    (scalar-prefetch index maps DMA only that layer's blocks)."""
    import contextlib

    q, k8, ks, v8, vs, valid = _stacked_int8_inputs()
    for li in range(k8.shape[0]):
        ref = KV._decode_attention_int8_xla(
            q.reshape(q.shape[0], k8.shape[2], -1, q.shape[-1]),
            k8[li], ks[li], v8[li], vs[li], valid,
        ).reshape(q.shape)
        os.environ["PADT_PALLAS"] = "1"
        try:
            ctx = contextlib.nullcontext() if ON_TPU else _interp()
            with ctx:
                out = KV.decode_attention_int8(
                    q, k8, ks, v8, vs, valid, layer=jnp.int32(li)
                )
        finally:
            os.environ["PADT_PALLAS"] = "auto"
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=f"layer {li}",
        )


@pytest.mark.smoke
def test_stacked_fresh_decode_attention_matches_store_then_attend():
    """The read-only-cache decode path (`fresh_kv=`): compositing the current
    token's K/V in-kernel over the PRE-update stack must equal storing the row
    first and attending over the updated cache (the carry-free decomposition
    `models/language.py::_decode_step_int8` relies on)."""
    import contextlib

    q, k8, ks, v8, vs, valid = _stacked_int8_inputs()
    nl, b, hkv, c, hd = k8.shape
    rng = np.random.RandomState(11)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    ksn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    vsn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    pos = c // 2  # first unwritten slot (valid excludes it)
    for li in (0, nl - 1):
        # oracle: write the row into layer li, then plain sliced attention
        k8_u = np.asarray(k8).copy(); k8_u[li, :, :, pos] = np.asarray(k8n)[:, :, 0]
        v8_u = np.asarray(v8).copy(); v8_u[li, :, :, pos] = np.asarray(v8n)[:, :, 0]
        ks_u = np.asarray(ks).copy(); ks_u[li, :, :, pos] = np.asarray(ksn)[:, :, 0]
        vs_u = np.asarray(vs).copy(); vs_u[li, :, :, pos] = np.asarray(vsn)[:, :, 0]
        valid_u = np.asarray(valid).copy(); valid_u[:, pos] = True
        ref = KV._decode_attention_int8_xla(
            q.reshape(b, hkv, -1, hd),
            jnp.asarray(k8_u[li]), jnp.asarray(ks_u[li]),
            jnp.asarray(v8_u[li]), jnp.asarray(vs_u[li]), jnp.asarray(valid_u),
        ).reshape(q.shape)
        # bb="1" covers the per-(b, hkv) kernel, bb="2" the batch-blocked one
        for pallas, bb in (("0", "1"), ("1", "1"), ("1", "2")):
            os.environ["PADT_PALLAS"] = pallas
            os.environ["PADT_DECODE_BB"] = bb
            try:
                ctx = contextlib.nullcontext() if (ON_TPU or pallas == "0") else _interp()
                with ctx:
                    out = KV.decode_attention_int8(
                        q, k8, ks, v8, vs, valid, layer=jnp.int32(li),
                        fresh_kv=(k8n, ksn, v8n, vsn),
                    )
            finally:
                os.environ["PADT_PALLAS"] = "auto"
                del os.environ["PADT_DECODE_BB"]
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=2e-2, rtol=2e-2, err_msg=f"layer {li} pallas={pallas} bb={bb}",
            )


@pytest.mark.smoke
def test_stacked_fresh_bb_multiprogram_matches_unblocked():
    """Batch-blocked fresh kernel with a real multi-program grid (B=8, bb=4 ->
    2 programs) must match the per-(b, hkv) kernel bit-for-bit-ish: same math,
    different grid/DMA decomposition."""
    import contextlib

    q, k8, ks, v8, vs, valid = _stacked_int8_inputs(b=8)
    nl, b, hkv, c, hd = k8.shape
    rng = np.random.RandomState(23)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    ksn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    vsn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    li = jnp.int32(1)
    outs = {}
    for bb in ("1", "4"):
        os.environ["PADT_PALLAS"] = "1"
        os.environ["PADT_DECODE_BB"] = bb
        try:
            ctx = contextlib.nullcontext() if ON_TPU else _interp()
            with ctx:
                outs[bb] = KV.decode_attention_int8(
                    q, k8, ks, v8, vs, valid, layer=li,
                    fresh_kv=(k8n, ksn, v8n, vsn),
                )
        finally:
            os.environ["PADT_PALLAS"] = "auto"
            del os.environ["PADT_DECODE_BB"]
    np.testing.assert_allclose(
        np.asarray(outs["4"], np.float32), np.asarray(outs["1"], np.float32),
        atol=1e-3, rtol=1e-3,
    )


@pytest.mark.smoke
def test_stacked_store_kv_rows_matches_sliced():
    """`store_kv_rows(..., layer=)` over the (L, ...) stack: rows land at each
    sample's own position inside layer `layer` ONLY; other layers untouched."""
    import contextlib

    rng = np.random.RandomState(13)
    nl, b, hkv, c, hd = 3, 4, 2, 256, 128
    k8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, c)), jnp.float32)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    ksn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    vsn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    pos = jnp.asarray([3, 97, 160, 255], jnp.int32)
    li = 1
    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = KV.store_kv_rows(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, layer=jnp.int32(li))
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out = KV.store_kv_rows(k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, layer=jnp.int32(li))
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    # sanity on the oracle itself: untouched layers identical to the input
    np.testing.assert_array_equal(np.asarray(ref[0][0]), np.asarray(k8[0]))
    np.testing.assert_array_equal(np.asarray(ref[0][2]), np.asarray(k8[2]))
    assert (np.asarray(ref[0][li]) != np.asarray(k8[li])).any()


@pytest.mark.smoke
def test_store_kv_rows_all_layers_matches_per_layer():
    """One-launch all-layer row store (the serve engine's post-scan write)
    vs layer-by-layer stores: identical caches, incl. tile-boundary rows."""
    import contextlib

    rng = np.random.RandomState(19)
    nl, b, hkv, c, hd = 3, 4, 2, 256, 128
    k8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, c)), jnp.float32)
    k8r = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, 1, hd)), jnp.int8)
    v8r = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, 1, hd)), jnp.int8)
    ksr = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, 1)), jnp.float32)
    vsr = jnp.asarray(rng.lognormal(-4, 0.5, (nl, b, hkv, 1)), jnp.float32)
    pos = jnp.asarray([3, 97, 160, 255], jnp.int32)

    os.environ["PADT_PALLAS"] = "0"
    try:
        rk8, rks, rv8, rvs = np.asarray(k8), np.asarray(ks), np.asarray(v8), np.asarray(vs)
        for li in range(nl):
            o = KV.store_kv_rows(
                jnp.asarray(rk8), jnp.asarray(rks), jnp.asarray(rv8), jnp.asarray(rvs),
                k8r[li], ksr[li], v8r[li], vsr[li], pos, layer=jnp.int32(li),
            )
            rk8, rks, rv8, rvs = map(np.asarray, o)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out = KV.store_kv_rows_all_layers(k8, ks, v8, vs, k8r, ksr, v8r, vsr, pos)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(out, (rk8, rks, rv8, rvs)):
        np.testing.assert_array_equal(np.asarray(o), r)
    # XLA fallback agrees too
    os.environ["PADT_PALLAS"] = "0"
    try:
        out2 = KV.store_kv_rows_all_layers(k8, ks, v8, vs, k8r, ksr, v8r, vsr, pos)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(out2, (rk8, rks, rv8, rvs)):
        np.testing.assert_array_equal(np.asarray(o), r)


@pytest.mark.smoke
def test_stacked_multi_and_k_store_match_sliced():
    """Speculative-verify stacked paths: `store_kv_rows_k(..., layer=)` and
    `decode_attention_int8_multi(..., layer=)` vs the sliced-layer oracles."""
    import contextlib

    rng = np.random.RandomState(17)
    nl, b, hkv, g, hd, c, kq = 3, 2, 2, 4, 128, 128, 4
    h = hkv * g
    li = 2
    k8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.3, (nl, b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.3, (nl, b, hkv, c)), jnp.float32)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, kq, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, kq, hd)), jnp.int8)
    ksn = jnp.asarray(rng.rand(b, hkv, kq), jnp.float32)
    vsn = jnp.asarray(rng.rand(b, hkv, kq), jnp.float32)
    pos = jnp.asarray([30, c - kq], jnp.int32)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref_store = KV.store_kv_rows_k(
            k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, layer=jnp.int32(li)
        )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out_store = KV.store_kv_rows_k(
                k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, layer=jnp.int32(li)
            )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(out_store, ref_store):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))

    q = jnp.asarray(rng.randn(b, kq, h, hd) * 0.3, jnp.bfloat16)
    valid = np.zeros((b, c), bool)
    for i in range(b):
        valid[i, 2 : int(pos[i]) + kq] = True
    valid = jnp.asarray(valid)
    k8u, ksu, v8u, vsu = ref_store
    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = KV.decode_attention_int8_multi(
            q, k8u[li], ksu[li], v8u[li], vsu[li], valid, pos
        )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out = KV.decode_attention_int8_multi(
                q, k8u, ksu, v8u, vsu, valid, pos, layer=jnp.int32(li)
            )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


@pytest.mark.smoke
def test_multi_fresh_matches_store_then_attend():
    """Speculative verify, read-only-cache decomposition: attention over the
    PRE-update stack with the K fresh rows composited in-kernel
    (`decode_attention_int8_multi(fresh_kv=)`) must match the store-then-
    attend oracle (rows stored, new positions validated, per-query causal
    limit). Also: `store_kv_rows_k_all_layers` == per-layer k-row stores."""
    import contextlib

    rng = np.random.RandomState(23)
    nl, b, hkv, g, hd, c, kq = 3, 4, 2, 4, 128, 256, 4
    h = hkv * g
    li = 1
    k8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.3, (nl, b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.3, (nl, b, hkv, c)), jnp.float32)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, kq, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, kq, hd)), jnp.int8)
    ksn = jnp.asarray(rng.rand(b, hkv, kq), jnp.float32)
    vsn = jnp.asarray(rng.rand(b, hkv, kq), jnp.float32)
    q = jnp.asarray(rng.randn(b, kq, h, hd) * 0.3, jnp.bfloat16)
    # tile-interior, tile-boundary straddle, and end-of-capacity positions
    pos = jnp.asarray([5, 30, 97, c - kq], jnp.int32)

    valid_pre = np.zeros((b, c), bool)
    for i in range(b):
        valid_pre[i, 2 : int(pos[i])] = True
    valid_pre = jnp.asarray(valid_pre)
    valid_post = np.asarray(valid_pre).copy()
    for i in range(b):
        valid_post[i, int(pos[i]) : int(pos[i]) + kq] = True
    valid_post = jnp.asarray(valid_post)

    os.environ["PADT_PALLAS"] = "0"
    try:
        stored = KV.store_kv_rows_k(
            k8, ks, v8, vs, k8n, ksn, v8n, vsn, pos, layer=jnp.int32(li)
        )
        k8u, ksu, v8u, vsu = stored
        ref = KV.decode_attention_int8_multi(
            q, k8u[li], ksu[li], v8u[li], vsu[li], valid_post, pos
        )
        out_xla = KV.decode_attention_int8_multi(
            q, k8, ks, v8, vs, valid_pre, pos, layer=jnp.int32(li),
            fresh_kv=(k8n, ksn, v8n, vsn),
        )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    np.testing.assert_allclose(
        np.asarray(out_xla, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )

    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out_pl = KV.decode_attention_int8_multi(
                q, k8, ks, v8, vs, valid_pre, pos, layer=jnp.int32(li),
                fresh_kv=(k8n, ksn, v8n, vsn),
            )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    np.testing.assert_allclose(
        np.asarray(out_pl, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )

    # all-layer k-row store vs per-layer stores (kernel + XLA fallback)
    k8rL = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, kq, hd)), jnp.int8)
    v8rL = jnp.asarray(rng.randint(-127, 128, (nl, b, hkv, kq, hd)), jnp.int8)
    ksrL = jnp.asarray(rng.rand(nl, b, hkv, kq), jnp.float32)
    vsrL = jnp.asarray(rng.rand(nl, b, hkv, kq), jnp.float32)
    os.environ["PADT_PALLAS"] = "0"
    try:
        rk8, rks, rv8, rvs = map(np.asarray, (k8, ks, v8, vs))
        for l_ in range(nl):
            o = KV.store_kv_rows_k(
                jnp.asarray(rk8), jnp.asarray(rks), jnp.asarray(rv8), jnp.asarray(rvs),
                k8rL[l_], ksrL[l_], v8rL[l_], vsrL[l_], pos, layer=jnp.int32(l_),
            )
            rk8, rks, rv8, rvs = map(np.asarray, o)
        out_fb = KV.store_kv_rows_k_all_layers(
            k8, ks, v8, vs, k8rL, ksrL, v8rL, vsrL, pos
        )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(out_fb, (rk8, rks, rv8, rvs)):
        np.testing.assert_array_equal(np.asarray(o), r)
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out_k = KV.store_kv_rows_k_all_layers(
                k8, ks, v8, vs, k8rL, ksrL, v8rL, vsrL, pos
            )
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    for o, r in zip(out_k, (rk8, rks, rv8, rvs)):
        np.testing.assert_array_equal(np.asarray(o), r)


@pytest.mark.smoke
def test_tiled_decode_kernel_matches_oracle():
    """Length-aware tiled decode kernel: partial live lengths (incl. tile
    boundaries and sub-tile lengths) must match the XLA oracle exactly —
    dead-capacity tiles are skipped without being read."""
    import contextlib

    rng = np.random.RandomState(9)
    b, hkv, g, hd, c = 4, 2, 8, 128, 1024
    q = jnp.asarray(rng.randn(b, 1, hkv * g, hd) * 0.3, jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (b, hkv, c, hd)), jnp.int8)
    ks = jnp.asarray(rng.lognormal(-4, 0.3, (b, hkv, c)), jnp.float32)
    vs = jnp.asarray(rng.lognormal(-4, 0.3, (b, hkv, c)), jnp.float32)
    n_valid = jnp.asarray([100, 256, 257, 1024], jnp.int32)  # sub-tile/edge/cross/full
    valid = np.zeros((b, c), bool)
    for i in range(b):
        valid[i, 3 : int(n_valid[i])] = True  # left padding + live region
    valid = jnp.asarray(valid)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = KV.decode_attention_int8(q, k8, ks, v8, vs, valid)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        ctx = contextlib.nullcontext() if ON_TPU else _interp()
        with ctx:
            out = KV.decode_attention_int8(q, k8, ks, v8, vs, valid, n_valid=n_valid)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


@pytest.mark.smoke
def test_stacked_fresh_quantized_q_matches_oracle():
    """int8-native score dots (PADT_DECODE_QI8): both fresh kernels
    (per-(b,hkv) and batch-blocked) must match the quantize_q=True XLA oracle
    composed as store-then-attend."""
    import contextlib

    q, k8, ks, v8, vs, valid = _stacked_int8_inputs(b=8)
    nl, b, hkv, c, hd = k8.shape
    rng = np.random.RandomState(31)
    k8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    v8n = jnp.asarray(rng.randint(-127, 128, (b, hkv, 1, hd)), jnp.int8)
    ksn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    vsn = jnp.asarray(rng.lognormal(-4, 0.5, (b, hkv, 1)), jnp.float32)
    pos = c // 2
    li = 1
    k8_u = np.asarray(k8).copy(); k8_u[li, :, :, pos] = np.asarray(k8n)[:, :, 0]
    v8_u = np.asarray(v8).copy(); v8_u[li, :, :, pos] = np.asarray(v8n)[:, :, 0]
    ks_u = np.asarray(ks).copy(); ks_u[li, :, :, pos] = np.asarray(ksn)[:, :, 0]
    vs_u = np.asarray(vs).copy(); vs_u[li, :, :, pos] = np.asarray(vsn)[:, :, 0]
    valid_u = np.asarray(valid).copy(); valid_u[:, pos] = True
    ref = KV._decode_attention_int8_xla(
        q.reshape(b, hkv, -1, hd),
        jnp.asarray(k8_u[li]), jnp.asarray(ks_u[li]),
        jnp.asarray(v8_u[li]), jnp.asarray(vs_u[li]), jnp.asarray(valid_u),
        quantize_q=True,
    ).reshape(q.shape)
    for pallas, bb in (("0", "1"), ("1", "1"), ("1", "4")):
        os.environ["PADT_PALLAS"] = pallas
        os.environ["PADT_DECODE_BB"] = bb
        try:
            ctx = contextlib.nullcontext() if (ON_TPU or pallas == "0") else _interp()
            with ctx:
                out = KV.decode_attention_int8(
                    q, k8, ks, v8, vs, valid, layer=jnp.int32(li),
                    fresh_kv=(k8n, ksn, v8n, vsn), quantize_q=True,
                )
        finally:
            os.environ["PADT_PALLAS"] = "auto"
            del os.environ["PADT_DECODE_BB"]
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=f"pallas={pallas} bb={bb}",
        )


def test_qi8_generate_greedy_matches_bf16_full_generation(monkeypatch):
    """Re-judged accuracy gate for int8-native score dots: a FULL 64-step
    greedy generation with quantized-q attention must still be
    token-for-token identical to the bf16-cache generation on the tiny
    parity model (same policy gate as the int8-KV default;
    `test_int8_generate_greedy_matches_bf16_full_generation`)."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.preprocess.vision_process import ProcessedImage
    from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
    from padt_tpu.vrt.processor import VisionTextProcessor

    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=64, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    rng = np.random.RandomState(5)
    imgs = [
        ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12)),
        ProcessedImage(rng.randn(64, 1176).astype(np.float32), (1, 8, 8)),
    ]
    params = P.init_padt_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    batch = proc.build_batch(["find the dog", "describe"], imgs)
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    deltas = jnp.asarray(batch.rope_deltas)
    n_steps = 64
    ref = P.generate(params, cfg, jb, n_steps, deltas, eos_token_id=-1)
    monkeypatch.setattr(KV, "_QI8_DEFAULT", True)
    out = P.generate(params, cfg, jb, n_steps, deltas, eos_token_id=-1, kv_cache_dtype="int8")
    tok_ref = np.asarray(ref.tokens)
    tok_qi8 = np.asarray(out.tokens)
    mismatch = np.nonzero(tok_ref != tok_qi8)
    assert (tok_ref == tok_qi8).all(), (
        f"quantized-q int8 attention diverged from bf16 at {mismatch}: "
        f"{tok_ref[mismatch]} vs {tok_qi8[mismatch]}"
    )
    h_ref = np.asarray(ref.hidden, np.float32)
    h_qi8 = np.asarray(out.hidden, np.float32)
    rel = np.abs(h_qi8 - h_ref).max() / (np.abs(h_ref).max() + 1e-9)
    assert rel < 0.08, rel


def test_qi8_unsupported_paths_fail_loudly(monkeypatch):
    """quantize_q is implemented only for the single-step fresh_kv kernels;
    the multi-query (spec verify / suffix prefill) and non-fresh paths must
    raise instead of silently running bf16 score dots under the flag
    (advisor r4 medium: a silent fallback makes spec decoding non-equivalent
    to plain decode with PADT_DECODE_QI8=1)."""
    q, k8, ks, v8, vs, valid = _stacked_int8_inputs(b=2)
    nl, b, hkv, c, hd = k8.shape
    # non-fresh single-step stacked path
    with pytest.raises(NotImplementedError):
        KV.decode_attention_int8(
            q, k8, ks, v8, vs, valid, layer=jnp.int32(0), quantize_q=True
        )
    # multi-query path (explicit flag)
    qm = jnp.broadcast_to(q, (b, 2) + q.shape[2:])
    wp = jnp.zeros((b,), jnp.int32)
    with pytest.raises(NotImplementedError):
        KV.decode_attention_int8_multi(
            qm, k8, ks, v8, vs, valid, wp, layer=jnp.int32(0), quantize_q=True
        )
    # multi-query path picks up the env default too
    monkeypatch.setattr(KV, "_QI8_DEFAULT", True)
    with pytest.raises(NotImplementedError):
        KV.decode_attention_int8_multi(
            qm, k8, ks, v8, vs, valid, wp, layer=jnp.int32(0)
        )


@pytest.mark.smoke
def test_prefill_int8_matches_quantize_after():
    """In-scan int8 prefill quantization (kv_dtype='int8') must match
    quantize_cache(prefill_bf16(...)) — quantize_kv is per-(token, kv-head),
    so per-layer application inside the scan changes nothing mathematically. The direct path exists so the full bf16 cache stack (the known
    batch-128 OOM transient, ~2.7 GB at 3B/b96/C768) is never materialized."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import language as L2

    cfg = padt_tiny().text
    params = L2.init_text_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    rng = np.random.RandomState(7)
    b, l, cap = 2, 16, 32
    emb = jnp.asarray(rng.randn(b, l, cfg.hidden_size) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(l)[None, None, :], (3, b, l)).astype(jnp.int32)
    valid = jnp.asarray(rng.rand(b, l) > 0.2)
    h_ref, cache = L2.prefill(params, cfg, emb, pos, valid, cap)
    q_ref = L2.quantize_cache(cache)
    h_direct, q_direct = L2.prefill(params, cfg, emb, pos, valid, cap, kv_dtype="int8")
    # the two paths are DIFFERENT compiled programs: XLA may tile the k/v
    # projection dots differently, so f32 K/V (and hence amax scales) can
    # drift by ~1 ulp — assert quantum-level agreement, not bitwise
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_direct), rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(q_ref.k, np.int32) - np.asarray(q_direct.k, np.int32)).max() <= 1
    assert np.abs(np.asarray(q_ref.v, np.int32) - np.asarray(q_direct.v, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(q_ref.k_scale), np.asarray(q_direct.k_scale), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q_ref.v_scale), np.asarray(q_direct.v_scale), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(q_ref.valid), np.asarray(q_direct.valid))
    assert int(q_direct.length) == l


def test_prefill_batch_chunk_matches_whole_batch():
    """Split prefill (batch_chunk): rows are independent in a causal prefill,
    so chunked layer execution must match the whole-batch program exactly up
    to cross-program dot-tiling drift (CLAUDE.md round-4: never bitwise).
    This is the b120/128 memory lever (generate(prefill_batch_chunk=...))."""
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import language as L2

    cfg = padt_tiny().text
    params = L2.init_text_params(cfg, jax.random.PRNGKey(4), jnp.float32)
    rng = np.random.RandomState(11)
    b, l, cap = 4, 16, 32
    emb = jnp.asarray(rng.randn(b, l, cfg.hidden_size) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(l)[None, None, :], (3, b, l)).astype(jnp.int32)
    valid = jnp.asarray(rng.rand(b, l) > 0.2)
    for kv_dtype in ("bf16", "int8"):
        h_ref, c_ref = L2.prefill(params, cfg, emb, pos, valid, cap, kv_dtype=kv_dtype)
        h_ck, c_ck = L2.prefill(
            params, cfg, emb, pos, valid, cap, kv_dtype=kv_dtype, batch_chunk=2
        )
        np.testing.assert_allclose(
            np.asarray(h_ref), np.asarray(h_ck), rtol=1e-5, atol=1e-6, err_msg=kv_dtype
        )
        if kv_dtype == "int8":
            assert np.abs(
                np.asarray(c_ref.k, np.int32) - np.asarray(c_ck.k, np.int32)
            ).max() <= 1
            np.testing.assert_allclose(
                np.asarray(c_ref.k_scale), np.asarray(c_ck.k_scale), rtol=1e-5
            )
        else:
            np.testing.assert_allclose(
                np.asarray(c_ref.k), np.asarray(c_ck.k), rtol=1e-5, atol=1e-6
            )
        np.testing.assert_array_equal(np.asarray(c_ref.valid), np.asarray(c_ck.valid))
