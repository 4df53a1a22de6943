"""Pallas flash attention vs the XLA reference path.

Runs on the real TPU when available; falls back to Pallas interpret mode on
CPU (small shapes only — the interpreter is slow)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padt_tpu.ops import attention as A

ON_TPU = jax.default_backend() == "tpu"


def _mk(b, s, h, d, hkv=None, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    hkv = hkv or h
    q = jnp.asarray(rng.randn(b, s, h, d), dtype) * 0.3
    k = jnp.asarray(rng.randn(b, s, hkv, d), dtype) * 0.3
    v = jnp.asarray(rng.randn(b, s, hkv, d), dtype) * 0.3
    return q, k, v


def _flash(q, k, v, q_seg, k_seg, causal):
    from padt_tpu.ops.pallas_attention import flash_attention

    if ON_TPU:
        return flash_attention(q, k, v, q_seg, k_seg, causal)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return flash_attention(q, k, v, q_seg, k_seg, causal)


@pytest.mark.parametrize("d", [128, 80] if ON_TPU else [128])
def test_segment_flash_matches_xla(d):
    b, s, h = 2, 256, 4
    q, k, v = _mk(b, s, h, d)
    rng = np.random.RandomState(1)
    seg = np.sort(rng.randint(0, 5, size=(b, s)), axis=1).astype(np.int32)
    seg[:, -17:] = -1  # padding tail
    seg = jnp.asarray(seg)
    ref = A.segment_attention.__wrapped__(q, k, v, seg) if hasattr(A.segment_attention, "__wrapped__") else None
    # XLA reference path directly
    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = A.segment_attention(q, k, v, seg)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    out = _flash(q, k, v, seg, seg, False)
    valid = np.asarray(seg) >= 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-3, atol=2e-3
    )


def test_causal_flash_matches_xla():
    b, s, h, hkv, d = 2, 256, 4, 2, 128
    q, k, v = _mk(b, s, h, d, hkv=hkv)
    valid = np.ones((b, s), bool)
    valid[0, :37] = False  # left padding
    validj = jnp.asarray(valid)
    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = A.causal_attention(q, k, v, validj)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    seg = jnp.where(validj, 0, -1).astype(jnp.int32)
    out = _flash(q, k, v, seg, seg, True)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-3, atol=2e-3
    )


@pytest.mark.skipif(not ON_TPU, reason="interpret-mode grads too slow on CPU")
def test_flash_gradients_match_xla():
    b, s, h, d = 2, 256, 4, 128
    q, k, v = _mk(b, s, h, d)
    seg_np = np.zeros((b, s), np.int32)
    seg_np[:, -30:] = -1
    seg = jnp.asarray(seg_np)

    def loss_flash(q, k, v):
        from padt_tpu.ops.pallas_attention import flash_attention

        o = flash_attention(q, k, v, seg, seg, True)
        return (o * o).sum()

    def loss_xla(q, k, v):
        os.environ["PADT_PALLAS"] = "0"
        try:
            o = A.causal_attention(q, k, v, seg >= 0)
        finally:
            os.environ["PADT_PALLAS"] = "auto"
        mask = (seg >= 0)[:, :, None, None]
        return ((o * o) * mask).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not ON_TPU, reason="Pallas backward kernels are the TPU path")
def test_flash_backward_pallas_matches_xla_recompute():
    """True flash backward (dq + GQA-folding dkv kernels, saved LSE) vs the
    chunked XLA recompute oracle — GQA + causal + left/right padding, in bf16
    (the training dtype)."""
    b, s, h, hkv, d = 2, 256, 8, 2, 128
    q, k, v = _mk(b, s, h, d, hkv=hkv, dtype=jnp.bfloat16)
    seg_np = np.zeros((b, s), np.int32)
    seg_np[0, :37] = -1
    seg_np[:, -30:] = -1
    seg = jnp.asarray(seg_np)

    from padt_tpu.ops.pallas_attention import flash_attention

    def loss(q, k, v):
        o = flash_attention(q, k, v, seg, seg, True)
        return (o.astype(jnp.float32) ** 2).sum()

    def run(mode):
        os.environ["PADT_FLASH_BWD"] = mode
        try:
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            os.environ.pop("PADT_FLASH_BWD", None)

    gp = run("pallas")
    gx = run("xla")
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32), rtol=0.05, atol=0.05
        )


def _mk_rope(b, s, d, seed=5):
    rng = np.random.RandomState(seed)
    hpos = jnp.asarray(np.sort(rng.randint(0, 32, (b, s)), axis=1))
    wpos = jnp.asarray(np.sort(rng.randint(0, 32, (b, s)), axis=1))
    from padt_tpu.ops.rope import vision_rope_cos_sin

    return vision_rope_cos_sin(hpos, wpos, d)


@pytest.mark.parametrize("d", [80, 128] if ON_TPU else [64])
def test_fused_vision_attention_matches_xla(d):
    """Fused in-kernel rope + segment attention vs the XLA rope+attention
    oracle (the path the vision tower takes off-TPU)."""
    b, s, h = 2, 256, 4
    q, k, v = _mk(b, s, h, d, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    seg = np.sort(rng.randint(0, 4, size=(b, s)), axis=1).astype(np.int32)
    seg[:, -13:] = -1
    seg = jnp.asarray(seg)
    cos, sin = _mk_rope(b, s, d)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = A.fused_vision_attention(q, k, v, cos, sin, seg)
    finally:
        os.environ["PADT_PALLAS"] = "auto"

    os.environ["PADT_PALLAS"] = "1"
    try:
        if ON_TPU:
            out = A.fused_vision_attention(q, k, v, cos, sin, seg)
        else:
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                out = A.fused_vision_attention(q, k, v, cos, sin, seg)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    valid = np.asarray(seg) >= 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-3, atol=2e-3
    )


@pytest.mark.skipif(not ON_TPU, reason="interpret-mode grads too slow on CPU")
def test_fused_vision_attention_gradients():
    """Backward pulls grads through the in-kernel rotation correctly."""
    b, s, h, d = 2, 256, 4, 80
    q, k, v = _mk(b, s, h, d, dtype=jnp.float32)
    seg_np = np.zeros((b, s), np.int32)
    seg_np[:, 128:] = 1
    seg_np[:, -20:] = -1
    seg = jnp.asarray(seg_np)
    cos, sin = _mk_rope(b, s, d)

    def loss_fused(q, k, v):
        os.environ["PADT_PALLAS"] = "1"
        try:
            o = A.fused_vision_attention(q, k, v, cos, sin, seg)
        finally:
            os.environ["PADT_PALLAS"] = "auto"
        return (o * o).sum()

    def loss_xla(q, k, v):
        os.environ["PADT_PALLAS"] = "0"
        try:
            o = A.fused_vision_attention(q, k, v, cos, sin, seg)
        finally:
            os.environ["PADT_PALLAS"] = "auto"
        mask = (seg >= 0)[:, :, None, None]
        return ((o * o) * mask).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not ON_TPU, reason="needs TPU")
def test_padded_dispatch_non_multiple():
    """segment_attention wrapper pads non-128-multiple sequence lengths."""
    b, s, h, d = 2, 200, 4, 80
    q, k, v = _mk(b, s, h, d)
    seg = jnp.asarray(np.zeros((b, s), np.int32))
    os.environ["PADT_PALLAS"] = "1"
    try:
        out = A.segment_attention(q, k, v, seg)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = A.segment_attention(q, k, v, seg)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("d", [128] if ON_TPU else [128])
def test_window_kernel_matches_xla(d):
    """Slot-layout diagonal-window kernel (paired 128-row MXU tiles) vs the
    XLA batched-window oracle: identical outputs on valid tokens, including
    partially-filled windows (seg=-1 slot padding)."""
    b, s, h, win = 2, 256, 2, 64
    rng = np.random.RandomState(4)
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d).astype(np.float32) * 0.3)
    cos, sin = _mk_rope(b, s, d)
    # slot-layout segments: window id per 64-slot, ragged tails invalid
    seg = np.full((b, s), -1, np.int32)
    for bi in range(b):
        for wI in range(s // win):
            fill = rng.randint(8, win + 1) // 4 * 4  # whole merge groups
            seg[bi, wI * win : wI * win + fill] = wI
    seg = jnp.asarray(seg)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = A.window_attention_qkv(qkv, cos, sin, seg, h, win=win)
    finally:
        os.environ["PADT_PALLAS"] = "auto"

    os.environ["PADT_PALLAS"] = "1"
    try:
        if ON_TPU:
            out = A.window_attention_qkv(qkv, cos, sin, seg, h, win=win)
        else:
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                out = A.window_attention_qkv(qkv, cos, sin, seg, h, win=win)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    valid = np.repeat(np.asarray(seg) >= 0, h * d).reshape(b, s, h * d)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-3, atol=2e-3
    )


@pytest.mark.skipif(not ON_TPU, reason="needs TPU (unpack kernel lane relayouts)")
@pytest.mark.parametrize("windowed", [False, True])
def test_unpadded_qkv_unpack_pad_contract(windowed):
    """hd=80 fused-qkv paths take the UNPADDED qkv buffer and emit (B,S,H*128)
    with zero pad lanes per head (ops/pallas_attention.py::_unpack_rope_pad).
    Checks the real lanes against the XLA oracle and the pad-lane zeros."""
    b, s, h, d, win = 2, 256, 4, 80, 64
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d).astype(np.float32) * 0.3)
    cos, sin = _mk_rope(b, s, d)
    if windowed:
        seg = np.full((b, s), -1, np.int32)
        for bi in range(b):
            for wI in range(s // win):
                fill = rng.randint(8, win + 1) // 4 * 4
                seg[bi, wI * win : wI * win + fill] = wI
    else:
        seg = np.sort(rng.randint(0, 4, size=(b, s)), axis=1).astype(np.int32)
        seg[:, -12:] = -1
    seg = jnp.asarray(seg)

    def call(qkv):
        if windowed:
            return A.window_attention_qkv(qkv, cos, sin, seg, h, win=win)
        return A.fused_vision_attention_qkv(qkv, cos, sin, seg, h)

    os.environ["PADT_PALLAS"] = "0"
    try:
        ref = call(qkv)  # (B, S, H*80)
    finally:
        os.environ["PADT_PALLAS"] = "auto"
    os.environ["PADT_PALLAS"] = "1"
    try:
        out = call(qkv)  # (B, S, H*128) padded head tiles
    finally:
        os.environ["PADT_PALLAS"] = "auto"

    assert out.shape == (b, s, h * 128), out.shape
    out4 = np.asarray(out).reshape(b, s, h, 128)
    valid = np.asarray(seg) >= 0
    np.testing.assert_allclose(
        out4[..., :d][valid], np.asarray(ref).reshape(b, s, h, d)[valid],
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_array_equal(out4[..., d:][valid], 0.0)


@pytest.mark.skipif(not ON_TPU, reason="needs TPU")
def test_unpadded_qkv_gradients():
    """Backward through the unpadded-qkv path: dqkv matches the XLA oracle
    (pad-lane cotangents are dropped; dqkv keeps the UNPADDED shape)."""
    b, s, h, d = 2, 256, 4, 80
    rng = np.random.RandomState(9)
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d).astype(np.float32) * 0.3)
    cos, sin = _mk_rope(b, s, d)
    seg_np = np.zeros((b, s), np.int32)
    seg_np[:, 128:] = 1
    seg_np[:, -16:] = -1
    seg = jnp.asarray(seg_np)
    # head-dependent weighting so grads differ per lane
    wv = jnp.asarray(rng.randn(h * d).astype(np.float32))

    def loss(qkv, pallas):
        os.environ["PADT_PALLAS"] = "1" if pallas else "0"
        try:
            o = A.fused_vision_attention_qkv(qkv, cos, sin, seg, h)
        finally:
            os.environ["PADT_PALLAS"] = "auto"
        if o.shape[-1] != h * d:  # narrow padded output to real lanes
            o = o.reshape(b, s, h, -1)[..., :d].reshape(b, s, h * d)
        mask = (seg >= 0)[:, :, None]
        return ((o * wv) * mask).sum()

    gp = jax.grad(lambda x: loss(x, True))(qkv)
    gx = jax.grad(lambda x: loss(x, False))(qkv)
    assert gp.shape == qkv.shape
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=5e-3, atol=5e-3)
