"""Parity gates for the streaming decode matmul (ops/matmul.py).

The kernel claims exact rms_norm(x) @ w[li] + b[li] semantics (modulo bf16
dot tiling, which CLAUDE.md round-4 showed can differ ~1 ulp across compiled
programs) — fuzz it against the unfused XLA oracle over layer indices, norm
fusion on/off, bias on/off, and the real 3B decode shapes (skinny M, the
N=2560 qkv / 2*ff gateup / ff-K down tiles)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from padt_tpu.ops import matmul as MM

ON_TPU = jax.default_backend() == "tpu"


def _interp():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def _ctx():
    import contextlib

    return contextlib.nullcontext() if ON_TPU else _interp()


def _mk(nl, m, k, n, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, k) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(nl, k, n) * 0.05, jnp.bfloat16)
    ln = jnp.asarray(1.0 + rng.randn(nl, k) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(nl, n) * 0.1, jnp.bfloat16)
    return x, w, ln, b


@pytest.mark.smoke
@pytest.mark.parametrize("fuse_ln,bias", [(True, True), (True, False), (False, False)])
def test_stream_matmul_matches_oracle(fuse_ln, bias):
    nl, m, k, n = 3, 16, 256, 512
    x, w, ln, b = _mk(nl, m, k, n)
    for li in (0, nl - 1):
        ref = MM.stream_matmul_stacked_ref(
            x, w, li, ln_w=ln if fuse_ln else None, bias=b if bias else None
        )
        with _ctx():
            out = MM.stream_matmul_stacked(
                x, w, jnp.int32(li), ln_w=ln if fuse_ln else None,
                bias=b if bias else None,
            )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=f"li={li} fuse_ln={fuse_ln} bias={bias}",
        )


def test_stream_matmul_traced_layer_index():
    """Layer index must work as a TRACED scalar (scan carry), not just a
    Python int — scan over layers, compare against per-layer oracle."""
    nl, m, k, n = 4, 8, 128, 256
    x, w, ln, b = _mk(nl, m, k, n, seed=3)

    def run(x, w, ln, b):
        def body(acc, li):
            with _ctx():
                o = MM.stream_matmul_stacked(x, w, li, ln_w=ln, bias=b)
            return acc + o.astype(jnp.float32), ()

        acc, _ = jax.lax.scan(
            body, jnp.zeros((m, n), jnp.float32), jnp.arange(nl, dtype=jnp.int32)
        )
        return acc

    out = run(x, w, ln, b)
    ref = sum(
        np.asarray(MM.stream_matmul_stacked_ref(x, w, li, ln_w=ln, bias=b), np.float32)
        for li in range(nl)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2, rtol=5e-2)


def test_stream_matmul_odd_m_and_batch_shape():
    """M not a multiple of 8 pads internally; (B, 1, K) lead shapes reshape."""
    nl, k, n = 2, 128, 256
    x, w, ln, b = _mk(nl, 5, k, n, seed=7)
    ref = MM.stream_matmul_stacked_ref(x, w, 1, ln_w=ln)
    with _ctx():
        out = MM.stream_matmul_stacked(x, w, jnp.int32(1), ln_w=ln)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )
    x3 = x.reshape(5, 1, k)
    with _ctx():
        out3 = MM.stream_matmul_stacked(x3, w, jnp.int32(0), ln_w=ln)
    assert out3.shape == (5, 1, n)
    ref3 = MM.stream_matmul_stacked_ref(x3, w, 0, ln_w=ln)
    np.testing.assert_allclose(
        np.asarray(out3, np.float32), np.asarray(ref3, np.float32), atol=2e-2, rtol=2e-2
    )
