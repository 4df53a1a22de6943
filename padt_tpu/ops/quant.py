"""Int8 weight-only quantization for serving.

Decode at 3B/bf16 is HBM-bandwidth-bound on the ~6.2 GB parameter stream
(BASELINE.md); per-output-channel symmetric int8 halves the weight traffic and
frees ~2.4 GB of HBM for larger serving batches. Inference-only (no VJP) and
opt-in (`padt_tpu.models.padt.quantize_params`).

The matmul is a Pallas kernel that loads int8 weight tiles from HBM, converts
to bf16 in VMEM, and runs the MXU with fp32 accumulation — XLA alone does not
fuse the dequant into the operand load (measured: no win without the kernel).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(in, out) float -> {'q': int8 (in, out), 's': f32 (1, out)} per-out-channel."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wb = w_ref[:].astype(jnp.bfloat16)
    # explicit DEFAULT precision: a global 'highest' matmul-precision setting
    # does not lower for bf16 dots inside Mosaic kernels
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), wb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blk_k(k: int, blk_n: int, budget_bytes: int = 3 << 20) -> int:
    """Largest divisor of k (multiple of 128) whose int8 weight tile fits the
    budget; falls back to whole-K (legal: block dim == full array dim)."""
    best = None
    c = 128
    while c <= k:
        if k % c == 0 and c * blk_n <= budget_bytes:
            best = c
        c += 128
    return best if best is not None else k


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ dequant(wq (K, N)) -> (..., N) in x.dtype.

    Grid (M tiles, N tiles, K chunks) with an fp32 VMEM accumulator — K is
    chunked so large weights (e.g. 11008x2048) never exceed VMEM."""
    from .attention import use_pallas

    if not use_pallas():
        # CPU/test fallback: dense dequant matmul (the kernel's oracle)
        w = wq.astype(jnp.float32) * scale.reshape(1, wq.shape[1]).astype(jnp.float32)
        return (x.astype(jnp.float32) @ w).astype(x.dtype)

    *lead, k = x.shape
    n = wq.shape[1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    n_pad = n
    blk_n = next((c for c in (512, 256, 128) if n % c == 0), None)
    if blk_n is None:  # pad N to a 128 multiple (zero cols, sliced off below)
        n_pad = _round_up(n, 128)
        blk_n = 128
        wq = jnp.pad(wq, [(0, 0), (0, n_pad - n)])
        scale = jnp.pad(scale.reshape(1, n), [(0, 0), (0, n_pad - n)])
    blk_m = min(_round_up(m, 8), 256)
    m_pad = _round_up(m, blk_m)
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    blk_k = _pick_blk_k(k, blk_n)

    out = pl.pallas_call(
        _kernel,
        grid=(m_pad // blk_m, n_pad // blk_n, k // blk_k),
        in_specs=[
            pl.BlockSpec((blk_m, blk_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((blk_k, blk_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, blk_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((blk_m, blk_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((blk_m, blk_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x2, wq, scale.reshape(1, n_pad).astype(jnp.float32))
    return out[:m, :n].reshape(*lead, n)


def linear(lp: Dict, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Apply layer weight `name` (e.g. 'q_w'): quantized if `{name}_q` exists,
    dense otherwise. Bias (`{base}_b`) is NOT applied here."""
    qk = name + "_q"
    if qk in lp:
        return int8_matmul(x, lp[qk], lp[name + "_s"])
    return x @ lp[name]
