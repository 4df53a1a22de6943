"""Streaming bf16 matmul kernels for the decode weight stream.

Decode at 3B/b96-112 is bound by streaming ~5.9 GB of bf16 weights per step;
the XLA dot path reaches ~592 GB/s of the 819 GB/s v5e HBM peak (72%,
BASELINE.md round-4). ROADMAP declared that "the practical XLA dot ceiling at
M=96" without attacking it — these kernels are the attack (VERDICT r4 #3):

- whole-K weight tiles streamed HBM->VMEM through Pallas's double-buffered
  grid pipeline, skinny-M (96-112) LHS resident in VMEM across all N tiles;
- the layer's RMS-norm optionally FUSED into the dot (qkv/gateup dots consume
  rms_norm(x) — fusing removes a separate VPU pass + its HBM round trip and
  the inter-kernel gap, recomputing the cheap norm per N tile instead);
- scan-friendly: takes the FULL (L, K, N) weight stack + a traced layer index
  via scalar prefetch, so a lax.scan over layers reads loop-invariant HBM
  with NO per-layer slice copies (the same shape that fixed the KV cache,
  CLAUDE.md round-3).

Reference counterpart: flash-attn-style hand kernels are the reference's hot
path (SURVEY.md §2.3); its decode matmuls live in cuBLAS. Measured results in
scripts/micro_stream_matmul.py / BASELINE.md round-5.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(li_ref, x_ref, w_ref, *rest, eps: float, fuse_ln: bool, has_bias: bool):
    refs = list(rest)
    ln_ref = refs.pop(0) if fuse_ln else None
    b_ref = refs.pop(0) if has_bias else None
    o_ref = refs.pop(0)
    x = x_ref[:]
    if fuse_ln:
        # exact ops/norms.py::rms_norm numerics: f32 variance, bf16 rescale,
        # bf16 * bf16 weight multiply
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = ln_ref[0, 0] * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    out = jax.lax.dot_general(
        x, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # pin DEFAULT: a process-global 'highest' precision does not lower for
        # bf16 dots inside Mosaic (CLAUDE.md round-2 test-order trap)
        precision=jax.lax.Precision.DEFAULT,
    ).astype(o_ref.dtype)
    if has_bias:
        out = out + b_ref[0, 0]
    o_ref[:] = out


def _pick_blk_n(k: int, n: int) -> int:
    """Largest N tile in {1024,512,256,128} dividing n whose whole-K bf16
    weight tile stays <= ~6 MB (two pipeline buffers fit scoped VMEM with
    headroom for x + out)."""
    env = os.environ.get("PADT_STREAM_BLKN")
    if env:
        return int(env)
    for c in (1024, 512, 256, 128):
        if n % c == 0 and k * c * 2 <= (6 << 20):
            return c
    return 128 if n % 128 == 0 else n


def stream_matmul_stacked(
    x: jnp.ndarray,  # (M, K) bf16 (or (B, 1, K))
    w: jnp.ndarray,  # (L, K, N) bf16 — FULL layer stack, loop-invariant
    li,  # () int32 — traced layer index (scan carry-safe: scalar prefetch)
    ln_w: Optional[jnp.ndarray] = None,  # (L, K): fuse rms_norm(x, ln_w[li])
    bias: Optional[jnp.ndarray] = None,  # (L, N): + bias[li] (bf16 add)
    eps: float = 1e-6,
) -> jnp.ndarray:
    """`rms_norm(x, ln_w[li]) @ w[li] + bias[li]` as one streaming kernel.

    Whole-K weight tiles (norm needs full K anyway), grid over N tiles only;
    Pallas double-buffers the weight DMA across tiles while the MXU consumes
    the previous tile. x stays VMEM-resident for the whole call.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    nl, wk, n = w.shape
    assert wk == k, (x.shape, w.shape)
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    m_pad = _round_up(max(m, 8), 8)
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    blk_n = _pick_blk_n(k, n)
    fuse_ln = ln_w is not None
    has_bias = bias is not None

    li1 = jnp.asarray(li, jnp.int32).reshape(1)
    at_layer = lambda j, li_r: (li_r[0], 0, j)
    in_specs = [
        pl.BlockSpec((m_pad, k), lambda j, li_r: (0, 0)),
        pl.BlockSpec((1, k, blk_n), at_layer),
    ]
    args = [x2, w]
    if fuse_ln:
        in_specs.append(pl.BlockSpec((1, 1, k), lambda j, li_r: (li_r[0], 0, 0)))
        args.append(ln_w.reshape(nl, 1, k).astype(x.dtype))
    if has_bias:
        in_specs.append(pl.BlockSpec((1, 1, blk_n), lambda j, li_r: (li_r[0], 0, j)))
        args.append(bias.reshape(nl, 1, n).astype(x.dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // blk_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, blk_n), lambda j, li_r: (0, j)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, fuse_ln=fuse_ln, has_bias=has_bias),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # two whole-K weight buffers can exceed the 16 MB default scoped
            # limit at K=11008 (CLAUDE.md round-4); v5e has 128 MB
            vmem_limit_bytes=100 * (1 << 20),
        ),
    )(li1, *args)
    return out[:m].reshape(*lead, n)


def stream_matmul_stacked_ref(x, w, li, ln_w=None, bias=None, eps=1e-6):
    """XLA oracle for tests: identical math, unfused."""
    from .norms import rms_norm

    wl = jax.lax.dynamic_index_in_dim(w, jnp.asarray(li, jnp.int32), 0, keepdims=False)
    xx = rms_norm(x, ln_w[li], eps) if ln_w is not None else x
    out = jax.lax.dot_general(
        xx, wl, (((xx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias[li].astype(x.dtype)
    return out
