"""Qwen2.5 text decoder with M-RoPE and a static-shape KV cache.

Rebuilds the LLM layer of the reference (transformers Qwen2_5_VLModel used by
`padt.py:279-290`) as functional JAX:
  - `text_forward` — full-sequence causal forward (training / prefill), writes
    the KV cache as a by-product;
  - `decode_step` — one-token step over the cache (the reference runs one HF
    forward per token in `_sample_vision_token`, `padt.py:618-800`; here the
    step is jitted and driven by `lax.while_loop` in padt.py's generate).

Returns post-final-norm hidden states: parity with HF `output_hidden_states[-1]`
which PaDT's VRT parsing consumes (`padt_processor.py:125`,
`padt_sft_trainer.py:478`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextConfig
from ..ops.attention import causal_attention, decode_attention
from ..ops.norms import rms_norm
from ..ops.quant import linear as qlinear
from ..ops.rope import apply_rotary, mrope_cos_sin


class KVCache(NamedTuple):
    k: jnp.ndarray  # (layers, B, C, Hkv, hd)
    v: jnp.ndarray  # (layers, B, C, Hkv, hd)
    valid: jnp.ndarray  # (B, C) bool — live slots (handles left padding)
    length: jnp.ndarray  # () int32 — high-water mark (same for all samples)


class QuantKVCache(NamedTuple):
    """Int8 KV cache (serving): per-token/per-kv-head symmetric quantization,
    dequant fused into the Pallas decode kernel (ops/kv_cache.py). Layout puts
    C next to hd so per-(sample, head) slices are contiguous kernel tiles."""

    k: jnp.ndarray  # (layers, B, Hkv, C, hd) int8
    k_scale: jnp.ndarray  # (layers, B, Hkv, C) f32
    v: jnp.ndarray
    v_scale: jnp.ndarray
    valid: jnp.ndarray  # (B, C) bool
    length: jnp.ndarray  # () int32


def quantize_cache(cache: KVCache) -> QuantKVCache:
    """bf16 cache (e.g. fresh from prefill) -> int8 cache."""
    from ..ops.kv_cache import quantize_kv

    k8, ks = quantize_kv(cache.k.transpose(0, 1, 3, 2, 4))
    v8, vs = quantize_kv(cache.v.transpose(0, 1, 3, 2, 4))
    return QuantKVCache(k=k8, k_scale=ks, v=v8, v_scale=vs, valid=cache.valid, length=cache.length)


def init_cache(cfg: TextConfig, batch: int, capacity: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, capacity, cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        valid=jnp.zeros((batch, capacity), dtype=bool),
        length=jnp.zeros((), jnp.int32),
    )


def init_text_params(cfg: TextConfig, key, dtype=jnp.bfloat16):
    d, ff, nl = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    ks = jax.random.split(key, 8)

    def stack(shape, key, scale=0.02):
        return (jax.random.normal(key, (nl, *shape), jnp.float32) * scale).astype(dtype)

    layers = {
        "input_ln_w": jnp.ones((nl, d), dtype),
        "post_ln_w": jnp.ones((nl, d), dtype),
        "q_w": stack((d, qd), ks[0]),
        "q_b": jnp.zeros((nl, qd), dtype),
        "k_w": stack((d, kvd), ks[1]),
        "k_b": jnp.zeros((nl, kvd), dtype),
        "v_w": stack((d, kvd), ks[2]),
        "v_b": jnp.zeros((nl, kvd), dtype),
        "o_w": stack((qd, d), ks[3]),
        "gate_w": stack((d, ff), ks[4]),
        "up_w": stack((d, ff), ks[5]),
        "down_w": stack((ff, d), ks[6]),
    }
    params = {
        "embed": (jax.random.normal(ks[7], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(dtype),
        "layers": layers,
        "final_ln_w": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(jax.random.fold_in(ks[7], 1), (cfg.vocab_size, d), jnp.float32) * 0.02
        ).astype(dtype)
    return params


def _packed(lp) -> bool:
    """True when the layer uses the fused inference weight layout
    (`padt.pack_inference_params`): q|k|v -> qkv_w, gate|up -> gateup_w."""
    return "qkv_w" in lp or "qkv_w_q" in lp


def _qkv(x, lp, cfg: TextConfig, cos, sin):
    b, l, _ = x.shape
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if _packed(lp):
        # one fused weight stream per layer (decode is weight-bandwidth-bound;
        # each output column depends only on its own weight column, so the
        # fused dot is bit-exact vs the three separate ones)
        qkv = qlinear(lp, "qkv_w", x) + lp["qkv_b"]
        q = qkv[..., : h * hd].reshape(b, l, h, hd)
        k = qkv[..., h * hd : (h + hkv) * hd].reshape(b, l, hkv, hd)
        v = qkv[..., (h + hkv) * hd :].reshape(b, l, hkv, hd)
    else:
        q = (qlinear(lp, "q_w", x) + lp["q_b"]).reshape(b, l, h, hd)
        k = (qlinear(lp, "k_w", x) + lp["k_b"]).reshape(b, l, hkv, hd)
        v = (qlinear(lp, "v_w", x) + lp["v_b"]).reshape(b, l, hkv, hd)
    q = apply_rotary(q, cos[:, :, None, :], sin[:, :, None, :])
    k = apply_rotary(k, cos[:, :, None, :], sin[:, :, None, :])
    return q, k, v


def _mlp(x, lp):
    if "gateup_w" in lp or "gateup_w_q" in lp:
        gu = qlinear(lp, "gateup_w", x)
        ff = gu.shape[-1] // 2
        return qlinear(lp, "down_w", jax.nn.silu(gu[..., :ff]) * gu[..., ff:])
    h = jax.nn.silu(qlinear(lp, "gate_w", x)) * qlinear(lp, "up_w", x)
    return qlinear(lp, "down_w", h)


def text_forward(
    params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, L, D)
    position_ids: jnp.ndarray,  # (3, B, L)
    valid: jnp.ndarray,  # (B, L) bool
    remat: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Full causal forward. Returns (hidden post-final-norm (B,L,D),
    (k_all, v_all) each (layers, B, L, Hkv, hd)) for cache seeding."""
    from ..ops.attention import use_pallas

    b, l, _ = inputs_embeds.shape
    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    # fused single-pass rope kernel (same gate as prefill); its custom VJP is
    # the same kernel with sin negated, so training takes this path too —
    # the unfused XLA rotate_half chain costs an extra read+write of q/k per
    # layer in each of fwd, remat-recompute, and bwd.
    fused_rope = use_pallas() and l % 128 == 0 and cfg.head_dim % 128 == 0
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def body(x, lp):
        xn = rms_norm(x, lp["input_ln_w"], cfg.rms_norm_eps)
        if fused_rope and _packed(lp):
            # inference-only packed layout: rope reads q/k straight out of the
            # fused qkv projection (lane-block offset, no slice copies)
            from ..ops.pallas_attention import rope_pair_fused_qkv

            qkvp = qlinear(lp, "qkv_w", xn) + lp["qkv_b"]
            qr, kr = rope_pair_fused_qkv(qkvp, cos, sin, h, hkv)
            q, k = qr.reshape(b, l, h, hd), kr.reshape(b, l, hkv, hd)
            v = qkvp[..., (h + hkv) * hd :].reshape(b, l, hkv, hd)
        elif fused_rope:
            from ..ops.pallas_attention import rope_pair_packed

            qp = qlinear(lp, "q_w", xn) + lp["q_b"]
            kp = qlinear(lp, "k_w", xn) + lp["k_b"]
            v = (qlinear(lp, "v_w", xn) + lp["v_b"]).reshape(b, l, hkv, hd)
            qr, kr = rope_pair_packed(qp, kp, cos, sin, h, hkv)
            q, k = qr.reshape(b, l, h, hd), kr.reshape(b, l, hkv, hd)
        else:
            q, k, v = _qkv(xn, lp, cfg, cos, sin)
        attn = causal_attention(q, k, v, valid)
        x = x + qlinear(lp, "o_w", attn.reshape(*x.shape[:2], -1))
        xn = rms_norm(x, lp["post_ln_w"], cfg.rms_norm_eps)
        x = x + _mlp(xn, lp)
        return x, (k, v)

    if remat:
        body = jax.checkpoint(body)
    x, (k_all, v_all) = jax.lax.scan(body, inputs_embeds, params["layers"])
    hidden = rms_norm(x, params["final_ln_w"], cfg.rms_norm_eps)
    return hidden, (k_all, v_all)


def prefill(
    params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, L, D)
    position_ids: jnp.ndarray,  # (3, B, L)
    valid: jnp.ndarray,  # (B, L) bool
    capacity: int,
    kv_dtype: str = "bf16",
    batch_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, "KVCache | QuantKVCache"]:
    """Causal forward + cache seeded into slots [0, L).

    K/V are padded to capacity INSIDE the layer scan so only one per-layer
    transient exists (padding the stacked (layers, B, L, ...) output after the
    fact would briefly hold prefill-size + capacity-size copies — ~2.4 GB extra
    at 3B/batch-48 shapes).

    kv_dtype="int8": each layer's K/V rows are quantized INSIDE the scan
    (same math as `quantize_cache(prefill(...))` — quantize_kv is
    per-(token, kv-head); only compile-level ulp drift differs) so the full
    bf16 (layers, B, C, Hkv, hd) stack is never materialized: at 3B/b96/C768
    that transient is ~2.7 GB and was the known batch-128 OOM blocker
    (CLAUDE.md round-2).

    batch_chunk: when set (and it divides B, B > chunk), each layer runs as a
    sequential `lax.map` over batch sub-chunks. Rows are independent in a
    causal prefill, so the math is identical; per-layer activation transients
    (the (B, L, ff) MLP intermediates + qkv projections, ~3.8 GB at 3B/b112)
    shrink to one chunk's worth. All chunk outputs are batch-leading, so
    reassembly is a free contiguous reshape — no transpose copies. This is
    the memory lever for decode batches past 112 on one chip (decode is
    weight-stream-bound: larger B amortizes the weight read)."""
    from ..ops.attention import use_pallas

    if kv_dtype == "int8":
        from ..ops.kv_cache import quantize_kv
    elif kv_dtype != "bf16":
        raise ValueError(f"unknown kv_dtype {kv_dtype!r}")

    b, l, _ = inputs_embeds.shape
    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    pad = [(0, 0), (0, capacity - l), (0, 0), (0, 0)]
    # fused single-pass rope kernel (inference path; ~270 ms of unfused XLA
    # elementwise at 3B/batch-96 otherwise). Training (text_forward) keeps the
    # XLA rope for its VJP.
    fused_rope = use_pallas() and l % 128 == 0 and cfg.head_dim % 128 == 0
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def layer_chunk(lp, xc, cosc, sinc, validc):
        bc = xc.shape[0]
        xn = rms_norm(xc, lp["input_ln_w"], cfg.rms_norm_eps)
        if fused_rope and _packed(lp):
            from ..ops.pallas_attention import rope_pair_fused_qkv

            qkvp = qlinear(lp, "qkv_w", xn) + lp["qkv_b"]  # (bc, L, (H+2Hkv)*hd)
            qr, kr = rope_pair_fused_qkv(qkvp, cosc, sinc, h, hkv)
            q, k = qr.reshape(bc, l, h, hd), kr.reshape(bc, l, hkv, hd)
            v = qkvp[..., (h + hkv) * hd :].reshape(bc, l, hkv, hd)
        elif fused_rope:
            from ..ops.pallas_attention import rope_pair_packed

            qp = qlinear(lp, "q_w", xn) + lp["q_b"]  # (bc, L, H*hd) packed
            kp = qlinear(lp, "k_w", xn) + lp["k_b"]  # (bc, L, Hkv*hd)
            v = (qlinear(lp, "v_w", xn) + lp["v_b"]).reshape(bc, l, hkv, hd)
            qr, kr = rope_pair_packed(qp, kp, cosc, sinc, h, hkv)
            q, k = qr.reshape(bc, l, h, hd), kr.reshape(bc, l, hkv, hd)
        else:
            q, k, v = _qkv(xn, lp, cfg, cosc, sinc)
        attn = causal_attention(q, k, v, validc)
        xc = xc + qlinear(lp, "o_w", attn.reshape(bc, l, -1))
        xn = rms_norm(xc, lp["post_ln_w"], cfg.rms_norm_eps)
        xc = xc + _mlp(xn, lp)
        if kv_dtype == "int8":
            # quantize AFTER padding: pad rows quantize to (q=0, scale=1e-8/127)
            # exactly as quantize_cache produces on the padded bf16 stack
            k8, ksc = quantize_kv(jnp.pad(k, pad).transpose(0, 2, 1, 3))
            v8, vsc = quantize_kv(jnp.pad(v, pad).transpose(0, 2, 1, 3))
            return xc, (k8, ksc, v8, vsc)
        return xc, (jnp.pad(k, pad), jnp.pad(v, pad))

    chunked = bool(batch_chunk) and b > batch_chunk and b % batch_chunk == 0

    def body(x, lp):
        if not chunked:
            return layer_chunk(lp, x, cos, sin, valid)
        nc = b // batch_chunk
        split = lambda a: a.reshape(nc, batch_chunk, *a.shape[1:])
        x2, kv = jax.lax.map(
            lambda t: layer_chunk(lp, *t), (split(x), split(cos), split(sin), split(valid))
        )
        merge = lambda a: a.reshape(b, *a.shape[2:])
        return merge(x2), jax.tree.map(merge, kv)

    x, ys = jax.lax.scan(body, inputs_embeds, params["layers"])
    hidden = rms_norm(x, params["final_ln_w"], cfg.rms_norm_eps)
    valid_pad = jnp.pad(valid, [(0, 0), (0, capacity - l)])
    length = jnp.asarray(l, jnp.int32)
    if kv_dtype == "int8":
        k_all, ks_all, v_all, vs_all = ys
        cache = QuantKVCache(
            k=k_all, k_scale=ks_all, v=v_all, v_scale=vs_all,
            valid=valid_pad, length=length,
        )
    else:
        cache = KVCache(k=ys[0], v=ys[1], valid=valid_pad, length=length)
    return hidden, cache


def decode_step(
    params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # (B, 1, D)
    position_ids: jnp.ndarray,  # (3, B, 1)
    cache,  # KVCache | QuantKVCache
):
    """One decode step; writes the new KV at slot `cache.length`."""
    if isinstance(cache, QuantKVCache):
        return _decode_step_int8(params, cfg, inputs_embeds, position_ids, cache)
    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    pos = cache.length
    new_valid = cache.valid.at[:, pos].set(True)

    def body(x, layer):
        lp, k_cache, v_cache = layer
        xn = rms_norm(x, lp["input_ln_w"], cfg.rms_norm_eps)
        q, k, v = _qkv(xn, lp, cfg, cos, sin)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, pos, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, pos, axis=1)
        attn = decode_attention(q, k_cache, v_cache, new_valid)
        x = x + qlinear(lp, "o_w", attn.reshape(*x.shape[:2], -1))
        xn = rms_norm(x, lp["post_ln_w"], cfg.rms_norm_eps)
        x = x + _mlp(xn, lp)
        return x, (k_cache, v_cache)

    x, (k_new, v_new) = jax.lax.scan(body, inputs_embeds, (params["layers"], cache.k, cache.v))
    hidden = rms_norm(x, params["final_ln_w"], cfg.rms_norm_eps)
    return hidden, KVCache(k=k_new, v=v_new, valid=new_valid, length=pos + 1)


def _decode_step_int8(params, cfg: TextConfig, inputs_embeds, position_ids, cache: QuantKVCache):
    """One int8-KV decode step — the cache is READ-ONLY inside the layer scan.

    Decomposition chosen by measurement (3B/b96/C1280, BASELINE.md round-3
    decode-path analysis):
    - per-layer cache slices through scan xs/ys: XLA restacks the full cache
      every step (29.2 ms/step);
    - stacked cache in the scan CARRY with in-place row DUS: XLA still
      materializes a full cache copy per step because a Pallas read consumes
      the updated carry (22.6 ms/step, +4.6 GB HBM);
    - HERE: the layer-indexed kernel reads the PRE-update stack (loop
      invariant -> no carry, no copies) and composites the current token's
      K/V in-kernel (`fresh_kv=`); each layer's new row leaves the scan as
      stacked ys and ONE all-layer dynamic_update_slice writes column `pos`
      after the scan (17.2 ms/step)."""
    from ..ops.kv_cache import decode_attention_int8, quantize_kv

    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    pos = cache.length
    old_valid = cache.valid  # excludes pos: the kernel adds the fresh column
    k8a, ksa, v8a, vsa = cache.k, cache.k_scale, cache.v, cache.v_scale
    nl = len(jax.tree.leaves(params["layers"])[0])

    def body(x, layer):
        lp, li = layer
        xn = rms_norm(x, lp["input_ln_w"], cfg.rms_norm_eps)
        q, k, v = _qkv(xn, lp, cfg, cos, sin)
        k8n, ksn = quantize_kv(k.transpose(0, 2, 1, 3))  # (B, Hkv, 1, hd)
        v8n, vsn = quantize_kv(v.transpose(0, 2, 1, 3))
        attn = decode_attention_int8(
            q, k8a, ksa, v8a, vsa, old_valid, layer=li,
            fresh_kv=(k8n, ksn, v8n, vsn),
        )
        x = x + qlinear(lp, "o_w", attn.reshape(*x.shape[:2], -1))
        xn = rms_norm(x, lp["post_ln_w"], cfg.rms_norm_eps)
        x = x + _mlp(xn, lp)
        return x, (k8n, ksn, v8n, vsn)

    x, (k8r, ksr, v8r, vsr) = jax.lax.scan(
        body, inputs_embeds, (params["layers"], jnp.arange(nl, dtype=jnp.int32))
    )
    zero = jnp.zeros((), jnp.int32)
    k8 = jax.lax.dynamic_update_slice(k8a, k8r, (zero, zero, zero, pos, zero))
    ks = jax.lax.dynamic_update_slice(ksa, ksr, (zero, zero, zero, pos))
    v8 = jax.lax.dynamic_update_slice(v8a, v8r, (zero, zero, zero, pos, zero))
    vs = jax.lax.dynamic_update_slice(vsa, vsr, (zero, zero, zero, pos))
    hidden = rms_norm(x, params["final_ln_w"], cfg.rms_norm_eps)
    return hidden, QuantKVCache(
        k=k8, k_scale=ks, v=v8, v_scale=vs,
        valid=cache.valid.at[:, pos].set(True), length=pos + 1,
    )
