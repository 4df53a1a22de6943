"""Decode-step bandwidth decomposition at 3B/b96/C1280 (one chip).

ROADMAP lever #3 asks for a fused per-layer decode megakernel (qkv+attn+o,
weights streamed through VMEM). Before building it, measure WHERE the
17 ms/step go (BASELINE.md decode analysis: ~560 of 819 GB/s effective):

  full        the production `_decode_step_int8` (36-layer scan + final norm)
  matmuls     same scan with attention replaced by a zero-cost q passthrough
              -> pure weight-stream time (qkv/o/MLP projections + norms)
  attn        scan running ONLY the int8 attention kernel per layer (fixed
              query) -> pure KV-stream time
  logits      the extended-vocab head (hidden @ embed^T): 622 MB/step of
              embed reads at V=152k
  embed_gather token-id -> embedding row gather (the step's input)

If matmuls + attn ~= full, the layers execute their two streams back to
back with no overlap — a megakernel that overlaps weight DMA with the KV
read has (full - max(matmuls, attn)) of headroom. If full ~= max(...), XLA
already overlaps and the megakernel can only help via VMEM-resident fusion.

Timing: data-dependent chains inside ONE jit (identical calls CSE; per-call
dispatch on the axon tunnel is ~36 ms — CLAUDE.md). Consumption is a single
element per rep: every timed op here is either opaque (pallas_call) or
data-dependent on the full carry, so XLA cannot narrow it.

Env: PADT_MICRO_B (96), PADT_MICRO_CAP (1280), PADT_MICRO_REPS (20).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_3b
from padt_tpu.models import language as L
from padt_tpu.models.language import QuantKVCache, rms_norm, qlinear, _qkv, _mlp
from padt_tpu.ops.rope import mrope_cos_sin
from padt_tpu.ops.kv_cache import decode_attention_int8, quantize_kv

B = int(os.environ.get("PADT_MICRO_B", "96"))
CAP = int(os.environ.get("PADT_MICRO_CAP", "1280"))
REPS = int(os.environ.get("PADT_MICRO_REPS", "20"))


def _time(fn, x, env):
    """`fn(x, env)` timed over REPS data-dependent reps in one jit. `env` is a
    pytree of the big arrays passed as REAL jit arguments — closing over them
    bakes GBs of 'captured constants' into lowering (7.9 GB here), which
    stalls/kills the remote compile server."""

    def chain(x, env):
        def body(carry, _):
            xx, acc = carry
            out = fn(xx, env)
            leaves = jax.tree.leaves(out)
            s = sum(l[(0,) * l.ndim].astype(jnp.float32) for l in leaves) * 1e-30
            xx = xx + s.astype(xx.dtype)
            return (xx, acc + s), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None, length=REPS)
        return acc

    jfn = jax.jit(chain)
    float(jfn(x, env))  # compile + sync
    t0 = time.perf_counter()
    float(jfn(x, env))
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    cfg = padt_3b().text
    if os.environ.get("PADT_MICRO_TINY", "0") == "1":  # CPU syntax check
        from padt_tpu.config import padt_tiny

        cfg = padt_tiny().text
    nl = cfg.num_hidden_layers
    d = cfg.hidden_size
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)

    # weights: per-layer stacks like init_text_params (bf16)
    def stk(key, shape, scale=0.02):
        return (jax.random.normal(key, (nl, *shape), jnp.float32) * scale).astype(jnp.bfloat16)

    params = {
        "layers": {
            "input_ln_w": jnp.ones((nl, d), jnp.bfloat16),
            "post_ln_w": jnp.ones((nl, d), jnp.bfloat16),
            "q_w": stk(ks[0], (d, h * hd)),
            "q_b": jnp.zeros((nl, h * hd), jnp.bfloat16),
            "k_w": stk(ks[1], (d, hkv * hd)),
            "k_b": jnp.zeros((nl, hkv * hd), jnp.bfloat16),
            "v_w": stk(ks[2], (d, hkv * hd)),
            "v_b": jnp.zeros((nl, hkv * hd), jnp.bfloat16),
            "o_w": stk(ks[3], (h * hd, d)),
            "gate_w": stk(ks[4], (d, cfg.intermediate_size)),
            "up_w": stk(ks[5], (d, cfg.intermediate_size)),
            "down_w": stk(ks[6], (cfg.intermediate_size, d)),
        },
        "final_ln_w": jnp.ones((d,), jnp.bfloat16),
    }
    embed = (jax.random.normal(ks[7], (cfg.vocab_size, d), jnp.float32) * 0.02).astype(jnp.bfloat16)

    if os.environ.get("PADT_MICRO_PACKED", "0") == "1":
        # fused qkv_w / gateup_w inference layout (padt.pack_inference_params)
        from padt_tpu.models import padt as P

        params = P.pack_inference_params({"text": params})["text"]

    # int8 KV cache stack, ~3/4 full
    kcache = jnp.zeros((nl, B, hkv, CAP, hd), jnp.int8)
    kscale = jnp.ones((nl, B, hkv, CAP), jnp.float32)
    vcache = jnp.zeros((nl, B, hkv, CAP, hd), jnp.int8)
    vscale = jnp.ones((nl, B, hkv, CAP), jnp.float32)
    valid = (jnp.arange(CAP)[None, :] < (CAP * 3) // 4).repeat(B, 0)
    cache = QuantKVCache(
        k=kcache, k_scale=kscale, v=vcache, v_scale=vscale,
        valid=valid, length=jnp.asarray((CAP * 3) // 4, jnp.int32),
    )
    x = (jax.random.normal(jax.random.PRNGKey(9), (B, 1, d), jnp.float32) * 0.1).astype(jnp.bfloat16)
    pos_ids = jnp.zeros((3, B, 1), jnp.int32) + cache.length
    cos, sin = mrope_cos_sin(pos_ids, hd, cfg.mrope_section, cfg.rope_theta)
    li_xs = jnp.arange(nl, dtype=jnp.int32)
    qf_placeholder = (jax.random.normal(jax.random.PRNGKey(3), (B, 1, h, hd), jnp.float32) * 0.1).astype(jnp.bfloat16)

    results = {}

    env = dict(params=params, cache=cache, cos=cos, sin=sin, pos_ids=pos_ids,
               embed=embed, qf=qf_placeholder)

    # --- full production step ---
    def full(x, env):
        hidden, new_cache = L._decode_step_int8(env["params"], cfg, x, env["pos_ids"], env["cache"])
        # consume the cache write so the post-scan all-layer DUS isn't elided
        # as dead code (it's part of the production step's bytes)
        return hidden + new_cache.k[0, 0, 0, 0, 0].astype(hidden.dtype) * 1e-30

    results["full_ms"] = _time(full, x, env)

    # --- matmuls only: attention replaced by a passthrough of q ---
    def matmuls(x, env):
        params, cos, sin = env["params"], env["cos"], env["sin"]

        def body(xc, layer):
            lp, _li = layer
            xn = rms_norm(xc, lp["input_ln_w"], cfg.rms_norm_eps)
            q, k, v = _qkv(xn, lp, cfg, cos, sin)
            # fold k/v in so their projections aren't dead code; no KV read
            attn = q + jnp.pad(k + v, [(0, 0), (0, 0), (0, h - hkv), (0, 0)])
            xc = xc + qlinear(lp, "o_w", attn.reshape(B, 1, h * hd))
            xn = rms_norm(xc, lp["post_ln_w"], cfg.rms_norm_eps)
            xc = xc + _mlp(xn, lp)
            return xc, ()

        out, _ = jax.lax.scan(body, x, (params["layers"], li_xs))
        return rms_norm(out, params["final_ln_w"], cfg.rms_norm_eps)

    results["matmuls_ms"] = _time(matmuls, x, env)

    # --- attention only: per-layer int8 kernel reads, fixed fresh kv ---

    def attn_only(x, env):
        cache, qf = env["cache"], env["qf"]
        kcache, kscale, vcache, vscale = cache.k, cache.k_scale, cache.v, cache.v_scale
        valid = cache.valid
        k8n, ksn = quantize_kv(qf[:, :, :hkv].transpose(0, 2, 1, 3))
        v8n, vsn = quantize_kv(qf[:, :, :hkv].transpose(0, 2, 1, 3))

        def body(xc, li):
            # 1e-30 (not *0: XLA folds that away and CSEs the reps) keeps the
            # kernel input data-dependent on the carry
            a = decode_attention_int8(
                qf + (xc[:, :, None, :hd] * 1e-30).astype(qf.dtype), kcache, kscale,
                vcache, vscale, valid, layer=li, fresh_kv=(k8n, ksn, v8n, vsn),
            )
            xc = xc + a.reshape(B, 1, h * hd)[..., :d] * 1e-30
            return xc, ()

        out, _ = jax.lax.scan(body, x, li_xs)
        return out

    results["attn_ms"] = _time(attn_only, x, env)

    # --- logits head ---
    def logits(x, env):
        return x[:, 0] @ env["embed"].T

    results["logits_ms"] = _time(logits, x, env)

    # --- bandwidth accounting ---
    wbytes = sum(int(np.prod(v.shape[1:])) for v in jax.tree.leaves(params["layers"])) * 2 * nl
    kvbytes = 2 * B * hkv * CAP * hd * nl + 2 * B * hkv * CAP * 4 * nl  # int8 + f32 scales
    kv_live = int(kvbytes * 0.75)
    ebytes = cfg.vocab_size * d * 2
    results["weight_gb"] = wbytes / 1e9
    results["kv_live_gb"] = kv_live / 1e9
    results["embed_gb"] = ebytes / 1e9
    results["weight_gbps"] = wbytes / (results["matmuls_ms"] / 1e3) / 1e9
    results["kv_gbps"] = kv_live / (results["attn_ms"] / 1e3) / 1e9
    results["embed_gbps"] = ebytes / (results["logits_ms"] / 1e3) / 1e9
    results["overlap_headroom_ms"] = results["full_ms"] - max(
        results["matmuls_ms"], results["attn_ms"]
    )
    results["serial_sum_ms"] = results["matmuls_ms"] + results["attn_ms"]
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
