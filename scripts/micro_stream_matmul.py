"""Decode weight-stream shootout: XLA dots vs Pallas streaming matmul kernels
(ops/matmul.py) on the matmuls-only layer scan at 3B/b96-112 shapes.

VERDICT r4 #3: ROADMAP's "592 GB/s is the practical XLA dot ceiling at M=96"
was asserted, never attacked. This measures the same matmuls-only
decomposition as scripts/micro_decode_decomp.py (packed qkv/gateup layout,
rope + norms + residuals included, attention replaced by a zero-cost
passthrough) with the dots swapped for `stream_matmul_stacked`:

  xla      rms_norm (XLA) + x @ w[li] per dot (the production bf16 path)
  stream   whole-K double-buffered Pallas tiles, rms_norm FUSED into the
           qkv/gateup dots, scalar-prefetch layer indexing off the full
           (L, K, N) stacks
  stream_noln  same kernels, norms left to XLA (isolates the fusion's value)

Timing: REPS data-dependent chained reps inside ONE jit (axon dispatch is
~36 ms/call; identical calls CSE — CLAUDE.md). Big arrays are REAL jit args.

Env: PADT_MICRO_B (96), PADT_MICRO_REPS (20), PADT_STREAM_BLKN (kernel N
tile override), PADT_MICRO_TINY=1 (CPU syntax check).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_3b, padt_tiny
from padt_tpu.models.language import rms_norm
from padt_tpu.ops.matmul import stream_matmul_stacked
from padt_tpu.ops.rope import apply_rotary, mrope_cos_sin

B = int(os.environ.get("PADT_MICRO_B", "96"))
REPS = int(os.environ.get("PADT_MICRO_REPS", "20"))
TINY = os.environ.get("PADT_MICRO_TINY", "0") == "1"


def _time(fn, x, env):
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
    cfg = (padt_tiny() if TINY else padt_3b()).text
    nl, d = cfg.num_hidden_layers, cfg.hidden_size
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    ff = cfg.intermediate_size
    eps = cfg.rms_norm_eps
    ks = jax.random.split(jax.random.PRNGKey(0), 6)

    stk = lambda key, shape: (
        jax.random.normal(key, (nl, *shape), jnp.float32) * 0.02
    ).astype(jnp.bfloat16)
    params = {
        "input_ln_w": jnp.ones((nl, d), jnp.bfloat16),
        "post_ln_w": jnp.ones((nl, d), jnp.bfloat16),
        "qkv_w": stk(ks[0], (d, (h + 2 * hkv) * hd)),
        "qkv_b": jnp.zeros((nl, (h + 2 * hkv) * hd), jnp.bfloat16),
        "o_w": stk(ks[1], (h * hd, d)),
        "gateup_w": stk(ks[2], (d, 2 * ff)),
        "down_w": stk(ks[3], (ff, d)),
    }
    x = (jax.random.normal(ks[4], (B, 1, d), jnp.float32) * 0.1).astype(jnp.bfloat16)
    pos_ids = jnp.full((3, B, 1), 900, jnp.int32)
    cos, sin = mrope_cos_sin(pos_ids, hd, cfg.mrope_section, cfg.rope_theta)
    li_xs = jnp.arange(nl, dtype=jnp.int32)

    def split_qkv(qkv):
        q = qkv[..., : h * hd].reshape(B, 1, h, hd)
        k = qkv[..., h * hd : (h + hkv) * hd].reshape(B, 1, hkv, hd)
        v = qkv[..., (h + hkv) * hd :].reshape(B, 1, hkv, hd)
        q = apply_rotary(q, cos[:, :, None, :], sin[:, :, None, :])
        k = apply_rotary(k, cos[:, :, None, :], sin[:, :, None, :])
        # fold k/v in so their columns aren't dead code; no KV read
        return q + jnp.pad(k + v, [(0, 0), (0, 0), (0, h - hkv), (0, 0)])

    def xla_step(xc, lp, _li):
        xn = rms_norm(xc, lp["input_ln_w"], eps)
        attn = split_qkv(xn @ lp["qkv_w"] + lp["qkv_b"])
        xc = xc + attn.reshape(B, 1, h * hd) @ lp["o_w"]
        xn = rms_norm(xc, lp["post_ln_w"], eps)
        gu = xn @ lp["gateup_w"]
        xc = xc + (jax.nn.silu(gu[..., :ff]) * gu[..., ff:]) @ lp["down_w"]
        return xc

    def stream_step(xc, p, li, fuse_ln):
        x2 = xc[:, 0]
        if fuse_ln:
            qkv = stream_matmul_stacked(
                x2, p["qkv_w"], li, ln_w=p["input_ln_w"], bias=p["qkv_b"], eps=eps
            )
        else:
            xn = rms_norm(x2, p["input_ln_w"][li], eps)
            qkv = stream_matmul_stacked(xn, p["qkv_w"], li, bias=p["qkv_b"])
        attn = split_qkv(qkv[:, None])
        x2 = x2 + stream_matmul_stacked(attn.reshape(B, h * hd), p["o_w"], li)
        if fuse_ln:
            gu = stream_matmul_stacked(x2, p["gateup_w"], li, ln_w=p["post_ln_w"], eps=eps)
        else:
            gu = stream_matmul_stacked(rms_norm(x2, p["post_ln_w"][li], eps), p["gateup_w"], li)
        hh = jax.nn.silu(gu[..., :ff]) * gu[..., ff:]
        x2 = x2 + stream_matmul_stacked(hh, p["down_w"], li)
        return x2[:, None]

    def run_xla(x, env):
        def body(xc, layer):
            lp, li = layer
            return xla_step(xc, lp, li), ()

        out, _ = jax.lax.scan(body, x, (env["params"], li_xs))
        return out

    def make_stream(fuse_ln):
        def run(x, env):
            def body(xc, li):
                return stream_step(xc, env["params"], li, fuse_ln), ()

            out, _ = jax.lax.scan(body, x, li_xs)
            return out

        return run

    env = dict(params=params)
    wbytes = sum(int(np.prod(v.shape)) for v in params.values()) * 2
    results = {"b": B, "weight_gb": round(wbytes / 1e9, 3)}
    for name, fn in (
        ("xla", run_xla),
        ("stream", make_stream(True)),
        ("stream_noln", make_stream(False)),
    ):
        ms = _time(fn, x, env)
        results[f"{name}_ms"] = round(ms, 3)
        results[f"{name}_gbps"] = round(wbytes / (ms / 1e3) / 1e9, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
