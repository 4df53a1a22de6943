"""Microbench: can the vision tower's hd=80 lane-pad FLOPs be removed by
keeping activations TRANSPOSED (feature dim on sublanes, tokens on lanes)?

Background (BASELINE.md "activation-side head lane-padding", closed): the
round-2 design zero-pads each 80-lane head to 128 in the qkv/proj WEIGHTS so
the projections emit Mosaic-legal 128-lane head tiles — at the cost of ~1.6x
FLOPs on qkv/proj (~0.4 s of the 5.19 s prefill at 3B/b96). Un-padding the
weights and relaying out activations measured WORSE (lane-unaligned pad
relayout per block).

The untried decomposition: emit the qkv projection TRANSPOSED —
`einsum('nd,do->on')` — so heads live on the SUBLANE axis where an 80-row
slice IS tile-aligned (80 = 10*8): a Pallas kernel can take (80, blk) blocks
of a (3*H*80, N) array legally, with no pad FLOPs and no relayout... IF XLA
fuses the transposed output into the matmul instead of materializing a
transpose pass. That fusion question is what this script measures.

Variants (bf16, vision-tower shapes d=1280, H=16, hd=80):
  pad     y  = x @ w_pad            (N,6144)  — current design's qkv cost
  unpad   y  = x @ w                (N,3840)  — FLOP floor, layout unusable
  tout    yt = einsum('nd,do->on')  (3840,N)  — transposed OUTPUT only
  tboth   yt = einsum('dn,do->on')  (3840,N)  — transposed in AND out
                                                (steady-state transposed tower)
  tproj   z  = einsum('on,oc->cn')  (1280,N)  — proj direction, stays transposed

Decision rule: if tboth <= unpad * ~1.15 the transposed tower wins
(~0.3-0.4 s prefill); if tboth ~ pad or worse, XLA is inserting relayouts
and the design is dead — record and close (third and final layout idea).

Run on the TPU: `python scripts/micro_vis_transposed.py`. One JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D, O_UNPAD, O_PAD = 1280, 3840, 6144  # d, 3*H*hd, 3*H*128
N = int(os.environ.get("PADT_MICRO_N", str(96 * 1152)))  # half the b96 token count
K = int(os.environ.get("PADT_MICRO_K", "8"))


def _chain(op, *operands):
    """K data-dependent repetitions of `op` inside one jit (CSE-proof: each
    iteration's x is perturbed by a runtime scalar from the previous y)."""

    def fn(x, *rest):
        def body(carry, _):
            xx, acc = carry
            y = op(xx, *rest)
            # consume EVERY output element: a single-element read lets XLA
            # narrow the matmul to one dot product (first version of this
            # script measured dispatch latency, not FLOPs)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-30
            xx = xx + s.astype(xx.dtype)
            return (xx, acc + s), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None, length=K)
        return acc

    jfn = jax.jit(fn)
    acc = jfn(*operands)
    float(acc)  # compile + sync (tunnel-safe small readback)
    t0 = time.perf_counter()
    acc = jfn(*operands)
    float(acc)
    return (time.perf_counter() - t0) / K


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    bf = jnp.bfloat16
    x = jax.random.normal(ks[0], (N, D), jnp.float32).astype(bf)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x, jnp.float32).T), bf)
    w = jax.random.normal(ks[1], (D, O_UNPAD), jnp.float32).astype(bf)
    w_pad = jax.random.normal(ks[2], (D, O_PAD), jnp.float32).astype(bf)
    yt = jax.random.normal(ks[3], (O_UNPAD, N), jnp.float32).astype(bf)
    wp = jax.random.normal(ks[4], (O_UNPAD, D), jnp.float32).astype(bf)

    res = {}
    res["pad_ms"] = _chain(lambda a, b: a @ b, x, w_pad) * 1e3
    res["unpad_ms"] = _chain(lambda a, b: a @ b, x, w) * 1e3
    res["tout_ms"] = _chain(lambda a, b: jnp.einsum("nd,do->on", a, b), x, w) * 1e3
    res["tboth_ms"] = _chain(lambda a, b: jnp.einsum("dn,do->on", a, b), xt, w) * 1e3
    res["tproj_ms"] = _chain(lambda a, b: jnp.einsum("on,oc->cn", a, b), yt, wp) * 1e3

    flop_unpad = 2.0 * N * D * O_UNPAD
    res = {k: round(v, 3) for k, v in res.items()}
    res.update(
        n_tokens=N,
        chain_k=K,
        tflops_unpad_at_tboth=round(flop_unpad / (res["tboth_ms"] * 1e-3) / 1e12, 1),
        backend=jax.default_backend(),
        verdict=(
            "transposed-tower VIABLE"
            if res["tboth_ms"] <= res["unpad_ms"] * 1.15
            and res["tproj_ms"] <= res["unpad_ms"] * 1.15  # same FLOP count

            else "transposed-tower dead (XLA relayouts)"
        ),
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
