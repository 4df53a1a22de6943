"""Microbench: in-KERNEL head unpacking for the vision tower's hd=80 heads.

Decision input for ROADMAP lever #1 (prefill lane-pad FLOPs). The round-2
design pads heads 80->128 in the qkv/proj WEIGHTS (1.6x projection FLOPs,
~0.3-0.4 s of the 5.19 s b96 prefill); an XLA activation-side pad relayout
measured worse (BASELINE.md closed experiment). The untried variant: keep the
projections UNPADDED (full-rate MXU) and do the 80-lane head unpacking inside
the rope kernel, which already reads q/k and writes rotated copies — the pad
then costs only in-kernel VPU lane relayouts, no extra HBM pass.

Variants (vision shapes H=16, hd=80, S tokens):
  rope_pad      current `_rope_pair` on weight-padded (N, H*128) q/k  [baseline]
  unpack4d      Pallas: read fused UNPADDED (N, 3*H*80) qkv, rotate, write
                q/k/v as 4D (B, H, S, 80) arrays (the generic flash kernel's
                native layout — everything downstream runs unpadded)
  unpackpad     same read, write packed PADDED (N, H*128) q/k/v (attention
                kernels unchanged)
  merge4d       (B, H, S, 80) -> (N, 1280) head re-pack (needed after
                attention in the 4d design, before the proj matmul)

Decision rule: design wins if (unpack4d + merge4d) or unpackpad costs less
than the ~2.6 ms/layer-at-b96-equivalent saved on qkv-projection FLOPs
(scaled to this micro's token count).

Run on the TPU: `python scripts/micro_vis_unpack.py`. One JSON line.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, HD, LANE = 16, 80, 128
B = int(os.environ.get("PADT_MICRO_B", "16"))
S = int(os.environ.get("PADT_MICRO_S", "2304"))
# blk 768 VMEM-OOMs: double-buffered (in + 3 outs) = ~24-30 MB > 16 MB VMEM
BLK = 256
REPS = int(os.environ.get("PADT_MICRO_REPS", "20"))


def _time(op, *operands, consume="elem"):
    """K data-dependent reps inside ONE jit (dispatch+sync on the axon tunnel
    is ~36 ms — per-call timing is noise). `consume`: "elem" reads one output
    element (enough to force an opaque pallas_call to run fully), "sum"
    reduces every element (required for matmuls, which XLA can narrow to
    whatever slice is consumed)."""

    def fn(x, *rest):
        def body(carry, _):
            xx, acc = carry
            out = op(xx, *rest)
            leaves = jax.tree.leaves(out)
            if consume == "sum":
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
            else:
                s = sum(l[(0,) * l.ndim].astype(jnp.float32) for l in leaves) * 1e-30
            xx = xx + s.astype(xx.dtype)
            return (xx, acc + s), None

        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)), None, length=REPS)
        return acc

    jfn = jax.jit(fn)
    float(jfn(*operands))  # compile + sync (small host readback)
    t0 = time.perf_counter()
    float(jfn(*operands))
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def _rot80(x, c, s):
    half = HD // 2
    rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=-1)
    return x * c + rot * s


def _unpack_kernel(qkv_ref, cos_ref, sin_ref, oq_ref, ok_ref, ov_ref, *, mode):
    x = qkv_ref[0]
    c = cos_ref[0].astype(jnp.float32)
    s = sin_ref[0].astype(jnp.float32)
    blk = x.shape[0]
    pads = jnp.zeros((blk, LANE - HD), jnp.float32)
    qs, ks, vs = [], [], []
    for h in range(H):
        qh = x[:, HD * h : HD * (h + 1)].astype(jnp.float32)
        kh = x[:, H * HD + HD * h : H * HD + HD * (h + 1)].astype(jnp.float32)
        vh = x[:, 2 * H * HD + HD * h : 2 * H * HD + HD * (h + 1)]
        qr = _rot80(qh, c, s)
        kr = _rot80(kh, c, s)
        if mode == "4d":
            oq_ref[0, h] = qr.astype(oq_ref.dtype)
            ok_ref[0, h] = kr.astype(ok_ref.dtype)
            ov_ref[0, h] = vh.astype(ov_ref.dtype)
        else:
            qs.append(jnp.concatenate([qr, pads], axis=-1))
            ks.append(jnp.concatenate([kr, pads], axis=-1))
            vs.append(jnp.concatenate([vh.astype(jnp.float32), pads], axis=-1))
    if mode == "pad":
        oq_ref[0] = jnp.concatenate(qs, axis=-1).astype(oq_ref.dtype)
        ok_ref[0] = jnp.concatenate(ks, axis=-1).astype(ok_ref.dtype)
        ov_ref[0] = jnp.concatenate(vs, axis=-1).astype(ov_ref.dtype)


def unpack(qkv, cos, sin, mode):
    b, s_len, _ = qkv.shape
    grid = (b, s_len // BLK)
    in_specs = [
        pl.BlockSpec((1, BLK, 3 * H * HD), lambda bi, si: (bi, si, 0)),
        pl.BlockSpec((1, BLK, HD), lambda bi, si: (bi, si, 0)),
        pl.BlockSpec((1, BLK, HD), lambda bi, si: (bi, si, 0)),
    ]
    if mode == "4d":
        out_specs = [pl.BlockSpec((1, H, BLK, HD), lambda bi, si: (bi, 0, si, 0))] * 3
        out_shape = [jax.ShapeDtypeStruct((b, H, s_len, HD), qkv.dtype)] * 3
    else:
        out_specs = [pl.BlockSpec((1, BLK, H * LANE), lambda bi, si: (bi, si, 0))] * 3
        out_shape = [jax.ShapeDtypeStruct((b, s_len, H * LANE), qkv.dtype)] * 3
    return pl.pallas_call(
        functools.partial(_unpack_kernel, mode=mode),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qkv, cos, sin)


def _merge_kernel(x_ref, o_ref):
    o_ref[0] = jnp.concatenate([x_ref[0, h] for h in range(H)], axis=-1)


def merge4d(x):
    b, _, s_len, _ = x.shape
    return pl.pallas_call(
        _merge_kernel,
        grid=(b, s_len // BLK),
        in_specs=[pl.BlockSpec((1, H, BLK, HD), lambda bi, si: (bi, 0, si, 0))],
        out_specs=pl.BlockSpec((1, BLK, H * HD), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_len, H * HD), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x)


def main():
    from padt_tpu.ops.pallas_attention import _rope_pair

    bf = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qkv = jax.random.normal(ks[0], (B, S, 3 * H * HD), jnp.float32).astype(bf)
    qkv_pad = jax.random.normal(ks[1], (B, S, 3 * H * LANE), jnp.float32).astype(bf)
    cos80 = jnp.cos(jax.random.normal(ks[2], (B, S, HD), jnp.float32))
    sin80 = jnp.sin(jax.random.normal(ks[3], (B, S, HD), jnp.float32))
    cos128 = jnp.pad(cos80, [(0, 0), (0, 0), (0, LANE - HD)])
    sin128 = jnp.pad(sin80, [(0, 0), (0, 0), (0, LANE - HD)])

    res = {}
    # baseline: current fused-qkv rope pass (q and k rotated, padded layout)
    res["rope_pad_ms"] = _time(
        lambda x, c, s: _rope_pair(x, x, c, s, H, HD, k_blk_offset=H),
        qkv_pad, cos128, sin128,
    )
    res["unpack4d_ms"] = _time(lambda x, c, s: unpack(x, c, s, "4d"), qkv, cos80, sin80)
    res["unpackpad_ms"] = _time(lambda x, c, s: unpack(x, c, s, "pad"), qkv, cos80, sin80)

    q4 = jax.jit(lambda x, c, s: unpack(x, c, s, "4d"))(qkv, cos80, sin80)[0]
    res["merge4d_ms"] = _time(merge4d, q4)

    # qkv projection A/B at this token count: the FLOPs the unpadded design
    # recovers (pad vs unpad matmul). "sum" consumer: XLA would otherwise
    # narrow the matmul to the consumed slice.
    x = jax.random.normal(ks[0], (B * S, 1280), jnp.float32).astype(bf)
    w_u = jax.random.normal(ks[1], (1280, 3 * H * HD), jnp.float32).astype(bf)
    w_p = jax.random.normal(ks[2], (1280, 3 * H * LANE), jnp.float32).astype(bf)
    res["proj_unpad_ms"] = _time(lambda a, w: a @ w, x, w_u, consume="sum")
    res["proj_pad_ms"] = _time(lambda a, w: a @ w, x, w_p, consume="sum")

    res = {k: round(v, 3) for k, v in res.items()}
    saved = res["proj_pad_ms"] - res["proj_unpad_ms"]
    cost_4d = res["unpack4d_ms"] - res["rope_pad_ms"] + res["merge4d_ms"]
    cost_pad = res["unpackpad_ms"] - res["rope_pad_ms"]
    res.update(
        tokens=B * S,
        qkv_flops_saved_ms=round(saved, 3),
        net_4d_ms=round(saved - cost_4d, 3),
        net_pad_ms=round(saved - cost_pad, 3),
        backend=jax.default_backend(),
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
