"""Measured MXU-utilization floor of the vision tower (one chip, 3B shapes).

BASELINE.md's prefill close-out used an ASSUMED 75% MXU efficiency; VERDICT
r3 #1 asks for a measured profile instead. Two timings at the production
chunk shape (B=PADT_MICRO_B images x 2304 slot tokens):

  full      vision_forward (production: unpack-pad rope kernel + windowed/
            full attention + merger)
  matmuls   the same layer stack with attention replaced by a q passthrough
            (projections, MLPs, merger unchanged — the pure matmul stream)

From `matmuls` and the exact matmul FLOP count, the ACHIEVED MXU efficiency
of the tower's matmul mix is measured, not assumed; (full - matmuls) is the
attention+rope overhead the kernels actually cost. The matmul mix itself is
irreducible (checkpoint shapes), so `full` vs `matmuls * (1 + overhead%)`
bounds what any further kernel work could recover.

Env: PADT_MICRO_B (4: the bench's vision chunk), PADT_MICRO_REPS (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("PADT_MICRO_B", "4"))
REPS = int(os.environ.get("PADT_MICRO_REPS", "8"))


def main():
    from padt_tpu.config import padt_3b
    from padt_tpu.models import padt as P
    from padt_tpu.models import vision as V
    from padt_tpu.models.vision_geom import vision_geometry

    cfg = padt_3b().replace(max_image_patches=2304)
    vc = cfg.vision
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)["vision"]
    grid = (1, 46, 46)
    geom = vision_geometry([grid] * B, cfg.max_image_patches)
    pix = (jax.random.normal(jax.random.PRNGKey(1), (B, cfg.max_image_patches, vc.patch_input_dim), jnp.float32) * 0.1)

    args = dict(
        window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index),
        seg_win=jnp.asarray(geom.seg_win),
        seg_full=jnp.asarray(geom.seg_full),
        hpos=jnp.asarray(geom.hpos),
        wpos=jnp.asarray(geom.wpos),
        pack_index=None if geom.pack_index is None else jnp.asarray(geom.pack_index),
    )

    def timeit(fn):
        out = fn()
        float(np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn()
        float(np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])))
        return (time.perf_counter() - t0) / REPS

    jfull = jax.jit(lambda p, x: V.vision_forward(p, vc, x, **args))
    t_full = timeit(lambda: jfull(params, pix))

    # matmuls only: attention -> padded-q passthrough (output shape matches
    # the padded-head contract so proj_w consumes it unchanged)
    from padt_tpu.ops import attention as A

    real_fused = A.fused_vision_attention_qkv
    real_win = A.window_attention_qkv

    def passthrough(qkv, cos, sin, seg, num_heads, **kw):
        b, s, dh3 = qkv.shape
        d = dh3 // (3 * num_heads)
        q = qkv[..., : num_heads * d].reshape(b, s, num_heads, d)
        if A.use_pallas() and d % 128 != 0:
            q = jnp.pad(q, [(0, 0), (0, 0), (0, 0), (0, 128 - d)])
        return q.reshape(b, s, -1)

    A.fused_vision_attention_qkv = passthrough
    A.window_attention_qkv = lambda qkv, cos, sin, seg, h, win=64, **kw: passthrough(
        qkv, cos, sin, seg, h
    )
    V.fused_vision_attention_qkv = A.fused_vision_attention_qkv
    V.window_attention_qkv = A.window_attention_qkv
    try:
        jmm = jax.jit(lambda p, x: V.vision_forward(p, vc, x, **args))
        t_mm = timeit(lambda: jmm(params, pix))
    finally:
        A.fused_vision_attention_qkv = real_fused
        A.window_attention_qkv = real_win
        V.fused_vision_attention_qkv = real_fused
        V.window_attention_qkv = real_win

    # exact matmul FLOPs (per token): patch_embed + qkv(unpadded) + proj
    # (padded rows are zeros but the MXU still runs 128-lane tiles) + MLP
    # + merger
    d, ff, dep = vc.hidden_size, vc.intermediate_size, vc.depth
    h, hd = vc.num_heads, vc.head_dim
    s = cfg.max_image_patches
    m = s // vc.spatial_merge_unit
    per_layer = 2 * d * (3 * h * hd) + 2 * (h * 128) * d + 2 * d * ff * 3
    tower = dep * per_layer * s
    patch = 2 * vc.patch_input_dim * d * s
    merger_dim = d * vc.spatial_merge_unit
    merger = (2 * merger_dim * merger_dim + 2 * merger_dim * vc.out_hidden_size) * m
    flops = (tower + patch + merger) * B
    peak = 197e12  # v5e bf16
    print(json.dumps({
        "b_images": B,
        "full_s": round(t_full, 4),
        "matmuls_s": round(t_mm, 4),
        "attn_rope_overhead_s": round(t_full - t_mm, 4),
        "matmul_tflop": round(flops / 1e12, 2),
        "mxu_eff_matmuls": round(flops / t_mm / peak, 3),
        "mxu_eff_full": round(flops / t_full / peak, 3),
    }))


if __name__ == "__main__":
    main()
