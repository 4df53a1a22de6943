"""Backward-residual ablation of the fused SFT step (one chip, b8).

profile_train (round 4) puts the backward at 0.551 s vs its ~0.44 s
remat-inclusive matmul floor. This times fwd_bwd with components
MONKEYPATCHED to near-zero cost (wrong math, same matmul shapes — timing
only) to locate the ~0.11 s residual:

  base        full fwd+bwd (profile_train's fwd_bwd phase)
  norms_free  rms_norm -> x * w in the text/vision/decoder stacks (kills the
              norm VJP's reduction+rsqrt chain; matmuls unchanged)
  ce_cheap    sft_token_loss -> masked mean of the target-gathered logits
              (kills the fp32 logaddexp-softmax CE fwd+bwd; the lm-head and
              prototype matmuls still run and still get cotangents)
  bwd_xla     PADT_FLASH_BWD=xla (recompute attention backward) for
              reference against the Pallas kernels

Grads are consumed in-jit (scalar), matching profile_train's fwd_bwd.
Env: PADT_TRAIN_BATCH (8), PADT_MICRO_REPS (4).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import bench_train
    from padt_tpu.config import padt_3b
    from padt_tpu.models import padt as P
    from padt_tpu.train.train_step import LossConfig, padt_loss

    batch_size = int(os.environ.get("PADT_TRAIN_BATCH", "8"))
    reps = int(os.environ.get("PADT_MICRO_REPS", "4"))
    if os.environ.get("PADT_MICRO_TINY", "0") == "1":  # CPU syntax check
        from padt_tpu.config import padt_tiny

        cfg = padt_tiny().replace(max_image_patches=256)
        grid, lp, lc = (1, 16, 16), 96, 32
    else:
        cfg = padt_3b().replace(max_image_patches=2304, max_objects=8)
        grid, lp, lc = (1, 46, 46), 576, 64
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    batch, canvas_hw = bench_train._build_batch(cfg, batch_size, grid, lp, lc)
    lcfg = LossConfig(freeze_vision=True)
    warmup = jnp.asarray(False)

    def grad_fn():
        def f(p, b, w):
            return padt_loss(p, cfg, b, lp, canvas_hw, lcfg, w)

        def g(p, b, w):
            (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(p, b, w)
            gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(grads))
            return loss + gsum * 1e-30

        return jax.jit(g)

    def timeit(jfn):
        out = jfn(params, batch, warmup)
        np.asarray(jax.device_get(out))  # sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(params, batch, warmup)
        np.asarray(jax.device_get(out))
        return (time.perf_counter() - t0) / reps

    results = {}
    results["base_s"] = timeit(grad_fn())

    # --- norms free ---
    from padt_tpu.models import decoder as D
    from padt_tpu.models import language as L
    from padt_tpu.models import vision as V
    from padt_tpu.ops import norms as NORMS

    def fake_norm(x, w, eps=1e-6):
        return x * w

    saved = (L.rms_norm, V.rms_norm, D.rms_norm, NORMS.rms_norm)
    L.rms_norm = V.rms_norm = D.rms_norm = NORMS.rms_norm = fake_norm
    try:
        results["norms_free_s"] = timeit(grad_fn())
    finally:
        L.rms_norm, V.rms_norm, D.rms_norm, NORMS.rms_norm = saved

    # --- CE cheap ---
    from padt_tpu.train import losses as LOSSES

    real_ce = LOSSES.sft_token_loss

    def cheap_ce(logits, target_ids, completion_mask, vrt_penalty_mask, vocab_size,
                 use_vp_mask=True):
        lt, lv = logits if isinstance(logits, tuple) else (logits, logits)
        tgt = jnp.clip(target_ids.astype(jnp.int32), 0, lt.shape[-1] - 1)
        pick = jnp.take_along_axis(lt, tgt[:, :, None], axis=-1)[..., 0]
        pick = pick + lv.mean(-1)  # keep lv's cotangent alive
        m = completion_mask.astype(jnp.float32)
        return (pick.astype(jnp.float32) * m).sum(-1) / (m.sum(-1) + 1e-4)

    LOSSES.sft_token_loss = cheap_ce
    try:
        results["ce_cheap_s"] = timeit(grad_fn())
    finally:
        LOSSES.sft_token_loss = real_ce

    # --- XLA recompute attention backward ---
    os.environ["PADT_FLASH_BWD"] = "xla"
    try:
        results["bwd_xla_s"] = timeit(grad_fn())
    finally:
        os.environ.pop("PADT_FLASH_BWD", None)

    results["norms_cost_s"] = results["base_s"] - results["norms_free_s"]
    results["ce_cost_s"] = results["base_s"] - results["ce_cheap_s"]
    results["pallas_bwd_gain_s"] = results["bwd_xla_s"] - results["base_s"]
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
