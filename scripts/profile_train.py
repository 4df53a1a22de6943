"""Phase-ablation profile of the fused SFT train step (one chip).

Splits the measured train-step time (bench_train.py, reference workload
`run_scripts/padt_pro_3b_sft.sh:20-43`) into:

  vision_fwd   frozen-tower forward (appears once; no backward when frozen)
  fwd_loss     full loss forward (all four losses + decoder chain)
  fwd_bwd      value_and_grad (adds the remat backward)
  step_full    fwd_bwd + optimizer update (the bench_train number)

and derives: backward = fwd_bwd - fwd_loss, optimizer = step_full - fwd_bwd,
decoder_chain = fwd_loss(all losses) - fwd_loss(sft only), bwd/fwd ratio
(remat recompute shows up here; a remat text stack re-runs its forward once
inside the backward, so the matmul-floor ratio is ~2.0 for frozen-vision).

Prints one JSON line per phase + a "derived" line. Same env knobs as
bench_train.py (PADT_TRAIN_BATCH / PADT_TRAIN_OPT / PADT_TRAIN_FREEZE /
PADT_TRAIN_SMALL / PADT_TRAIN_STEPS); PADT_PROF_TRACE=<dir> additionally
wraps the timed step_full loop in a jax.profiler trace for XProf.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_phase(fn, sync, n_steps):
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n_steps, compile_s


def main():
    import jax
    import jax.numpy as jnp

    import bench_train
    from padt_tpu.models import padt as P
    from padt_tpu.train.train_step import (
        LossConfig,
        make_optimizer,
        make_train_step,
        padt_loss,
    )

    small = os.environ.get("PADT_TRAIN_SMALL", "0") == "1"
    freeze_vision = os.environ.get("PADT_TRAIN_FREEZE", "1") == "1"
    opt_name = os.environ.get("PADT_TRAIN_OPT", "adafactor")
    n_steps = int(os.environ.get("PADT_TRAIN_STEPS", "4"))
    batch_size = int(os.environ.get("PADT_TRAIN_BATCH", "2" if small else "8"))

    if small:
        from padt_tpu.config import padt_tiny

        cfg = padt_tiny().replace(max_image_patches=256)
        grid, lp, lc = (1, 16, 16), 96, 32
    else:
        from padt_tpu.config import padt_3b

        cfg = padt_3b().replace(max_image_patches=2304, max_objects=8)
        grid, lp, lc = (1, 46, 46), 576, 64

    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    batch, canvas_hw = bench_train._build_batch(cfg, batch_size, grid, lp, lc)
    lcfg = LossConfig(freeze_vision=freeze_vision)
    warmup = jnp.asarray(False)

    def sync_loss(out):
        # host readback of one scalar leaf = the only real sync on axon
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1] if leaf.ndim else leaf))

    results = {}

    # --- vision tower forward alone ---
    from padt_tpu.models import vision as V

    vis_keys = [
        "pixel_patches", "window_index", "inv_window_index", "seg_win",
        "seg_full", "hpos", "wpos",
    ]
    vis_in = {k: batch[k] for k in vis_keys}
    if "pack_index" in batch:
        vis_in["pack_index"] = batch["pack_index"]
    jvis = jax.jit(
        lambda p, b: V.vision_forward(
            p, cfg.vision, b["pixel_patches"], b["window_index"],
            b["inv_window_index"], b["seg_win"], b["seg_full"], b["hpos"],
            b["wpos"], pack_index=b.get("pack_index"),
        )
    )
    results["vision_fwd"] = _time_phase(
        lambda: jvis(params["vision"], vis_in), sync_loss, n_steps
    )

    # --- loss forward (all losses / sft only) ---
    def loss_fn(lcfg_):
        def f(p, b, w):
            return padt_loss(p, cfg, b, lp, canvas_hw, lcfg_, w)

        return f

    jfwd = jax.jit(loss_fn(lcfg))
    results["fwd_loss"] = _time_phase(
        lambda: jfwd(params, batch, warmup)[0], sync_loss, n_steps
    )
    sft_only = lcfg._replace(
        use_bbox_loss=False, use_score_loss=False, use_mask_loss=False
    )
    jfwd_sft = jax.jit(loss_fn(sft_only))
    results["fwd_loss_sft_only"] = _time_phase(
        lambda: jfwd_sft(params, batch, warmup)[0], sync_loss, n_steps
    )

    # --- value_and_grad (no optimizer) ---
    def grad_phase(p, b, w):
        (loss, aux), grads = jax.value_and_grad(loss_fn(lcfg), has_aux=True)(p, b, w)
        # consume grads into a scalar INSIDE the jit: returning the 6.4 GB
        # bf16 grad tree keeps every leaf live to the output — alongside
        # params that OOMs 15.75 GB HBM; a scalar reduction lets XLA free
        # each grad buffer as the backward produces it (the backward itself
        # is unchanged — every grad is still computed and consumed)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return loss + gsum * 1e-30

    jgrad = jax.jit(grad_phase)
    results["fwd_bwd"] = _time_phase(
        lambda: jgrad(params, batch, warmup), sync_loss, n_steps
    )

    # --- full train step (grads donated; fresh params/opt_state per timing) ---
    from padt_tpu.train.train_step import vision_frozen_mask

    opt = make_optimizer(
        learning_rate=2e-5, total_steps=1000, optimizer=opt_name,
        frozen_mask=vision_frozen_mask if freeze_vision else None,
    )
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, prompt_length=lp, canvas_hw=canvas_hw, lcfg=lcfg)
    jstep = jax.jit(step, donate_argnums=(0, 1))

    t0 = time.perf_counter()
    params, opt_state, metrics = jstep(params, opt_state, batch, warmup)
    sync_loss(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, metrics = jstep(params, opt_state, batch, warmup)
    sync_loss(metrics["loss"])
    results["step_full"] = ((time.perf_counter() - t0) / n_steps, compile_s)

    trace_dir = os.environ.get("PADT_PROF_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(2):
                params, opt_state, metrics = jstep(params, opt_state, batch, warmup)
            sync_loss(metrics["loss"])

    for name, (t, c) in results.items():
        print(json.dumps({"phase": name, "t_s": round(t, 4), "compile_s": round(c, 1)}))
    t = {k: v[0] for k, v in results.items()}
    print(
        json.dumps(
            {
                "derived": {
                    "backward_s": round(t["fwd_bwd"] - t["fwd_loss"], 4),
                    "optimizer_s": round(t["step_full"] - t["fwd_bwd"], 4),
                    "decoder_chain_s": round(t["fwd_loss"] - t["fwd_loss_sft_only"], 4),
                    "vision_fwd_s": round(t["vision_fwd"], 4),
                    "llm_fwd_s_est": round(t["fwd_loss_sft_only"] - t["vision_fwd"], 4),
                    "bwd_over_fwd": round((t["fwd_bwd"] - t["fwd_loss"]) / max(t["fwd_loss"], 1e-9), 3),
                },
                "config": {
                    "batch": batch_size,
                    "freeze_vision": freeze_vision,
                    "optimizer": opt_name,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
