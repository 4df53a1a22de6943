"""Benchmark: PaDT SFT training step time / tokens/s / MFU on one chip.

The reference's primary workload is 8-GPU SFT (run_scripts/padt_pro_3b_sft.sh:
per-device batch 16, bf16, grad checkpointing, ZeRO-3). This measures the
TPU-native fused train step — all four losses (sft CE + bbox + score + mask)
plus the optimizer update in ONE jitted program — on the largest
single-chip-feasible 3B configuration:

  - full PaDT-3B weights (bf16), REC-shaped batch (644px image -> 529 merged
    patches, 64-token completion bucket)
  - frozen vision tower (stop_gradient at the tower outputs: no ViT backward,
    matching the reference's `--freeze_vision_modules` option) — 3.09B text +
    decoder/prototyper params trainable
  - remat (gradient checkpointing) on text + vision layers
  - Adafactor (factored second moment, no momentum): AdamW fp32 moments for
    3.1B trainable params are ~25 GB and cannot fit next to bf16 weights in
    15.75 GB HBM; Adafactor states are O(rows+cols).

Prints ONE JSON line: {"metric": "train_step_time_s", "value": ..., "unit":
"s", ...} with tokens/s/chip and model-FLOPs MFU in "detail".

Env: PADT_TRAIN_BATCH (default ladder 8/4/2/1), PADT_TRAIN_OPT
(adafactor|adamw), PADT_TRAIN_FREEZE (1 default), PADT_TRAIN_SMALL=1 (tiny
config for CPU smoke), PADT_TRAIN_STEPS (timed steps, default 4),
PADT_TRAIN_ACCUM (micro-steps per optimizer update, default 1 = fused step),
PADT_TRAIN_VISION_CACHE=1 (frozen-tower feature caching steady state: the
tower runs zero times per step — trainer `cache_vision_features`).

Single-chip batch ladder (measured): fused batch 16 misses HBM by 7.39 MB;
batch 8 + accum 2 (effective 16) misses by 5.17 GB — the bf16 grad
accumulator must stay resident across micro-steps next to params + the
backward workspace, so accumulation can never beat the largest fused batch
on one chip. Effective batch 16 is a >=2-chip config (grads shard over
fsdp); the 8-device dryrun covers that program. accum stays useful on
CPU/multi-chip and mirrors the trainer's make_grad_and_apply_fns path.
"""

import json
import os
import time

import numpy as np


def _tree_param_count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _flops_per_step(cfg, params, batch_size, l_total, lc, s_patches, freeze_vision):
    """Matmul-dominated model-FLOPs estimate for one train step.

    forward = 2*N_matmul per token; backward = 2x forward over trainable parts.
    Attention scores/probs matmuls added explicitly (not in param count).
    """
    n_text_layers = _tree_param_count(params["text"]["layers"])
    tc, vc = cfg.text, cfg.vision
    # embed gather is free; logits head runs over lc positions vs (V + M) cols
    v_ext = tc.vocab_size + cfg.max_merged_patches
    head = 2 * v_ext * tc.hidden_size * lc
    attn_text = 4 * l_total * l_total * tc.num_attention_heads * tc.head_dim
    text_fwd = 2 * n_text_layers * l_total + head + attn_text

    n_vis = _tree_param_count(params["vision"])
    n_full = len(vc.fullatt_block_indexes)
    n_win = vc.depth - n_full
    win = 64  # (window_size/patch_size)^2 / spatial_merge... tokens per window
    attn_vis = 4 * s_patches * vc.hidden_size * (n_full * s_patches + n_win * win)
    vis_fwd = 2 * n_vis * s_patches + attn_vis

    vis_mult = 1 if freeze_vision else 3
    per_sample = vis_mult * vis_fwd + 3 * text_fwd
    return per_sample * batch_size


def _build_batch(cfg, b, grid, lp, lc, n_obj_valid=None):
    import jax.numpy as jnp

    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    s_max = cfg.max_image_patches
    grids = [grid] * b
    geom = vision_geometry(grids, s_max)
    rng = np.random.RandomState(0)
    pix = rng.randn(b, s_max, cfg.vision.patch_input_dim).astype(np.float32)

    nm = grid[0] * grid[1] * grid[2] // 4
    v = cfg.text.vocab_size
    l = lp + lc
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    # prompt: [pad...][vision_start][529 image pads][~30 text tokens]
    t0 = min(1000, v // 2)
    seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + list(range(t0, t0 + 30))
    assert len(seq) <= lp, (len(seq), lp)
    for i in range(b):
        ids[i, lp - len(seq):lp] = seq
        am[i, lp - len(seq):lp] = 1
    # completion: REC-style answer with a 5-VRT run, rest text, EOS-terminated
    comp = rng.randint(5, min(2000, v - 20), size=(b, lc)).astype(np.int64)
    comp[:, 6:11] = v + np.arange(5)  # VRT run (local ids 0..4)
    comp[:, -1] = cfg.eos_token_id
    ids[:, lp:] = comp
    am[:, lp:] = 1
    pos, deltas = get_rope_index(ids, am, np.array(grids), cfg.image_token_id)
    comp_mask = np.zeros_like(am)
    comp_mask[:, lp:] = 1

    m_bucket = cfg.max_merged_patches
    n_obj, k_max = cfg.max_objects, cfg.max_vrt_per_object
    n_valid = n_obj_valid if n_obj_valid is not None else min(b, n_obj)
    hc = wc = grid[1] // 2  # merged-grid side (square grids here)
    rng2 = np.random.RandomState(1)
    gather = np.full((n_obj, k_max), lp + 6, np.int64)
    gather[:, :5] = lp + 6 + np.arange(5)
    batch = dict(
        pixel_patches=jnp.asarray(pix, jnp.bfloat16),
        window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index),
        seg_win=jnp.asarray(geom.seg_win),
        seg_full=jnp.asarray(geom.seg_full),
        hpos=jnp.asarray(geom.hpos),
        wpos=jnp.asarray(geom.wpos),
        num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches),
        grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
        completion_mask=jnp.asarray(comp_mask, jnp.int32),
        vrt_penalty_mask=jnp.zeros((b, lc, m_bucket), bool),
        obj_sample=jnp.asarray(np.arange(n_obj) % b, jnp.int32),
        gather_pos=jnp.asarray(gather, jnp.int32),
        vrt_counts=jnp.asarray(np.full((n_obj,), 5), jnp.int32),
        obj_valid=jnp.asarray(np.arange(n_obj) < n_valid),
        picked_patch_ids=jnp.asarray(rng2.randint(0, m_bucket, (n_obj, k_max)), jnp.int32),
        gt_boxes=jnp.asarray(np.tile([0.2, 0.2, 0.8, 0.8], (n_obj, 1)), jnp.float32),
        gt_mask=jnp.asarray(rng2.rand(n_obj, hc * 4, wc * 4) > 0.5, jnp.float32),
        gt_mask_valid=jnp.ones((n_obj, hc * 4, wc * 4), jnp.float32),
    )
    return batch, (hc, wc)


def run(batch_size):
    import jax
    import jax.numpy as jnp

    from padt_tpu.models import padt as P
    from padt_tpu.train.train_step import LossConfig, make_optimizer, make_train_step

    small = os.environ.get("PADT_TRAIN_SMALL", "0") == "1"
    freeze_vision = os.environ.get("PADT_TRAIN_FREEZE", "1") == "1"
    opt_name = os.environ.get("PADT_TRAIN_OPT", "adafactor")
    n_steps = int(os.environ.get("PADT_TRAIN_STEPS", "4"))

    if small:
        from padt_tpu.config import padt_tiny

        cfg = padt_tiny().replace(max_image_patches=256)
        grid, lp, lc = (1, 16, 16), 96, 32
    else:
        from padt_tpu.config import padt_3b

        cfg = padt_3b().replace(max_image_patches=2304, max_objects=8)
        grid, lp, lc = (1, 46, 46), 576, 64

    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    batch, canvas_hw = _build_batch(cfg, batch_size, grid, lp, lc)

    # PADT_TRAIN_VISION_CACHE=1 (requires freeze): swap the tower inputs for
    # precomputed tower outputs (models/padt.py::vision_features) — the
    # trainer's cache_vision_features steady state. Features sit device-
    # resident here, standing in for a real host's per-batch feed (~10 MB x
    # batch per step over PCIe; this machine's tunnel can't sustain that, but
    # the STEP cost is what's being measured).
    vision_cache = os.environ.get("PADT_TRAIN_VISION_CACHE", "0") == "1"
    # PADT_TRAIN_VISION_CACHE_DTYPE=int8: per-row int8 cached features (halves
    # their device residency — the b16-cached lever, VERDICT r4 #6)
    vc_quant = "int8" if os.environ.get("PADT_TRAIN_VISION_CACHE_DTYPE") == "int8" else "none"
    if vision_cache:
        assert freeze_vision, "vision-feature caching is exact only with frozen vision"
        feat_fn = jax.jit(lambda p, b: P.vision_features(p, cfg, b, quant=vc_quant))
        feats = feat_fn(params, {k: batch[k] for k in P._VISION_BATCH_KEYS if k in batch})
        batch = {k: v for k, v in batch.items() if k not in P._VISION_ONLY_KEYS}
        batch.update(feats)
        jax.block_until_ready(list(feats.values()))
        # steady-state memory model: with every feature cached the tower
        # weights are UNUSED by the step (the cached run_vision path reads
        # only params['proto']) — drop them from the step's resident params
        # (~1.3 GB at 3B; the b16-int8-cache attempt OOM'd by 14 MB with the
        # tower resident, BASELINE.md round-5). PaDTTrainer mirrors this with
        # precache_vision/offload (train/trainer.py).
        params = dict(params, vision={})

    from padt_tpu.train.train_step import vision_frozen_mask

    opt = make_optimizer(
        learning_rate=2e-5, total_steps=1000, optimizer=opt_name,
        frozen_mask=vision_frozen_mask if freeze_vision else None,
    )
    opt_state = opt.init(params)
    lcfg = LossConfig(freeze_vision=freeze_vision)
    accum = int(os.environ.get("PADT_TRAIN_ACCUM", "1"))
    warmup = jnp.asarray(False)

    if accum == 1:
        step = make_train_step(cfg, opt, prompt_length=lp, canvas_hw=canvas_hw, lcfg=lcfg)
        jstep = jax.jit(step, donate_argnums=(0, 1))

        t_c0 = time.perf_counter()
        params, opt_state, metrics = jstep(params, opt_state, batch, warmup)
        loss0 = float(metrics["loss"])  # host readback = the only real sync here
        t_compile = time.perf_counter() - t_c0
        assert np.isfinite(loss0), metrics

        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, metrics = jstep(params, opt_state, batch, warmup)
        loss_n = float(metrics["loss"])
        t_step = (time.perf_counter() - t0) / n_steps
        assert np.isfinite(loss_n), loss_n
    else:
        from padt_tpu.train.train_step import make_grad_and_apply_fns

        grad_fn, _, apply_fn = make_grad_and_apply_fns(
            cfg, opt, prompt_length=lp, canvas_hw=canvas_hw, lcfg=lcfg
        )

        # micro-step: grads += grad(batch); acc donated so the accumulator is
        # one params-sized bf16 tree updated in place across micros
        def micro(p, acc, b, w):
            g, metrics = grad_fn(p, b, w)
            return jax.tree.map(jnp.add, acc, g), metrics

        jmicro = jax.jit(micro, donate_argnums=(1,))
        japply = jax.jit(
            lambda p, s, g: apply_fn(p, s, g, float(accum)), donate_argnums=(0, 1, 2)
        )
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)

        def full_step(params, opt_state):
            acc = zeros()
            for _ in range(accum):
                acc, metrics = jmicro(params, acc, batch, warmup)
            params, opt_state, gnorm = japply(params, opt_state, acc)
            return params, opt_state, metrics

        t_c0 = time.perf_counter()
        params, opt_state, metrics = full_step(params, opt_state)
        loss0 = float(metrics["loss"])
        t_compile = time.perf_counter() - t_c0
        assert np.isfinite(loss0), metrics

        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, metrics = full_step(params, opt_state)
        loss_n = float(metrics["loss"])
        t_step = (time.perf_counter() - t0) / n_steps
        assert np.isfinite(loss_n), loss_n

    l_total = lp + lc
    tokens_per_step = batch_size * l_total * accum
    flops = accum * _flops_per_step(
        cfg, params, batch_size, l_total, lc,
        # cached vision: the tower contributes ZERO FLOPs to the step
        0 if vision_cache else cfg.max_image_patches,
        freeze_vision,
    )
    peak = 197.9e12 if jax.default_backend() == "tpu" else 1e12
    mfu = flops / (t_step * peak)

    n_total = _tree_param_count(params)
    n_vision = _tree_param_count(params["vision"])
    result = {
        "metric": "train_step_time_s",
        "value": round(t_step, 4),
        "unit": "s",
        "vs_baseline": 1.0,
        "detail": {
            "batch": batch_size,
            "grad_accum": accum,
            "effective_batch": batch_size * accum,
            "seq_len": l_total,
            "tokens_per_sec_per_chip": round(tokens_per_step / t_step, 1),
            "model_flops_per_step": flops,
            "mfu": round(mfu, 4),
            "optimizer": opt_name,
            "freeze_vision": freeze_vision,
            "vision_feature_cache": vision_cache,
            "params_total": n_total,
            "params_trainable": n_total - (n_vision if freeze_vision else 0),
            "compile_plus_first_step_s": round(t_compile, 1),
            "loss_first": round(loss0, 4),
            "loss_last": round(loss_n, 4),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))
    return result


def main():
    if os.environ.get("PADT_TRAIN_BATCH"):
        return run(int(os.environ["PADT_TRAIN_BATCH"]))
    import sys

    for b in (8, 4, 2, 1):
        try:
            return run(b)
        except Exception as e:
            print(f"batch {b} failed ({type(e).__name__}: {e}); retrying smaller", file=sys.stderr)
    raise SystemExit("no batch size fit")


if __name__ == "__main__":
    from padt_tpu.utils.hostenv import wait_for_tpu

    wait_for_tpu()  # bounded wait when the axon tunnel is transiently down
    main()
