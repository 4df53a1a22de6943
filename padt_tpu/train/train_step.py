"""Jitted SFT train step: the four PaDT losses on one fused device program.

Rebuilds `PaDTSFTTrainer.compute_loss` (reference `padt_sft_trainer.py:330-540`)
as a single differentiable function:
  sft token CE (robust VP mask) + bbox (GIoU+L1) + score MSE + mask (dice+focal)
with the warm-up substitution (feed VRT *prototypes* instead of hidden states
early in training, `padt_sft_trainer.py:485-487`) as a traced boolean switch.

The reference's host-side work (completion synthesis, VRT re-parse, GT decode)
lives in train/data.py — this module is pure device compute under jit/pjit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import PaDTConfig
from ..models import padt as padt_model
from ..parallel import mesh as mesh_lib
from . import losses


class LossConfig(NamedTuple):
    """Static loss switches (reference PaDTSFTConfig flags,
    `padt_sft_config.py:38-76`)."""

    use_bbox_loss: bool = True
    use_score_loss: bool = True
    use_mask_loss: bool = True
    use_sft_vp_mask: bool = True
    use_warm_up: bool = True
    # `--freeze_vision_modules` (padt_sft_trainer.py:166-170): stop_gradient at
    # the tower outputs, so the vision backward is never built (grads for the
    # vision subtree come back as zeros from value_and_grad).
    freeze_vision: bool = False


def padt_loss(
    params,
    cfg: PaDTConfig,
    batch: Dict[str, jnp.ndarray],
    prompt_length: int,
    canvas_hw: Tuple[int, int],
    lcfg: LossConfig,
    warmup: jnp.ndarray,  # () bool — warm-up prototype substitution active
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    lp = prompt_length
    l = batch["input_ids"].shape[1]
    lc = l - lp

    # split_logits: the loss consumes (text, VRT) logit parts separately — no
    # (B,Lc,V+M) concat copy, and no vocab-axis slice for GSPMD to reshard.
    logits, hidden, art = padt_model.forward_train(
        params, cfg, batch, logits_slice=(lp - 1, lc), remat=True,
        freeze_vision=lcfg.freeze_vision, split_logits=True,
    )
    logits = mesh_lib.constrain_loss_logits(*logits)
    target_ids = batch["input_ids"][:, lp:]
    comp_mask = batch["completion_mask"][:, lp:].astype(jnp.float32)

    sft = losses.sft_token_loss(
        logits,
        target_ids,
        comp_mask,
        batch["vrt_penalty_mask"],
        cfg.text.vocab_size,
        use_vp_mask=lcfg.use_sft_vp_mask,
    )
    sft_loss = sft.mean()
    metrics = {"sft_loss": sft_loss}

    # --- perception decoder on VRT hidden states (or prototypes in warm-up) ---
    obj_sample = batch["obj_sample"]
    feats = hidden[obj_sample[:, None], batch["gather_pos"]]  # (N, K, D)
    # Object space is replicated (objects index arbitrary samples); pinning the
    # gather output here keeps its cotangent from inheriting a batch-axis
    # sharding that GSPMD can only undo by full rematerialization.
    feats = mesh_lib.constrain(feats)
    if lcfg.use_warm_up:
        proto_feats = art.proto[obj_sample[:, None], batch["picked_patch_ids"]]
        feats = jnp.where(warmup, proto_feats.astype(feats.dtype), feats)

    dec = padt_model.vl_decode(
        params,
        cfg,
        feats,
        batch["vrt_counts"],
        batch["obj_valid"],
        obj_sample,
        art,
        canvas_hw=canvas_hw,
        compute_mask=lcfg.use_mask_loss,
    )

    obj_valid = batch["obj_valid"]
    total = sft_loss

    if lcfg.use_bbox_loss:
        bl = losses.bbox_losses(dec.pred_boxes, batch["gt_boxes"], obj_valid)
        total = total + bl["bbox_loss"]
        metrics.update(bbox_loss=bl["bbox_loss"], iou=bl["iou_mean"], giou=bl["giou_mean"])
        if lcfg.use_score_loss:
            sc = losses.score_loss(dec.pred_score, bl["giou"], obj_valid)
            total = total + sc
            metrics["score_loss"] = sc

    if lcfg.use_mask_loss:
        gt_mask = batch["gt_mask"]
        # invalid objects contribute empty loss masks (reference zero canvases)
        lm = batch["gt_mask_valid"] * obj_valid[:, None, None]
        ml = losses.dice_loss(dec.pred_mask, gt_mask, lm) + losses.sigmoid_focal_loss(
            dec.pred_mask, gt_mask, lm
        )
        total = total + ml
        metrics["mask_loss"] = ml

    metrics["loss"] = total
    return total, metrics


def vision_frozen_mask(params):
    """Frozen-leaf mask for `--freeze_vision_modules`: True for every leaf
    under the top-level "vision" subtree (the reference freezes exactly the
    "visual" module set, `padt_sft_trainer.py:166-170`). Pass as
    `make_optimizer(frozen_mask=vision_frozen_mask)` so the frozen tower
    allocates no optimizer-state buffers."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(path) and getattr(path[0], "key", None) == "vision",
        params,
    )


def make_optimizer(
    learning_rate: float = 2e-5,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    schedule: str = "linear",
    optimizer: str = "adamw",
    frozen_mask=None,
) -> optax.GradientTransformation:
    """AdamW + clip, matching the reference's HF Trainer defaults (lr 2e-5,
    grad clipping 1.0, linear decay — `run_scripts/padt_pro_3b_sft.sh:32`,
    `utils.py:74`).

    `optimizer="adafactor"` swaps in factored-second-moment Adafactor — the
    memory-light choice that makes full-3B single-chip training fit in 15.75 GB
    HBM (AdamW fp32 moments for 3.1B trainable params alone are ~25 GB).
    `frozen_mask`: optional pytree (or callable params->pytree) of bools, True
    = frozen leaf; the update is masked out so frozen subtrees (e.g. the vision
    tower under `freeze_vision`) allocate NO optimizer-state buffers."""
    if total_steps and schedule == "linear":
        lr = optax.linear_schedule(
            init_value=learning_rate, end_value=0.0, transition_steps=total_steps
        )
        if warmup_steps:
            lr = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, learning_rate, warmup_steps),
                    optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup_steps, 1)),
                ],
                [warmup_steps],
            )
    elif total_steps and schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    else:
        lr = learning_rate
    if optimizer == "adafactor":
        inner = optax.adafactor(
            learning_rate=lr,
            multiply_by_parameter_scale=False,
            clipping_threshold=None,  # global-norm clip below instead
            momentum=None,
            weight_decay_rate=weight_decay or None,
            eps=1e-30,
        )
    elif optimizer == "adamw":
        inner = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if frozen_mask is not None:
        trainable = (
            (lambda p: jax.tree.map(lambda m: not m, frozen_mask(p)))
            if callable(frozen_mask)
            else jax.tree.map(lambda m: not m, frozen_mask)
        )
        inner = optax.masked(inner, trainable)
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)


def make_train_step(
    cfg: PaDTConfig,
    optimizer: optax.GradientTransformation,
    prompt_length: int,
    canvas_hw: Tuple[int, int],
    lcfg: LossConfig = LossConfig(),
    freeze_vision: bool = False,
    data_axes: Tuple[str, ...] = (),
):
    """Returns step(params, opt_state, batch, warmup) -> (params, opt_state, metrics).

    `data_axes`: mesh axes the batch is sharded over — metrics/grads are
    averaged by jit/pjit automatically (SPMD); nothing extra needed here.
    `freeze_vision` mirrors `--freeze_vision_modules`
    (padt_sft_trainer.py:166-170) via stop_gradient at the tower outputs, so
    the ViT backward is never built (vision grads come back as zeros).
    """
    if freeze_vision:
        lcfg = lcfg._replace(freeze_vision=True)

    def step(params, opt_state, batch, warmup):
        (loss, metrics), grads = jax.value_and_grad(padt_loss, has_aux=True)(
            params, cfg, batch, prompt_length, canvas_hw, lcfg, warmup
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return params, opt_state, metrics

    return step


def make_eval_step(
    cfg: PaDTConfig,
    prompt_length: int,
    canvas_hw: Tuple[int, int],
    lcfg: LossConfig = LossConfig(),
):
    """Loss-only forward for the in-training validation loop (reference
    HF Trainer `evaluate()` with `_get_eval_sampler`,
    `padt_sft_trainer.py:569-577`). No warm-up substitution in eval."""

    def eval_step(params, batch):
        _, metrics = padt_loss(
            params, cfg, batch, prompt_length, canvas_hw, lcfg, jnp.asarray(False)
        )
        return metrics

    return eval_step


def make_grad_and_apply_fns(
    cfg: PaDTConfig,
    optimizer: optax.GradientTransformation,
    prompt_length: int,
    canvas_hw: Tuple[int, int],
    lcfg: LossConfig = LossConfig(),
    freeze_vision: bool = False,
):
    """Gradient-accumulation variant: `grad_fn` computes (grads, metrics) per
    micro batch; `apply_fn` averages accumulated grads and applies the
    optimizer once (reference HF Trainer grad-accum semantics)."""
    if freeze_vision:
        lcfg = lcfg._replace(freeze_vision=True)

    def grad_fn(params, batch, warmup):
        (loss, metrics), grads = jax.value_and_grad(padt_loss, has_aux=True)(
            params, cfg, batch, prompt_length, canvas_hw, lcfg, warmup
        )
        return grads, metrics

    def accumulate(acc, grads):
        if acc is None:
            return grads
        return jax.tree.map(jnp.add, acc, grads)

    def apply_fn(params, opt_state, grads, num_micro):
        grads = jax.tree.map(lambda g: g / num_micro, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, optax.global_norm(grads)

    return grad_fn, accumulate, apply_fn
