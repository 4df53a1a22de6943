"""SFT trainer: sampler, train loop, checkpointing, metrics.

Rebuilds the orchestration layer of `PaDTSFTTrainer` (reference
`padt_sft_trainer.py:102-246,542-577` + HF Trainer internals it inherits):
  - `RepeatRandomSampler` index schedule (seeded randperm chunked into
    effective-batch groups, interleaved across grad-accum steps,
    `padt_sft_trainer.py:48-99`),
  - warm-up rule: prototype substitution while `epoch < num_epochs/4 AND
    global_step < 300` (`padt_sft_trainer.py:485-487`),
  - checkpoint every `save_steps` + auto-resume from the latest step
    (`sft_train.py:106-109`; orbax replaces the DeepSpeed checkpoint engine,
    SURVEY.md §5) with the PaDTConfig embedded in checkpoint metadata
    ("model carries its decoder config"),
  - metric averaging & logging (gather_for_metrics is implicit: the loss
    metrics are global SPMD values under pjit).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import PaDTConfig
from ..models import padt as padt_model
from ..parallel.mesh import batch_shardings, make_mesh, param_shardings, shard_params
from ..vrt.processor import VisionTextProcessor
from .data import build_train_batch
from .train_step import LossConfig, make_optimizer, make_train_step


def repeat_random_sampler(
    num_samples: int,
    batch_size: int,
    seed: Optional[int] = None,
    mini_repeat_count: int = 1,
    repeat_count: int = 1,
    gradient_accumulation_steps: int = 1,
) -> Iterator[int]:
    """Reference RepeatRandomSampler semantics (padt_sft_trainer.py:87-96)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(num_samples).tolist()
    chunks = [
        perm[i : i + batch_size]
        for i in range(0, len(perm) // batch_size * batch_size, batch_size)
    ]
    for chunk in chunks:
        for _ in range(repeat_count):
            for acc in range(gradient_accumulation_steps):
                sub = chunk[acc::gradient_accumulation_steps]
                for idx in sub:
                    for _ in range(mini_repeat_count):
                        yield idx


@dataclass
class TrainArgs:
    """PaDTSFTConfig subset (reference `padt_sft_config.py:21-76` defaults)."""

    learning_rate: float = 2e-5
    per_device_train_batch_size: int = 16
    gradient_accumulation_steps: int = 1
    num_train_epochs: float = 1.0
    max_grad_norm: float = 1.0
    weight_decay: float = 0.0
    warmup_steps: int = 0
    seed: int = 42
    save_steps: int = 100
    logging_steps: int = 1
    # in-training eval (reference HF eval_strategy/eval_steps,
    # sft_train.py:85-90 + padt_sft_trainer.py:569-577)
    eval_strategy: str = "no"  # "no" | "steps"
    eval_steps: int = 100
    per_device_eval_batch_size: Optional[int] = None  # defaults to train bs
    output_dir: str = "outputs/padt_sft"
    use_mask_loss: bool = False
    use_bbox_loss: bool = True
    use_score_loss: bool = True
    use_sft_vp_mask: bool = True
    use_warm_up: bool = True
    warm_up_max_steps: int = 300
    random_select_patch: bool = False
    random_select_patch_num: int = 5
    freeze_vision_modules: bool = False
    # Frozen-tower feature caching (requires freeze_vision_modules): each
    # sample's vision-tower outputs (models/padt.py::vision_features) are
    # computed once, stored host-side (~10 MB/sample bf16 at 3B/644px), and
    # spliced into later batches in place of pixel_patches — exactly gradient-
    # equivalent (stop_gradient already cuts at these tensors) while removing
    # the tower forward (~35% of the frozen 3B step) from every step after a
    # sample's first visit. The trainable prototype projection still
    # recomputes from the cached features each step.
    cache_vision_features: bool = False
    # "bf16" (exact) | "int8" (per-row quantized merged/high_res — halves the
    # cache + per-step host->device stream; the b16-cached OOM margin was
    # 38 MB, BASELINE.md round-4. Forward-perturbation only: features are
    # stop_gradient inputs; parity bounds in tests/test_train_cache.py)
    vis_cache_dtype: str = "bf16"
    # "adamw" (reference HF default) | "adafactor" (factored second moments —
    # the single-chip-3B memory configuration, see BASELINE.md training table)
    optimizer: str = "adamw"
    # static shape buckets
    prompt_bucket: Optional[int] = None
    completion_bucket: Optional[int] = None
    patch_bucket: Optional[int] = None
    canvas_hw: Optional[Tuple[int, int]] = None
    # mesh
    mesh_data: int = 1
    mesh_fsdp: int = 1
    mesh_tensor: int = 1


class PaDTTrainer:
    def __init__(
        self,
        cfg: PaDTConfig,
        params,
        processor: VisionTextProcessor,
        args: TrainArgs,
        dataset: Sequence[Dict],
        images: Optional[Sequence[Any]] = None,  # optional preloaded images by index
        eval_dataset: Optional[Sequence[Dict]] = None,
        eval_images: Optional[Sequence[Any]] = None,
    ):
        self.cfg = cfg
        self.args = args
        self.processor = processor
        self.dataset = dataset
        self.images = images
        self.eval_dataset = eval_dataset
        self.eval_images = eval_images
        self.mesh = make_mesh(args.mesh_data, args.mesh_fsdp, args.mesh_tensor)
        # NOTE: the trainer takes OWNERSHIP of `params` — train steps donate the
        # buffers (in-place updates), and device_put below may alias rather than
        # copy when the sharding already matches. Don't reuse the argument.
        # cache_vision_features: the cached step reads only params['proto'], so
        # the frozen tower is kept OUT of the step/optimizer tree entirely
        # (~1.3 GB at 3B bf16 — the per-device-b16 enabler, BASELINE.md r5).
        # It lives in self._tower_dev for cache fills, is pulled to host the
        # moment every sample is cached (one readback), and re-attached on
        # save so checkpoints stay complete.
        self._tower_dev = None
        self._tower_host = None
        if args.cache_vision_features and not args.freeze_vision_modules:
            raise ValueError(
                "cache_vision_features requires freeze_vision_modules: cached "
                "features skip the tower graph, so an unfrozen tower would "
                "silently train with zero vision gradients"
            )
        self.params = shard_params(params, self.mesh)
        if args.cache_vision_features:
            self._tower_dev = self.params["vision"]
            self.params = dict(self.params, vision={})
        n_batches_per_epoch = len(dataset) // (args.per_device_train_batch_size * args.gradient_accumulation_steps)
        if n_batches_per_epoch == 0:
            print(
                f"WARNING: dataset ({len(dataset)} samples) smaller than one "
                f"effective batch — no train steps will run"
            )
        self.total_steps = max(int(n_batches_per_epoch * args.num_train_epochs), 1)
        from .train_step import vision_frozen_mask

        # no optimizer-state buffers for the frozen tower
        frozen_mask = vision_frozen_mask if args.freeze_vision_modules else None
        self.optimizer = make_optimizer(
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            warmup_steps=args.warmup_steps,
            total_steps=self.total_steps,
            optimizer=args.optimizer,
            frozen_mask=frozen_mask,
        )
        with self.mesh:
            self.opt_state = jax.jit(
                self.optimizer.init,
                in_shardings=(param_shardings(self.params, self.mesh),),
            )(self.params)
        self._vis_cache: Dict[Tuple, Dict[str, np.ndarray]] = {}
        self.global_step = 0
        self._step_fn_cache: Dict[Tuple, Any] = {}
        self.metrics_log: List[Dict] = []
        os.makedirs(args.output_dir, exist_ok=True)
        self._metrics_file = os.path.join(args.output_dir, "metrics.jsonl")
        self._wandb = None
        if os.environ.get("WANDB_PROJECT") and jax.process_index() == 0:
            try:  # wandb optional (reference --report_to wandb)
                import wandb

                self._wandb = wandb.init(project=os.environ["WANDB_PROJECT"], config=vars(args))
            except Exception:
                self._wandb = None

    # ------------------------------------------------------------------
    def _lcfg(self) -> LossConfig:
        a = self.args
        return LossConfig(
            use_bbox_loss=a.use_bbox_loss,
            use_score_loss=a.use_score_loss,
            use_mask_loss=a.use_mask_loss,
            use_sft_vp_mask=a.use_sft_vp_mask,
            use_warm_up=a.use_warm_up,
        )

    def _step_fn(self, prompt_length: int, canvas_hw: Tuple[int, int]):
        key = (prompt_length, canvas_hw)
        if key not in self._step_fn_cache:
            step = make_train_step(
                self.cfg,
                self.optimizer,
                prompt_length=prompt_length,
                canvas_hw=canvas_hw,
                lcfg=self._lcfg(),
                freeze_vision=self.args.freeze_vision_modules,
            )
            self._step_fn_cache[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._step_fn_cache[key]

    def _accum_fns(self, prompt_length: int, canvas_hw: Tuple[int, int]):
        from .train_step import make_grad_and_apply_fns

        key = ("accum", prompt_length, canvas_hw)
        if key not in self._step_fn_cache:
            grad_fn, accumulate, apply_fn = make_grad_and_apply_fns(
                self.cfg, self.optimizer, prompt_length, canvas_hw,
                lcfg=self._lcfg(), freeze_vision=self.args.freeze_vision_modules,
            )
            self._step_fn_cache[key] = (
                jax.jit(grad_fn),
                jax.jit(lambda a, g: jax.tree.map(jnp.add, a, g), donate_argnums=(0,)),
                jax.jit(apply_fn, donate_argnums=(0, 1, 2), static_argnums=(3,)),
            )
        return self._step_fn_cache[key]

    def _eval_fn(self, prompt_length: int, canvas_hw: Tuple[int, int]):
        from .train_step import make_eval_step

        key = ("eval", prompt_length, canvas_hw)
        if key not in self._step_fn_cache:
            # freeze_vision is grad-only and harmless in a loss-only forward,
            # but it gates run_vision's cached vis_* path — keep it consistent
            lcfg = self._lcfg()._replace(freeze_vision=self.args.freeze_vision_modules)
            self._step_fn_cache[key] = jax.jit(
                make_eval_step(self.cfg, prompt_length, canvas_hw, lcfg=lcfg)
            )
        return self._step_fn_cache[key]

    # ------------------------------------------------------------------
    def _with_vis_cache(self, tb, split: str) -> Dict[str, Any]:
        """cache_vision_features: swap a built batch's vision-tower inputs for
        per-sample cached tower outputs (models/padt.py::vision_features),
        computing + host-caching any missing samples' features in one batched
        device call. Must run on the main thread (device work)."""
        if not self.args.cache_vision_features:
            return tb.model
        idx = tb.meta.get("batch_idx")
        if idx is None:
            raise ValueError(
                "cache_vision_features needs per-sample cache keys: pass "
                "batch_idx= to build_train_batch"
            )
        keys = [(split, int(i)) for i in idx]
        if any(k not in self._vis_cache for k in keys):
            # full-batch fill on any miss: the sampler draws WITHOUT
            # replacement within an epoch, so batches are all-miss (epoch 1)
            # or all-hit (epoch 2+) — per-row sub-batching would only help a
            # sampler that mixes revisits into first-visit batches
            vb = {
                k: tb.model[k]
                for k in padt_model._VISION_BATCH_KEYS
                if k in tb.model
            }
            quant = "int8" if self.args.vis_cache_dtype == "int8" else "none"
            fkey = ("visfeat", quant, vb["pixel_patches"].shape)
            if fkey not in self._step_fn_cache:
                cfg = self.cfg
                self._step_fn_cache[fkey] = jax.jit(
                    lambda p, b: padt_model.vision_features(p, cfg, b, quant=quant)
                )
            if self._tower_dev is None:
                raise RuntimeError(
                    "vision-feature cache miss after the tower was offloaded: "
                    "a sample outside the train/eval datasets reached "
                    "_with_vis_cache (cache keys are (split, index))"
                )
            b_sh = batch_shardings(vb, self.mesh)
            vb_dev = {k: jax.device_put(np.asarray(v), b_sh[k]) for k, v in vb.items()}
            feats = self._step_fn_cache[fkey](
                dict(self.params, vision=self._tower_dev), vb_dev
            )
            host = {k: np.asarray(v) for k, v in feats.items()}  # one gather
            for row, key in enumerate(keys):
                self._vis_cache[key] = {k: host[k][row] for k in host}
            # every sample cached -> the tower will never run again: pull it
            # to host (one readback, re-attached on save) and free ~1.3 GB of
            # HBM for the steps that follow (BASELINE.md round-5 b16 ladder)
            n_cacheable = len(self.dataset) + len(self.eval_dataset or [])
            if len(self._vis_cache) >= n_cacheable:
                self._tower_host = jax.tree.map(np.asarray, self._tower_dev)
                self._tower_dev = None
        model = {
            k: v for k, v in tb.model.items() if k not in padt_model._VISION_ONLY_KEYS
        }
        for name in padt_model.vision_cache_keys(
            "int8" if self.args.vis_cache_dtype == "int8" else "none"
        ):
            model[name] = np.stack([self._vis_cache[k][name] for k in keys])
        return model

    # ------------------------------------------------------------------
    def evaluate(self) -> Dict[str, float]:
        """Run the loss forward over the validation split (reference
        `Trainer.evaluate` with the PaDT eval sampler: a seeded shuffle —
        batch_size=1 chunks make the grad-accum interleave a no-op,
        `padt_sft_trainer.py:569-577`). Evaluates `len(eval)//bs * bs`
        samples (full static-shape batches only); metrics stay on device
        until the final average."""
        assert self.eval_dataset, "no eval_dataset provided"
        a = self.args
        bs = a.per_device_eval_batch_size or a.per_device_train_batch_size
        order = list(repeat_random_sampler(len(self.eval_dataset), batch_size=1, seed=a.seed))
        rng = np.random.RandomState(a.seed)
        metric_sum = None
        n_batches = 0
        with self.mesh:
            for bi in range(0, len(order) // bs * bs, bs):
                batch_idx = order[bi : bi + bs]
                samples = [self.eval_dataset[i] for i in batch_idx]
                imgs = (
                    [self.eval_images[i] for i in batch_idx]
                    if self.eval_images is not None
                    else None
                )
                tb = build_train_batch(
                    samples, self.processor, self.cfg, rng,
                    images=imgs, batch_idx=batch_idx,
                    prompt_bucket=a.prompt_bucket,
                    completion_bucket=a.completion_bucket,
                    patch_bucket=a.patch_bucket,
                    canvas_hw=a.canvas_hw,
                    use_mask_targets=a.use_mask_loss,
                )
                model = self._with_vis_cache(tb, "eval")
                b_sh = batch_shardings(model, self.mesh)
                batch_dev = {k: jax.device_put(np.asarray(v), b_sh[k]) for k, v in model.items()}
                m = self._eval_fn(tb.prompt_length, tb.meta["canvas_hw"])(self.params, batch_dev)
                metric_sum = m if metric_sum is None else jax.tree.map(jnp.add, metric_sum, m)
                n_batches += 1
        if n_batches == 0:
            return {}
        return {f"eval_{k}": float(v) / n_batches for k, v in metric_sum.items()}

    # ------------------------------------------------------------------
    def train(self, resume: bool = False):
        a = self.args
        if resume:
            self.load_latest_checkpoint()
        rng = np.random.RandomState(a.seed)
        bs = a.per_device_train_batch_size * a.gradient_accumulation_steps
        epoch_len = len(self.dataset) // bs

        start_epoch = self.global_step // max(epoch_len, 1)

        def produce():
            """Host-side batch building, run ahead on a prefetch thread."""
            step_counter = self.global_step
            micro = a.per_device_train_batch_size
            ga = a.gradient_accumulation_steps
            for epoch in range(start_epoch, int(np.ceil(a.num_train_epochs))):
                idxs = list(
                    repeat_random_sampler(
                        len(self.dataset), bs, seed=a.seed + epoch,
                        gradient_accumulation_steps=ga,
                    )
                )
                for bi in range(0, len(idxs) // (micro * ga) * (micro * ga), micro * ga):
                    if step_counter >= self.total_steps:
                        return
                    epoch_frac = step_counter / max(epoch_len, 1)
                    warmup = (
                        a.use_warm_up
                        and epoch_frac < a.num_train_epochs / 4
                        and step_counter < a.warm_up_max_steps
                    )
                    micro_batches = []
                    for mi in range(ga):
                        batch_idx = idxs[bi + mi * micro : bi + (mi + 1) * micro]
                        samples = [self.dataset[i] for i in batch_idx]
                        imgs = [self.images[i] for i in batch_idx] if self.images is not None else None
                        micro_batches.append(
                            build_train_batch(
                                samples, self.processor, self.cfg, rng,
                                images=imgs, batch_idx=batch_idx,
                                random_select_patch=a.random_select_patch,
                                random_select_patch_num=a.random_select_patch_num,
                                prompt_bucket=a.prompt_bucket,
                                completion_bucket=a.completion_bucket,
                                patch_bucket=a.patch_bucket,
                                canvas_hw=a.canvas_hw,
                                use_mask_targets=a.use_mask_loss,
                            )
                        )
                    step_counter += 1
                    yield micro_batches, warmup, epoch_frac

        from .prefetch import BatchPrefetcher

        for micro_batches, warmup, epoch_frac in BatchPrefetcher(produce(), depth=2):
            ga = a.gradient_accumulation_steps
            t0 = time.perf_counter()
            with self.mesh:
                if ga == 1:
                    tb = micro_batches[0]
                    model = self._with_vis_cache(tb, "train")
                    b_sh = batch_shardings(model, self.mesh)
                    batch_dev = {k: jax.device_put(np.asarray(v), b_sh[k]) for k, v in model.items()}
                    step = self._step_fn(tb.prompt_length, tb.meta["canvas_hw"])
                    self.params, self.opt_state, metrics = step(
                        self.params, self.opt_state, batch_dev, jnp.asarray(bool(warmup))
                    )
                    metrics = {k: float(v) for k, v in metrics.items()}
                else:
                    # true gradient accumulation (HF Trainer semantics);
                    # metrics accumulate ON DEVICE — a float() per micro batch
                    # would force a ~36 ms dispatch+sync round-trip each
                    grads_acc = None
                    metric_sum = None
                    for tb in micro_batches:
                        grad_fn, add_fn, apply_fn = self._accum_fns(
                            tb.prompt_length, tb.meta["canvas_hw"]
                        )
                        model = self._with_vis_cache(tb, "train")
                        b_sh = batch_shardings(model, self.mesh)
                        batch_dev = {k: jax.device_put(np.asarray(v), b_sh[k]) for k, v in model.items()}
                        grads, m = grad_fn(self.params, batch_dev, jnp.asarray(bool(warmup)))
                        grads_acc = grads if grads_acc is None else add_fn(grads_acc, grads)
                        metric_sum = m if metric_sum is None else jax.tree.map(jnp.add, metric_sum, m)
                    self.params, self.opt_state, gnorm = apply_fn(
                        self.params, self.opt_state, grads_acc, ga
                    )
                    metrics = {k: float(v) / ga for k, v in metric_sum.items()}
                    metrics["grad_norm"] = float(gnorm)
            metrics["step_time_s"] = time.perf_counter() - t0
            self.global_step += 1
            metrics.update(step=self.global_step, epoch=round(epoch_frac, 4), warmup=bool(warmup))
            self.metrics_log.append(metrics)
            if self.global_step % a.logging_steps == 0 and jax.process_index() == 0:
                line = json.dumps({k: (round(v, 5) if isinstance(v, float) else v) for k, v in metrics.items()})
                print(line)
                with open(self._metrics_file, "a") as f:
                    f.write(line + "\n")
                if self._wandb is not None:
                    self._wandb.log(metrics, step=self.global_step)
            if (
                a.eval_strategy == "steps"
                and self.eval_dataset
                and self.global_step % a.eval_steps == 0
            ):
                em = self.evaluate()
                em["step"] = self.global_step
                self.metrics_log.append(em)
                if jax.process_index() == 0:
                    line = json.dumps({k: (round(v, 5) if isinstance(v, float) else v) for k, v in em.items()})
                    print(line)
                    with open(self._metrics_file, "a") as f:
                        f.write(line + "\n")
                    if self._wandb is not None:
                        self._wandb.log(em, step=self.global_step)
            if self.global_step % a.save_steps == 0:
                self.save_checkpoint()
        self.save_checkpoint()
        return self.metrics_log

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: Optional[str] = None):
        import orbax.checkpoint as ocp

        path = path or os.path.join(os.path.abspath(self.args.output_dir), f"checkpoint-{self.global_step}")
        ckpt = ocp.StandardCheckpointer()
        params = self.params
        if self.args.cache_vision_features:
            # re-attach the offloaded tower so checkpoints stay complete
            tower = self._tower_dev if self._tower_dev is not None else self._tower_host
            params = dict(params, vision=tower)
        ckpt.save(os.path.join(path, "state"), {"params": params, "opt_state": self.opt_state}, force=True)
        ckpt.wait_until_finished()
        if jax.process_index() == 0:
            with open(os.path.join(path, "meta.json"), "w") as f:
                f.write(json.dumps({"step": self.global_step, "config": json.loads(self.cfg.to_json())}))

    def load_latest_checkpoint(self) -> bool:
        out = os.path.abspath(self.args.output_dir)
        if not os.path.isdir(out):
            return False
        cands = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
        if not cands:
            return False
        latest = max(cands, key=lambda d: int(d.split("-")[1]))
        self.load_checkpoint(os.path.join(out, latest))
        return True

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        params_t = self.params
        if self.args.cache_vision_features:
            # checkpoints carry the full tree; restore the tower to its
            # offload slot and keep the step tree stripped
            tower_t = self._tower_dev if self._tower_dev is not None else self._tower_host
            assert tower_t is not None, "tower missing from both device and host slots"
            params_t = dict(params_t, vision=tower_t)
        target = {"params": params_t, "opt_state": self.opt_state}
        restored = ckpt.restore(os.path.join(os.path.abspath(path), "state"), target=target)
        params = restored["params"]
        if self.args.cache_vision_features:
            if self._tower_dev is not None:
                self._tower_dev = params["vision"]
            else:
                self._tower_host = params["vision"]
            params = dict(params, vision={})
        self.params = params
        self.opt_state = restored["opt_state"]
        with open(os.path.join(path, "meta.json")) as f:
            self.global_step = json.load(f)["step"]
