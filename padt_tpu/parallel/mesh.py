"""Device mesh + sharding rules: the TPU-native replacement for the
reference's distribution stack (SURVEY.md §2.2/§2.4).

Reference -> here:
  - torchrun 8-proc DP                 -> batch sharded over ('data','fsdp')
  - DeepSpeed ZeRO-3 param/opt shard   -> params NamedSharding over 'fsdp'
    (XLA schedules all-gather/reduce-scatter over ICI automatically; no
    GatheredParameters / gather-for-generate hacks needed)
  - (not in reference) tensor parallel -> head/ffn dims over 'tensor'
  - NCCL collectives                   -> XLA collectives inserted by GSPMD
  - synced_gpus lockstep decode        -> SPMD jit is lockstep by construction

Sharding rules are name-based over the param pytree; any dim not divisible by
its mesh axis falls back to replication (correct, just less sharded).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    fsdp: int = 1,
    tensor: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * fsdp * tensor
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((data, fsdp, tensor), devices=devices[:n])
    except Exception:
        dev_array = np.asarray(devices[:n]).reshape(data, fsdp, tensor)
    return Mesh(dev_array, ("data", "fsdp", "tensor"))


# ---------------------------------------------------------------------------
# parameter sharding rules
# ---------------------------------------------------------------------------

# text layer leaves are stacked (L, in, out): axis 0 = layer, never sharded
_TEXT_RULES: Dict[str, P] = {
    "embed": P("fsdp", "tensor"),
    "lm_head": P("fsdp", "tensor"),
    "final_ln_w": P(),
    "layers/input_ln_w": P(),
    "layers/post_ln_w": P(),
    "layers/q_w": P(None, "fsdp", "tensor"),
    "layers/q_b": P(None, "tensor"),
    "layers/k_w": P(None, "fsdp", "tensor"),
    "layers/k_b": P(None, "tensor"),
    "layers/v_w": P(None, "fsdp", "tensor"),
    "layers/v_b": P(None, "tensor"),
    "layers/o_w": P(None, "tensor", "fsdp"),
    "layers/gate_w": P(None, "fsdp", "tensor"),
    "layers/up_w": P(None, "fsdp", "tensor"),
    "layers/down_w": P(None, "tensor", "fsdp"),
    # unfused int8 inference layout (padt.quantize_params): *_q (L, in, out)
    # shards like its bf16 source; *_s (L, 1, out) per-out-channel scales
    # track the weight's out axis
    "layers/q_w_q": P(None, "fsdp", "tensor"),
    "layers/q_w_s": P(None, None, "tensor"),
    "layers/k_w_q": P(None, "fsdp", "tensor"),
    "layers/k_w_s": P(None, None, "tensor"),
    "layers/v_w_q": P(None, "fsdp", "tensor"),
    "layers/v_w_s": P(None, None, "tensor"),
    "layers/o_w_q": P(None, "tensor", "fsdp"),
    "layers/o_w_s": P(None, None, "fsdp"),
    "layers/gate_w_q": P(None, "fsdp", "tensor"),
    "layers/gate_w_s": P(None, None, "tensor"),
    "layers/up_w_q": P(None, "fsdp", "tensor"),
    "layers/up_w_s": P(None, None, "tensor"),
    "layers/down_w_q": P(None, "tensor", "fsdp"),
    "layers/down_w_s": P(None, None, "fsdp"),
    # packed inference layout (padt.pack_inference_params): the fused out
    # axis concatenates q|k|v (3B: 2048|256|256) / gate|up at boundaries that
    # do NOT align with a 'tensor' split, so downstream slices would cross
    # shard boundaries and GSPMD would reshard per layer — keep the fused out
    # axis UNsharded; only the contraction (in) axis shards (advisor r4)
    "layers/qkv_w": P(None, "fsdp", None),
    "layers/qkv_b": P(None, None),
    "layers/gateup_w": P(None, "fsdp", None),
    "layers/qkv_w_q": P(None, "fsdp", None),
    "layers/qkv_w_s": P(None, None, None),
    "layers/gateup_w_q": P(None, "fsdp", None),
    "layers/gateup_w_s": P(None, None, None),
}

_VISION_RULES: Dict[str, P] = {
    "patch_embed/w": P(None, "fsdp"),
    "blocks/qkv_w": P(None, "fsdp", "tensor"),
    "blocks/qkv_b": P(None, "tensor"),
    "blocks/proj_w": P(None, "tensor", "fsdp"),
    "blocks/proj_b": P(None,),
    "blocks/gate_w": P(None, "fsdp", "tensor"),
    "blocks/gate_b": P(None, "tensor"),
    "blocks/up_w": P(None, "fsdp", "tensor"),
    "blocks/up_b": P(None, "tensor"),
    "blocks/down_w": P(None, "tensor", "fsdp"),
    "blocks/down_b": P(None,),
    "merger/fc1/w": P("fsdp", "tensor"),
    "merger/fc2/w": P("tensor", "fsdp"),
}


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _spec_for(path: str, leaf, mesh: Mesh) -> P:
    rules = None
    if path.startswith("text/"):
        rules = _TEXT_RULES
        sub = path[len("text/"):]
    elif path.startswith("vision/"):
        rules = _VISION_RULES
        sub = path[len("vision/"):]
    else:
        sub = path  # decoder / proto: small, shard biggest dim over fsdp
        rules = {}

    spec = rules.get(sub)
    if spec is None:
        # generic fallback: shard the largest dim >= 2 axes over fsdp
        shape = np.shape(leaf)
        if len(shape) >= 2 and max(shape) >= 1024:
            axis = int(np.argmax(shape))
            spec = P(*[("fsdp" if i == axis else None) for i in range(len(shape))])
        else:
            spec = P()

    # divisibility check: drop axes that don't divide
    shape = np.shape(leaf)
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    fixed = []
    for i, s in enumerate(spec):
        if s is None:
            fixed.append(None)
            continue
        names = s if isinstance(s, tuple) else (s,)
        total = int(np.prod([sizes[nm] for nm in names]))
        fixed.append(s if (i < len(shape) and shape[i] % total == 0) else None)
    # pad spec to rank
    while len(fixed) < len(shape):
        fixed.append(None)
    return P(*fixed[: len(shape)])


def param_shardings(params: Any, mesh: Mesh):
    """Param pytree -> matching pytree of NamedShardings (FSDP+TP rules)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(_path_str(path), leaf, mesh)),
        params,
    )


def batch_shardings(batch: Dict[str, Any], mesh: Mesh):
    """Batch dict -> shardings: leading batch dim over ('data','fsdp');
    position_ids (3, B, L) over axis 1."""
    out = {}
    dp = ("data", "fsdp")
    for k, v in batch.items():
        shape = np.shape(v)
        if k == "position_ids":
            out[k] = NamedSharding(mesh, P(None, dp))
        elif k in _OBJECT_SPACE_KEYS:
            out[k] = NamedSharding(mesh, P())
        elif len(shape) >= 1 and shape[0] % (mesh.shape["data"] * mesh.shape["fsdp"]) == 0:
            out[k] = NamedSharding(mesh, P(dp, *([None] * (len(shape) - 1))))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


# batch keys that live in OBJECT space (leading dim = n_objects, not batch):
# each object may reference ANY sample (obj_sample indexing), so sharding them
# over the batch axes forces cross-device gathers + involuntary resharding in
# the backward pass. They are small — replicate.
_OBJECT_SPACE_KEYS = frozenset({
    "obj_sample", "gather_pos", "vrt_counts", "obj_valid", "picked_patch_ids",
    "gt_boxes", "gt_mask", "gt_mask_valid",
})


def constrain(x, *spec):
    """`with_sharding_constraint(x, P(*spec))` when tracing under a mesh
    context; identity otherwise (single-chip jit, or a mesh without these
    axes). Used to pin cotangent layouts the GSPMD propagator would otherwise
    resolve with involuntary full rematerialization."""
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except (RuntimeError, ValueError, KeyError):
        return x


def context_mesh_axis_sizes() -> Dict[str, int]:
    """{axis: size} of the mesh the current trace runs under ({} if none)."""
    try:
        from jax.interpreters.pxla import thread_resources

        m = thread_resources.env.physical_mesh
        if m.empty:
            return {}
        return dict(zip(m.axis_names, m.devices.shape))
    except Exception:
        return {}


def constrain_loss_logits(lt, lv):
    """Pin the training-loss logits layout ((B,Lc,V) text / (B,Lc,M) VRT).

    On a mesh with BOTH a data and an fsdp axis, batch-only sharding makes
    GSPMD reshard the logits cotangent from batch@(data,fsdp) to the
    vocab@fsdp layout the tied-embedding grad einsum wants — an involuntary
    full rematerialization within each data group. Jointly sharding
    batch@data / vocab@fsdp up front gives every producer/consumer einsum a
    local-contraction + psum path. On data=1 meshes GSPMD is already clean —
    leave the layout alone."""
    sizes = context_mesh_axis_sizes()
    if sizes.get("data", 1) <= 1 or sizes.get("fsdp", 1) <= 1:
        return lt, lv
    if lt.shape[-1] % sizes["fsdp"] or lv.shape[-1] % sizes["fsdp"]:
        return constrain(lt, ("data", "fsdp")), constrain(lv, ("data", "fsdp"))
    return (
        constrain(lt, "data", None, "fsdp"),
        constrain(lv, "data", None, "fsdp"),
    )


def shard_params(params, mesh: Mesh):
    """Place (possibly host) params onto the mesh with the FSDP/TP layout."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, sh)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
