"""Qwen2.5-VL vision tower, TPU-native.

Reference behavior being rebuilt: `custom_visual_forward` (reference
`src/PaDT/models/padt.py:48-108`) — patch embed -> window reorder -> depth
blocks alternating windowed/full attention (`fullatt_block_indexes`) -> merger;
returns the PaDT triple:
  (merged raster-order, high_res window-order, rope (cos,sin) window-order).

TPU-first design:
  - one image per sample, padded to a static patch bucket (B, S, ...) — replaces
    the packed varlen + cu_seqlens layout;
  - window/full attention expressed as segment-id masked dense attention
    (`ops.attention.segment_attention`) — replaces flash_attn_varlen_func;
  - the depth-block loop is a `lax.scan` over stacked per-layer params with a
    per-layer "is full attention" flag, rematerialized for training;
  - all geometry (window index, segments, rope positions) precomputed host-side
    (`vision_geom.py`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import VisionConfig
from ..ops.attention import fused_vision_attention_qkv, use_pallas, window_attention_qkv
from ..ops.norms import rms_norm
from ..ops.rope import vision_rope_cos_sin

# slot width of the window-aligned token layout (vision_geom.py window_slots):
# one vision window = 64 patch tokens (112px window / 14px patches, squared)
_WIN_TOKENS = 64

# Mosaic lane-tile width: heads are zero-padded to this at the WEIGHT level on
# the Pallas path so the qkv projection emits 128-lane head tiles for free
# (see ops/pallas_attention.py::vision_flash_attention)
_LANE = 128


def _linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_vision_params(cfg: VisionConfig, key, dtype=jnp.bfloat16):
    """Random init (converter overwrites for real checkpoints)."""
    d, ff, depth = cfg.hidden_size, cfg.intermediate_size, cfg.depth
    pid = cfg.patch_input_dim
    out = cfg.out_hidden_size
    merged_dim = d * cfg.spatial_merge_unit
    ks = jax.random.split(key, 8)

    def w(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def stack(shape, key, scale=0.02):
        return (jax.random.normal(key, (depth, *shape), jnp.float32) * scale).astype(dtype)

    blocks = {
        "norm1_w": jnp.ones((depth, d), dtype),
        "norm2_w": jnp.ones((depth, d), dtype),
        "qkv_w": stack((d, 3 * d), ks[0]),
        "qkv_b": jnp.zeros((depth, 3 * d), dtype),
        "proj_w": stack((d, d), ks[1]),
        "proj_b": jnp.zeros((depth, d), dtype),
        "gate_w": stack((d, ff), ks[2]),
        "gate_b": jnp.zeros((depth, ff), dtype),
        "up_w": stack((d, ff), ks[3]),
        "up_b": jnp.zeros((depth, ff), dtype),
        "down_w": stack((ff, d), ks[4]),
        "down_b": jnp.zeros((depth, d), dtype),
    }
    return {
        "patch_embed": {"w": w(ks[5], (pid, d))},
        "blocks": blocks,
        "merger": {
            "ln_q_w": jnp.ones((d,), dtype),
            "fc1": {"w": w(ks[6], (merged_dim, merged_dim)), "b": jnp.zeros((merged_dim,), dtype)},
            "fc2": {"w": w(ks[7], (merged_dim, out)), "b": jnp.zeros((out,), dtype)},
        },
    }


def _pad_head_lanes(blocks, h: int, hd: int, qkv_too: bool = True):
    """Zero-pad per-head rows of proj_w (and, when `qkv_too`, per-head
    columns of qkv_w/qkv_b) to _LANE. Weight-sized one-time cost per forward
    (~0.5 GB/s-scale, negligible).

    `qkv_too=False` is the fast path: the attention kernels unpack the
    UNPADDED fused qkv buffer and pad heads in their rope pass
    (ops/pallas_attention.py::_unpack_rope_pad), so the qkv projection runs
    at real-hd FLOPs (hd=80: 1.6x fewer than padded) and only the attention
    output carries 128-lane head tiles into the row-padded proj_w."""
    pad = _LANE - hd
    depth, d, _ = blocks["qkv_w"].shape
    proj_w = blocks["proj_w"].reshape(depth, h, hd, d)
    proj_w = jnp.pad(proj_w, [(0, 0), (0, 0), (0, pad), (0, 0)]).reshape(depth, h * _LANE, d)
    out = dict(blocks, proj_w=proj_w)
    if qkv_too:
        qkv_w = blocks["qkv_w"].reshape(depth, d, 3, h, hd)
        qkv_w = jnp.pad(qkv_w, [(0, 0)] * 4 + [(0, pad)]).reshape(depth, d, 3 * h * _LANE)
        qkv_b = blocks["qkv_b"].reshape(depth, 3, h, hd)
        qkv_b = jnp.pad(qkv_b, [(0, 0)] * 3 + [(0, pad)]).reshape(depth, 3 * h * _LANE)
        out.update(qkv_w=qkv_w, qkv_b=qkv_b)
    return out


def _block(x, lp, cos, sin, seg, cfg: VisionConfig, windowed_slots=None):
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    # --- attention ---
    xn = rms_norm(x, lp["norm1_w"], cfg.rms_norm_eps)
    qkv = xn @ lp["qkv_w"] + lp["qkv_b"]  # (B, S, 3*H*hd_eff); heads may be lane-padded
    # fp32 rotary (monkey-patch parity, qwen2_5vl_monkey_patch.py:29-30) fused
    # into the attention kernels on TPU (which read q/k/v straight out of the
    # fused qkv buffer); XLA rope+attention elsewhere
    if windowed_slots is not None:
        # slot layout + traced is-windowed flag: pick diagonal-64 window
        # attention or full flash per layer (both branches compile once)
        attn = jax.lax.cond(
            windowed_slots,
            lambda qc: window_attention_qkv(
                qc, cos, sin, seg, h, win=_WIN_TOKENS, scale=1.0 / (hd**0.5), rope_dim=hd
            ),
            lambda qc: fused_vision_attention_qkv(
                qc, cos, sin, seg, h, scale=1.0 / (hd**0.5), rope_dim=hd
            ),
            qkv,
        )
    else:
        attn = fused_vision_attention_qkv(
            qkv, cos, sin, seg, h, scale=1.0 / (hd**0.5), rope_dim=hd
        )  # (B, S, H*hd_eff)
    x = x + (attn @ lp["proj_w"] + lp["proj_b"])
    # --- gated MLP (SiLU) ---
    xn = rms_norm(x, lp["norm2_w"], cfg.rms_norm_eps)
    gate = jax.nn.silu(xn @ lp["gate_w"] + lp["gate_b"])
    up = xn @ lp["up_w"] + lp["up_b"]
    x = x + (gate * up) @ lp["down_w"] + lp["down_b"]
    return x


def vision_forward(
    params,
    cfg: VisionConfig,
    pixels: jnp.ndarray,  # (B, S, patch_input_dim)
    window_index: jnp.ndarray,  # (B, M)
    inv_window_index: jnp.ndarray,  # (B, M)
    seg_win: jnp.ndarray,  # (B, S)
    seg_full: jnp.ndarray,  # (B, S)
    hpos: jnp.ndarray,  # (B, S)
    wpos: jnp.ndarray,  # (B, S)
    remat: bool = False,
    pack_index: jnp.ndarray = None,  # (B, M) slot->packed gather (slot layout)
) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (merged (B,M,out) raster order,
                high_res (B,S,D) window order,
                (cos, sin) (B,S,head_dim) window order).

    `pack_index` is not None => the inputs use the 64-aligned window-SLOT
    layout (vision_geom.py `window_slots`): windowed layers run the diagonal
    64-block attention, and high_res/cos/sin are gathered back to PACKED
    window order before returning, so the PaDT decoder contract (matched
    (feat, PE) pairs, prefix validity by num_patches) is unchanged."""
    b, s, _ = pixels.shape
    unit = cfg.spatial_merge_unit
    m = s // unit
    dtype = params["patch_embed"]["w"].dtype

    x = pixels.astype(dtype) @ params["patch_embed"]["w"]  # (B, S, D)
    # window reorder at merge-group granularity (padt.py:70-72)
    x = x.reshape(b, m, unit, cfg.hidden_size)
    x = jnp.take_along_axis(x, window_index[:, :, None, None], axis=1)
    x = x.reshape(b, s, cfg.hidden_size)

    cos, sin = vision_rope_cos_sin(hpos, wpos, cfg.head_dim)

    blocks = params["blocks"]
    cos_a, sin_a = cos, sin
    if use_pallas() and cfg.head_dim % _LANE != 0:
        if s % 128 == 0:
            # Fast path: keep qkv UNPADDED (projection at real-hd FLOPs); the
            # attention kernels unpack+rope+pad heads to Mosaic-legal 128-lane
            # tiles in one pass and emit (B, S, H*128) into row-padded proj_w
            # (zero pad lanes -> zero proj rows, outputs exact).
            blocks = _pad_head_lanes(blocks, cfg.num_heads, cfg.head_dim, qkv_too=False)
        else:
            # Odd seq lengths the unpack kernel can't tile: lane-pad qkv too so
            # the projections emit 128-lane head tiles directly; zero-padded
            # cos/sin keep the rotation inert on pad lanes.
            blocks = _pad_head_lanes(blocks, cfg.num_heads, cfg.head_dim)
            pad = [(0, 0), (0, 0), (0, _LANE - cfg.head_dim)]
            cos_a, sin_a = jnp.pad(cos, pad), jnp.pad(sin, pad)

    is_full = jnp.zeros((cfg.depth,), dtype=bool).at[jnp.asarray(cfg.fullatt_block_indexes)].set(True)
    slot_mode = pack_index is not None

    def body(xc, layer):
        lp, full = layer
        seg = jnp.where(full, seg_full, seg_win)
        windowed = (~full) if slot_mode else None
        return _block(xc, lp, cos_a, sin_a, seg, cfg, windowed_slots=windowed), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, (blocks, is_full))

    if slot_mode:
        # gather slot order -> PACKED window order (merge-group granularity)
        # for everything the decoder consumes; slot padding disappears here
        def pack(t):
            tg = t.reshape(b, m, unit, t.shape[-1])
            tg = jnp.take_along_axis(tg, pack_index[:, :, None, None], axis=1)
            return tg.reshape(b, s, t.shape[-1])

        high_res = pack(x)
        cos, sin = pack(cos), pack(sin)
    else:
        high_res = x
    # merger: RMSNorm then 4-group concat MLP (Qwen2_5_VLPatchMerger)
    mp = params["merger"]
    y = rms_norm(x, mp["ln_q_w"], cfg.rms_norm_eps)
    y = y.reshape(b, m, unit * cfg.hidden_size)
    y = jax.nn.gelu(_linear(mp["fc1"], y), approximate=False)
    merged = _linear(mp["fc2"], y)  # (B, M, out) window order
    # un-permute to raster order (padt.py:103-104)
    merged = jnp.take_along_axis(merged, inv_window_index[:, :, None], axis=1)
    return merged, high_res, (cos, sin)
