"""Prefill phase decomposition at bench shapes (3B/b96, 644px REC workload).

`t_prefill_plus_short_s` is ~4.9 s; the vision tower's measured envelope
(scripts/micro_vis_floor.py) accounts for ~2.6 s and the text prefill's
matmul floor for ~1.1 s — this script times each ACTUAL stage of the
generate() prefill path on chip so the residual is attributed, not guessed:

  vision      run_vision (chunked tower + window scatter + merger)
  embed       extended_embed (token embed + VRT prototype splice)
  text        language.prefill(kv_dtype="int8") — 36-layer causal forward
              with IN-SCAN int8 cache quantization, exactly what generate()
              runs since round 4 (PADT_MICRO_KV=bf16 restores the legacy
              quantize-after decomposition: bf16 prefill + quantize_cache)
  logits      extended_logits on the last position (first-token head)

Each stage is timed as its own jit with host-readback sync (axon:
block_until_ready does not sync; per-dispatch overhead ~36 ms is small vs
the 0.2-2.5 s stages). REPS=3, min taken.

Env: PADT_MICRO_B (96), PADT_MICRO_REPS (3), PADT_MICRO_PACKED (1),
PADT_MICRO_KV (int8).
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
    from padt_tpu.config import padt_3b, padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.models import language
    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    tiny = os.environ.get("PADT_MICRO_TINY", "0") == "1"  # CPU syntax check
    b = 2 if tiny else int(os.environ.get("PADT_MICRO_B", "96"))
    reps = int(os.environ.get("PADT_MICRO_REPS", "3"))
    if tiny:
        cfg = padt_tiny().replace(max_image_patches=256)
        grid = (1, 8, 8)
    else:
        cfg = padt_3b().replace(max_image_patches=2304, vision_chunk_size=16)
        grid = (1, 46, 46)
    dtype = jnp.bfloat16

    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), dtype)
    if os.environ.get("PADT_MICRO_PACKED", "1") == "1":
        params = P.pack_inference_params(params)

    grids = [grid] * b
    s_max = cfg.max_image_patches
    geom = vision_geometry(grids, s_max)
    rng = np.random.RandomState(0)
    pix = rng.randn(b, s_max, cfg.vision.patch_input_dim).astype(np.float32)
    nm = grid[0] * grid[1] * grid[2] // 4
    prompt_extra = 40
    l = -(-(nm + prompt_extra + 8) // 64) * 64
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + list(
        range(1000, 1000 + prompt_extra)
    )
    for i in range(b):
        ids[i, l - len(seq):] = seq
        am[i, l - len(seq):] = 1
    pos, _ = get_rope_index(ids, am, np.array(grids), cfg.image_token_id)
    batch = dict(
        pixel_patches=jnp.asarray(pix, dtype),
        window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index),
        seg_win=jnp.asarray(geom.seg_win), seg_full=jnp.asarray(geom.seg_full),
        hpos=jnp.asarray(geom.hpos), wpos=jnp.asarray(geom.wpos),
        num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches),
        grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
    )
    capacity = -(-(l + 80) // 128) * 128

    def timed(fn, *args):
        jf = jax.jit(fn)
        out = jf(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))  # compile+sync
        ts = []
        for _ in range(reps):
            out = None  # free the previous rep's output BEFORE reallocating
            #             (two live int8 caches + the bf16 source OOMs at b96)
            t0 = time.perf_counter()
            out = jf(*args)
            _ = float(jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    results = {}
    t, art = timed(lambda p, bt: P.run_vision(p, cfg, bt), params, batch)
    results["vision_s"] = round(t, 4)
    t, embeds = timed(
        lambda p, bt, pr, mg: P.extended_embed(p, cfg, bt["input_ids"], pr, mg),
        params, batch, art.proto, art.merged,
    )
    results["embed_s"] = round(t, 4)
    valid = batch["attention_mask"].astype(bool)
    kv_dtype = os.environ.get("PADT_MICRO_KV", "int8")  # generate()'s path
    t, (hidden, cache) = timed(
        lambda p, e, bt: language.prefill(
            p["text"], cfg.text, e, bt["position_ids"], valid, capacity,
            kv_dtype=kv_dtype,
        ),
        params, embeds, batch,
    )
    results["text_prefill_s"] = round(t, 4)
    # free stage outputs generate() would have dropped — keeping embeds + the
    # bf16 cache + its int8 copy all alive OOMs at b96 where generate fits
    del embeds
    if kv_dtype == "bf16":
        # legacy quantize-after path, kept for comparison against in-scan
        t, qcache = timed(lambda c: language.quantize_cache(c), cache)
        results["quant_cache_s"] = round(t, 4)
        del qcache
    del cache
    t, _ = timed(
        lambda p, h, pr, nmg: P.extended_logits(p, cfg, h[:, -1:], pr, nmg),
        params, hidden, art.proto, art.num_merged,
    )
    results["logits_s"] = round(t, 4)
    results["sum_s"] = round(sum(v for k, v in results.items()), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
