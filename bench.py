"""Benchmark: PaDT REC-style decode throughput on one chip.

Workload mirrors the reference's eval configuration (BASELINE.md): PaDT-3B
architecture, bf16, one 644px-class image per sample (46x46 patch grid -> 529
merged patches / VRTs), greedy decode with KV cache and per-step hidden-state
capture — the hot path of `eval/evaluation_scripts/utils.py:233-236`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
decode tokens/sec/chip (decode-slope measurement: two different generation
lengths, differenced to remove prefill+vision cost).

Env overrides: PADT_BENCH_BATCH (default 8), PADT_BENCH_SMALL=1 (tiny config
for CPU smoke runs), PADT_BENCH_BASELINE (tokens/sec to compare against, else
BENCH_BASELINE.json if present).
"""

import json
import os
import time

import numpy as np


def _config(batch=None):
    import dataclasses

    from padt_tpu.config import padt_3b, padt_7b, padt_tiny

    if os.environ.get("PADT_BENCH_SMALL", "0") == "1":
        return padt_tiny().replace(max_image_patches=256), 2, 8, 16, (1, 8, 12)
    batch = batch or int(os.environ.get("PADT_BENCH_BATCH", "0")) or None
    chunk_env = os.environ.get("PADT_BENCH_VISION_CHUNK")
    if os.environ.get("PADT_BENCH_MODEL", "3b") == "7b":
        # 7B single-chip: int8 weights mandatory (bf16 7B = 15.2 GB alone);
        # smaller default batch, same 644px REC workload
        if batch is None:
            batch = 48  # fits with the direct-packed int8 init (round 5)
        chunk = int(chunk_env) if chunk_env else (8 if batch > 16 else 0)
        cfg = padt_7b().replace(max_image_patches=2304, vision_chunk_size=chunk)
        return cfg, batch, 16, 80, (1, 46, 46)
    if batch is None:
        batch = 160  # largest known-good (split prefill eighth-chunks +
        #              vision chunk 8, BASELINE.md round-5: 8800 tok/s;
        #              b176/b192 OOM); main() falls back down the ladder
    chunk = int(chunk_env) if chunk_env else (8 if batch > 112 else 16 if batch > 32 else 0)
    cfg = padt_3b().replace(max_image_patches=2304, vision_chunk_size=chunk)
    return cfg, batch, 16, 80, (1, 46, 46)  # grid = 644px image


def main(batch=None):
    import jax
    import jax.numpy as jnp

    from padt_tpu.models import padt as P
    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    cfg, batch_size, n_short, n_long, grid = _config(batch)
    dtype = jnp.bfloat16

    if os.environ.get("PADT_BENCH_MODEL", "3b") == "7b":
        # int8 layer weights built directly (bf16 7B cannot be materialized
        # then quantized in 15.75 GB HBM), in the FUSED qkv/gateup layout
        # (packed=True) — on-device packing's ~4.3 GB concat transient OOMs
        # one chip, so the fused stacks are built straight away; real 7B
        # checkpoints pack host-side in convert/load.
        params = P.init_padt_params_quantized(
            cfg, jax.random.PRNGKey(0), dtype,
            packed=os.environ.get("PADT_BENCH_PACKED", "1") == "1",
        )
    else:
        params = P.init_padt_params(cfg, jax.random.PRNGKey(0), dtype)
        if os.environ.get("PADT_BENCH_INT8", "0") == "1":
            params = P.quantize_params(params)
        if os.environ.get("PADT_BENCH_PACKED", "1") == "1":
            # fused qkv / gateup weight streams (PADT_BENCH_PACKED=0 restores
            # the unfused layout for A/B)
            params = P.pack_inference_params(params)

    grids = [grid] * batch_size
    s_max = cfg.max_image_patches
    geom = vision_geometry(grids, s_max)
    rng = np.random.RandomState(0)
    pix = rng.randn(batch_size, s_max, cfg.vision.patch_input_dim).astype(np.float32)

    nm = grid[0] * grid[1] * grid[2] // 4
    prompt_extra = 40  # REC prompt text tokens
    l = -(-(nm + prompt_extra + 8) // 64) * 64
    ids = np.full((batch_size, l), cfg.pad_token_id, np.int64)
    am = np.zeros((batch_size, l), np.int64)
    seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + list(range(1000, 1000 + prompt_extra))
    for i in range(batch_size):
        ids[i, l - len(seq):] = seq
        am[i, l - len(seq):] = 1
    pos, deltas = get_rope_index(ids, am, np.array(grids), cfg.image_token_id)

    batch = dict(
        pixel_patches=jnp.asarray(pix, dtype),
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
    )
    deltas = jnp.asarray(deltas)

    # int8 KV cache is the default serving config (1.21x at batch 96; parity
    # within int8 noise, tests/test_kv_cache.py). PADT_BENCH_KV=bf16 for exact.
    kv_dtype = os.environ.get("PADT_BENCH_KV", "int8")
    # split prefill (language.prefill batch_chunk): bounds per-layer prefill
    # activation transients so batches past 112 fit (decode keeps amortizing
    # the weight stream with B). 0/unset = whole-batch prefill.
    pchunk = int(os.environ.get("PADT_BENCH_PREFILL_CHUNK", "0")) or None
    if pchunk is None and batch_size > 128 and batch_size % 8 == 0:
        # eighth-chunks past b128: b160 needs chunk 20 (chunk 40 OOMs);
        # the ~2 s extra serialization is amortized by the decode gain
        # (BASELINE.md round-5 ladder)
        pchunk = batch_size // 8
    elif pchunk is None and batch_size > 112 and batch_size % 4 == 0:
        # quarter-chunks: b120 at chunk 60 still OOM'd, chunk 30 fits
        # (BASELINE.md round-5 ladder)
        pchunk = batch_size // 4

    def run(n_new):
        f = jax.jit(
            lambda p, b, d: P.generate(
                p, cfg, b, n_new, d, kv_cache_dtype=kv_dtype,
                prefill_batch_chunk=pchunk,
            ),
            static_argnums=(),
        )
        out = f(params, batch, deltas)
        _ = np.asarray(out.tokens)  # compile + warm (host readback = real sync;
        # block_until_ready does not synchronize on the axon tunnel backend)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, batch, deltas)
            _ = np.asarray(out.tokens)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_short = run(n_short)
    t_long = run(n_long)
    diff = t_long - t_short
    if diff < 0.02 * t_long or diff <= 0:
        # timing resolution too coarse for the slope method (tiny smoke runs):
        # fall back to amortized whole-generation throughput
        decode_tps = batch_size * n_long / max(t_long, 1e-9)
    else:
        decode_tps = batch_size * (n_long - n_short) / diff
    per_seq = decode_tps / batch_size
    # queries/sec/chip at the reference decode budget-ish completion (~25 tokens REC)
    qps = decode_tps / 25.0

    baseline = None
    if os.environ.get("PADT_BENCH_BASELINE"):
        baseline = float(os.environ["PADT_BENCH_BASELINE"])
    elif os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = float(json.load(open("BENCH_BASELINE.json"))["value"])
        except Exception:
            baseline = None
    vs = (decode_tps / baseline) if baseline else 1.0

    result = {
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "batch": batch_size,
            "prompt_len": int(l),
            "merged_patches": int(nm),
            "per_seq_tokens_per_sec": round(per_seq, 2),
            "rec_queries_per_sec_est": round(qps, 2),
            # end-to-end harness measurement (scripts/bench_eval_scale.py,
            # 1024 640px REC queries, warm stream engine, one v5e + ONE host
            # core; BASELINE.md round-5 "eval at dataset scale" + "compact
            # uint8 pixel wire format" — was 6.62 before the u8 upload cut).
            # The _est above is decode arithmetic only (no prefill, no host).
            "rec_queries_per_sec_measured_e2e": 9.17,
            "t_prefill_plus_short_s": round(t_short, 3),
            "t_long_s": round(t_long, 3),
            "backend": jax.default_backend(),
            "kv_cache_dtype": kv_dtype,
        },
    }
    print(json.dumps(result))


def main_with_fallback():
    """Try the largest known-good batch first; halve on OOM so the driver
    always records a number."""
    from padt_tpu.utils.hostenv import wait_for_tpu

    # the axon tunnel dies/hangs transiently and recovers on its own — wait
    # (bounded) instead of failing the round's one bench record on a bad probe
    wait_for_tpu()
    if os.environ.get("PADT_BENCH_BATCH") or os.environ.get("PADT_BENCH_SMALL") == "1":
        return main()
    ladder = (48, 32, 16, 8) if os.environ.get("PADT_BENCH_MODEL") == "7b" else (160, 152, 144, 128, 120, 112, 96, 64, 32, 16, 8)
    for b in ladder:
        try:
            return main(batch=b)
        except Exception as e:
            import sys

            print(f"batch {b} failed ({type(e).__name__}); retrying smaller", file=sys.stderr)
    return main(batch=4)


if __name__ == "__main__":
    main_with_fallback()
