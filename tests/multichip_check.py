"""Subprocess body for multi-device tests (run under JAX_PLATFORM_NAME=cpu with
8 virtual devices). Invoked by test_parallel.py.

check_sharded_generate: shard tiny-model params (fsdp+tensor) and the batch
(data axis), run the fused generate loop + vl_decode under the mesh, and verify
outputs match the unsharded single-device run (GSPMD semantics preservation).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_sharded_generate():
    import jax
    import jax.numpy as jnp

    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.parallel.mesh import batch_shardings, make_mesh, shard_params
    from padt_tpu.models.mrope_index import get_rope_index
    from padt_tpu.models.vision_geom import vision_geometry

    assert len(jax.devices()) >= 8, jax.devices()
    cfg = padt_tiny()
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    b = 4
    grids = [(1, 8, 12)] * b
    s_max = cfg.max_image_patches
    geom = vision_geometry(grids, s_max)
    rng = np.random.RandomState(0)
    pix = rng.randn(b, s_max, cfg.vision.patch_input_dim).astype(np.float32)
    l = 64
    ids = np.full((b, l), cfg.pad_token_id, np.int64)
    am = np.zeros((b, l), np.int64)
    nm = grids[0][1] * grids[0][2] // 4
    seq = [cfg.vision_start_token_id] + [cfg.image_token_id] * nm + list(range(10, 20))
    for i in range(b):
        ids[i, l - len(seq):] = seq
        am[i, l - len(seq):] = 1
    pos, deltas = get_rope_index(ids, am, np.array(grids), cfg.image_token_id)
    batch = dict(
        pixel_patches=jnp.asarray(pix), window_index=jnp.asarray(geom.window_index),
        inv_window_index=jnp.asarray(geom.inv_window_index), seg_win=jnp.asarray(geom.seg_win),
        seg_full=jnp.asarray(geom.seg_full), hpos=jnp.asarray(geom.hpos),
        wpos=jnp.asarray(geom.wpos), num_merged=jnp.asarray(geom.num_merged),
        num_patches=jnp.asarray(geom.num_patches), grid_thw=jnp.asarray(geom.grid_thw),
        **({"pack_index": jnp.asarray(geom.pack_index)} if geom.pack_index is not None else {}),
        input_ids=jnp.asarray(ids, jnp.int32), attention_mask=jnp.asarray(am, jnp.int32),
        position_ids=jnp.asarray(pos),
    )
    deltas_j = jnp.asarray(deltas)

    # single-device reference
    ref = jax.jit(lambda p, bt, d: P.generate(p, cfg, bt, 6, d))(params, batch, deltas_j)
    ref_tokens = np.asarray(ref.tokens)

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    with mesh:
        sp = shard_params(params, mesh)
        b_sh = batch_shardings(batch, mesh)
        batch_dev = {k: jax.device_put(v, b_sh[k]) for k, v in batch.items()}
        out = jax.jit(lambda p, bt, d: P.generate(p, cfg, bt, 6, d))(sp, batch_dev, deltas_j)
        sh_tokens = np.asarray(out.tokens)
        # vl_decode sharded too
        feats = out.hidden[:, :2][jnp.asarray([0, 1])][:, :]
        dec = jax.jit(
            lambda p, f, a: P.vl_decode(
                p, cfg, f, jnp.asarray([2, 1]), jnp.asarray([True, True]),
                jnp.asarray([0, 1]), a, canvas_hw=(8, 12),
            )
        )(sp, feats, out.artifacts)
        assert np.isfinite(np.asarray(dec.pred_boxes)).all()

    np.testing.assert_array_equal(ref_tokens, sh_tokens)
    print("sharded_generate OK", sh_tokens[0].tolist())


def check_cached_vision_train():
    """Sharded SFT train step consuming cached vis_* features (trainer
    cache_vision_features): the cached keys must shard cleanly over the batch
    axes (generic leading-dim rule in parallel/mesh.py::batch_shardings) and
    the step must stay SPMD-clean — test_parallel asserts zero 'Involuntary
    full rematerialization' warnings on this process's stderr."""
    import jax
    import jax.numpy as jnp

    from bench_train import _build_batch
    from padt_tpu.config import padt_tiny
    from padt_tpu.models import padt as P
    from padt_tpu.parallel.mesh import (
        batch_shardings, make_mesh, param_shardings, shard_params,
    )
    from padt_tpu.train.train_step import LossConfig, make_optimizer, make_train_step

    assert len(jax.devices()) >= 8, jax.devices()
    cfg = padt_tiny().replace(max_image_patches=256)
    b, grid, lp, lc = 8, (1, 16, 16), 96, 32
    batch, canvas_hw = _build_batch(cfg, b, grid, lp, lc)
    batch = {
        k: v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
        for k, v in batch.items()
    }
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    with mesh:
        params = shard_params(params, mesh)
        # batched feature fill, sharded — same call the trainer makes on a miss
        vb = {k: batch[k] for k in P._VISION_BATCH_KEYS if k in batch}
        v_sh = batch_shardings(vb, mesh)
        vb_dev = {k: jax.device_put(v, v_sh[k]) for k, v in vb.items()}
        feats = jax.jit(lambda p, bt: P.vision_features(p, cfg, bt))(params, vb_dev)
        cached = {k: v for k, v in batch.items() if k not in P._VISION_ONLY_KEYS}
        cached.update(feats)

        opt = make_optimizer(learning_rate=1e-5, total_steps=10)
        opt_state = jax.jit(
            opt.init, in_shardings=(param_shardings(params, mesh),)
        )(params)
        step = make_train_step(
            cfg, opt, prompt_length=lp, canvas_hw=canvas_hw,
            lcfg=LossConfig(freeze_vision=True),
        )
        c_sh = batch_shardings(cached, mesh)
        cached_dev = {k: jax.device_put(v, c_sh[k]) for k, v in cached.items()}
        params, opt_state, metrics = jax.jit(step, donate_argnums=(0, 1))(
            params, opt_state, cached_dev, jnp.asarray(False)
        )
        loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    print("cached_vision_train OK", round(loss, 4))


if __name__ == "__main__":
    globals()[sys.argv[1]]()
