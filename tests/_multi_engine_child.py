"""Subprocess child for test_serve.py::test_multi_engine_matches_single:
runs on >=2 virtual CPU devices; asserts MultiEngine (one replica per device)
produces token-identical completions to one ServeEngine, with replicas'
params/state actually placed on distinct devices."""

import numpy as np

import jax
import jax.numpy as jnp

from padt_tpu.config import padt_tiny
from padt_tpu.models import padt as P
from padt_tpu.preprocess.vision_process import ProcessedImage
from padt_tpu.serve import MultiEngine, Request, ServeEngine
from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
from padt_tpu.vrt.processor import VisionTextProcessor


def main():
    devices = jax.devices()
    assert len(devices) >= 2, devices
    cfg = padt_tiny()
    tok = make_tiny_tokenizer(cfg)
    proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=128)
    proc.prepare(cfg.text.vocab_size)
    params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(3)
    prompts = ["detect the cat", "find a dog", "locate the car", "what is here"]
    reqs = []
    budgets = [4, 9, 3, 8, 6, 5, 7, 2, 10, 4]
    for i, bud in enumerate(budgets):
        img = ProcessedImage(rng.randn(96, 1176).astype(np.float32), (1, 8, 12))
        b = proc.build_batch([prompts[i % len(prompts)]], [img], prompt_bucket=128)
        reqs.append(
            Request(
                batch={k: jnp.asarray(v) for k, v in b.data.items()},
                rope_delta=int(b.rope_deltas[0]),
                max_new_tokens=bud,
                uid=i,
            )
        )
    prompt_len = 128
    mk = lambda p: ServeEngine(
        p, cfg, n_slots=2, max_new_tokens=12, prompt_len=prompt_len,
        prefill_bucket=1, chunk_steps=2, patch_bucket=128,
    )
    single, _ = mk(params).run(reqs, schedule="longest_first")
    ref = {c.uid: c.tokens for c in single}

    def make_engine(dev):
        p = jax.device_put(params, dev)
        eng = mk(p)
        eng.state = jax.device_put(eng.state, dev)
        return eng

    multi = MultiEngine.for_devices(make_engine, devices[:2])
    # replicas really live on different devices
    d0 = list(multi.engines[0].state.k8.devices())[0]
    d1 = list(multi.engines[1].state.k8.devices())[0]
    assert d0 != d1, (d0, d1)
    results, stats = multi.run(reqs, schedule="longest_first")
    assert stats.completions == len(reqs), stats
    got = {c.uid: c.tokens for c in results}
    assert set(got) == set(ref)
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid], err_msg=f"uid {uid}")
    assert 0 < stats.slot_step_utilization <= 1.0
    print("MULTI_ENGINE_OK", stats.completions, round(stats.slot_step_utilization, 3))


if __name__ == "__main__":
    main()
