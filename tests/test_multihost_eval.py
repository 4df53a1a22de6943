"""Multi-host eval smoke: two REAL processes through jax.distributed (CPU
backend) run `infer_dataset` and shard the dataset by `jax.process_index()`
— the rebuild of the reference's torchrun rank-strided sharding
(`eval/evaluation_scripts/utils.py:181-189`): per-rank output files, disjoint
row coverage, identical file naming."""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
import jax

jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["RANK"]),
)
import jax.numpy as jnp
import PIL.Image

from padt_tpu.config import padt_tiny
from padt_tpu.eval.harness import InferenceEngine, infer_dataset
from padt_tpu.models import padt as P
from padt_tpu.utils.mock_tokenizer import make_tiny_tokenizer
from padt_tpu.vrt.processor import VisionTextProcessor

assert jax.process_count() == 2, jax.process_count()
out_dir = os.environ["OUT_DIR"]
cfg = padt_tiny()
tok = make_tiny_tokenizer(cfg)
proc = VisionTextProcessor(tok, cfg, seq_bucket=32, patch_bucket=cfg.max_image_patches)
proc.prepare(cfg.text.vocab_size)
params = P.init_padt_params(cfg, jax.random.PRNGKey(0), jnp.float32)

img_path = os.path.join(out_dir, "img.png")
if int(os.environ["RANK"]) == 0:
    rng = np.random.RandomState(0)
    PIL.Image.fromarray(rng.randint(0, 255, (64, 96, 3), np.uint8)).save(img_path)
import time
while not os.path.exists(img_path):
    time.sleep(0.1)

dataset = [{"id": i, "image_path": img_path, "problem": f'find "{i}"'} for i in range(6)]
engine = InferenceEngine(params, cfg, proc, max_new_tokens=6, canvas_hw=(9, 9))
res_path, comp_path = infer_dataset(
    engine, dataset, out_dir, batch_size=2, datasetname="mh", max_side=None
)
print("WORKER_DONE", res_path, comp_path)
"""


def test_two_process_eval_sharding(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORM_NAME="cpu",
            # keep the axon plugin importable (JAX_PLATFORMS=axon is set
            # globally in this environment) while adding the repo root
            PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""),
            JAX_PLATFORMS="cpu",
            COORD=f"localhost:{port}",
            RANK=str(rank),
            OUT_DIR=str(tmp_path),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py)], env=env, cwd=root,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-3000:]
        assert "WORKER_DONE" in so

    rows = {}
    for rank in range(2):
        comp = tmp_path / f"mh_{rank}_pred_comp_.json"
        assert comp.exists(), f"rank {rank} wrote no completion file"
        rows[rank] = [json.loads(l)["image_id"] for l in open(comp)]
        assert rows[rank], f"rank {rank} processed no rows"
    # disjoint coverage of the whole dataset across ranks (utils.py:181-182)
    assert not (set(rows[0]) & set(rows[1]))
    assert set(rows[0]) | set(rows[1]) == set(range(6))
