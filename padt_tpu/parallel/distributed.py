"""Multi-host runtime initialization.

Replaces `torch.distributed.init_process_group("nccl")` + torchrun
(reference `inference_coco.py:12-23`, SURVEY.md §2.4): on TPU pods,
`jax.distributed.initialize()` discovers peers from the TPU environment; all
collectives then ride ICI/DCN via XLA. Call once at program start, before any
JAX computation.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if running multi-host. Returns True if a
    multi-host runtime is active. No-op (False) for single-host runs."""
    import jax

    if jax.process_count() > 1:
        return True
    env_multi = any(
        os.environ.get(k) for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if coordinator_address or env_multi or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return jax.process_count() > 1
    # TPU pod slices auto-discover; attempt only when the TPU env hints exist
    if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1
    return False
