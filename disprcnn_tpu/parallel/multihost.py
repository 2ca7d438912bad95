"""Multi-host helpers: fixed-shape prediction gathering across processes.

Replaces the reference's pickle-over-NCCL `all_gather`
(utils/comm.py:47-89, engine/inference.py:253-272): predictions are already
fixed-shape padded arrays, so cross-host merging is a structured
`process_allgather` — no byte-tensor padding or pickling.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (reference utils/comm.py synchronize)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("disprcnn_tpu_sync")


def all_gather_predictions(local: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather equal-shaped per-host prediction arrays; returns concatenated
    arrays on every host (host 0 writes outputs)."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return {
        k: np.asarray(multihost_utils.process_allgather(v)).reshape(
            (-1,) + v.shape[1:]
        )
        for k, v in local.items()
    }
