"""Inference engine: eval loop -> per-image predictions -> KITTI txt/eval.

Reference: engine/inference.py:215-352. The loop batches images, runs the
jitted eval forward, gathers fixed-shape outputs to host, trims padding, and
caches predictions (predictions.pkl == the reference's predictions.pth +
--no_force_recompute workflow). Multi-host: each host evaluates its shard and
host 0 merges (fixed-shape process_allgather in the multi-host setting).
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from ..utils.logging import Timer, setup_logger


def compute_on_dataset(
    predict_fn: Callable[[dict], dict],
    loader,
    logger=None,
) -> Dict[str, dict]:
    """predict_fn(batch) -> dict of numpy arrays with leading batch axis.
    Returns imgid -> trimmed per-image prediction dict."""
    results = {}
    timer = Timer()
    for batch in loader:
        timer.tic()
        out = predict_fn(batch)
        dt = timer.toc()
        bs = len(batch["imgid"])
        for i, imgid in enumerate(batch["imgid"]):
            results[imgid] = {k: np.asarray(v[i]) for k, v in out.items()}
        if logger:
            logger.info(f"inference {len(results)} images, {dt / bs:.3f} s/img")
    return results


def merge_predictions_across_hosts(local: Dict[str, dict]) -> Dict[str, dict]:
    """Merge per-host prediction shards into the full dict on every host
    (reference engine/inference.py:253-272 pickle all_gather, rebuilt as
    fixed-shape array gathers: per-image dicts are stacked per key, gathered
    with process_allgather, and re-keyed by the gathered integer ids)."""
    import jax

    from ..parallel.multihost import all_gather_predictions

    if jax.process_count() == 1 or not local:
        return local
    ids = sorted(local.keys())
    keys = sorted(local[ids[0]].keys())
    stacked = {k: np.stack([local[i][k] for i in ids]) for k in keys}
    # imgids travel as integers (KITTI ids are numeric strings)
    width = max(len(i) for i in ids)
    stacked["_imgid"] = np.asarray([int(i) for i in ids], np.int64)
    merged = all_gather_predictions(stacked)
    out = {}
    for row, iid in enumerate(merged["_imgid"]):
        imgid = str(int(iid)).zfill(width)
        out[imgid] = {k: merged[k][row] for k in keys}
    return out


def inference(
    predict_fn,
    loader,
    dataset_name: str,
    output_folder: Optional[str] = None,
    force_recompute: bool = True,
    evaluator=None,
    logger=None,
):
    import jax

    from ..parallel.multihost import is_main_process, synchronize

    logger = logger or setup_logger("disprcnn_tpu.inference", output_folder or "")
    cache = os.path.join(output_folder, "predictions.pkl") if output_folder else None
    if cache and os.path.exists(cache) and not force_recompute:
        with open(cache, "rb") as f:
            predictions = pickle.load(f)
        logger.info(f"loaded cached predictions for {dataset_name}")
    else:
        t0 = time.perf_counter()
        predictions = compute_on_dataset(predict_fn, loader, logger)
        total = time.perf_counter() - t0
        logger.info(
            f"total inference time {total:.1f}s "
            f"({total / max(len(predictions), 1):.3f} s/img per device)"
        )
        synchronize()
        predictions = merge_predictions_across_hosts(predictions)
        if cache and is_main_process():
            os.makedirs(output_folder, exist_ok=True)
            with open(cache, "wb") as f:
                pickle.dump(predictions, f)
    if evaluator is not None:
        return evaluator(predictions, output_folder)
    return predictions
