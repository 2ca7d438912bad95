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
    fixed-shape array gathers).

    Hosts may hold UNEQUAL shard sizes: a first scalar gather agrees on the
    global max rows / id width, every host zero-pads its stack to that shape
    (pad rows carried in a ``_valid`` mask and dropped after the gather), and
    image ids travel as fixed-width utf-8 byte codes — arbitrary string ids
    round-trip, not just zero-padded integers. Duplicate ids (shard padding
    repeats samples) collapse on re-keying, matching the reference's
    dict-update merge.
    """
    import jax

    from ..parallel.multihost import all_gather_predictions

    if jax.process_count() == 1:
        return local
    if not local:
        raise ValueError(
            "merge_predictions_across_hosts: this host holds 0 predictions "
            "(every host must evaluate >= 1 image; the loader pads shards)"
        )
    ids = sorted(local.keys())
    keys = sorted(local[ids[0]].keys())
    n = len(ids)
    width = max(len(i.encode("utf-8")) for i in ids)
    dims = all_gather_predictions(
        {"_dims": np.asarray([[n, width]], np.int64)}
    )["_dims"]
    nmax, wmax = int(dims[:, 0].max()), int(dims[:, 1].max())

    def pad_rows(a: np.ndarray) -> np.ndarray:
        if n == nmax:
            return a
        return np.concatenate(
            [a, np.zeros((nmax - n,) + a.shape[1:], a.dtype)]
        )

    stacked = {
        k: pad_rows(np.stack([np.asarray(local[i][k]) for i in ids]))
        for k in keys
    }
    codes = np.zeros((nmax, wmax), np.uint8)
    for r, i in enumerate(ids):
        b = i.encode("utf-8")
        codes[r, : len(b)] = np.frombuffer(b, np.uint8)
    stacked["_imgid"] = codes
    stacked["_valid"] = np.arange(nmax) < n
    merged = all_gather_predictions(stacked)
    out = {}
    for row in range(merged["_valid"].shape[0]):
        if not merged["_valid"][row]:
            continue
        imgid = bytes(merged["_imgid"][row]).rstrip(b"\x00").decode("utf-8")
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
