"""Checkpointing: orbax-backed save/load of TrainState + stage-handoff import.

Reference: utils/checkpoint.py:13-148 (Checkpointer with `last_checkpoint`
tag, optimizer/scheduler skipping), model_serialization.py:10-80 (fuzzy
longest-suffix state-dict alignment), c2_model_loading (Caffe2 import — here
replaced by a torch->JAX converter for the released reference weights).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()
        with open(os.path.join(self.directory, "last_checkpoint"), "w") as f:
            f.write(str(step))

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def load(self, state_template, step: Optional[int] = None,
             load_optimizer: bool = True):
        """Restore into the template; optionally keep the fresh optimizer
        state (SOLVER.LOAD_OPTIMIZER=False semantics)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state_template, 0
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        if not load_optimizer:
            restored = restored.replace(
                opt_state=state_template.opt_state, step=state_template.step
            )
        return restored, step


_CATALOG = {
    # names the reference resolves through ModelCatalog (utils/checkpoint.py:
    # 110-148 + model_zoo); zero-egress here, so they map to local files
    "ImageNetPretrained/MSRA/R-50": "R-50.pkl",
    "ImageNetPretrained/MSRA/R-101": "R-101.pkl",
    "ImageNetPretrained/MSRA/R-152": "R-152.pkl",
}


def resolve_weight(weight: str) -> str:
    """`catalog://` / URL resolution (reference DetectronCheckpointer
    _load_file): catalog names and URLs map to files under
    $DISPRCNN_WEIGHTS (default /root/repo/weights) — this machine has no
    network egress, so remote fetch is replaced by a local-cache contract."""
    root = os.environ.get("DISPRCNN_WEIGHTS", "/root/repo/weights")
    if weight.startswith("catalog://"):
        name = weight[len("catalog://"):]
        fname = _CATALOG.get(name, name.replace("/", "_") + ".pkl")
        path = os.path.join(root, fname)
    elif weight.startswith(("http://", "https://")):
        path = os.path.join(root, os.path.basename(weight))
    else:
        return weight
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{weight} resolves to local cache {path}, which does not exist "
            "(no network egress: place the file there manually)"
        )
    return path


def load_stage_weights(variables: dict, weight: str) -> dict:
    """Resolve cfg.MODEL.WEIGHT for stage handoff
    (reference DetectronCheckpointer.load + scripts/car/vob/train_rcnn.sh:1-9
    ckpt copying): `weight` is a previous stage's orbax checkpoint directory,
    a released torch .pth/.tar, a Detectron/Caffe2 .pkl, or a catalog:// /
    URL name (resolved to the local weight cache); parameters are merged
    into `variables` by fuzzy suffix alignment."""
    weight = resolve_weight(weight)
    src_stats: dict = {}
    if weight.endswith(".pkl"):
        from .torch_import import import_c2_backbone

        src_params, src_frozen = import_c2_backbone(weight)
    elif weight.endswith((".pth", ".tar")):
        from . import torch_import as ti

        # sniff which of the four released layouts this is
        # (model_serialization.py:10-80 lineage; docs/TRAIN_VAL.md artifacts)
        sd = ti.load_torch_state_dict(weight)
        src_frozen = {}
        if any(k.startswith(("dispnet.", "pcnet.")) for k in sd):
            src_params, src_stats = ti.import_disprcnn3d(sd)  # full 3D stage
        elif any("backbone_net" in k for k in sd):
            src_params, src_stats = ti.import_pointrcnn(sd)  # pointrcnn.pth
        elif any(k.startswith("feature_extraction") for k in sd):
            src_params, src_stats = ti.import_psmnet(sd)  # iDispNet bestmodel
        else:
            src_params, src_frozen = ti.import_disprcnn2d(weight)  # 2D mrcnn
    else:
        mngr = ocp.CheckpointManager(os.path.abspath(weight))
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {weight}")
        raw = mngr.restore(step)
        src_params = raw.get("params", {})
        src_frozen = raw.get("frozen", {})
        src_stats = raw.get("batch_stats", {})

    out = dict(variables)
    params, unmatched = align_and_update_params(variables["params"], src_params)
    out["params"] = params
    if src_frozen and variables.get("frozen"):
        frozen, _ = align_and_update_params(variables["frozen"], src_frozen)
        out["frozen"] = frozen
    if src_stats and variables.get("batch_stats"):
        stats, _ = align_and_update_params(variables["batch_stats"], src_stats)
        out["batch_stats"] = stats
    if unmatched:
        import logging

        logging.getLogger("disprcnn_tpu").info(
            f"load_stage_weights({weight}): {len(unmatched)} target params "
            f"not found (kept init), e.g. {unmatched[:5]}"
        )
    return out


def align_and_update_params(target: dict, source: dict) -> tuple[dict, list[str]]:
    """Fuzzy parameter alignment by longest matching dotted-suffix
    (reference model_serialization.py:10-59): tolerates module-prefix changes
    between stages. Returns (updated tree, list of unmatched target paths)."""
    flat_t = _flatten(target)
    flat_s = _flatten(source)
    unmatched = []
    out = dict(flat_t)
    skeys = list(flat_s.keys())
    for tk in flat_t:
        best, best_len = None, 0
        for sk in skeys:
            if tk == sk or tk.endswith("." + sk) or sk.endswith("." + tk):
                l = min(len(tk), len(sk))
                if l > best_len:
                    best, best_len = sk, l
        if best is not None and flat_s[best].shape == flat_t[tk].shape:
            out[tk] = flat_s[best]
        else:
            unmatched.append(tk)
    return _unflatten(out), unmatched


def _flatten(tree, prefix="") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
