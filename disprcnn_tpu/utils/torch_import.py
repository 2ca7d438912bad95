"""torch -> JAX checkpoint conversion for the reference's released weights.

Reference artifacts (scripts/download/model/*): the 2D detector in
maskrcnn-benchmark format (srcnn_pretrained_2d_mrcnn_format.pth), the PSMNet
tar (bestmodel.pth, `module.`-prefixed), the PointRCNN checkpoints, and the
full DispRCNN3D state dicts. This module converts tensors to the Flax
conventions and remaps module paths:
- Conv2d weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
- Conv3d weight (O, I, kd, kh, kw) -> kernel (kd, kh, kw, I, O)
- ConvTranspose weight (I, O, k...) -> kernel (k..., I, O) [flax transpose]
- Linear weight (O, I) -> kernel (I, O)
- BatchNorm (weight, bias, running_mean, running_var) -> FrozenBatchNorm
  {scale, bias, mean, var} or flax BN {scale, bias} + batch_stats {mean, var}.

Loading uses `align_and_update_params`-style suffix matching after the
mechanical conversion, so stage-prefix differences are tolerated
(reference model_serialization.py:10-80 behaviour).
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        for key in ("model", "state_dict", "model_state"):
            if key in blob and isinstance(blob[key], dict):
                blob = blob[key]
                break
    out = {}
    for k, v in blob.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def convert_tensor(name: str, arr: np.ndarray, transpose_conv: bool = False):
    """-> (flax_leaf_name, converted array)."""
    if name.endswith(".weight"):
        # torch ConvTranspose computes correlation with a spatially FLIPPED
        # kernel relative to flax ConvTranspose(transpose_kernel=False), so the
        # spatial axes must be reversed before the layout transpose (verified
        # numerically: without the flip a 2x2/s2 deconv import errs by ~0.9).
        if arr.ndim == 4:
            if transpose_conv:
                return "kernel", arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # (I,O,kh,kw)->(kh,kw,I,O)
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:
            if transpose_conv:
                return "kernel", arr[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1)
            return "kernel", arr.transpose(2, 3, 4, 1, 0)
        if arr.ndim == 2:
            return "kernel", arr.T
        return "scale", arr  # 1-D: norm scale
    if name.endswith(".bias"):
        return "bias", arr
    if name.endswith(".running_mean"):
        return "mean", arr
    if name.endswith(".running_var"):
        return "var", arr
    return name.rsplit(".", 1)[-1], arr


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    transpose_conv_names: Tuple[str, ...] = ("deconv", "conv5", "conv6"),
) -> Dict[str, np.ndarray]:
    """Mechanical tensor conversion; keys keep their dotted module paths."""
    out = {}
    for k, arr in sd.items():
        if k.endswith("num_batches_tracked"):
            continue  # torch BN counter, no flax counterpart
        is_tc = any(t in k for t in transpose_conv_names)
        leaf, conv = convert_tensor(k, arr, transpose_conv=is_tc)
        base = k.rsplit(".", 1)[0] if "." in k else k
        out[f"{base}.{leaf}"] = conv
    return out


# -- name remapping for the released 2D detector ---------------------------
_RESNET_MAPS = [
    # stem
    (re.compile(r"^(?:module\.)?backbone\.body\.stem\.conv1\."), "backbone.body.stem.conv1."),
    (re.compile(r"^(?:module\.)?backbone\.body\.stem\.bn1\."), "backbone.body.stem.FrozenBatchNorm_0."),
    # stages: layerN.M.convK / bnK / downsample
    (re.compile(r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.conv(\d)\."),
     lambda m: f"backbone.body.layer{m.group(1)}_{m.group(2)}.conv{m.group(3)}."),
    # NOTE flax auto-numbering order: in a block WITH a downsample branch the
    # downsample norm is created FIRST (FrozenBatchNorm_0) and bn1..bn3 map
    # to _1.._3; plain blocks map bn1..bn3 to _0.._2 (verified end-to-end by
    # tests/test_backbone_reference_parity.py)
    (re.compile(r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.bn(\d)\."),
     lambda m: (f"backbone.body.layer{m.group(1)}_{m.group(2)}."
                f"FrozenBatchNorm_{int(m.group(3)) - 1 + (1 if m.group(2) == '0' else 0)}.")),
    (re.compile(r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.downsample\.0\."),
     lambda m: f"backbone.body.layer{m.group(1)}_{m.group(2)}.downsample_conv."),
    (re.compile(r"^(?:module\.)?backbone\.body\.layer(\d)\.(\d+)\.downsample\.1\."),
     lambda m: f"backbone.body.layer{m.group(1)}_{m.group(2)}.FrozenBatchNorm_0."),
    # FPN
    (re.compile(r"^(?:module\.)?backbone\.fpn\.fpn_inner(\d)\."),
     lambda m: f"backbone.fpn.lateral{int(m.group(1)) + 1}."),
    (re.compile(r"^(?:module\.)?backbone\.fpn\.fpn_layer(\d)\."),
     lambda m: f"backbone.fpn.output{int(m.group(1)) + 1}."),
    # stereo RPN head
    (re.compile(r"^(?:module\.)?rpn\.head\.conv\."), "rpn_head.conv."),
    (re.compile(r"^(?:module\.)?rpn\.head\.cls_logits\."), "rpn_head.cls_logits."),
    (re.compile(r"^(?:module\.)?rpn\.head\.bbox_pred\."), "rpn_head.bbox_pred."),
    # stereo box head
    (re.compile(r"^(?:module\.)?roi_heads\.box\.feature_extractor\.RCNN_top\.0\."),
     "box_extractor.rcnn_top0."),
    (re.compile(r"^(?:module\.)?roi_heads\.box\.feature_extractor\.RCNN_top\.3\."),
     "box_extractor.rcnn_top1."),
    (re.compile(r"^(?:module\.)?roi_heads\.box\.predictor\.cls_score\."),
     "box_predictor.cls_score."),
    (re.compile(r"^(?:module\.)?roi_heads\.box\.predictor\.bbox_pred\."),
     "box_predictor.bbox_pred."),
    # mask head
    (re.compile(r"^(?:module\.)?roi_heads\.mask\.feature_extractor\.mask_fcn(\d)\."),
     lambda m: f"mask_head.fcn{m.group(1)}."),
    (re.compile(r"^(?:module\.)?roi_heads\.mask\.predictor\.conv5_mask\."),
     "mask_head.deconv."),
    (re.compile(r"^(?:module\.)?roi_heads\.mask\.predictor\.mask_fcn_logits\."),
     "mask_head.mask_logits."),
]


def remap_disprcnn2d_names(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename reference DispRCNN (2D) torch keys to this framework's module
    paths (dots become the flax tree levels)."""
    out = {}
    for k, v in sd.items():
        nk = k
        for pat, repl in _RESNET_MAPS:
            if pat.match(nk):
                nk = pat.sub(repl, nk) if not callable(repl) else pat.sub(repl, nk)
                break
        out[nk] = v
    return out


def to_tree(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def split_params_frozen(tree: dict) -> tuple[dict, dict]:
    """Separate FrozenBatchNorm subtrees (scale/bias/mean/var) into the
    `frozen` collection; everything else stays in `params`."""
    params, frozen = {}, {}

    def walk(node, p_out, f_out):
        for k, v in node.items():
            if isinstance(v, dict):
                keys = set(v.keys())
                if keys and keys <= {"scale", "bias", "mean", "var"} and (
                    "mean" in keys or "var" in keys
                ):
                    f_out[k] = v
                else:
                    p_sub, f_sub = {}, {}
                    walk(v, p_sub, f_sub)
                    if p_sub:
                        p_out[k] = p_sub
                    if f_sub:
                        f_out[k] = f_sub
            else:
                p_out[k] = v

    walk(tree, params, frozen)
    return params, frozen


def import_disprcnn2d(path: str) -> tuple[dict, dict]:
    """Released 2D checkpoint -> (params, frozen) trees in this framework's
    naming. Combine with align_and_update_params for fuzzy remainder."""
    sd = load_torch_state_dict(path)
    sd = convert_state_dict(sd, transpose_conv_names=("conv5_mask",))
    sd = remap_disprcnn2d_names(sd)
    return split_params_frozen(to_tree(sd))


# -- Caffe2 / Detectron pickle import ---------------------------------------
# Reference: utils/c2_model_loading.py:12-175 (maskrcnn-benchmark lineage).
# Detectron pickles store flat numpy blobs named in caffe2 convention
# (res2_0_branch2a_w, res2_0_branch2a_bn_s, conv1_w, fpn_inner_res2_2_sum_w,
# ...); they carry affine BN only (scale s / bias b, no running stats — the
# stats are pre-folded), so FrozenBatchNorm mean/var are synthesized as 0/1.

_C2_STAGE = {"res2": "layer1", "res3": "layer2", "res4": "layer3", "res5": "layer4"}
_C2_BRANCH = {
    "branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
    "branch1": "downsample.0",
}


def rename_c2_resnet_key(k: str):
    """caffe2 blob name -> maskrcnn-benchmark torch name (backbone only).
    Returns None for blobs with no torch counterpart (momentum etc.)."""
    if k.endswith("_momentum") or k.startswith(("fc1000", "pred_")):
        return None
    m = re.match(r"^conv1_(w|b)$", k)
    if m:
        return f"backbone.body.stem.conv1.{'weight' if m.group(1) == 'w' else 'bias'}"
    m = re.match(r"^res_conv1_bn_(s|b)$", k) or re.match(r"^conv1_bn_(s|b)$", k)
    if m:
        return f"backbone.body.stem.bn1.{'weight' if m.group(1) == 's' else 'bias'}"
    m = re.match(r"^(res[2-5])_(\d+)_(branch(?:1|2[abc]))(_bn)?_(w|b|s)$", k)
    if m:
        stage, blk, br, bn, leaf = m.groups()
        torch_mod = _C2_BRANCH[br]
        if bn:
            # branchNx_bn -> bnN / downsample.1
            torch_mod = ("downsample.1" if torch_mod == "downsample.0"
                         else torch_mod.replace("conv", "bn"))
        leaf_name = {"w": "weight", "s": "weight", "b": "bias"}[leaf]
        return f"backbone.body.{_C2_STAGE[stage]}.{blk}.{torch_mod}.{leaf_name}"
    m = re.match(r"^fpn_inner_(res[2-5])_\d+_sum(?:_lateral)?_(w|b)$", k)
    if m:
        lvl = int(m.group(1)[3]) - 1  # res2 -> fpn_inner1
        return f"backbone.fpn.fpn_inner{lvl}.{'weight' if m.group(2) == 'w' else 'bias'}"
    m = re.match(r"^fpn_(res[2-5])_\d+_sum_(w|b)$", k)
    if m:
        lvl = int(m.group(1)[3]) - 1
        return f"backbone.fpn.fpn_layer{lvl}.{'weight' if m.group(2) == 'w' else 'bias'}"
    return None


def load_c2_pickle(path: str) -> Dict[str, np.ndarray]:
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if isinstance(data, dict) and "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items()
            if isinstance(v, np.ndarray) or hasattr(v, "shape")}


def import_c2_backbone(path: str) -> tuple[dict, dict]:
    """Detectron .pkl -> (params, frozen) trees (ResNet-FPN backbone scope).

    BN appears as affine (s, b); running stats are synthesized (mean 0,
    var 1) so the frozen-collection trees are complete."""
    raw = load_c2_pickle(path)
    sd: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        nk = rename_c2_resnet_key(k)
        if nk is not None:
            sd[nk] = v
    # synthesize stats for every BN module seen
    for k in list(sd.keys()):
        if (".bn" in k or "downsample.1" in k) and k.endswith(".weight"):
            base = k.rsplit(".", 1)[0]
            n = sd[k].shape[0]
            sd.setdefault(f"{base}.running_mean", np.zeros((n,), np.float32))
            sd.setdefault(f"{base}.running_var", np.ones((n,), np.float32))
    sd = convert_state_dict(sd)
    sd = remap_disprcnn2d_names(sd)
    return split_params_frozen(to_tree(sd))


# -- released PSMNet (.tar) import ------------------------------------------
# Reference artifact: the standalone-iDispNet checkpoint saved by
# train_idispnet_fa.py (state_dict of modeling/psmnet/stackhourglass.PSMNet,
# optionally "module."-prefixed). Maps every torch Sequential index to this
# framework's explicit flax names (psmnet.py keeps auto-numbering-compatible
# explicit names precisely so this stays mechanical).

_FE_LAYER_OFFSET = {"1": 0, "2": 3, "3": 19, "4": 22}  # BasicBlock_ index base


def remap_psmnet_name(k: str):
    """torch PSMNet state-dict key (module path, leaf stripped) -> flax path,
    or None for buffers with no counterpart (num_batches_tracked)."""
    k = re.sub(r"^(module\.|model\.)", "", k)
    m = re.match(r"^feature_extraction\.firstconv\.([024])\.([01])$", k)
    if m:
        i = int(m.group(1)) // 2
        sub = "Conv_0" if m.group(2) == "0" else "BatchNorm_0"
        return f"feature_extraction.ConvBN_{i}.{sub}"
    m = re.match(r"^feature_extraction\.layer([1-4])\.(\d+)\.(.+)$", k)
    if m:
        blk = _FE_LAYER_OFFSET[m.group(1)] + int(m.group(2))
        rest = m.group(3)
        sub = {
            "conv1.0.0": "ConvBN_0.Conv_0", "conv1.0.1": "ConvBN_0.BatchNorm_0",
            "conv2.0": "ConvBN_1.Conv_0", "conv2.1": "ConvBN_1.BatchNorm_0",
            "downsample.0": "Conv_0", "downsample.1": "BatchNorm_0",
        }.get(rest)
        return None if sub is None else f"feature_extraction.BasicBlock_{blk}.{sub}"
    m = re.match(r"^feature_extraction\.branch([1-4])\.1\.([01])$", k)
    if m:
        sub = "Conv_0" if m.group(2) == "0" else "BatchNorm_0"
        return f"feature_extraction.ConvBN_{int(m.group(1)) + 2}.{sub}"
    m = re.match(r"^feature_extraction\.lastconv\.(0\.[01]|2)$", k)
    if m:
        sub = {"0.0": "ConvBN_7.Conv_0", "0.1": "ConvBN_7.BatchNorm_0",
               "2": "Conv_0"}[m.group(1)]
        return f"feature_extraction.{sub}"
    m = re.match(r"^dres([01])\.([02])\.([01])$", k)
    if m:
        half = 0 if m.group(2) == "0" else 1
        sub = "Conv_0" if m.group(3) == "0" else "BatchNorm_0"
        return f"dres{m.group(1)}_{half}.{sub}"
    m = re.match(r"^dres([234])\.conv([1-4])\.(?:0\.)?([01])$", k)
    if m:
        sub = "Conv_0" if m.group(3) == "0" else "BatchNorm_0"
        return f"dres{m.group(1)}.ConvBN_{int(m.group(2)) - 1}.{sub}"
    m = re.match(r"^dres([234])\.conv([56])\.([01])$", k)
    if m:
        j = int(m.group(2)) - 5
        sub = f"ConvTranspose_{j}" if m.group(3) == "0" else f"BatchNorm_{j}"
        return f"dres{m.group(1)}.{sub}"
    m = re.match(r"^classif([123])\.(0\.[01]|2)$", k)
    if m:
        sub = {"0.0": f"classif{m.group(1)}_0.Conv_0",
               "0.1": f"classif{m.group(1)}_0.BatchNorm_0",
               "2": f"classif{m.group(1)}_1"}[m.group(1 + 1)]
        return sub
    return None


def split_params_stats(tree: dict) -> tuple[dict, dict]:
    """Split flax BatchNorm leaves: {scale, bias} stay in params,
    {mean, var} go to batch_stats (regular, trainable BN — unlike
    split_params_frozen's FrozenBatchNorm collection)."""
    params, stats = {}, {}

    def walk(node, p_out, s_out):
        for k, v in node.items():
            if isinstance(v, dict):
                p_sub, s_sub = {}, {}
                walk(v, p_sub, s_sub)
                if p_sub:
                    p_out[k] = p_sub
                if s_sub:
                    s_out[k] = s_sub
            elif k in ("mean", "var"):
                s_out[k] = v
            else:
                p_out[k] = v

    walk(tree, params, stats)
    return params, stats


def import_psmnet(path_or_sd) -> tuple[dict, dict]:
    """Released PSMNet checkpoint (path or torch state-dict-like mapping of
    numpy arrays) -> (params, batch_stats) variable trees for
    models.psmnet.PSMNet. ConvTranspose3d kernels get the spatial flip +
    layout transpose (see convert_tensor)."""
    sd = (load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    out = {}
    for k, arr in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        base, leaf_t = k.rsplit(".", 1)
        nk = remap_psmnet_name(base)
        if nk is None:
            continue
        is_tc = "ConvTranspose" in nk
        leaf, conv = convert_tensor(f"x.{leaf_t}", np.asarray(arr),
                                    transpose_conv=is_tc)
        out[f"{nk}.{leaf}"] = conv
    return split_params_stats(to_tree(out))


# -- released PointRCNN (.pth) import ---------------------------------------
# Reference artifact: models/kitti/<cls>/<base>/rcnn/pointrcnn.pth —
# torch.load(...)['model'] with DDP 'module.' prefixes, loaded into
# lib/net/point_rcnn.PointRCNN (disprcnn3d.py:35-42). Torch module paths:
#   rpn.backbone_net.SA_modules.{k}.mlps.{i}.layer{j}.{conv|bn.bn}
#   rpn.backbone_net.FP_modules.{k}.mlp.layer{j}.{conv|bn.bn}
#   rpn.rpn_cls_layer.{s}.{conv|bn.bn}   (Dropout inserted at index 1)
#   rcnn_net.{xyz_up_layer|merge_down_layer}.layer{j}.{conv|bn.bn}
#   rcnn_net.SA_modules.{k}.mlps.0.layer{j}.{conv|bn.bn}
#   rcnn_net.{cls|reg}_layer.{s}.{conv|bn.bn}
# All convs are 1x1 Conv1d/Conv2d (pt_utils) == our nn.Dense; BN wrappers
# nest twice ('bn.bn', pytorch_utils.py:83,108).


def _head_idx(s: int, n_fc: int) -> str:
    """pt_utils head Sequential index -> fc{i}/out (Dropout at torch idx 1)."""
    if s == 0:
        return "fc0"
    i = s - 1  # positions after the inserted Dropout shift by one
    return f"fc{i}" if i < n_fc else "out"


def remap_pointrcnn_name(k: str, n_cls_fc: int = 1, n_reg_fc: int = 1):
    """torch PointRCNN key (module path, leaf stripped) -> flax path or None."""
    k = re.sub(r"^(module\.|pcnet\.)*", "", k)
    m = re.match(r"^rpn\.backbone_net\.SA_modules\.(\d+)\.mlps\.(\d+)\.layer(\d+)\.(conv|bn\.bn)$", k)
    if m:
        sub = f"mlp{m.group(3)}" if m.group(4) == "conv" else f"bn{m.group(3)}"
        return f"rpn.backbone.sa{m.group(1)}.mlp_scale{m.group(2)}.{sub}"
    m = re.match(r"^rpn\.backbone_net\.FP_modules\.(\d+)\.mlp\.layer(\d+)\.(conv|bn\.bn)$", k)
    if m:
        sub = f"mlp{m.group(2)}" if m.group(3) == "conv" else f"bn{m.group(2)}"
        return f"rpn.backbone.fp{m.group(1)}.mlp.{sub}"
    m = re.match(r"^rpn\.rpn_(cls|reg)_layer\.(\d+)\.(conv|bn\.bn)$", k)
    if m:
        head, s, kind = m.group(1), int(m.group(2)), m.group(3)
        n = n_cls_fc if head == "cls" else n_reg_fc
        slot = _head_idx(s, n)
        sub = slot if kind == "conv" else slot.replace("fc", "bn")
        return f"rpn.{head}_head.{sub}"
    m = re.match(r"^rcnn_net\.(xyz_up|merge_down)_layer\.layer(\d+)\.(conv|bn\.bn)$", k)
    if m:
        sub = f"mlp{m.group(2)}" if m.group(3) == "conv" else f"bn{m.group(2)}"
        return f"rcnn.{m.group(1)}.{sub}"
    m = re.match(r"^rcnn_net\.SA_modules\.(\d+)\.mlps\.0\.layer(\d+)\.(conv|bn\.bn)$", k)
    if m:
        sub = f"mlp{m.group(2)}" if m.group(3) == "conv" else f"bn{m.group(2)}"
        return f"rcnn.sa{m.group(1)}.mlp.{sub}"
    m = re.match(r"^rcnn_net\.(cls|reg)_layer\.(\d+)\.(conv|bn\.bn)$", k)
    if m:
        head, s, kind = m.group(1), int(m.group(2)), m.group(3)
        n = n_cls_fc if head == "cls" else n_reg_fc
        slot = _head_idx(s, n)
        # RCNNNet heads are flat Dense layers named {head}_fc{i}/{head}_out
        name = f"{head}_{slot}" if kind == "conv" else f"{head}_{slot.replace('fc', 'bn')}"
        return f"rcnn.{name}"
    return None


def import_pointrcnn(path_or_sd, n_cls_fc: int = 1, n_reg_fc: int = 1,
                     rcnn_n_cls_fc: int = 2, rcnn_n_reg_fc: int = 2):
    """Released pointrcnn.pth -> (params, batch_stats) trees for
    models.pointrcnn.PointRCNN ({'rpn': ..., 'rcnn': ...} scopes)."""
    sd = (load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    out = {}
    for k, arr in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        base, leaf_t = k.rsplit(".", 1)
        ncf, nrf = ((rcnn_n_cls_fc, rcnn_n_reg_fc) if "rcnn_net." in k
                    else (n_cls_fc, n_reg_fc))
        nk = remap_pointrcnn_name(base, ncf, nrf)
        if nk is None:
            continue
        arr = np.asarray(arr)
        if leaf_t == "weight" and arr.ndim in (3, 4):
            # 1x1 Conv1d/Conv2d -> Dense kernel (I, O)
            out[f"{nk}.kernel"] = arr.reshape(arr.shape[0], arr.shape[1]).T
        else:
            leaf, conv = convert_tensor(f"x.{leaf_t}", arr)
            out[f"{nk}.{leaf}"] = conv
    return split_params_stats(to_tree(out))


def import_disprcnn3d(path_or_sd) -> tuple[dict, dict]:
    """Full DispRCNN3D stage checkpoint (dispnet.* + pcnet.* scopes, DDP
    'module.' prefixes already stripped by load_torch_state_dict) ->
    (params, batch_stats) trees matching models.detector.DispRCNN3D
    ({'idispnet': PSMNet, 'pointrcnn': PointRCNN})."""
    sd = (load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    psm_sd = {k[len("dispnet."):]: v for k, v in sd.items()
              if k.startswith("dispnet.")}
    pr_sd = {k[len("pcnet."):]: v for k, v in sd.items()
             if k.startswith("pcnet.")}
    psm_p, psm_s = import_psmnet(psm_sd)
    pr_p, pr_s = import_pointrcnn(pr_sd)
    params = {}
    stats = {}
    if psm_p:
        params["idispnet"] = psm_p
    if psm_s:
        stats["idispnet"] = psm_s
    if pr_p:
        params["pointrcnn"] = pr_p
    if pr_s:
        stats["pointrcnn"] = pr_s
    return params, stats
