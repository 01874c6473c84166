"""Torch -> flax weight conversion utilities.

The reference ships pretrained RangeNet++ weights as torch pickles
(load_model.py:6-20). These helpers map torch Conv2d/BatchNorm2d state_dicts
onto the flax RangeSegmentator parameter tree so converted weights can run
on TPU. Conversion is generic over (conv, bn) pairs in declaration order, so
it works for any darknet-style stack with matching shapes.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def torch_conv_to_flax(weight: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(weight), (2, 3, 1, 0))


def extract_conv_bn_pairs(state_dict: Dict[str, "np.ndarray"]):
    """Ordered (conv_weight, bn_params) pairs from a torch state_dict.

    bn_params = dict(scale, bias, mean, var). Assumes the darknet convention
    conv -> bn -> activation with no conv bias."""
    items = [(k, np.asarray(v)) for k, v in state_dict.items()]
    pairs: List[Tuple[np.ndarray, dict]] = []
    i = 0
    while i < len(items):
        k, v = items[i]
        if k.endswith("weight") and v.ndim == 4:
            conv_w = v
            bn = {}
            j = i + 1
            while j < len(items) and len(bn) < 4:
                bk, bv = items[j]
                if bv.ndim == 1 and len(bv) == conv_w.shape[0]:
                    if bk.endswith(".weight"):
                        bn["scale"] = bv
                    elif bk.endswith(".bias"):
                        bn["bias"] = bv
                    elif bk.endswith("running_mean"):
                        bn["mean"] = bv
                    elif bk.endswith("running_var"):
                        bn["var"] = bv
                j += 1
            pairs.append((conv_w, bn))
            i = j if len(bn) == 4 else i + 1
        else:
            i += 1
    return pairs


def _flax_conv_bn_paths(params: dict, prefix=()):
    """Ordered (conv_path, bn_path) leaf-dict pairs from a flax params tree
    (ConvBNLeaky submodules contain Conv_0 + BatchNorm_0)."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            keys = sorted(node.keys(), key=_module_sort_key)
            if "Conv_0" in node and "BatchNorm_0" in node:
                out.append((path + ("Conv_0",), path + ("BatchNorm_0",)))
                return
            for k in keys:
                walk(node[k], path + (k,))

    walk(params, prefix)
    return out


def _module_sort_key(k: str):
    import re

    m = re.match(r"([A-Za-z]+)_(\d+)", k)
    if m:
        return (m.group(1), int(m.group(2)))
    return (k, -1)


def load_torch_weights_into_flax(variables: dict,
                                 state_dict: Dict[str, np.ndarray]) -> dict:
    """Copy torch (conv, bn) pairs into the flax variable tree in order.

    Shapes must match pairwise; raises on mismatch. Returns new variables."""
    import copy

    variables = copy.deepcopy(jax_to_numpy(variables))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    torch_pairs = extract_conv_bn_pairs(state_dict)
    flax_pairs = _flax_conv_bn_paths(params)
    n = min(len(torch_pairs), len(flax_pairs))
    for (conv_w, bn), (conv_path, bn_path) in zip(torch_pairs[:n],
                                                  flax_pairs[:n]):
        conv_leaf = _get(params, conv_path)
        w = torch_conv_to_flax(conv_w)
        if conv_leaf["kernel"].shape != w.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(conv_path)}: "
                f"{conv_leaf['kernel'].shape} vs {w.shape}")
        conv_leaf["kernel"] = w.astype(np.float32)
        bn_leaf = _get(params, bn_path)
        bn_leaf["scale"] = bn["scale"].astype(np.float32)
        bn_leaf["bias"] = bn["bias"].astype(np.float32)
        stats_leaf = _get(batch_stats, bn_path)
        stats_leaf["mean"] = bn["mean"].astype(np.float32)
        stats_leaf["var"] = bn["var"].astype(np.float32)
    return variables, n


def load_head_conv(variables: dict, weight: np.ndarray, bias: np.ndarray,
                   path=("Conv_0",)) -> dict:
    """Load the biased classification-head conv (1x1, no BN — the flax
    RangeSegmentator's top-level Conv_0, segmentation.py:99) from torch
    OIHW weight + bias. Returns new variables."""
    import copy

    variables = copy.deepcopy(jax_to_numpy(variables))
    leaf = _get(variables["params"], path)
    w = torch_conv_to_flax(np.asarray(weight))
    if leaf["kernel"].shape != w.shape:
        raise ValueError(f"head shape mismatch: {leaf['kernel'].shape} "
                         f"vs {w.shape}")
    leaf["kernel"] = w.astype(np.float32)
    leaf["bias"] = np.asarray(bias, np.float32)
    return variables


def load_crf_compat(state_dict: Dict[str, np.ndarray],
                    prefix: str = "CRF.compat_conv"):
    """Extract the *learned* CRF class-compatibility 1x1 conv
    (CRF.py:98-101: nn.Conv2d(nclasses, nclasses, 1), weight initialised to
    (ones - I) * xyz_coef but trained thereafter) as a (compat [C_in, C_out],
    bias [C_out]) pair consumable by segmentation.crf_refine, which applies
    `msg @ compat + bias` — the channel-last equivalent of the torch conv
    `out[c_out] = sum_in W[c_out, c_in] * msg[c_in] + b[c_out]`."""
    w = np.asarray(state_dict[f"{prefix}.weight"])        # [C_out, C_in, 1, 1]
    if w.ndim != 4 or w.shape[2:] != (1, 1):
        raise ValueError(f"{prefix}.weight is not a 1x1 conv: {w.shape}")
    compat = w[:, :, 0, 0].T.astype(np.float32)           # [C_in, C_out]
    b = state_dict.get(f"{prefix}.bias")
    bias = (np.zeros((compat.shape[1],), np.float32) if b is None
            else np.asarray(b, np.float32))
    return compat, bias


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)
