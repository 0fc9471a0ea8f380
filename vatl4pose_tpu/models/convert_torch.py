"""Torch checkpoint → Flax variables converter.

Imports the reference's pretrained `.pth` state_dicts (SimplePose / FastPose /
PoseHighResolutionNet / WholeBodyAE — simplepose.py:12-91, fastpose.py:14-73,
hrnet.py:270-494, AutoEncoder.py:5-39) into this build's Flax param/
batch_stats trees.  Pure tensor-layout translation:

  conv weight   OIHW -> HWIO
  deconv weight IOHW -> HWIO (stored as a regular conv kernel; the
                 TorchConvTranspose module flips it at call time)
  linear weight (out,in) -> (in,out)
  batchnorm     weight/bias -> scale/bias; running_{mean,var} -> batch_stats
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

import jax

__all__ = ["convert_state_dict", "load_torch_checkpoint",
           "export_state_dict", "save_torch_checkpoint"]


def load_torch_checkpoint(path: str):
    """Load a .pth state_dict as {name: np.ndarray} (torch CPU)."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def export_state_dict(variables, arch: str):
    """Inverse of convert_state_dict: Flax variables → torch-layout
    state_dict ({name: np.ndarray}), so weights trained here load into the
    reference's models for A/B runs.  Implemented by inverting the forward
    mapping: enumerate every torch key the architecture produces via the
    path functions and pull the matching leaf."""
    params = variables.get("params", variables)
    batch_stats = variables.get("batch_stats", {})
    out = {}
    # reconstruct torch module names from the flax structure with
    # arch-specific inverse rules
    inv = _INVERSE_PATHS[arch]
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [k.key for k in keypath]
        torch_mod = inv(names[:-1])
        leaf_name = names[-1]
        arr = np.asarray(leaf)
        if leaf_name == "kernel":
            if arr.ndim == 4:
                if names[-2] in _DECONV_MODULES:
                    out[torch_mod + ".weight"] = arr.transpose(2, 3, 0, 1)
                else:
                    out[torch_mod + ".weight"] = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2:
                out[torch_mod + ".weight"] = arr.transpose(1, 0)
            else:
                out[torch_mod + ".weight"] = arr
        elif leaf_name == "scale":
            out[torch_mod + ".weight"] = arr
        elif leaf_name == "bias":
            out[torch_mod + ".bias"] = arr
        else:
            out[torch_mod + "." + leaf_name] = arr
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(
            batch_stats)[0]:
        names = [k.key for k in keypath]
        torch_mod = inv(names[:-1])
        leaf_name = {"mean": "running_mean", "var": "running_var"}[names[-1]]
        out[torch_mod + "." + leaf_name] = np.asarray(leaf)
    return out


def save_torch_checkpoint(path: str, variables, arch: str):
    import torch
    sd = {k: torch.tensor(v) for k, v in
          export_state_dict(variables, arch).items()}
    # strict load_state_dict (ActiveLearning.py:217) also expects the BN
    # step counters; zeros are correct for a fresh/converted checkpoint
    for k in list(sd):
        if k.endswith(".running_mean"):
            sd[k[: -len("running_mean")] + "num_batches_tracked"] = \
                torch.tensor(0, dtype=torch.int64)
    torch.save(sd, path)
    return path


def _inv_resnet_block(name: str) -> List[str]:
    if name == "downsample_conv":
        return ["downsample", "0"]
    if name == "downsample_bn":
        return ["downsample", "1"]
    return [name]


def _inv_simplepose(names: List[str]) -> str:
    t = []
    i = 0
    if names[0] == "preact":
        t.append("preact")
        rest = names[1:]
        m = re.fullmatch(r"layer(\d+)_(\d+)", rest[0])
        if m:
            t += [f"layer{m.group(1)}", m.group(2)]
            for r in rest[1:]:
                if r == "se":
                    t.append("se")
                elif r in ("fc1", "fc2"):
                    t += ["fc", "0" if r == "fc1" else "2"]
                else:
                    t += _inv_resnet_block(r)
        else:
            t += rest
        return ".".join(t)
    name = names[0]
    deconv = {"deconv1": "0", "bn_d1": "1", "deconv2": "3", "bn_d2": "4",
              "deconv3": "6", "bn_d3": "7"}
    if name in deconv:
        return f"deconv_layers.{deconv[name]}"
    return ".".join(names)


def _inv_wholebody_ae(names: List[str]) -> str:
    name = names[0]
    side = "encoder" if name.startswith("enc") else "decoder"
    return f"{side}.{int(name[3:]) * 2}"


def _inv_fastpose(names: List[str]) -> str:
    if names[0] == "preact":
        return _inv_simplepose(names)
    if names[0] in ("duc1", "duc2"):
        return f"{names[0]}.{names[1]}"
    return ".".join(names)  # conv_out


_INVERSE_PATHS = {
    "SimplePose": _inv_simplepose,
    "FastPose": _inv_fastpose,
    "WholeBodyAE": _inv_wholebody_ae,
}


def _resnet_block_path(tokens: List[str]) -> List[str]:
    """Map a torch residual-block-relative path to flax module names."""
    if tokens[0] == "downsample":
        return ["downsample_conv" if tokens[1] == "0" else "downsample_bn"]
    if tokens[0] == "se":
        # SELayer fc = Sequential(Linear, ReLU, Linear, Sigmoid)
        return ["se", "fc1" if tokens[2] == "0" else "fc2"]
    return [tokens[0]]


def _resnet_path(tokens: List[str]) -> List[str]:
    m = re.fullmatch(r"layer(\d+)", tokens[0])
    if m:
        return [f"layer{m.group(1)}_{tokens[1]}"] + _resnet_block_path(tokens[2:])
    return [tokens[0]]  # conv1 / bn1


def _simplepose_path(tokens: List[str]) -> List[str]:
    if tokens[0] == "preact":
        return ["preact"] + _resnet_path(tokens[1:])
    if tokens[0] == "deconv_layers":
        idx = {"0": "deconv1", "1": "bn_d1", "3": "deconv2", "4": "bn_d2",
               "6": "deconv3", "7": "bn_d3"}[tokens[1]]
        return [idx]
    return [tokens[0]]  # final_layer


def _fastpose_path(tokens: List[str]) -> List[str]:
    if tokens[0] == "preact":
        return ["preact"] + _resnet_path(tokens[1:])
    if tokens[0] in ("duc1", "duc2"):
        return [tokens[0], tokens[1]]  # conv / bn
    return [tokens[0]]  # conv_out


def _hrnet_path(tokens: List[str]) -> List[str]:
    t0 = tokens[0]
    if t0 == "conv1":
        return ["stem1", "conv"]
    if t0 == "bn1":
        return ["stem1", "bn"]
    if t0 == "conv2":
        return ["stem2", "conv"]
    if t0 == "bn2":
        return ["stem2", "bn"]
    if t0 == "layer1":
        return [f"layer1_{tokens[1]}"] + _resnet_block_path(tokens[2:])
    m = re.fullmatch(r"transition(\d)", t0)
    if m:
        cb = {"0": "conv", "1": "bn"}
        if len(tokens) == 3:      # transitionT.i.{0|1}
            return [f"transition{m.group(1)}_{tokens[1]}", cb[tokens[2]]]
        # transitionT.i.j.{0|1}
        return [f"transition{m.group(1)}_{tokens[1]}_{tokens[2]}", cb[tokens[3]]]
    m = re.fullmatch(r"stage(\d)", t0)
    if m:
        mod = f"stage{m.group(1)}_{tokens[1]}"
        if tokens[2] == "branches":
            return [mod, f"branch{tokens[3]}_{tokens[4]}"] + \
                _resnet_block_path(tokens[5:])
        # fuse_layers.i.j[.k].{0|1}
        cb = {"0": "conv", "1": "bn"}
        i, j = tokens[3], tokens[4]
        if len(tokens) == 6:      # fuse_layers.i.j.{0|1}
            return [mod, f"fuse{i}_{j}", cb[tokens[5]]]
        return [mod, f"fuse{i}_{j}_{tokens[5]}", cb[tokens[6]]]
    return [t0]  # final_layer


def _wholebody_ae_path(tokens: List[str]) -> List[str]:
    idx = int(tokens[1]) // 2
    return [("enc" if tokens[0] == "encoder" else "dec") + str(idx)]


_ARCH_PATHS = {
    "SimplePose": _simplepose_path,
    "FastPose": _fastpose_path,
    "PoseHighResolutionNet": _hrnet_path,
    "WholeBodyAE": _wholebody_ae_path,
}

_DECONV_MODULES = {"deconv1", "deconv2", "deconv3"}


def convert_state_dict(state: Dict[str, np.ndarray], arch: str):
    """Convert a torch state_dict to {'params': ..., 'batch_stats': ...}."""
    path_fn = _ARCH_PATHS[arch]
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, val in state.items():
        tokens = key.split(".")
        suffix = tokens[-1]
        if suffix == "num_batches_tracked":
            continue
        path = path_fn(tokens[:-1])
        val = np.asarray(val)
        is_bn = val.ndim == 1 and any(
            p.startswith("bn") or p.endswith("bn") or p == "downsample_bn"
            for p in path[-1:])
        if suffix == "running_mean":
            put(batch_stats, path, "mean", val)
        elif suffix == "running_var":
            put(batch_stats, path, "var", val)
        elif suffix == "weight":
            if val.ndim == 4:
                if path[-1] in _DECONV_MODULES:
                    put(params, path, "kernel", val.transpose(2, 3, 0, 1))
                else:
                    put(params, path, "kernel", val.transpose(2, 3, 1, 0))
            elif val.ndim == 2:
                put(params, path, "kernel", val.transpose(1, 0))
            elif is_bn:
                put(params, path, "scale", val)
            else:
                put(params, path, "kernel", val)
        elif suffix == "bias":
            put(params, path, "bias", val)
        else:
            raise ValueError(f"unhandled checkpoint entry: {key}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
