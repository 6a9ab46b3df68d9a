"""Torch/detectron2 checkpoint import shim.

Rebuild of the reference's checkpoint-conversion machinery
(`efg/utils/checkpoint.py:58-157`, `d2_model_loading.py`,
`catalog.py`): loads a `.pth`/`.pkl` state dict (torch CPU or pickled
numpy), strips DDP prefixes, and converts conv/linear/BN tensors into the
flax NHWC parameter convention:

  torch Conv2d [O, I, kh, kw]  → flax [kh, kw, I, O]
  torch Linear [O, I]          → flax [I, O]
  torch BN weight/bias/mean/var → scale/bias + batch_stats mean/var

Used both for importing reference-pretrained backbones (parity testing)
and ImageNet weights.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth (CPU) or detectron2 .pkl into numpy arrays."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items() if isinstance(v, np.ndarray)}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().numpy()
    return out


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str = "module.") -> Dict[str, np.ndarray]:
    """Strip DDP 'module.' prefixes (reference `checkpoint.py:97-106`)."""
    if all(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()}
    return sd


def convert_tensor(name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map one torch tensor to the flax layout. Returns (kind, array) where
    kind ∈ {kernel, bias, scale, mean, var}."""
    if name.endswith(".weight"):
        if value.ndim == 4:  # conv OIHW → HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear OI → IO
            return "kernel", value.T
        if value.ndim == 1:  # norm scale
            return "scale", value
    if name.endswith(".bias"):
        return "bias", value
    if name.endswith(".running_mean"):
        return "mean", value
    if name.endswith(".running_var"):
        return "var", value
    return "raw", value


def assign_into_tree(tree: Dict[str, Any], path: str, value: np.ndarray) -> bool:
    """Place `value` at slash/dot path into a nested param dict if the leaf
    exists with a matching shape (shape-mismatch skip, reference
    `checkpoint.py:122-139`). Returns True when assigned."""
    parts = path.replace("/", ".").split(".")
    cur = tree
    for p in parts[:-1]:
        if not isinstance(cur, dict) or p not in cur:
            return False
        cur = cur[p]
    leaf = parts[-1]
    if not isinstance(cur, dict) or leaf not in cur:
        return False
    if tuple(np.shape(cur[leaf])) != tuple(value.shape):
        return False
    cur[leaf] = value.astype(np.asarray(cur[leaf]).dtype)
    return True


# ---------------------------------------------------------------------------
# torchvision / d2 ResNet name mapping (reference `d2_model_loading.py:11` —
# 289 LoC of detectron2 name conversion; here the target is the flax ResNet
# in `modeling/backbones/resnet.py`)
# ---------------------------------------------------------------------------

def _resnet_rename(key: str) -> str:
    """torchvision resnet key → flax ResNet tree path (without leaf kind).

    conv1/bn1 → stem; layer{i}.{b} → res{i+1}_block{b}; conv{j}/bn{j} →
    conv{j}/norm{j}; downsample.0/.1 → shortcut/shortcut_norm.
    """
    if key.startswith("backbone."):
        key = key[len("backbone."):]
    if key.startswith("conv1."):
        return "stem_conv1"
    if key.startswith("bn1."):
        return "stem_norm"
    if key.startswith("layer"):
        parts = key.split(".")
        stage = int(parts[0][len("layer"):]) + 1
        block = parts[1]
        rest = parts[2]
        base = f"res{stage}_block{block}"
        if rest.startswith("conv"):
            return f"{base}.conv{rest[4:]}"
        if rest.startswith("bn"):
            return f"{base}.norm{rest[2:]}"
        if rest == "downsample":
            which = parts[3]
            return f"{base}.shortcut" if which == "0" else f"{base}.shortcut_norm"
    return ""


def import_torchvision_resnet(
    sd: Dict[str, np.ndarray], variables: Dict[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], int, list]:
    """Load a torchvision-style ResNet state dict into flax ResNet
    variables (params + batch_stats), converting layouts.

    `prefix` locates the ResNet inside a larger param tree (e.g.
    "backbone"). Returns (new_variables, n_assigned, skipped_keys).
    """
    import copy

    variables = copy.deepcopy(
        {k: jax_tree_to_numpy(v) for k, v in variables.items()}
    )
    n, skipped = 0, []
    for key, val in strip_prefix(sd).items():
        if key.startswith("fc."):
            continue
        base = _resnet_rename(key)
        if not base:
            skipped.append(key)
            continue
        kind, arr = convert_tensor(key, val)
        coll = "batch_stats" if kind in ("mean", "var") else "params"
        path = f"{prefix}.{base}.{kind}" if prefix else f"{base}.{kind}"
        if assign_into_tree(variables.get(coll, {}), path, arr):
            n += 1
        else:
            skipped.append(key)
    return variables, n, skipped


def jax_tree_to_numpy(tree):
    """Deep-copy a (possibly frozen) param tree into plain nested dicts of
    numpy arrays so it can be mutated in place."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: jax_tree_to_numpy(v) for k, v in tree.items()}
    return np.asarray(tree)


# ---------------------------------------------------------------------------
# Swin Transformer pretrained import. Reference naming (mmdet-style port,
# `playground/panoptic_seg/coco/mask2former/.../backbone/swin.py:470-645`):
#   patch_embed.proj / patch_embed.norm / absolute_pos_embed /
#   layers.{i}.blocks.{j}.{norm1, attn.{qkv,proj,relative_position_bias_
#   table}, norm2, mlp.{fc1,fc2}} / layers.{i}.downsample.{norm,reduction}
#   / norm{i}
# Our PatchMerging concatenates the 2x2 sub-grids in (00, 01, 10, 11)
# order while the reference uses (00, 10, 01, 11) (`swin.py:293-303`), so
# downsample params permute their 4C input-channel groups.
# ---------------------------------------------------------------------------

def _merge_perm(c4: int) -> np.ndarray:
    c = c4 // 4
    g = np.arange(c)
    return np.concatenate([g, g + 2 * c, g + c, g + 3 * c])


def import_swin(
    sd: Dict[str, np.ndarray], variables: Dict[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], int, list]:
    """Load a reference/mmdet-format Swin state dict into flax
    `modeling.backbones.swin.SwinTransformer` variables. `prefix` locates
    the swin inside a larger tree. Returns (new_variables, n, skipped)."""
    import copy

    variables = copy.deepcopy(
        {k: jax_tree_to_numpy(v) for k, v in variables.items()}
    )

    def rename(key: str, val: np.ndarray):
        """→ (path, array) or None (unmapped) or "drop" (buffers)."""
        parts = key.split(".")
        leaf = parts[-1]
        if leaf in ("relative_position_index", "num_batches_tracked") or \
                parts[-1] == "attn_mask":
            return "drop"
        if key == "absolute_pos_embed":
            if val.ndim == 4:  # mmdet [1, C, H, W] → NHWC
                return "absolute_pos_embed", val.transpose(0, 2, 3, 1)
            if val.ndim == 3:  # official classification [1, N, C]
                n = val.shape[1]
                side = int(round(n ** 0.5))
                return "absolute_pos_embed", val.reshape(1, side, side, -1)
            return None
        if parts[0] == "patch_embed":
            if parts[1] == "proj":
                return (f"patch_embed.{'kernel' if leaf == 'weight' else 'bias'}",
                        val.transpose(2, 3, 1, 0) if leaf == "weight" else val)
            if parts[1] == "norm":
                return f"patch_norm.{'scale' if leaf == 'weight' else 'bias'}", val
            return None
        if parts[0].startswith("norm") and len(parts) == 2:
            i = int(parts[0][4:])
            return f"out_norm{i}.{'scale' if leaf == 'weight' else 'bias'}", val
        if parts[0] == "layers":
            i = int(parts[1])
            if parts[2] == "downsample":
                perm = _merge_perm(val.shape[-1] if leaf == "weight" and val.ndim == 2
                                   else val.shape[0])
                if parts[3] == "norm":
                    return (f"merge{i}.norm.{'scale' if leaf == 'weight' else 'bias'}",
                            val[perm])
                if parts[3] == "reduction":  # [2C, 4C] → [4C, 2C]
                    return f"merge{i}.reduction.kernel", val[:, perm].T
                return None
            if parts[2] == "blocks":
                j = int(parts[3])
                base = f"stage{i}_block{j}"
                rest = parts[4:]
                if rest[0] in ("norm1", "norm2"):
                    return (f"{base}.{rest[0]}.{'scale' if leaf == 'weight' else 'bias'}",
                            val)
                if rest[0] == "attn":
                    if rest[1] == "relative_position_bias_table":
                        return f"{base}.attn.relative_position_bias_table", val
                    if rest[1] in ("qkv", "proj"):
                        return (f"{base}.attn.{rest[1]}.{'kernel' if leaf == 'weight' else 'bias'}",
                                val.T if leaf == "weight" else val)
                    return None
                if rest[0] == "mlp" and rest[1] in ("fc1", "fc2"):
                    return (f"{base}.{rest[1]}.{'kernel' if leaf == 'weight' else 'bias'}",
                            val.T if leaf == "weight" else val)
            return None
        return None

    n, skipped = 0, []
    for key, val in strip_prefix(sd).items():
        r = rename(key, val)
        if r == "drop":
            n += 1
            continue
        if r is None:
            skipped.append(key)
            continue
        path, arr = r
        if prefix:
            path = f"{prefix}.{path}"
        if assign_into_tree(variables.get("params", {}), path, arr):
            n += 1
        else:
            skipped.append(key)
    return variables, n, skipped


# ---------------------------------------------------------------------------
# CenterPoint VoxelNet whole-model name mapping. Reference naming:
#   trunk  `efg/modeling/backbones/sparse_net.py:473-545` (SpMiddleResNetFHD:
#          conv_input / conv1..conv4 SparseSequentials / extra_conv)
#   neck   `efg/modeling/backbones/configurable_rpn.py:13-123` (blocks.{i}
#          Sequential: ZeroPad, Conv, norm, ReLU, then 3 entries per layer;
#          deblocks.{i}: ConvTranspose2d|Conv2d + norm + ReLU)
#   head   playground `center_head.py` (shared_conv Sequential + tasks.{t}
#          SepHead with per-head fc Sequentials: conv, bn, ReLU, ..., final)
# Capability twin of the reference's d2/C2 converter
# (`efg/utils/d2_model_loading.py:11`, `checkpoint.py:58-157`) for the 3D
# family; enables transplanting reference-trained `.pth` checkpoints for
# decode-parity testing and fine-tuning.
# ---------------------------------------------------------------------------

_BN_LEAF = {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}


def _sparse_weight_to_flax(v: np.ndarray, layout: str) -> np.ndarray:
    """spconv weight → flax [K, Cin, Cout] (offsets row-major over
    (kd, kh, kw), matching `ops/sparse.py::_offsets`).

    spconv 2.x stores [Cout, kd, kh, kw, Cin]; spconv 1.x [kd, kh, kw,
    Cin, Cout]."""
    if v.ndim != 5:
        raise ValueError(f"expected 5-dim sparse conv weight, got {v.shape}")
    if layout == "spconv2":
        v = v.transpose(1, 2, 3, 4, 0)
    elif layout != "spconv1":
        raise ValueError(f"sparse_layout={layout!r}: expected spconv1|spconv2")
    return np.ascontiguousarray(v.reshape(-1, v.shape[3], v.shape[4]))


def _deconv_weight_to_flax(v: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [Cin, Cout, kh, kw] → flax ConvTranspose
    [kh, kw, Cin, Cout]. torch's transposed conv is the gradient of a conv
    (kernel spatially flipped relative to `lax.conv_transpose`), so flip
    the spatial dims."""
    return np.ascontiguousarray(v.transpose(2, 3, 0, 1)[::-1, ::-1])


def import_centerpoint_voxelnet(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    *,
    sparse_layout: str = "spconv2",
) -> Tuple[Dict[str, Any], int, list]:
    """Transplant a reference-format CenterPoint VoxelNet state dict
    (reader/backbone/neck/center_head naming, see module-level comment)
    into `efg_tpu.models.centerpoint.VoxelNet` variables.

    Returns (new_variables, n_assigned, skipped_keys)."""
    import copy

    variables = copy.deepcopy(
        {k: jax_tree_to_numpy(v) for k, v in variables.items()}
    )
    sd = strip_prefix(sd)

    # SepHead fc Sequentials: the LAST index per (task, head) is the final
    # conv; hidden convs sit at 3j (bn at 3j+1) — infer num_conv from keys.
    head_max: Dict[Tuple[str, str], int] = {}
    for key in sd:
        parts = key.split(".")
        if len(parts) >= 5 and parts[0] == "center_head" and parts[1] == "tasks":
            t, h, idx = parts[2], parts[3], int(parts[4])
            head_max[(t, h)] = max(head_max.get((t, h), -1), idx)

    def _block_inner(base: str, rest: list) -> Tuple[str, str] | None:
        """SparseBasicBlock member → (flax base path, kind)."""
        name, leaf = rest[0], rest[1]
        if name in ("conv1", "conv2"):
            if leaf == "weight":
                return f"{base}.{name}", "sparse"
            return f"{base}.{name}", "bias_leaf"
        if name == "bn1":
            return f"{base}.bn1.bn", "bn"
        if name == "bn2":
            return f"{base}.bn2", "bn"
        return None

    def rename(key: str) -> Tuple[str, str] | None:
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            return "", "drop"
        if parts[0] == "backbone":
            p = parts[1:]
            if p[0] == "conv_input":
                return (("backbone.conv_input", "sparse") if p[1] == "0"
                        else ("backbone.bn_input.bn", "bn"))
            if p[0] == "extra_conv":
                return (("backbone.extra_conv", "sparse") if p[1] == "0"
                        else ("backbone.bn_extra.bn", "bn"))
            if p[0] == "conv1":  # stage 0: blocks only
                return _block_inner(f"backbone.res0{'ab'[int(p[1])]}", p[2:])
            if p[0] in ("conv2", "conv3", "conv4"):
                s = int(p[0][4:]) - 1  # 1..3
                idx = int(p[1])
                if idx == 0:
                    return f"backbone.down{s}", "sparse"
                if idx == 1:
                    return f"backbone.bn_down{s}.bn", "bn"
                if idx in (3, 4):
                    return _block_inner(f"backbone.res{s}{'ab'[idx - 3]}", p[2:])
            return None
        if parts[0] == "neck":
            p = parts[1:]
            if p[0] == "blocks":
                i, j = int(p[1]), int(p[2])
                if j == 1:
                    return f"neck.block{i}_in.Conv_0", "conv"
                if j == 2:
                    return f"neck.block{i}_in.BatchNorm_0", "bn"
                if j >= 4 and (j - 4) % 3 == 0:
                    return f"neck.block{i}_conv{(j - 4) // 3}.Conv_0", "conv"
                if j >= 5 and (j - 5) % 3 == 0:
                    return f"neck.block{i}_conv{(j - 5) // 3}.BatchNorm_0", "bn"
            if p[0] == "deblocks":
                i, j = int(p[1]), int(p[2])
                if j == 0:
                    # stride>1 → ConvTranspose (deblock{i}_deconv);
                    # stride==1 → plain Conv (deblock{i}_conv)
                    tgt = variables.get("params", {}).get("neck", {})
                    if f"deblock{i}_deconv" in tgt:
                        return f"neck.deblock{i}_deconv", "deconv"
                    return f"neck.deblock{i}_conv", "conv"
                if j == 1:
                    return f"neck.deblock{i}_bn", "bn"
            return None
        if parts[0] == "center_head":
            p = parts[1:]
            if p[0] == "shared_conv":
                return (("head.shared_conv", "conv") if p[1] == "0"
                        else ("head.shared_bn", "bn"))
            if p[0] == "tasks":
                t, h, idx = p[1], p[2], int(p[3])
                last = head_max[(t, h)]
                if idx == last:
                    return f"head.task{t}.{h}_final", "conv"
                if idx % 3 == 0:
                    return f"head.task{t}.{h}_conv{idx // 3}", "conv"
                if idx % 3 == 1:
                    return f"head.task{t}.{h}_bn{idx // 3}", "bn"
        return None

    n, skipped = 0, []
    for key, val in sd.items():
        r = rename(key)
        if r is None:
            skipped.append(key)
            continue
        base, kind = r
        if kind == "drop":
            n += 1
            continue
        leaf = key.split(".")[-1]
        coll, arr, path = "params", val, None
        if kind == "bn":
            sub = _BN_LEAF.get(leaf)
            if sub is None:
                skipped.append(key)
                continue
            coll = "batch_stats" if sub in ("mean", "var") else "params"
            path = f"{base}.{sub}"
        elif kind == "sparse":
            path = f"{base}.kernel"
            arr = _sparse_weight_to_flax(val, sparse_layout)
        elif kind == "bias_leaf":
            path = f"{base}.bias"
        elif kind == "deconv":
            path = f"{base}.kernel"
            arr = _deconv_weight_to_flax(val)
        elif kind == "conv":
            k2, arr = convert_tensor(key, val)
            path = f"{base}.{k2}"
        if path is not None and assign_into_tree(variables.get(coll, {}), path, arr):
            n += 1
        else:
            skipped.append(key)
    return variables, n, skipped
