"""Torch checkpoint → flax parameter conversion.

Re-provides the reference's pretrained-weight loading capability
(``src/feature_extraction/efficientnet.py:42-59`` loads
``efficientnet-b4-6ed6700e.pth``; ``scripts/evaluate.py:53-57`` loads full
trained model checkpoints) for the JAX stack: converts

1. an efficientnet-pytorch ImageNet state dict (``_conv_stem`` /
   ``_blocks.N._*`` / ``_conv_head`` / ``_fc`` layout) into
   ``EfficientNetBackbone`` params + batch stats, and
2. a full reference ``DeepfakeDetectionModel`` state dict
   (feature_extractor.backbone.backbone.* + attention.* + classifier.*)
   into ``DeepfakeDetectionModel`` variables,

with the layout transposes TPU needs: OIHW conv kernels → HWIO, depthwise
(C,1,kh,kw) → (kh,kw,1,C), linear (out,in) → (in,out).

Tensors are accepted as numpy arrays or torch tensors; torch is only
imported to read ``.pth`` files (CPU wheel is available in this image).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .efficientnet import block_args


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module load
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv(w) -> np.ndarray:
    """OIHW → HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def _depthwise(w) -> np.ndarray:
    """(C, 1, kh, kw) → (kh, kw, 1, C)."""
    return _np(w).transpose(2, 3, 1, 0)


def _linear(w) -> np.ndarray:
    """(out, in) → (in, out)."""
    return _np(w).transpose(1, 0)


def _bn(sd: Dict[str, Any], prefix: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_efficientnet_backbone(
    state_dict: Dict[str, Any], variant: str = "b4", prefix: str = ""
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """efficientnet-pytorch state dict → (params, batch_stats) trees for
    ``EfficientNetBackbone``. ``prefix`` strips a leading module path (e.g.
    ``feature_extractor.backbone.backbone.``)."""
    if prefix:
        state_dict = {
            k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)
        }

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem_conv"] = {"kernel": _conv(state_dict["_conv_stem.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn(state_dict, "_bn0")

    blocks = block_args(variant)
    for i, args in enumerate(blocks):
        src = f"_blocks.{i}"
        blk: Dict[str, Any] = {}
        blk_stats: Dict[str, Any] = {}
        if args["expand_ratio"] != 1:
            blk["expand_conv"] = {"kernel": _conv(state_dict[f"{src}._expand_conv.weight"])}
            blk["bn0"], blk_stats["bn0"] = _bn(state_dict, f"{src}._bn0")
        blk["depthwise_conv"] = {"kernel": _depthwise(state_dict[f"{src}._depthwise_conv.weight"])}
        blk["bn1"], blk_stats["bn1"] = _bn(state_dict, f"{src}._bn1")
        if args["se_ratio"] > 0:
            blk["se_reduce"] = {
                "kernel": _conv(state_dict[f"{src}._se_reduce.weight"]),
                "bias": _np(state_dict[f"{src}._se_reduce.bias"]),
            }
            blk["se_expand"] = {
                "kernel": _conv(state_dict[f"{src}._se_expand.weight"]),
                "bias": _np(state_dict[f"{src}._se_expand.bias"]),
            }
        blk["project_conv"] = {"kernel": _conv(state_dict[f"{src}._project_conv.weight"])}
        blk["bn2"], blk_stats["bn2"] = _bn(state_dict, f"{src}._bn2")
        params[f"block_{i}"] = blk
        stats[f"block_{i}"] = blk_stats

    params["head_conv"] = {"kernel": _conv(state_dict["_conv_head.weight"])}
    params["head_bn"], stats["head_bn"] = _bn(state_dict, "_bn1")
    return params, stats


def convert_detection_model(
    state_dict: Dict[str, Any],
    variant: str = "b4",
    hidden_dims=(512, 128, 32),
) -> Dict[str, Any]:
    """Full reference DeepfakeDetectionModel state dict → flax variables.

    Reference module layout (``feature_extractor.py:184-238``,
    ``landmark_attention.py``): backbone at
    ``feature_extractor.backbone.backbone.*``; hybrid attention at
    ``feature_extractor.attention.{landmark_attn,channel_attn,spatial_attn}``;
    head as a Sequential of [Linear, BN1d, ReLU, Dropout]×N + final Linear
    at ``classifier.*``.
    """
    bb_params, bb_stats = convert_efficientnet_backbone(
        state_dict, variant, prefix="feature_extractor.backbone.backbone."
    )

    fe_params: Dict[str, Any] = {"backbone": bb_params}
    fe_stats: Dict[str, Any] = {"backbone": bb_stats}

    attn_params: Dict[str, Any] = {}
    lm_key = "feature_extractor.attention.landmark_attn.attention_weights"
    if lm_key in state_dict:
        attn_params["landmark_attn"] = {"attention_weights": _np(state_dict[lm_key])}
    ch_w0 = "feature_extractor.attention.channel_attn.fc.0.weight"
    if ch_w0 in state_dict:
        attn_params["channel_attn"] = {
            "fc1": {"kernel": _linear(state_dict[ch_w0])},
            "fc2": {"kernel": _linear(state_dict["feature_extractor.attention.channel_attn.fc.2.weight"])},
        }
    sp_w = "feature_extractor.attention.spatial_attn.conv.weight"
    if sp_w in state_dict:
        attn_params["spatial_attn"] = {"conv": {"kernel": _conv(state_dict[sp_w])}}
    if attn_params:
        fe_params["attention"] = attn_params

    params: Dict[str, Any] = {"feature_extractor": fe_params}
    batch_stats: Dict[str, Any] = {"feature_extractor": fe_stats}

    # Head Sequential indices: per hidden dim i → Linear at 4i, BN at 4i+1;
    # final Linear at 4·len(hidden_dims).
    for i, _ in enumerate(hidden_dims):
        lin = f"classifier.{4 * i}"
        bn = f"classifier.{4 * i + 1}"
        params[f"head_{i}"] = {
            "dense": {
                "kernel": _linear(state_dict[f"{lin}.weight"]),
                "bias": _np(state_dict[f"{lin}.bias"]),
            },
            "bn": {"scale": _np(state_dict[f"{bn}.weight"]), "bias": _np(state_dict[f"{bn}.bias"])},
        }
        batch_stats[f"head_{i}"] = {
            "bn": {
                "mean": _np(state_dict[f"{bn}.running_mean"]),
                "var": _np(state_dict[f"{bn}.running_var"]),
            }
        }
    final = f"classifier.{4 * len(hidden_dims)}"
    params["final"] = {
        "kernel": _linear(state_dict[f"{final}.weight"]),
        "bias": _np(state_dict[f"{final}.bias"]),
    }

    return {"params": params, "batch_stats": batch_stats}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Read a .pth file into a {name: numpy} dict (handles nested
    checkpoints with 'model_state_dict' / 'state_dict' wrappers)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: _np(v) for k, v in obj.items()}


def assert_tree_shapes_match(converted: Dict[str, Any], initialized: Dict[str, Any], path="") -> None:
    """Raise with the offending path if converted/initialized trees differ."""
    if isinstance(initialized, dict):
        missing = set(initialized) - set(converted)
        extra = set(converted) - set(initialized)
        if missing or extra:
            raise ValueError(f"tree mismatch at {path}: missing={missing} extra={extra}")
        for k in initialized:
            assert_tree_shapes_match(converted[k], initialized[k], f"{path}/{k}")
    else:
        cs, is_ = np.shape(converted), np.shape(initialized)
        if tuple(cs) != tuple(is_):
            raise ValueError(f"shape mismatch at {path}: {cs} vs {is_}")
