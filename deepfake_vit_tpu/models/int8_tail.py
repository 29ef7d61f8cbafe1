"""Int8 late-stage backbone tail (inference serving path).

The late EfficientNet stages are the compute-bound part of classify
(BASELINE.md: blocks 16-31 ≈ 21% MFU vs ~3% for the bandwidth-bound early
stages); v5e MXUs run s8×s8→s32 at twice the bf16 rate, so the serving
path quantizes the late blocks' 1×1 conv matmuls — expand and project,
where the FLOPs are — to int8 with per-output-channel weight scales and
dynamic per-image activation scales. Depthwise convs, SE, and the head
conv stay bf16 (VPU-bound / tiny). BN is folded into the conv weights at
build time (same fold as models/fused_backbone.py).

This re-provides the reference's deployment-quantization capability
(`src/feature_extraction/efficientnet.py:122-151` runs the backbone under
cuDNN/TensorRT-style inference) in TPU-native form; accuracy is gated by
the max-abs-prob-delta parity test in tests/test_int8_tail.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.fused_mbconv import fold_bn
from .efficientnet import _B0_STAGES, VARIANT_PARAMS, block_args, round_repeats


def default_tail_start(variant: str) -> int:
    """First block of stage 4 (the second 14² stage) — blocks 16-31 for b4."""
    _, depth, _, _ = VARIANT_PARAMS[variant]
    return sum(round_repeats(r, depth) for r, *_ in _B0_STAGES[:4])


def _quant_w(w: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of a (Cin, Cout) matrix."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


def _int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
                 bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(B, H, W, Cin) × (Cin, Cout) with dynamic per-image activation scales.

    s8×s8→s32 on the MXU; dequantized f32 output (caller applies the
    activation and casts back to bf16).
    """
    sx = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True) / 127.0,
        1e-8,
    )
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias
    return y


class Int8TailRunner:
    """Callable: block-``start`` input activations → final block output maps.

    Construct once per (params, batch_stats) of the backbone; BNs are folded
    and weights quantized at build time — inference only (training uses the
    flax path). Finish the network with
    ``model.apply(..., backbone_start_block=n_blocks)`` so the head conv +
    attention + classifier run unquantized.
    """

    def __init__(
        self,
        variant: str,
        params: Dict[str, Any],
        batch_stats: Dict[str, Any],
        start_block: Optional[int] = None,
    ):
        self.variant = variant
        args_all = block_args(variant)
        self.start = default_tail_start(variant) if start_block is None else start_block
        self.n_blocks = len(args_all)
        self.blocks: List[Dict[str, Any]] = []
        for i in range(self.start, self.n_blocks):
            p, st = params[f"block_{i}"], batch_stats[f"block_{i}"]
            a = args_all[i]
            entry: Dict[str, Any] = {"args": a}
            if a["expand_ratio"] != 1:
                k, b = fold_bn(p["expand_conv"]["kernel"][0, 0], p["bn0"], st["bn0"])
                entry["exp"] = (*_quant_w(k), b.astype(jnp.float32))
            kdw, bdw = fold_bn(p["depthwise_conv"]["kernel"], p["bn1"], st["bn1"])
            entry["dw"] = (kdw.astype(jnp.bfloat16), bdw.astype(jnp.float32))
            entry["se"] = (
                p["se_reduce"]["kernel"][0, 0].astype(jnp.bfloat16),
                p["se_reduce"]["bias"].astype(jnp.float32),
                p["se_expand"]["kernel"][0, 0].astype(jnp.bfloat16),
                p["se_expand"]["bias"].astype(jnp.float32),
            )
            kp, bp = fold_bn(p["project_conv"]["kernel"][0, 0], p["bn2"], st["bn2"])
            entry["proj"] = (*_quant_w(kp), bp.astype(jnp.float32))
            self.blocks.append(entry)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) bf16 input activations of flat block ``start``."""
        x = x.astype(jnp.bfloat16)
        for e in self.blocks:
            a = e["args"]
            inputs = x
            if "exp" in e:
                x = jax.nn.silu(_int8_matmul(x, *e["exp"])).astype(jnp.bfloat16)
            kdw, bdw = e["dw"]
            x = jax.lax.conv_general_dilated(
                x, kdw, (a["stride"], a["stride"]), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=kdw.shape[-1],
            )
            x = jax.nn.silu(x.astype(jnp.float32) + bdw).astype(jnp.bfloat16)
            w1, b1, w2, b2 = e["se"]
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = jax.nn.silu(
                jax.lax.dot_general(se, w1, (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) + b1
            ).astype(jnp.bfloat16)
            se = jax.lax.dot_general(se, w2, (((3,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) + b2
            x = x * jax.nn.sigmoid(se).astype(jnp.bfloat16)
            y = _int8_matmul(x, *e["proj"])
            if a["stride"] == 1 and a["in_filters"] == a["out_filters"]:
                y = y + inputs.astype(jnp.float32)
            x = y.astype(jnp.bfloat16)
        return x
