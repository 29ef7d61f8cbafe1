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
                 bias: Optional[jnp.ndarray],
                 sx: Optional[float] = None) -> jnp.ndarray:
    """(B, H, W, Cin) × (Cin, Cout), s8×s8→s32 on the MXU; dequantized f32
    output (caller applies the activation and casts back to bf16).

    ``sx=None`` → dynamic per-image activation scales (a max-abs
    reduction + standalone quantize pass per call). A float ``sx`` is a
    CALIBRATED static scale (``calibrate_act_scales``): the quantize
    becomes a constant multiply XLA fuses into the producer, and the
    dequant constant folds into the weight scales — the TPU-native
    equivalent of TensorRT-style post-training calibration.
    """
    if sx is None:
        sx = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
            / 127.0,
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
        act_scales: Optional[List[Dict[str, float]]] = None,
    ):
        """``act_scales``: per-tail-block {'exp': s, 'proj': s} static
        activation scales from ``calibrate_act_scales`` (None → dynamic
        per-image scales)."""
        self.variant = variant
        self.act_scales = act_scales
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
        return self._run(x)

    def calibrate(self, x: jnp.ndarray):
        """Run the tail recording per-quant-point max-abs activations.

        Returns (output, records) where records mirrors the
        ``act_scales`` structure with jnp scalars — callers max them over
        calibration batches and divide by 127 to get static scales."""
        records: List[Dict[str, jnp.ndarray]] = []
        out = self._run(x, records)
        return out, records

    def _run(self, x: jnp.ndarray, records: Optional[list] = None) -> jnp.ndarray:
        x = x.astype(jnp.bfloat16)
        for bi, e in enumerate(self.blocks):
            a = e["args"]
            scales = self.act_scales[bi] if self.act_scales is not None else {}
            rec: Dict[str, jnp.ndarray] = {}
            if records is not None:
                records.append(rec)
            inputs = x
            if "exp" in e:
                if records is not None:
                    rec["exp"] = jnp.max(jnp.abs(x.astype(jnp.float32)))
                x = jax.nn.silu(
                    _int8_matmul(x, *e["exp"], sx=scales.get("exp"))
                ).astype(jnp.bfloat16)
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
            if records is not None:
                rec["proj"] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            y = _int8_matmul(x, *e["proj"], sx=scales.get("proj"))
            if a["stride"] == 1 and a["in_filters"] == a["out_filters"]:
                y = y + inputs.astype(jnp.float32)
            x = y.astype(jnp.bfloat16)
        return x


def calibrate_act_scales(
    variant: str,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    face_batches,
    start_block: Optional[int] = None,
    margin: float = 1.0,
) -> List[Dict[str, float]]:
    """Post-training calibration of static activation scales.

    ``face_batches``: iterable of pre-normalized model inputs
    (B, H, W, 3) — the same tensors the backbone sees in serving. Runs
    the early stages + tail once per batch recording max-abs at every
    quantize point; returns per-tail-block {'exp', 'proj'} scale floats
    (max over batches / 127 · margin) for ``Int8TailRunner(act_scales=…)``.
    """
    from .efficientnet import EfficientNetBackbone

    start = default_tail_start(variant) if start_block is None else start_block
    if start < 1:
        raise ValueError("calibration requires start_block >= 1")
    runner = Int8TailRunner(variant, params, batch_stats, start_block=start)
    backbone = EfficientNetBackbone(
        variant=variant, capture_indices=(start - 1,), dtype=jnp.bfloat16
    )

    @jax.jit
    def one(faces):
        _, inter = backbone.apply(
            {"params": params, "batch_stats": batch_stats},
            faces, train=False, return_maps=True, return_intermediate=True,
        )
        _, records = runner.calibrate(inter[start - 1])
        return records

    maxes: Optional[List[Dict[str, float]]] = None
    for faces in face_batches:
        recs = jax.device_get(one(jnp.asarray(faces)))
        if maxes is None:
            maxes = [{k: float(v) for k, v in r.items()} for r in recs]
        else:
            for m, r in zip(maxes, recs):
                for k, v in r.items():
                    m[k] = max(m[k], float(v))
    if maxes is None:
        raise ValueError("no calibration batches provided")
    return [
        {k: max(v / 127.0 * margin, 1e-8) for k, v in m.items()} for m in maxes
    ]
