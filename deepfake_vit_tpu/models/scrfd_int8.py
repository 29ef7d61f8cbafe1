"""Int8 SCRFD detector graph (inference serving path).

Unlike the classify backbone — where the FLOPs concentrate in late-stage
1×1 convs (models/int8_tail.py) — SCRFD spends its MACs in 3×3 convs
spread across the whole net (res stages at C=64/128/256, FPN smoothing,
head towers). v5e MXUs run s8×s8→s32 convolutions at twice the bf16
rate, so this module re-emits the detector forward with every wide conv
quantized to int8: per-output-channel symmetric weight scales and static
calibrated per-tensor activation scales (``calibrate_det_act_scales``),
falling back to dynamic per-image scales when uncalibrated.

Deliberately NOT quantized (each is lane- or accuracy-bound, not MXU-bound):
- the stem's first conv (Cin=3 — the MXU pads 3 lanes to a full tile
  either way; bf16 keeps the folded-pool ingest exact),
- the 1×1 FPN lateral convs (≤ 0.5% of the MACs),
- the cls/box/kps output convs (Cout 2/8/20, accuracy-sensitive).

The graph is numerically held to the flax ``ScrfdDetector`` by
tests/test_scrfd_int8.py: decoded best-face box/landmark parity on the
trained weights plus the full detection acceptance bars re-run under int8.

Reference counterpart: the reference serves its detector through an ONNX
runtime session (``src/preprocessing/face_detector.py:195-276``) where
TensorRT-style INT8 post-training calibration is the stock deployment
option; this is that capability rebuilt TPU-native.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.anchors import NUM_ANCHORS, STRIDES
from ..ops.pallas.fused_mbconv import fold_bn
from .scrfd import _upsample2

_BN_EPS = 1e-5  # ScrfdDetector's BatchNorm epsilon (scrfd.py:63)


def _quant_w(k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-8)
    kq = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
    return kq, s.astype(jnp.float32)


class ScrfdInt8Runner:
    """Callable: normalized detection canvas → per-level head outputs.

    Same output contract as ``ScrfdDetector.__call__`` (train=False):
    {stride: {'scores': (B, N_l), 'bbox': (B, N_l, 4), 'kps': (B, N_l, 10)}}.

    Construct per trace from the detector variables (BN folding and weight
    quantization are cheap jnp ops on the traced tree — the same pattern as
    ``Int8TailRunner``). ``stem_pool`` must match the variables: pass the
    tree through ``fold_stem_pool_params`` first, exactly as the bf16
    serving path does (e2e.py::_graph).

    ``act_scales``: {name: float} static activation scales from
    ``calibrate_det_act_scales``; None → dynamic per-image max-abs scales
    (an extra reduction + quantize pass per conv).
    """

    # Mirrors ScrfdDetector's architecture config (scrfd.py:102-107).
    widths = (32, 64, 128, 256)
    blocks_per_stage = (2, 2, 2, 2)
    fpn_width = 64
    head_depth = 2

    def __init__(
        self,
        det_vars: Dict[str, Any],
        stem_pool: int = 1,
        act_scales: Optional[Dict[str, float]] = None,
        dtype: Any = jnp.bfloat16,
    ):
        self.stem_pool = int(stem_pool)
        self.act_scales = act_scales
        self.dtype = dtype
        p, st = det_vars["params"], det_vars["batch_stats"]

        def folded(cp, cs):
            return fold_bn(cp["Conv_0"]["kernel"], cp["BatchNorm_0"],
                           cs["BatchNorm_0"], eps=_BN_EPS)

        # Stem conv 1: bf16, keeps the (possibly pool-folded) ingest exact.
        k, b = folded(p["_ConvBN_0"], st["_ConvBN_0"])
        self.stem1 = (k.astype(dtype), b.astype(jnp.float32))
        # Stem conv 2 onward: int8.
        k, b = folded(p["_ConvBN_1"], st["_ConvBN_1"])
        self.stem2 = (*_quant_w(k), b.astype(jnp.float32))

        self.blocks: List[Dict[str, Any]] = []
        idx = 0
        for n in self.blocks_per_stage[1:]:
            for j in range(n):
                name = f"_ResBlock_{idx}"
                bp, bs = p[name], st[name]
                k1, b1 = fold_bn(bp["_ConvBN_0"]["Conv_0"]["kernel"],
                                 bp["_ConvBN_0"]["BatchNorm_0"],
                                 bs["_ConvBN_0"]["BatchNorm_0"], eps=_BN_EPS)
                k2, b2 = fold_bn(bp["Conv_0"]["kernel"], bp["BatchNorm_0"],
                                 bs["BatchNorm_0"], eps=_BN_EPS)
                entry: Dict[str, Any] = {
                    "stride": 2 if j == 0 else 1,
                    "c1": (*_quant_w(k1), b1.astype(jnp.float32)),
                    "c2": (*_quant_w(k2), b2.astype(jnp.float32)),
                    "last": j == n - 1,
                }
                if "Conv_1" in bp:
                    kd, bd = fold_bn(bp["Conv_1"]["kernel"], bp["BatchNorm_1"],
                                     bs["BatchNorm_1"], eps=_BN_EPS)
                    entry["down"] = (*_quant_w(kd), bd.astype(jnp.float32))
                self.blocks.append(entry)
                idx += 1

        self.lats = {
            lvl: (p[f"lat{lvl}"]["kernel"].astype(dtype),
                  p[f"lat{lvl}"]["bias"].astype(jnp.float32))
            for lvl in (3, 4, 5)
        }
        self.smooth = []
        for i in range(3):
            k, b = folded(p[f"smooth{i}"], st[f"smooth{i}"])
            self.smooth.append((*_quant_w(k), b.astype(jnp.float32)))
        self.towers = []
        for i in range(self.head_depth):
            k, b = folded(p["head"][f"tower{i}"], st["head"][f"tower{i}"])
            self.towers.append((*_quant_w(k), b.astype(jnp.float32)))
        # One fused output conv: cls/box/kps read the same tower output, so
        # their kernels concatenate along Cout (2+8+20 = 30 ≤ one lane tile)
        # — one pass over the feature map instead of three.
        self.head_out = (
            jnp.concatenate(
                [p["head"][n]["kernel"] for n in ("cls", "box", "kps")], axis=-1
            ).astype(dtype),
            jnp.concatenate(
                [p["head"][n]["bias"] for n in ("cls", "box", "kps")]
            ).astype(jnp.float32),
        )

    # ------------------------------------------------------------------
    def _quant_x(self, x: jnp.ndarray, name: str,
                 records: Optional[Dict[str, jnp.ndarray]]):
        xf = x.astype(jnp.float32)
        if records is not None:
            records[name] = jnp.max(jnp.abs(xf))
        sx = None if self.act_scales is None else self.act_scales.get(name)
        if sx is None:
            sx = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0,
                1e-8,
            )
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return xq, sx

    @staticmethod
    def _conv_s8(xq, kq, stride: int, padding="SAME"):
        return jax.lax.conv_general_dilated(
            xq, kq, (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def _int8_conv(self, x, w, stride, name, records, relu=True):
        """Quantize → s8 conv → dequant (+bias); optional ReLU; bf16 out."""
        kq, sw, b = w
        xq, sx = self._quant_x(x, name, records)
        y = self._conv_s8(xq, kq, stride).astype(jnp.float32) * sx * sw + b
        if relu:
            y = jax.nn.relu(y)
        return y.astype(self.dtype)

    def _conv_bf16(self, x, k, b, stride=1, padding="SAME"):
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.astype(jnp.float32) + b

    # ------------------------------------------------------------------
    def __call__(self, images: jnp.ndarray,
                 records: Optional[Dict[str, jnp.ndarray]] = None):
        """images: (B, H·p, W·p, 3), already (x−127.5)/128-normalized."""
        sp = self.stem_pool
        pad = "SAME" if sp == 1 else ((0, sp), (0, sp))
        k, b = self.stem1
        x = jax.lax.conv_general_dilated(
            images.astype(self.dtype), k, (2 * sp, 2 * sp), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x.astype(jnp.float32) + b).astype(self.dtype)
        x = self._int8_conv(x, self.stem2, 2, "stem2", records)

        feats = []
        for i, e in enumerate(self.blocks):
            # conv1 and the downsample shortcut share the block input —
            # one quantize pass serves both convs.
            kq1, sw1, b1 = e["c1"]
            xq, sx = self._quant_x(x, f"b{i}_in", records)
            y = self._conv_s8(xq, kq1, e["stride"]).astype(jnp.float32)
            y = jax.nn.relu(y * sx * sw1 + b1).astype(self.dtype)
            kq2, sw2, b2 = e["c2"]
            yq, sy = self._quant_x(y, f"b{i}_mid", records)
            y = self._conv_s8(yq, kq2, 1).astype(jnp.float32) * sy * sw2 + b2
            if "down" in e:
                kqd, swd, bd = e["down"]
                res = self._conv_s8(xq, kqd, e["stride"]).astype(jnp.float32)
                res = res * sx * swd + bd
            else:
                res = x.astype(jnp.float32)
            x = jax.nn.relu(y + res).astype(self.dtype)
            if e["last"]:
                feats.append(x)
        c3, c4, c5 = feats

        k5, b5 = self.lats[5]
        p5 = self._conv_bf16(c5, k5, b5).astype(self.dtype)
        k4, b4 = self.lats[4]
        p4 = (self._conv_bf16(c4, k4, b4).astype(self.dtype) + _upsample2(p5))
        k3, b3 = self.lats[3]
        p3 = (self._conv_bf16(c3, k3, b3).astype(self.dtype) + _upsample2(p4))

        outputs = {}
        for lvl, (stride, feat, sm) in enumerate(
            zip(STRIDES, (p3, p4, p5), self.smooth)
        ):
            h = self._int8_conv(feat, sm, 1, f"smooth{lvl}", records)
            for t, tw in enumerate(self.towers):
                h = self._int8_conv(h, tw, 1, f"tw{lvl}_{t}", records)
            B = h.shape[0]
            ko, bo = self.head_out
            y = self._conv_bf16(h, ko, bo)
            A = NUM_ANCHORS
            outputs[stride] = {
                "scores": y[..., :A].reshape(B, -1),
                "bbox": y[..., A : 5 * A].reshape(B, -1, 4),
                "kps": y[..., 5 * A :].reshape(B, -1, 10),
            }
        return outputs

    def calibrate(self, images: jnp.ndarray):
        """Forward pass recording max-abs activations at every quant point."""
        records: Dict[str, jnp.ndarray] = {}
        out = self(images, records)
        return out, records


def calibrate_det_act_scales(
    det_vars: Dict[str, Any],
    canvas_batches,
    stem_pool: int = 1,
    margin: float = 1.0,
) -> Dict[str, float]:
    """Post-training calibration of the detector's activation scales.

    ``canvas_batches``: iterable of (B, H·p, W·p, 3) NORMALIZED detection
    canvases — the exact tensors the serving graph feeds the detector
    (pooled + (x−127.5)/128). Returns {quant_point: scale} floats for
    ``ScrfdInt8Runner(act_scales=…)``.
    """
    runner = ScrfdInt8Runner(det_vars, stem_pool=stem_pool)

    @jax.jit
    def one(x):
        _, records = runner.calibrate(x)
        return records

    maxes: Optional[Dict[str, float]] = None
    for batch in canvas_batches:
        recs = jax.device_get(one(jnp.asarray(batch)))
        if maxes is None:
            maxes = {k: float(v) for k, v in recs.items()}
        else:
            for k, v in recs.items():
                maxes[k] = max(maxes[k], float(v))
    if maxes is None:
        raise ValueError("no calibration batches provided")
    return {k: max(v / 127.0 * margin, 1e-8) for k, v in maxes.items()}
