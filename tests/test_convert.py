"""Weight-conversion parity tests.

Verifies the torch→flax converter (models/convert.py) both structurally
(full-backbone state dict → exact init-tree match) and numerically (a
torch MBConv block built here with TF-SAME padding semantics — the layout
efficientnet-pytorch uses — matches the flax block bit-for-bit-ish after
conversion). This de-risks SURVEY.md §7 hard part 3 (EfficientNet numerical
parity) without the efficientnet-pytorch wheel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from deepfake_vit_tpu.models import DeepfakeDetectionModel, EfficientNetBackbone, block_args
from deepfake_vit_tpu.models.convert import (
    assert_tree_shapes_match,
    convert_detection_model,
    convert_efficientnet_backbone,
)
from deepfake_vit_tpu.models.efficientnet import MBConvBlock


def tf_same_pad(x, kernel, stride):
    """TF/XLA 'SAME' padding for NCHW torch tensors."""
    ih, iw = x.shape[-2:]
    pad_h = max((-ih % stride) + kernel - stride, kernel - stride if ih % stride == 0 else 0)
    # Simplified: standard formula
    oh = -(-ih // stride)
    ow = -(-iw // stride)
    pad_h = max((oh - 1) * stride + kernel - ih, 0)
    pad_w = max((ow - 1) * stride + kernel - iw, 0)
    return tF.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])


class TorchMBConv(tnn.Module):
    """Reference-layout MBConv (efficientnet-pytorch naming) with TF-SAME pads."""

    def __init__(self, fin, fout, kernel, stride, expand, se_ratio):
        super().__init__()
        mid = fin * expand
        self.kernel, self.stride, self.expand = kernel, stride, expand
        self.fin, self.fout = fin, fout
        if expand != 1:
            self._expand_conv = tnn.Conv2d(fin, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        self._depthwise_conv = tnn.Conv2d(mid, mid, kernel, stride, groups=mid, bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        se = max(1, int(fin * se_ratio))
        self._se_reduce = tnn.Conv2d(mid, se, 1)
        self._se_expand = tnn.Conv2d(se, mid, 1)
        self._project_conv = tnn.Conv2d(mid, fout, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(fout, eps=1e-3, momentum=0.01)

    def forward(self, x):
        inputs = x
        if self.expand != 1:
            x = tF.silu(self._bn0(self._expand_conv(x)))
        x = tf_same_pad(x, self.kernel, self.stride)
        x = tF.silu(self._bn1(self._depthwise_conv(x)))
        se = x.mean((2, 3), keepdim=True)
        se = self._se_expand(tF.silu(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.fin == self.fout:
            x = x + inputs
        return x


@pytest.mark.parametrize("fin,fout,kernel,stride,expand", [
    (16, 16, 3, 1, 6),   # residual path
    (16, 24, 5, 2, 6),   # strided, channel change
    (32, 16, 3, 1, 1),   # no expansion
])
def test_mbconv_numerical_parity(rng, fin, fout, kernel, stride, expand):
    tblock = TorchMBConv(fin, fout, kernel, stride, expand, se_ratio=0.25).eval()
    sd = {k: v.detach().numpy() for k, v in tblock.state_dict().items()}
    # randomize BN stats so parity covers the normalize path
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(rng.normal(1.0, 0.2, sd[k].shape)).astype(np.float32)
        if k.endswith("running_mean"):
            sd[k] = rng.normal(0, 0.2, sd[k].shape).astype(np.float32)
    tblock.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})

    # convert via the backbone converter machinery on a single-block dict
    sd_prefixed = {f"_blocks.0.{k}": v for k, v in sd.items()}
    # minimal stem/head entries so the converter runs: use block-only path
    from deepfake_vit_tpu.models.convert import _bn, _conv, _depthwise, _np

    blk = {}
    blk_stats = {}
    if expand != 1:
        blk["expand_conv"] = {"kernel": _conv(sd["_expand_conv.weight"])}
        blk["bn0"], blk_stats["bn0"] = _bn(sd, "_bn0")
    blk["depthwise_conv"] = {"kernel": _depthwise(sd["_depthwise_conv.weight"])}
    blk["bn1"], blk_stats["bn1"] = _bn(sd, "_bn1")
    blk["se_reduce"] = {"kernel": _conv(sd["_se_reduce.weight"]), "bias": _np(sd["_se_reduce.bias"])}
    blk["se_expand"] = {"kernel": _conv(sd["_se_expand.weight"]), "bias": _np(sd["_se_expand.bias"])}
    blk["project_conv"] = {"kernel": _conv(sd["_project_conv.weight"])}
    blk["bn2"], blk_stats["bn2"] = _bn(sd, "_bn2")

    fblock = MBConvBlock(
        kernel=kernel, stride=stride, expand_ratio=expand,
        in_filters=fin, out_filters=fout, se_ratio=0.25,
    )
    x = rng.normal(0, 1, (2, 14, 14, fin)).astype(np.float32)
    variables = fblock.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert_tree_shapes_match(blk, jax.tree_util.tree_map(np.asarray, variables["params"]))
    out_f = fblock.apply({"params": blk, "batch_stats": blk_stats}, jnp.asarray(x))

    with torch.no_grad():
        out_t = tblock(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4, rtol=1e-3)


def _synthetic_backbone_sd(variant="b0", rng=None):
    """Random torch-layout state dict with the right shapes for a variant."""
    from deepfake_vit_tpu.models.efficientnet import VARIANT_PARAMS, feature_dim, round_filters

    rng = rng or np.random.default_rng(0)
    width = VARIANT_PARAMS[variant][0]
    sd = {}

    def conv(name, cin, cout, k, bias=False, groups=1):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (cout, cin // groups, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.abs(rng.normal(1, 0.1, (c,))).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.normal(1, 0.1, (c,))).astype(np.float32)

    stem = round_filters(32, width)
    conv("_conv_stem", 3, stem, 3)
    bn("_bn0", stem)
    for i, a in enumerate(block_args(variant)):
        mid = a["in_filters"] * a["expand_ratio"]
        se = max(1, int(a["in_filters"] * 0.25))
        if a["expand_ratio"] != 1:
            conv(f"_blocks.{i}._expand_conv", a["in_filters"], mid, 1)
            bn(f"_blocks.{i}._bn0", mid)
        conv(f"_blocks.{i}._depthwise_conv", mid, mid, a["kernel"], groups=mid)
        bn(f"_blocks.{i}._bn1", mid)
        conv(f"_blocks.{i}._se_reduce", mid, se, 1, bias=True)
        conv(f"_blocks.{i}._se_expand", se, mid, 1, bias=True)
        conv(f"_blocks.{i}._project_conv", mid, a["out_filters"], 1)
        bn(f"_blocks.{i}._bn2", a["out_filters"])
    conv("_conv_head", block_args(variant)[-1]["out_filters"], feature_dim(variant), 1)
    bn("_bn1", feature_dim(variant))
    return sd


def test_backbone_conversion_structure():
    sd = _synthetic_backbone_sd("b0")
    params, stats = convert_efficientnet_backbone(sd, "b0")

    model = EfficientNetBackbone(variant="b0")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert_tree_shapes_match(params, jax.tree_util.tree_map(np.asarray, variables["params"]))
    assert_tree_shapes_match(stats, jax.tree_util.tree_map(np.asarray, variables["batch_stats"]))

    out = model.apply({"params": params, "batch_stats": stats}, x)
    assert out.shape == (1, 1280)
    assert np.isfinite(np.asarray(out)).all()


def test_full_model_conversion_structure(rng):
    sd = _synthetic_backbone_sd("b0", rng)
    sd = {f"feature_extractor.backbone.backbone.{k}": v for k, v in sd.items()}
    sd["feature_extractor.attention.landmark_attn.attention_weights"] = np.ones(5, np.float32)
    C = 1280
    sd["feature_extractor.attention.channel_attn.fc.0.weight"] = rng.normal(0, 0.05, (C // 16, C)).astype(np.float32)
    sd["feature_extractor.attention.channel_attn.fc.2.weight"] = rng.normal(0, 0.05, (C, C // 16)).astype(np.float32)
    sd["feature_extractor.attention.spatial_attn.conv.weight"] = rng.normal(0, 0.05, (1, 2, 7, 7)).astype(np.float32)
    hidden = (64, 16)
    dims = [C, *hidden]
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        sd[f"classifier.{4*i}.weight"] = rng.normal(0, 0.05, (dout, din)).astype(np.float32)
        sd[f"classifier.{4*i}.bias"] = np.zeros(dout, np.float32)
        sd[f"classifier.{4*i+1}.weight"] = np.ones(dout, np.float32)
        sd[f"classifier.{4*i+1}.bias"] = np.zeros(dout, np.float32)
        sd[f"classifier.{4*i+1}.running_mean"] = np.zeros(dout, np.float32)
        sd[f"classifier.{4*i+1}.running_var"] = np.ones(dout, np.float32)
    sd[f"classifier.{4*len(hidden)}.weight"] = rng.normal(0, 0.05, (2, hidden[-1])).astype(np.float32)
    sd[f"classifier.{4*len(hidden)}.bias"] = np.zeros(2, np.float32)

    variables = convert_detection_model(sd, variant="b0", hidden_dims=hidden)

    model = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=hidden)
    imgs = jnp.ones((2, 64, 64, 3)) * 0.4
    lms = jnp.full((2, 5, 2), 32.0)
    ref = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, imgs, lms)
    assert_tree_shapes_match(
        variables["params"], jax.tree_util.tree_map(np.asarray, ref["params"])
    )

    logits, feats = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        imgs, lms, return_features=True,
    )
    assert logits.shape == (2, 2) and np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------------------
# Full-network golden parity (VERDICT round-1 item 5): a complete torch
# replica of the reference DeepfakeDetectionModel — stem → all MBConv blocks
# → head conv → hybrid attention (landmark σ=1.5 Gaussians / SE / CBAM) →
# GAP → MLP head (reference feature_extractor.py:184-299,
# landmark_attention.py:13-310) — converted via convert_detection_model and
# checked end-to-end against the flax model, covering every converted tensor.
# ---------------------------------------------------------------------------


class _TorchBackboneCore(tnn.Module):
    """efficientnet-pytorch layout: _conv_stem/_bn0/_blocks.N/_conv_head/_bn1."""

    def __init__(self, variant="b0"):
        super().__init__()
        from deepfake_vit_tpu.models.efficientnet import (
            VARIANT_PARAMS,
            feature_dim,
            round_filters,
        )

        width = VARIANT_PARAMS[variant][0]
        stem = round_filters(32, width)
        self._conv_stem = tnn.Conv2d(3, stem, 3, stride=2, bias=False)
        self._bn0 = tnn.BatchNorm2d(stem, eps=1e-3, momentum=0.01)
        self._blocks = tnn.ModuleList(
            [
                TorchMBConv(
                    a["in_filters"], a["out_filters"], a["kernel"], a["stride"],
                    a["expand_ratio"], a["se_ratio"],
                )
                for a in block_args(variant)
            ]
        )
        last = block_args(variant)[-1]["out_filters"]
        self._conv_head = tnn.Conv2d(last, feature_dim(variant), 1, bias=False)
        self._bn1 = tnn.BatchNorm2d(feature_dim(variant), eps=1e-3, momentum=0.01)

    def forward(self, x):
        x = tf_same_pad(x, 3, 2)
        x = tF.silu(self._bn0(self._conv_stem(x)))
        for b in self._blocks:
            x = b(x)
        return tF.silu(self._bn1(self._conv_head(x)))


class _TorchBackboneWrap(tnn.Module):
    def __init__(self, variant):
        super().__init__()
        self.backbone = _TorchBackboneCore(variant)

    def forward(self, x):
        return self.backbone(x)


class _TorchLandmarkAttn(tnn.Module):
    """Reference landmark_attention.py:13-130: σ=1.5 Gaussians, learnable
    5-weights, batch-global max norm, clamp [0.1, 1.0]."""

    def __init__(self, sigma=1.5, input_size=224.0):
        super().__init__()
        self.attention_weights = tnn.Parameter(torch.ones(5))
        self.sigma, self.input_size = sigma, input_size

    def forward(self, x, landmarks):
        B, C, H, W = x.shape
        scale = torch.tensor([W / self.input_size, H / self.input_size])
        lm = landmarks * scale  # (B, 5, 2)
        ys = torch.arange(H, dtype=torch.float32)
        xs = torch.arange(W, dtype=torch.float32)
        dy = ys[None, None, :, None] - lm[:, :, 1][:, :, None, None]
        dx = xs[None, None, None, :] - lm[:, :, 0][:, :, None, None]
        gauss = torch.exp(-(dx * dx + dy * dy) / (2.0 * self.sigma**2))
        gauss = gauss * self.attention_weights[None, :, None, None]
        amap = gauss.sum(1, keepdim=True)
        amap = amap / (amap.max() + 1e-8)
        return x * amap.clamp(0.1, 1.0)


class _TorchChannelAttn(tnn.Module):
    def __init__(self, channels, reduction=16):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Linear(channels, channels // reduction, bias=False),
            tnn.ReLU(),
            tnn.Linear(channels // reduction, channels, bias=False),
        )

    def forward(self, x):
        avg = x.mean((2, 3))
        mx = x.amax((2, 3))
        scale = torch.sigmoid(self.fc(avg) + self.fc(mx))
        return x * scale[:, :, None, None]


class _TorchSpatialAttn(tnn.Module):
    def __init__(self, kernel=7):
        super().__init__()
        self.conv = tnn.Conv2d(2, 1, kernel, padding=kernel // 2, bias=False)

    def forward(self, x):
        avg = x.mean(1, keepdim=True)
        mx = x.amax(1, keepdim=True)
        return x * torch.sigmoid(self.conv(torch.cat([avg, mx], 1)))


class _TorchHybridAttn(tnn.Module):
    def __init__(self, channels):
        super().__init__()
        self.landmark_attn = _TorchLandmarkAttn()
        self.channel_attn = _TorchChannelAttn(channels)
        self.spatial_attn = _TorchSpatialAttn()

    def forward(self, x, landmarks):
        x = self.landmark_attn(x, landmarks)
        x = self.channel_attn(x)
        return self.spatial_attn(x)


class _TorchFeatureExtractor(tnn.Module):
    def __init__(self, variant):
        super().__init__()
        from deepfake_vit_tpu.models.efficientnet import feature_dim

        self.backbone = _TorchBackboneWrap(variant)
        self.attention = _TorchHybridAttn(feature_dim(variant))

    def forward(self, x, landmarks):
        maps = self.backbone(x)
        maps = self.attention(maps, landmarks)
        return tF.adaptive_avg_pool2d(maps, 1).flatten(1)


class TorchDeepfakeModel(tnn.Module):
    """Reference feature_extractor.py:184-299 layout (state-dict compatible)."""

    def __init__(self, variant="b0", hidden=(64, 16), num_classes=2):
        super().__init__()
        from deepfake_vit_tpu.models.efficientnet import feature_dim

        self.feature_extractor = _TorchFeatureExtractor(variant)
        layers = []
        dims = [feature_dim(variant), *hidden]
        for din, dout in zip(dims[:-1], dims[1:]):
            layers += [tnn.Linear(din, dout), tnn.BatchNorm1d(dout), tnn.ReLU(), tnn.Dropout(0.4)]
        layers.append(tnn.Linear(hidden[-1], num_classes))
        self.classifier = tnn.Sequential(*layers)

    def forward(self, x, landmarks):
        feats = self.feature_extractor(x, landmarks)
        return self.classifier(feats), feats


@pytest.mark.slow
def test_full_network_golden_parity(rng):
    """End-to-end logits parity: torch replica → convert → flax apply."""
    hidden = (64, 16)
    tmodel = TorchDeepfakeModel(variant="b0", hidden=hidden).eval()

    # Randomize every BN's running stats so parity covers normalization.
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(rng.normal(1.0, 0.2, sd[k].shape)).astype(np.float32)
        elif k.endswith("running_mean"):
            sd[k] = rng.normal(0.0, 0.2, sd[k].shape).astype(np.float32)
    tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}

    variables = convert_detection_model(sd, variant="b0", hidden_dims=hidden)

    fmodel = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=hidden)
    imgs = rng.normal(0, 1, (2, 224, 224, 3)).astype(np.float32)
    lms = rng.uniform(40, 180, (2, 5, 2)).astype(np.float32)

    # Structural completeness: the converted tree must exactly match init.
    ref = fmodel.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), jnp.asarray(lms),
    )
    assert_tree_shapes_match(
        variables["params"], jax.tree_util.tree_map(np.asarray, ref["params"])
    )
    assert_tree_shapes_match(
        variables["batch_stats"], jax.tree_util.tree_map(np.asarray, ref["batch_stats"])
    )

    logits_f, feats_f = fmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(imgs), jnp.asarray(lms), return_features=True,
    )

    with torch.no_grad():
        logits_t, feats_t = tmodel(
            torch.tensor(imgs.transpose(0, 3, 1, 2)), torch.tensor(lms)
        )

    np.testing.assert_allclose(
        np.asarray(feats_f), feats_t.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logits_f), logits_t.numpy(), atol=1e-3, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# Detector conversion (VERDICT r3 next #6): round-trip a synthetic external
# SCRFD-style checkpoint (torch layout, random values) through
# convert_scrfd_detector into FaceDetector and assert DECODE equivalence —
# so the day real converted det_10g weights reach the environment they load
# without new code. Reference counterpart: the buffalo_l pretrained-weights
# path (src/preprocessing/face_detector.py:220-227).
# ---------------------------------------------------------------------------


def test_scrfd_detector_conversion_roundtrip(tmp_path):
    from flax import serialization

    from deepfake_vit_tpu.models.convert import (
        convert_scrfd_detector,
        export_scrfd_torch_layout,
    )
    from deepfake_vit_tpu.models.scrfd import ScrfdDetector
    from deepfake_vit_tpu.preprocessing.detector import FaceDetector

    det = ScrfdDetector()
    variables = det.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # Non-trivial batch stats so BN running-average handling is exercised.
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda x: x + np.random.default_rng(3).normal(0, 0.05, x.shape).astype(x.dtype),
        variables["batch_stats"],
    )

    # The "external checkpoint": torch-layout flat dict saved with torch.save
    # (exactly what load_torch_state_dict consumes), values from the flax
    # init so equivalence is checkable.
    sd = export_scrfd_torch_layout(variables)
    pth = tmp_path / "scrfd_external.pth"
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}}, pth)

    from deepfake_vit_tpu.models.convert import load_torch_state_dict

    converted = convert_scrfd_detector(load_torch_state_dict(str(pth)))
    assert_tree_shapes_match(
        converted["params"], jax.tree_util.tree_map(np.asarray, variables["params"])
    )
    assert_tree_shapes_match(
        converted["batch_stats"],
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
    )

    # Values must round-trip bit-exactly (transposes only, no arithmetic).
    flat_a = jax.tree_util.tree_leaves(converted)
    flat_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, dict(variables))
    )
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)

    # End-to-end: the converted msgpack loads through FaceDetector and
    # decodes identically to the original variables on a rendered scene.
    msgpack_path = tmp_path / "scrfd_converted.msgpack"
    with open(msgpack_path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(converted)))

    from deepfake_vit_tpu.data.synth_faces import render_scene

    img, _, _ = render_scene(np.random.default_rng(11), size=128, max_faces=1,
                             min_face=48, max_face=100, p_empty=0.0)
    images = img[None].astype(np.float32)

    fd_a = FaceDetector(confidence_threshold=0.0, input_size=(128, 128),
                        keep_top_k=1, pretrained=False)
    fd_a.variables = variables
    fd_b = FaceDetector(confidence_threshold=0.0, input_size=(128, 128),
                        keep_top_k=1, pretrained=False)
    fd_b.load_weights(str(msgpack_path))

    out_a = fd_a.detect_batch_raw(images)
    out_b = fd_b.detect_batch_raw(images)
    for k in ("boxes", "scores", "landmarks", "valid"):
        np.testing.assert_array_equal(np.asarray(out_a[k]), np.asarray(out_b[k]))


def test_convert_checkpoint_cli_detector_kind(tmp_path):
    """scripts/convert_checkpoint.py --kind detector writes a msgpack that
    FaceDetector.load_weights accepts."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path as _Path

    from deepfake_vit_tpu.models.convert import export_scrfd_torch_layout
    from deepfake_vit_tpu.models.scrfd import ScrfdDetector
    from deepfake_vit_tpu.preprocessing.detector import FaceDetector

    det = ScrfdDetector()
    variables = det.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 3)))
    sd = export_scrfd_torch_layout(jax.tree_util.tree_map(np.asarray, variables))
    pth = tmp_path / "ext.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    repo = _Path(__file__).resolve().parents[1]
    out = tmp_path / "det.msgpack"
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=str(repo))
    proc = subprocess.run(
        [_sys.executable, str(repo / "scripts" / "convert_checkpoint.py"),
         "--kind", "detector", "--input", str(pth), "--output", str(out)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()
    fd = FaceDetector(confidence_threshold=0.0, input_size=(128, 128),
                      keep_top_k=1, pretrained=False)
    fd.load_weights(str(out))
