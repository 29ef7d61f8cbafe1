"""EfficientNet family in flax — TPU-native (NHWC, SAME padding, bf16).

Re-provides the capability of the reference backbone
(`src/feature_extraction/efficientnet.py:13-170`: EfficientNet-B4 feature
extractor, 1792-dim features, intermediate-map capture at flat block
indices 5/10/21, BatchNorm freeze mode, fine-tune variant with staged
freezing and discriminative LR groups) as an idiomatic JAX implementation
built from the published architecture (Tan & Le, 2019) — not a port of
torch code. Convolutions are NHWC with XLA 'SAME' padding so they tile
directly onto the MXU; activations may run in bfloat16 with fp32 params.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Base (B0) stage configuration from the EfficientNet paper:
# (num_repeat, kernel, stride, expand_ratio, in_filters, out_filters, se_ratio)
_B0_STAGES = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)

# variant -> (width_mult, depth_mult, resolution, dropout)
VARIANT_PARAMS = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    """Round channel counts to the nearest multiple of ``divisor``."""
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def block_args(variant: str) -> Tuple[Dict[str, Any], ...]:
    """Flattened per-block arguments for a variant (stride only on block 0)."""
    width, depth, _, _ = VARIANT_PARAMS[variant]
    blocks = []
    for repeat, kernel, stride, expand, fin, fout, se in _B0_STAGES:
        fin_r = round_filters(fin, width)
        fout_r = round_filters(fout, width)
        for i in range(round_repeats(repeat, depth)):
            blocks.append(
                dict(
                    kernel=kernel,
                    stride=stride if i == 0 else 1,
                    expand_ratio=expand,
                    in_filters=fin_r if i == 0 else fout_r,
                    out_filters=fout_r,
                    se_ratio=se,
                )
            )
    return tuple(blocks)


def feature_dim(variant: str) -> int:
    """Head channel count (1792 for b4, matching reference ``feature_dim``)."""
    width = VARIANT_PARAMS[variant][0]
    return round_filters(1280, width)


def _drop_connect(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    kernel: int
    stride: int
    expand_ratio: int
    in_filters: int
    out_filters: int
    se_ratio: float
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, freeze_bn: bool = False) -> jnp.ndarray:
        use_ra = (not train) or freeze_bn
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        bn_kw = dict(
            use_running_average=use_ra,
            momentum=_BN_MOMENTUM,
            epsilon=_BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        inputs = x
        expanded = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(expanded, (1, 1), padding="SAME", name="expand_conv", **conv_kw)(x)
            x = nn.BatchNorm(name="bn0", **bn_kw)(x)
            x = nn.silu(x)

        # Depthwise conv: feature_group_count == channels.
        x = nn.Conv(
            expanded,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=expanded,
            name="depthwise_conv",
            **conv_kw,
        )(x)
        x = nn.BatchNorm(name="bn1", **bn_kw)(x)
        x = nn.silu(x)

        if self.se_ratio > 0:
            se_filters = max(1, int(self.in_filters * self.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(se_filters, (1, 1), use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name="se_reduce")(se)
            se = nn.silu(se)
            se = nn.Conv(expanded, (1, 1), use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name="se_expand")(se)
            x = x * jax.nn.sigmoid(se)

        x = nn.Conv(self.out_filters, (1, 1), padding="SAME", name="project_conv", **conv_kw)(x)
        x = nn.BatchNorm(name="bn2", **bn_kw)(x)

        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_rate > 0:
                rng = self.make_rng("dropout")
                x = _drop_connect(x, self.drop_rate, deterministic=not train, rng=rng)
            x = x + inputs
        return x


class EfficientNetBackbone(nn.Module):
    """EfficientNet feature backbone.

    ``__call__`` returns pooled features (B, C); ``feature_maps`` returns the
    final (B, H, W, C) map; both can additionally capture intermediate maps
    at flat block indices (default 5/10/21, the reference's hook points).
    """

    variant: str = "b4"
    dropout_rate: float = 0.4
    drop_connect_rate: float = 0.2
    freeze_bn: bool = False
    capture_indices: Tuple[int, ...] = (5, 10, 21)
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        return feature_dim(self.variant)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        return_maps: bool = False,
        return_intermediate: bool = False,
        start_block: int = 0,
    ):
        """x: (B, H, W, 3) normalized images, NHWC.

        ``start_block > 0`` resumes mid-network: ``x`` is then the input
        activation of flat block ``start_block`` (the stem and earlier
        blocks are skipped — serving runs them in the fused Pallas kernels,
        ``models/fused_backbone.py``). Only valid under ``apply`` with a
        full parameter tree; the skipped modules' params are simply unread.
        """
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        use_ra = (not train) or self.freeze_bn
        bn_kw = dict(
            use_running_average=use_ra,
            momentum=_BN_MOMENTUM,
            epsilon=_BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        x = x.astype(self.dtype)

        if start_block == 0:
            width, _, _, _ = VARIANT_PARAMS[self.variant]
            stem_filters = round_filters(32, width)
            x = nn.Conv(stem_filters, (3, 3), strides=(2, 2), padding="SAME",
                        name="stem_conv", **conv_kw)(x)
            x = nn.BatchNorm(name="stem_bn", **bn_kw)(x)
            x = nn.silu(x)

        blocks = block_args(self.variant)
        n_blocks = len(blocks)
        intermediates: Dict[int, jnp.ndarray] = {}
        for idx, args in enumerate(blocks):
            if idx < start_block:
                continue
            drop = self.drop_connect_rate * idx / n_blocks
            x = MBConvBlock(
                **args,
                drop_rate=drop,
                dtype=self.dtype,
                name=f"block_{idx}",
            )(x, train=train, freeze_bn=self.freeze_bn)
            if return_intermediate and idx in self.capture_indices:
                intermediates[idx] = x

        head_filters = feature_dim(self.variant)
        x = nn.Conv(head_filters, (1, 1), padding="SAME", name="head_conv", **conv_kw)(x)
        x = nn.BatchNorm(name="head_bn", **bn_kw)(x)
        feature_maps = nn.silu(x)

        if return_maps:
            out = feature_maps
        else:
            pooled = jnp.mean(feature_maps, axis=(1, 2))
            pooled = nn.Dropout(self.dropout_rate, deterministic=not train)(pooled)
            out = pooled

        if return_intermediate:
            return out, intermediates
        return out


class EfficientNetClassifier(nn.Module):
    """End-to-end EfficientNet classifier.

    Capability parity with the reference fine-tune variant
    (`efficientnet.py:173-292`): full backbone + linear head. Stage freezing
    and discriminative learning rates are handled functionally via
    :func:`param_group_labels` + optax multi_transform rather than mutating
    module state.
    """

    variant: str = "b4"
    num_classes: int = 2
    dropout_rate: float = 0.4
    freeze_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = EfficientNetBackbone(
            variant=self.variant,
            dropout_rate=self.dropout_rate,
            freeze_bn=self.freeze_bn,
            dtype=self.dtype,
            name="backbone",
        )(x, train=train)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="fc")(feats)
        return logits.astype(jnp.float32)


def param_group_labels(params: Dict[str, Any], num_stem_blocks: int = 2) -> Dict[str, Any]:
    """Label each param leaf 'stem' / 'blocks' / 'head' for discriminative LRs.

    Mirrors the 3-group LR policy of the reference fine-tune variant
    (`efficientnet.py:255-292`) as an optax ``multi_transform`` label tree.
    """

    def label_for(path: Tuple[str, ...]) -> str:
        top = path[0] if path else ""
        if top.startswith("stem"):
            return "stem"
        if top.startswith("block_"):
            return "blocks"
        return "head"

    flat = jax.tree_util.tree_map_with_path(
        lambda kp, _: label_for(tuple(getattr(k, "key", str(k)) for k in kp)), params
    )
    return flat


def frozen_stage_mask(params: Dict[str, Any], freeze_stages: int, variant: str = "b4") -> Dict[str, Any]:
    """Boolean pytree: True where the leaf is trainable given frozen stages.

    ``freeze_stages`` counts EfficientNet stages (0 = none, 7 = all blocks);
    the stem freezes whenever any stage is frozen, matching the reference's
    staged-freezing semantics.
    """
    width, depth, _, _ = VARIANT_PARAMS[variant]
    stage_ends = []
    total = 0
    for repeat, *_ in _B0_STAGES:
        total += round_repeats(repeat, depth)
        stage_ends.append(total)
    frozen_upto = stage_ends[freeze_stages - 1] if freeze_stages > 0 else 0

    def trainable(path: Tuple[str, ...]) -> bool:
        top = path[0] if path else ""
        if top.startswith("stem"):
            return freeze_stages == 0
        if top.startswith("block_"):
            return int(top.split("_")[1]) >= frozen_upto
        return True

    return jax.tree_util.tree_map_with_path(
        lambda kp, _: trainable(tuple(getattr(k, "key", str(k)) for k in kp)), params
    )
