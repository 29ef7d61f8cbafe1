"""Vision Transformer classifier (flax) — the fallback model family.

Capability parity with the reference's fallback submission path
(``task(less_cpu_intensive_ver).ipynb`` cell 15: HuggingFace
``ViTForImageClassification`` 'deep-fake-detector-v2-model' + processor):
a ViT-B/16-class encoder with a classification head, plus a converter from
HF ViT checkpoints (transformers is available in this image, weights load
offline from a local directory when provided).

TPU-native: patchify is a single strided conv; attention/MLP blocks are
plain batched matmuls in bf16 — MXU-shaped by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VIT_CONFIGS = {
    "base16": dict(patch=16, width=768, depth=12, heads=12, mlp=3072),
    "small16": dict(patch=16, width=384, depth=12, heads=6, mlp=1536),
    "tiny16": dict(patch=16, width=192, depth=12, heads=3, mlp=768),
}


class _EncoderBlock(nn.Module):
    width: int
    heads: int
    mlp: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        y = nn.LayerNorm(epsilon=1e-12, name="ln1", **kw)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="attn",
            **kw,
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-12, name="ln2", **kw)(x)
        y = nn.Dense(self.mlp, name="fc1", **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.width, name="fc2", **kw)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class ViTClassifier(nn.Module):
    """ViT with CLS token + linear head → (logits, cls_features) tuple."""

    variant: str = "base16"
    num_classes: int = 2
    image_size: int = 224
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        landmarks: Optional[jnp.ndarray] = None,  # accepted for API parity, unused
        train: bool = False,
        return_features: bool = False,
    ):
        cfg = VIT_CONFIGS[self.variant]
        P, W = cfg["patch"], cfg["width"]
        B = images.shape[0]
        n_patches = (self.image_size // P) ** 2

        x = nn.Conv(
            W, (P, P), strides=(P, P), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, n_patches, W)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, W), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, W)), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_patches + 1, W),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        for i in range(cfg["depth"]):
            x = _EncoderBlock(
                width=W, heads=cfg["heads"], mlp=cfg["mlp"],
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(x, train=train)

        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln_final")(x)
        cls_feat = x[:, 0]
        logits = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                          name="head")(cls_feat).astype(jnp.float32)
        if return_features:
            return logits, cls_feat.astype(jnp.float32)
        return logits, None

    def predict(self, images, landmarks=None, return_probs: bool = True):
        logits, _ = self(images, landmarks, train=False)
        return jax.nn.softmax(logits, axis=-1) if return_probs else logits


def convert_hf_vit(state_dict: Dict[str, Any], variant: str = "base16") -> Dict[str, Any]:
    """HuggingFace ViTForImageClassification state dict → flax params.

    Accepts {name: numpy/torch tensor} with HF's naming
    (``vit.embeddings.*``, ``vit.encoder.layer.N.*``, ``classifier.*``).
    """
    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    cfg = VIT_CONFIGS[variant]
    W, H = cfg["width"], cfg["heads"]
    p: Dict[str, Any] = {}

    p["patch_embed"] = {
        "kernel": npy(state_dict["vit.embeddings.patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0),
        "bias": npy(state_dict["vit.embeddings.patch_embeddings.projection.bias"]),
    }
    p["cls_token"] = npy(state_dict["vit.embeddings.cls_token"])
    p["pos_embed"] = npy(state_dict["vit.embeddings.position_embeddings"])

    for i in range(cfg["depth"]):
        src = f"vit.encoder.layer.{i}"
        head_dim = W // H

        def qkv(name):
            w = npy(state_dict[f"{src}.attention.attention.{name}.weight"]).T  # (W, W)
            b = npy(state_dict[f"{src}.attention.attention.{name}.bias"])
            return {"kernel": w.reshape(W, H, head_dim), "bias": b.reshape(H, head_dim)}

        out_w = npy(state_dict[f"{src}.attention.output.dense.weight"]).T  # (W, W)
        blk = {
            "ln1": {
                "scale": npy(state_dict[f"{src}.layernorm_before.weight"]),
                "bias": npy(state_dict[f"{src}.layernorm_before.bias"]),
            },
            "attn": {
                "query": qkv("query"),
                "key": qkv("key"),
                "value": qkv("value"),
                "out": {
                    "kernel": out_w.reshape(H, head_dim, W),
                    "bias": npy(state_dict[f"{src}.attention.output.dense.bias"]),
                },
            },
            "ln2": {
                "scale": npy(state_dict[f"{src}.layernorm_after.weight"]),
                "bias": npy(state_dict[f"{src}.layernorm_after.bias"]),
            },
            "fc1": {
                "kernel": npy(state_dict[f"{src}.intermediate.dense.weight"]).T,
                "bias": npy(state_dict[f"{src}.intermediate.dense.bias"]),
            },
            "fc2": {
                "kernel": npy(state_dict[f"{src}.output.dense.weight"]).T,
                "bias": npy(state_dict[f"{src}.output.dense.bias"]),
            },
        }
        p[f"block_{i}"] = blk

    p["ln_final"] = {
        "scale": npy(state_dict["vit.layernorm.weight"]),
        "bias": npy(state_dict["vit.layernorm.bias"]),
    }
    p["head"] = {
        "kernel": npy(state_dict["classifier.weight"]).T,
        "bias": npy(state_dict["classifier.bias"]),
    }
    return {"params": p}
