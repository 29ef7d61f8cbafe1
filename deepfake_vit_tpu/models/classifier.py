"""Standalone classification heads (Stage 3 API surface).

Capability parity with reference ``src/classification/classifier.py:11-220``:
MLP (Dense/BN/ReLU/Dropout stack), tanh-scored softmax self-attention head,
and a 3-member ensemble with soft (log-mean-softmax) or hard (one-hot
majority) voting. Hard voting is expressed with a one-hot sum instead of a
per-row Python bincount loop so it stays jittable.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPClassifier(nn.Module):
    hidden_dims: Sequence[int] = (512, 128, 32)
    num_classes: int = 2
    dropout_rate: float = 0.4
    use_batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = features
        for i, hidden in enumerate(self.hidden_dims):
            x = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"dense_{i}")(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="out")(x)
        return logits.astype(jnp.float32)


class AttentionClassifier(nn.Module):
    """Softmax self-attention over N feature vectors → weighted sum → MLP."""

    hidden_dim: int = 512
    num_classes: int = 2
    dropout_rate: float = 0.4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        train: bool = False,
        return_attention: bool = False,
    ):
        """features: (B, D) or (B, N, D)."""
        if features.ndim == 2:
            features = features[:, None, :]

        score = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name="attn_dense")(features)
        score = jnp.tanh(score)
        score = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                         name="attn_score")(score)
        weights = jax.nn.softmax(score, axis=1)  # (B, N, 1)
        pooled = jnp.sum(features * weights, axis=1)  # (B, D)

        x = pooled
        for i, hidden in enumerate((self.hidden_dim, self.hidden_dim // 2)):
            x = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="out")(x).astype(jnp.float32)

        if return_attention:
            return logits, jnp.squeeze(weights, axis=-1)
        return logits


_ENSEMBLE_HIDDENS: Tuple[Tuple[int, ...], ...] = ((512, 128, 32), (256, 64), (1024, 256, 64))


class EnsembleClassifier(nn.Module):
    num_classes: int = 2
    num_classifiers: int = 3
    voting: str = "soft"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        outputs = []
        for i in range(self.num_classifiers):
            hiddens = _ENSEMBLE_HIDDENS[i % len(_ENSEMBLE_HIDDENS)]
            outputs.append(
                MLPClassifier(
                    hidden_dims=hiddens,
                    num_classes=self.num_classes,
                    dropout_rate=0.3 + 0.1 * i,
                    dtype=self.dtype,
                    name=f"member_{i}",
                )(features, train=train)
            )
        stacked = jnp.stack(outputs)  # (K, B, C)

        if self.voting == "soft":
            probs = jax.nn.softmax(stacked, axis=-1)
            return jnp.log(jnp.mean(probs, axis=0) + 1e-10)

        # Hard voting: one-hot per-member argmax summed, then one-hot winner.
        preds = jnp.argmax(stacked, axis=-1)  # (K, B)
        votes = jnp.sum(jax.nn.one_hot(preds, self.num_classes), axis=0)  # (B, C)
        winner = jnp.argmax(votes, axis=-1)
        return jax.nn.one_hot(winner, self.num_classes)
