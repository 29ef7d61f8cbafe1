"""Loss functions as pure JAX — jit/grad/vmap-safe, no module state.

Capability parity with reference ``src/training/losses.py:12-294``:

- focal_loss: (1-p_t)^γ · CE, γ default 2.0, optional per-class α.
- contrastive_loss: euclidean or cosine distance;
  ``same·d² + (1-same)·relu(margin-d)²``, margin 1.0. NOTE the reference's
  label convention (losses.py:108-111 vs its own docstring): label 1 means
  *same class* and pulls the pair together.
- triplet_loss: relu(d_pos - d_neg + margin).
- combined_loss: weighted CE + Focal + Contrastive where contrastive pairs
  are adjacent even/odd samples in the batch (losses.py:229-243) — the
  per-shard ordering must match the host loader's to keep values comparable.
- label_smoothing_loss: manual one-hot smoothing CE.

All reductions are means over the batch so values are invariant to
data-parallel sharding (mean-of-shard-means == global mean when shards are
equal, guaranteed by drop_last batches).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Weighted softmax cross-entropy matching torch ``CrossEntropyLoss``.

    With ``class_weights`` the mean is weight-normalized (sum of per-sample
    losses / sum of per-sample weights), torch's documented behavior.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        w = class_weights[labels]
        nll = nll * w
        if reduction == "mean":
            return jnp.sum(nll) / (jnp.sum(w) + 1e-12)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    ce = cross_entropy_loss(logits, labels, reduction="none")
    pt = jnp.exp(-ce)
    fl = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        fl = alpha[labels] * fl
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def _pairwise_distance(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Row-wise euclidean distance (torch F.pairwise_distance semantics)."""
    return jnp.sqrt(jnp.sum((a - b + eps) ** 2, axis=-1))


def contrastive_loss(
    emb1: jnp.ndarray,
    emb2: jnp.ndarray,
    pair_labels: jnp.ndarray,
    margin: float = 1.0,
    distance: str = "euclidean",
) -> jnp.ndarray:
    """pair_labels: 1.0 = same class (pull together), 0.0 = different (push)."""
    if distance == "euclidean":
        d = _pairwise_distance(emb1, emb2)
    else:
        cos = jnp.sum(emb1 * emb2, axis=-1) / (
            jnp.linalg.norm(emb1, axis=-1) * jnp.linalg.norm(emb2, axis=-1) + 1e-8
        )
        d = 1.0 - cos
    loss_same = pair_labels * d**2
    loss_diff = (1.0 - pair_labels) * jax.nn.relu(margin - d) ** 2
    return jnp.mean(loss_same + loss_diff)


def triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
    distance: str = "euclidean",
) -> jnp.ndarray:
    if distance == "euclidean":
        d_pos = _pairwise_distance(anchor, positive)
        d_neg = _pairwise_distance(anchor, negative)
    else:
        def cos_d(a, b):
            cos = jnp.sum(a * b, axis=-1) / (
                jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
            )
            return 1.0 - cos

        d_pos, d_neg = cos_d(anchor, positive), cos_d(anchor, negative)
    return jnp.mean(jax.nn.relu(d_pos - d_neg + margin))


def label_smoothing_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int = 2,
    smoothing: float = 0.1,
) -> jnp.ndarray:
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    off = smoothing / (num_classes - 1)
    one_hot = jax.nn.one_hot(labels, num_classes) * (1.0 - smoothing - off) + off
    return jnp.mean(jnp.sum(-one_hot * log_probs, axis=-1))


def combined_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    features: Optional[jnp.ndarray] = None,
    weights: Optional[Dict[str, float]] = None,
    class_weights: Optional[jnp.ndarray] = None,
    focal_gamma: float = 2.0,
    contrastive_margin: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Weighted CE + Focal + Contrastive; returns {'total', 'ce', 'focal', 'contrastive'}."""
    weights = weights or {"ce": 1.0, "focal": 0.5, "contrastive": 0.2}
    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, dtype=jnp.float32)

    if weights.get("ce", 0.0) > 0:
        ce = cross_entropy_loss(logits, labels, class_weights)
        losses["ce"] = ce
        total = total + weights["ce"] * ce

    if weights.get("focal", 0.0) > 0:
        fl = focal_loss(logits, labels, gamma=focal_gamma, alpha=class_weights)
        losses["focal"] = fl
        total = total + weights["focal"] * fl

    if features is not None and weights.get("contrastive", 0.0) > 0 and features.shape[0] >= 2:
        # Adjacent even/odd pairing within the (per-shard) batch order.
        feat1 = features[:-1:2]
        feat2 = features[1::2]
        lab1 = labels[:-1:2]
        lab2 = labels[1::2]
        n = min(feat1.shape[0], feat2.shape[0])
        pair = (lab1[:n] == lab2[:n]).astype(jnp.float32)
        con = contrastive_loss(feat1[:n], feat2[:n], pair, margin=contrastive_margin)
        losses["contrastive"] = con
        total = total + weights["contrastive"] * con

    losses["total"] = total
    return losses


def make_criterion(loss_cfg: Dict, class_weights: Optional[jnp.ndarray] = None):
    """Factory mapping the model_config.yaml 'loss' block to a callable.

    Returned callable: ``criterion(logits, labels, features) -> dict`` with at
    least key 'total' (matching the reference's CombinedLoss dict contract;
    scalar losses are wrapped into {'total': loss}).
    """
    kind = (loss_cfg or {}).get("type", "CombinedLoss")
    cw = class_weights
    if loss_cfg and loss_cfg.get("class_weights") is not None:
        cw = jnp.asarray(loss_cfg["class_weights"], dtype=jnp.float32)

    if kind == "CrossEntropy":
        return lambda logits, labels, features=None: {
            "total": cross_entropy_loss(logits, labels, cw)
        }
    if kind == "FocalLoss":
        gamma = loss_cfg.get("focal_gamma", 2.0)
        return lambda logits, labels, features=None: {
            "total": focal_loss(logits, labels, gamma=gamma, alpha=cw)
        }
    if kind == "LabelSmoothing":
        smoothing = loss_cfg.get("smoothing", 0.1)
        return lambda logits, labels, features=None: {
            "total": label_smoothing_loss(
                logits, labels, num_classes=logits.shape[-1] if hasattr(logits, "shape") else 2,
                smoothing=smoothing,
            )
        }
    if kind == "CombinedLoss":
        weights = (loss_cfg or {}).get("weights", None)
        gamma = (loss_cfg or {}).get("focal_gamma", 2.0)
        return lambda logits, labels, features=None: combined_loss(
            logits, labels, features, weights=weights, class_weights=cw, focal_gamma=gamma
        )
    raise ValueError(f"unknown loss type: {kind}")
