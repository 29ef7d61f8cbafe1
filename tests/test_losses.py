"""Loss golden-parity tests vs torch (reference ``src/training/losses.py``).

torch (CPU) is available in the image; every loss is checked numerically
against an independent torch computation with the reference's exact
semantics (γ=2 focal, margin-1 contrastive with euclidean pairwise
distance, adjacent even/odd pairing, label-1-means-same convention).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from deepfake_vit_tpu.training.losses import (
    combined_loss,
    contrastive_loss,
    cross_entropy_loss,
    focal_loss,
    label_smoothing_loss,
    make_criterion,
    triplet_loss,
)


@pytest.fixture()
def data(rng):
    logits = rng.normal(size=(16, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=16).astype(np.int64)
    features = rng.normal(size=(16, 32)).astype(np.float32)
    return logits, labels, features


def test_cross_entropy_parity(data):
    logits, labels, _ = data
    ours = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    ref = tF.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cross_entropy_class_weights(data):
    logits, labels, _ = data
    w = np.asarray([1.0, 2.5], np.float32)
    ours = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    ref = tF.cross_entropy(torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(w))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_focal_parity(data):
    logits, labels, _ = data
    ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
    ce = tF.cross_entropy(torch.tensor(logits), torch.tensor(labels), reduction="none")
    pt = torch.exp(-ce)
    ref = ((1 - pt) ** 2.0 * ce).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_contrastive_parity(rng):
    e1 = rng.normal(size=(8, 16)).astype(np.float32)
    e2 = rng.normal(size=(8, 16)).astype(np.float32)
    pair = rng.integers(0, 2, size=8).astype(np.float32)
    ours = contrastive_loss(jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(pair), margin=1.0)
    d = tF.pairwise_distance(torch.tensor(e1), torch.tensor(e2))
    t_pair = torch.tensor(pair)
    ref = (t_pair * d.pow(2) + (1 - t_pair) * tF.relu(1.0 - d).pow(2)).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_triplet_parity(rng):
    a = rng.normal(size=(8, 16)).astype(np.float32)
    p = rng.normal(size=(8, 16)).astype(np.float32)
    n = rng.normal(size=(8, 16)).astype(np.float32)
    ours = triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), margin=1.0)
    dp = tF.pairwise_distance(torch.tensor(a), torch.tensor(p))
    dn = tF.pairwise_distance(torch.tensor(a), torch.tensor(n))
    ref = tF.relu(dp - dn + 1.0).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_label_smoothing_parity(data):
    logits, labels, _ = data
    ours = label_smoothing_loss(jnp.asarray(logits), jnp.asarray(labels), 2, smoothing=0.1)
    log_probs = tF.log_softmax(torch.tensor(logits), dim=1)
    one_hot = torch.full_like(log_probs, 0.1 / 1)
    one_hot.scatter_(1, torch.tensor(labels).unsqueeze(1), 0.9)
    ref = (-one_hot * log_probs).sum(dim=1).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_combined_loss_parity(data):
    logits, labels, features = data
    weights = {"ce": 1.0, "focal": 0.5, "contrastive": 0.2}
    ours = combined_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(features), weights=weights
    )
    assert set(ours.keys()) == {"ce", "focal", "contrastive", "total"}

    t_logits, t_labels = torch.tensor(logits), torch.tensor(labels)
    t_feat = torch.tensor(features)
    ce = tF.cross_entropy(t_logits, t_labels)
    ce_n = tF.cross_entropy(t_logits, t_labels, reduction="none")
    focal = ((1 - torch.exp(-ce_n)) ** 2 * ce_n).mean()
    f1, f2 = t_feat[:-1:2], t_feat[1::2]
    l1, l2 = t_labels[:-1:2], t_labels[1::2]
    pair = (l1 == l2).float()
    d = tF.pairwise_distance(f1, f2)
    con = (pair * d.pow(2) + (1 - pair) * tF.relu(1.0 - d).pow(2)).mean()
    total = 1.0 * ce + 0.5 * focal + 0.2 * con
    np.testing.assert_allclose(float(ours["total"]), float(total), rtol=1e-4)


def test_make_criterion_types(data):
    logits, labels, features = data
    jl, jy, jf = jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(features)
    for kind in ("CrossEntropy", "FocalLoss", "LabelSmoothing", "CombinedLoss"):
        crit = make_criterion({"type": kind})
        out = crit(jl, jy, jf)
        assert "total" in out and np.isfinite(float(out["total"]))
