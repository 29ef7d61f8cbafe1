"""Model shape/contract tests (reference parity: shape contracts of
``efficientnet.py:296-348``, ``landmark_attention.py:314-373``,
``feature_extractor.py:303-365``, ``classifier.py:224-283``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models import (
    AttentionClassifier,
    ChannelAttention,
    DeepfakeDetectionModel,
    EfficientNetBackbone,
    EnsembleClassifier,
    HybridAttention,
    LandmarkAttention,
    MLPClassifier,
    SpatialAttention,
    block_args,
    feature_dim,
    round_filters,
    round_repeats,
)
from deepfake_vit_tpu.ops.gaussian import landmark_gaussian_map


def test_b4_architecture_constants():
    # EfficientNet-B4: 1792-dim head, 32 MBConv blocks (reference feature_dim
    # efficientnet.py:75 and hook indices 5/10/21 within 32 blocks).
    assert feature_dim("b4") == 1792
    assert len(block_args("b4")) == 32
    assert round_filters(32, 1.4) == 48
    assert round_repeats(3, 1.8) == 6


def test_backbone_shapes_small():
    model = EfficientNetBackbone(variant="b0", dropout_rate=0.2)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    pooled = model.apply(variables, x)
    assert pooled.shape == (2, 1280)
    fmap = model.apply(variables, x, return_maps=True)
    assert fmap.shape == (2, 2, 2, 1280)
    pooled2, inter = model.apply(variables, x, return_intermediate=True)
    assert pooled2.shape == (2, 1280)
    assert set(inter.keys()) <= {5, 10, 21}
    assert len(inter) > 0


def test_landmark_gaussian_map_properties():
    lms = jnp.asarray([[[112.0, 112.0]] * 5, [[0.0, 0.0]] * 5])
    amap = landmark_gaussian_map(lms, (7, 7))
    assert amap.shape == (2, 1, 7, 7)
    a = np.asarray(amap)
    assert a.min() >= 0.1 - 1e-6 and a.max() <= 1.0 + 1e-6
    # Peak should be at the landmark location (center → pixel 3,3 at 7/224 scale)
    assert np.unravel_index(a[0, 0].argmax(), (7, 7)) == (3, 3)


def test_attention_modules_shapes():
    x = jnp.ones((4, 7, 7, 32))
    lms = jnp.ones((4, 5, 2)) * 100.0

    lm = LandmarkAttention(feature_size=(7, 7))
    v = lm.init(jax.random.PRNGKey(0), x, lms)
    assert v["params"]["attention_weights"].shape == (5,)
    assert lm.apply(v, x, lms).shape == x.shape

    ch = ChannelAttention(channels=32, reduction=16)
    v = ch.init(jax.random.PRNGKey(0), x)
    assert ch.apply(v, x).shape == x.shape
    # shared MLP: only 2 dense kernels
    assert set(v["params"].keys()) == {"fc1", "fc2"}

    sp = SpatialAttention()
    v = sp.init(jax.random.PRNGKey(0), x)
    assert sp.apply(v, x).shape == x.shape
    assert v["params"]["conv"]["kernel"].shape == (7, 7, 2, 1)

    hy = HybridAttention(channels=32, feature_size=(7, 7))
    v = hy.init(jax.random.PRNGKey(0), x, lms)
    assert hy.apply(v, x, lms).shape == x.shape


def test_attention_toggles():
    x = jnp.ones((2, 7, 7, 16))
    hy = HybridAttention(channels=16, use_landmark=False, use_spatial=False, use_channel=False)
    v = hy.init(jax.random.PRNGKey(0), x, None)
    out = hy.apply(v, x, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_full_model_contract():
    model = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=(64, 16))
    imgs = jnp.ones((2, 64, 64, 3)) * 0.3
    lms = jnp.ones((2, 5, 2)) * 112.0
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, imgs, lms)

    logits, features = model.apply(variables, imgs, lms, return_features=True)
    assert logits.shape == (2, 2)
    assert features.shape == (2, 1280)
    assert logits.dtype == jnp.float32

    logits2, none = model.apply(variables, imgs, lms)
    assert none is None
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-5)

    probs = model.apply(variables, imgs, lms, method=model.predict)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    emb = model.apply(variables, imgs, lms, method=model.embed)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4)


def test_train_mode_updates_batch_stats():
    model = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=(16,))
    imgs = jnp.ones((4, 64, 64, 3)) * 0.5
    lms = jnp.ones((4, 5, 2)) * 112.0
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, imgs, lms)
    (_, _), mutated = model.apply(
        variables, imgs, lms, train=True, return_features=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))


def test_classifiers():
    feats = jnp.ones((8, 1792))
    mlp = MLPClassifier(hidden_dims=(64, 16))
    v = mlp.init(jax.random.PRNGKey(0), feats)
    assert mlp.apply(v, feats).shape == (8, 2)

    attn = AttentionClassifier(hidden_dim=64)
    v = attn.init(jax.random.PRNGKey(0), feats)
    logits, w = attn.apply(v, feats, return_attention=True)
    assert logits.shape == (8, 2) and w.shape == (8, 1)
    seq = jnp.ones((8, 3, 1792))
    v = attn.init(jax.random.PRNGKey(0), seq)
    logits, w = attn.apply(v, seq, return_attention=True)
    assert logits.shape == (8, 2) and w.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)

    ens = EnsembleClassifier()
    v = ens.init(jax.random.PRNGKey(0), feats)
    soft = ens.apply(v, feats)
    assert soft.shape == (8, 2)
    np.testing.assert_allclose(np.exp(np.asarray(soft)).sum(-1), 1.0, rtol=1e-4)

    hard = EnsembleClassifier(voting="hard")
    v = hard.init(jax.random.PRNGKey(0), feats)
    out = hard.apply(v, feats)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_b4_param_count():
    # Reference prints ≈19M params for B4 backbone + head (feature_extractor.py:359-363).
    model = DeepfakeDetectionModel(variant="b4")
    imgs = jnp.zeros((1, 224, 224, 3))
    lms = jnp.ones((1, 5, 2)) * 112.0
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, imgs, lms)
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 18_000_000 < n < 21_000_000
