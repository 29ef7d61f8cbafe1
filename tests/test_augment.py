"""On-device augmentation (ops/augment.py): semantics + train-step wiring."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from deepfake_vit_tpu.ops.augment import (
    color_jitter,
    make_augment_fn,
    random_flip,
    random_rotation,
)


def test_flip_swaps_landmarks(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    lms = jnp.asarray(rng.uniform(0, 32, (8, 5, 2)), jnp.float32)
    out_i, out_l = random_flip(imgs, lms, jax.random.PRNGKey(0))
    flipped = ~np.isclose(np.asarray(out_i[:, 0, 0, 0]), np.asarray(imgs[:, 0, 0, 0]))
    # For flipped samples: left eye (idx 0) must be the mirrored right eye (idx 1)
    oi, ol, li = np.asarray(out_i), np.asarray(out_l), np.asarray(lms)
    for b in range(8):
        if np.allclose(oi[b], np.asarray(imgs)[b, :, ::-1, :]):
            np.testing.assert_allclose(ol[b, 0, 0], 31.0 - li[b, 1, 0], atol=1e-5)
            np.testing.assert_allclose(ol[b, 0, 1], li[b, 1, 1], atol=1e-5)
        else:
            np.testing.assert_allclose(ol[b], li[b], atol=1e-5)


def test_rotation_moves_landmarks_consistently(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    lms = jnp.asarray(rng.uniform(16, 48, (4, 5, 2)), jnp.float32)
    out_i, out_l = random_rotation(imgs, lms, jax.random.PRNGKey(3), max_degrees=10.0)
    assert out_i.shape == imgs.shape
    # Rotation preserves distance from center for landmarks
    c = 31.5
    r_before = np.linalg.norm(np.asarray(lms) - c, axis=-1)
    r_after = np.linalg.norm(np.asarray(out_l) - c, axis=-1)
    np.testing.assert_allclose(r_after, r_before, rtol=1e-3, atol=1e-2)


def test_color_jitter_bounded(rng):
    imgs = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 3)), jnp.float32)
    out = color_jitter(imgs, jax.random.PRNGKey(0), strength=0.1)
    assert out.shape == imgs.shape
    assert float(jnp.abs(out - imgs).max()) < 1.0  # gentle jitter


def test_make_augment_fn_config_gating(rng):
    assert make_augment_fn(None) is None
    assert make_augment_fn({"enabled": False, "random_flip": True}) is None
    fn = make_augment_fn({"enabled": True, "random_flip": True,
                          "random_rotation": 5, "color_jitter": 0.1})
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32),
        "landmarks": jnp.asarray(rng.uniform(4, 28, (4, 5, 2)), jnp.float32),
        "label": jnp.zeros(4, jnp.int32),
    }
    out = fn(batch, jax.random.PRNGKey(0))
    assert out["image"].shape == batch["image"].shape
    assert out["landmarks"].shape == (4, 5, 2)
    np.testing.assert_array_equal(np.asarray(out["label"]), 0)


@pytest.mark.slow
def test_train_step_with_augmentation(rng):
    from deepfake_vit_tpu.models import DeepfakeDetectionModel
    from deepfake_vit_tpu.training import TrainState, create_optimizer, make_criterion, make_train_step

    model = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=(8,))
    opt = create_optimizer({"type": "SGD", "lr": 1e-2, "momentum": 0.0, "nesterov": False})
    crit = make_criterion({"type": "CrossEntropy"})
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "landmarks": jnp.asarray(rng.uniform(0, 32, (4, 5, 2)), jnp.float32),
    }
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch["image"], batch["landmarks"])
    state = TrainState.create(v["params"], v["batch_stats"], opt.init(v["params"]))
    aug = make_augment_fn({"enabled": True, "random_flip": True, "color_jitter": 0.1})
    step = make_train_step(model, crit, opt, augment_fn=aug, donate=False)
    s, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_train_step_with_remat(rng):
    """remat=True produces the same loss as remat=False (it only changes
    what the backward rematerializes)."""
    import jax
    import jax.numpy as jnp
    from deepfake_vit_tpu.models import DeepfakeDetectionModel
    from deepfake_vit_tpu.training import TrainState, create_optimizer, make_criterion, make_train_step

    model = DeepfakeDetectionModel(
        variant="b0", classifier_hidden_dims=(8,), feature_dropout_rate=0.0, dropout_rate=0.0
    )
    opt = create_optimizer({"type": "SGD", "lr": 1e-2, "momentum": 0.0, "nesterov": False})
    crit = make_criterion({"type": "CrossEntropy"})
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "landmarks": jnp.asarray(rng.uniform(0, 32, (4, 5, 2)), jnp.float32),
    }
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch["image"], batch["landmarks"])
    state = TrainState.create(v["params"], v["batch_stats"], opt.init(v["params"]))
    key = jax.random.PRNGKey(2)
    s1, m1 = make_train_step(model, crit, opt, donate=False, remat=False)(state, batch, key)
    s2, m2 = make_train_step(model, crit, opt, donate=False, remat=True)(state, batch, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-3)
