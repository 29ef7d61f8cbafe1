"""S2D-Lite detector (models/lite_detector.py): output contract, stem-pool
fold exactness, trainability, and FusedPipeline integration.

The family shares the ScrfdDetector contract so the decode/NMS/training
machinery is exercised unchanged; these tests pin the parts that are new —
the space-to-depth stem and its pool fold."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfake_vit_tpu.models.lite_detector import (
    LiteDetector,
    fold_stem_pool_params_lite,
    space_to_depth,
)


def test_space_to_depth_layout():
    # channel c = (a·f + b)·C + rgb for block position (a, b)
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    y = np.asarray(space_to_depth(jnp.asarray(x), 4))
    assert y.shape == (2, 2, 2, 48)
    for a in range(4):
        for b in range(4):
            for c in range(3):
                np.testing.assert_array_equal(
                    y[:, :, :, (a * 4 + b) * 3 + c], x[:, a::4, b::4, c]
                )


def test_output_contract_shapes():
    det = LiteDetector(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 320, 320, 3)), jnp.float32)
    v = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(v, x, train=False)
    for s in (8, 16, 32):
        n = (320 // s) ** 2 * 2
        assert out[s]["scores"].shape == (2, n)
        assert out[s]["bbox"].shape == (2, n, 4)
        assert out[s]["kps"].shape == (2, n, 10)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    assert n_params < 2_600_000  # the point of the family: ultra-light (~2.1M)


def test_stem_pool_fold_exact():
    """pool(2×) → s2d(4) → net == s2d(8) folded stem on full-res frames
    (fold_stem_pool_params_lite) — exact to accumulation order."""
    from deepfake_vit_tpu.ops.warp import _avg_pool2

    det = LiteDetector(dtype=jnp.float32)
    det_folded = LiteDetector(dtype=jnp.float32, stem_pool=2)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)), jnp.float32)
    pooled = _avg_pool2(frames)
    v = det.init(jax.random.PRNGKey(0), pooled)
    ref = det.apply(v, pooled, train=False)
    out = det_folded.apply(fold_stem_pool_params_lite(v, 2), frames, train=False)
    for s in ref:
        for k in ref[s]:
            np.testing.assert_allclose(
                np.asarray(out[s][k]), np.asarray(ref[s][k]), atol=2e-4
            )


def test_train_step_decreases_loss():
    """The shared FCOS-style trainer (training/detection.py) fits the lite
    net: loss decreases on a fixed tiny batch."""
    from deepfake_vit_tpu.training import create_optimizer
    from deepfake_vit_tpu.training.detection import make_detector_train_step

    size = 64
    det = LiteDetector(dtype=jnp.float32)
    rng = np.random.default_rng(2)
    batch = {
        "image": rng.uniform(0, 255, (4, size, size, 3)).astype(np.float32),
        "boxes": np.tile(np.asarray([[10.0, 12.0, 50.0, 56.0]], np.float32), (4, 2, 1)),
        "kps": np.tile(
            rng.uniform(15, 45, (1, 1, 5, 2)).astype(np.float32), (4, 2, 1, 1)
        ),
        "valid": np.tile(np.asarray([[1.0, 0.0]], np.float32), (4, 1)),
    }
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    opt = create_optimizer({"type": "AdamW", "lr": 3e-3}, gradient_clip=5.0)
    opt_state = opt.init(variables["params"])
    step = make_detector_train_step(det, opt, (size, size), mesh=None)
    params, stats = variables["params"], variables["batch_stats"]
    losses = []
    for _ in range(8):
        params, stats, opt_state, metrics = step(params, stats, opt_state, batch)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_fused_pipeline_lite_arch():
    """FusedPipeline(detector_arch='lite'): full contract at a decoupled
    serving size (exercises the lite stem-pool fold in the serving graph)."""
    from deepfake_vit_tpu.e2e import FusedPipeline

    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    pipe = FusedPipeline(
        model_cfg, detection_input_size=(128, 128), output_size=(64, 64),
        serving_size=(256, 256), confidence_threshold=0.0,
        dtype=jnp.float32, detector_arch="lite",
    )
    det_vars, model_vars = pipe.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.uniform(0, 255, (2, 256, 256, 3)), jnp.float32)
    out = jax.device_get(pipe.forward(det_vars, model_vars, frames))
    assert out["probs"].shape == (2, 2)
    assert out["bbox"].shape == (2, 4)
    assert out["landmarks"].shape == (2, 5, 2)
    assert np.all(np.isfinite(out["fake_prob"]))


def test_int8_detector_rejected_for_lite():
    import pytest

    from deepfake_vit_tpu.e2e import FusedPipeline

    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    with pytest.raises(ValueError):
        FusedPipeline(model_cfg, detection_input_size=(128, 128),
                      detector_arch="lite", use_int8_detector=True)
