"""Parity: the s2d-4 early-stage runner matches the plain backbone.

The runner (models/s2d_early.py) re-expresses stem + blocks 0-2 (the 112²
portion) in a block-4 space-to-depth domain; its output must equal the
plain backbone's block-2 activation, and resuming the plain backbone at
start_block=3 from it must reproduce full-network features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models.efficientnet import EfficientNetBackbone
from deepfake_vit_tpu.models.s2d_early import S2DEarlyRunner, _phase_taps


def test_phase_tap_algebra_covers_all_taps():
    # stem: k3 s2 on 224, s2d-4 in → s2d-2 out: taps stay within 2 rows
    taps, ky0, ky1 = _phase_taps(3, 2, 4, 2, 224)
    assert (ky0, ky1) == (0, 1)
    assert len(taps) == 6  # 2 out-phases × 3 kernel taps
    # s1 depthwise k3: 3-row support in the s2d domain
    taps, ky0, ky1 = _phase_taps(3, 1, 2, 2, 112)
    assert (ky0, ky1) == (-1, 1)
    # s2 depthwise k3 s2: phase collapse, 2-row support
    taps, ky0, ky1 = _phase_taps(3, 2, 2, 1, 112)
    assert (ky0, ky1) == (0, 1)


@pytest.fixture(scope="module")
def bb_and_vars():
    bb = EfficientNetBackbone(variant="b4", capture_indices=(2,),
                              dtype=jnp.bfloat16)
    v = bb.init(jax.random.PRNGKey(7), jnp.zeros((1, 224, 224, 3)))
    return bb, v


def test_s2d_early_matches_block2_activation(bb_and_vars):
    bb, v = bb_and_vars
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 224, 224, 3)), jnp.float32)

    _, inter = bb.apply(v, x, train=False, return_maps=True,
                        return_intermediate=True)
    ref = np.asarray(inter[2], np.float32)

    runner = S2DEarlyRunner("b4", v["params"], v["batch_stats"])
    assert runner.resume_block == 3
    out = np.asarray(runner(x), np.float32)

    assert out.shape == ref.shape == (2, 56, 56, 32)
    # bf16 activations accumulate rounding differences through 3 blocks;
    # the bound is the same order as two bf16 graphs with different
    # fusion/accumulation orders.
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_s2d_early_prob_parity_model_level():
    """Serving-path wiring (e2e.py use_s2d_early): class probabilities
    through s2d-early + resume must match the plain forward within the
    same gate the int8 tail ships under."""
    from deepfake_vit_tpu.models import DeepfakeDetectionModel

    model = DeepfakeDetectionModel(variant="b0", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    rngs = np.random.default_rng(3)
    imgs = jnp.asarray(rngs.normal(0, 1, (4, 224, 224, 3)), jnp.float32)
    lms = jnp.asarray(rngs.uniform(40, 180, (4, 5, 2)), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, imgs[:1], lms[:1])

    logits_ref, _ = model.apply(variables, imgs, lms, train=False,
                                return_features=True)
    probs_ref = jax.nn.softmax(logits_ref, axis=-1)

    bbp = variables["params"]["feature_extractor"]["backbone"]
    bbs = variables["batch_stats"]["feature_extractor"]["backbone"]
    s2d = S2DEarlyRunner("b0", bbp, bbs)
    logits_s, _ = model.apply(
        variables, s2d(imgs), lms, train=False, return_features=True,
        backbone_start_block=s2d.resume_block,
    )
    probs_s = jax.nn.softmax(logits_s, axis=-1)

    delta = np.abs(np.asarray(probs_s) - np.asarray(probs_ref))
    assert delta.max() < 0.03, f"s2d prob delta {delta.max():.4f}"


def test_pipeline_s2d_int8_branch_parity():
    """The e2e classify branch (use_s2d_early / use_int8_tail, possibly
    composed) must reproduce the plain pipeline's probabilities within the
    two gates' combined tolerance on identical frames."""
    from deepfake_vit_tpu.e2e import FusedPipeline

    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0", "dropout_rate": 0.2},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    kw = dict(detection_input_size=(128, 128), output_size=(224, 224),
              confidence_threshold=0.0, dtype=jnp.float32)
    plain = FusedPipeline(model_cfg, **kw)
    both = FusedPipeline(model_cfg, use_s2d_early=True, use_int8_tail=True,
                         **kw)
    det_vars, model_vars = plain.init_variables(jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    frames = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)
    p_ref = jax.device_get(plain.forward(det_vars, model_vars, frames))["probs"]
    p_opt = jax.device_get(both.forward(det_vars, model_vars, frames))["probs"]
    assert np.max(np.abs(p_opt - p_ref)) < 0.06


def test_s2d_early_full_network_resume(bb_and_vars):
    bb, v = bb_and_vars
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 224, 224, 3)), jnp.float32)

    ref_feats = np.asarray(bb.apply(v, x, train=False), np.float32)

    runner = S2DEarlyRunner("b4", v["params"], v["batch_stats"])
    feats = np.asarray(
        bb.apply(v, runner(x), train=False, start_block=runner.resume_block),
        np.float32,
    )
    assert feats.shape == ref_feats.shape
    # pooled 1792-dim features: relative agreement
    denom = np.maximum(np.abs(ref_feats), 1e-2)
    assert np.max(np.abs(feats - ref_feats) / denom) < 0.12
