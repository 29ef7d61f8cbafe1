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
