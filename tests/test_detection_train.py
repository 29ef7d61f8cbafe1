"""Detector training: assignment correctness + loss decreases on a tiny
synthetic overfit task (capability the reference lacks — SURVEY §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models.scrfd import ScrfdDetector
from deepfake_vit_tpu.ops.anchors import all_anchor_centers
from deepfake_vit_tpu.training import create_optimizer
from deepfake_vit_tpu.training.detection import (
    assign_targets,
    detection_loss,
    iou_loss,
    make_detector_train_step,
)


def test_assignment_levels():
    centers_np, strides_np = all_anchor_centers((128, 128))
    centers, strides = jnp.asarray(centers_np), jnp.asarray(strides_np)

    # Small face (32px) → stride 8; large face (128px min side) → stride 32.
    gt_boxes = jnp.asarray([[10.0, 10.0, 42.0, 42.0], [0.0, 0.0, 128.0, 128.0]])
    gt_kps = jnp.zeros((2, 5, 2))
    gt_valid = jnp.asarray([1.0, 1.0])

    t = assign_targets(centers, strides, gt_boxes, gt_kps, gt_valid)
    pos = np.asarray(t["pos"])
    s = np.asarray(strides)
    assert pos.any()
    # positives for the small face only at stride 8
    small_pos = pos & (np.asarray(t["box"])[:, 2] == 42.0)
    assert set(np.unique(s[small_pos])) == {8.0}
    big_pos = pos & (np.asarray(t["box"])[:, 2] == 128.0)
    assert set(np.unique(s[big_pos])) == {32.0}

    # invalid GTs assign nothing
    t2 = assign_targets(centers, strides, gt_boxes, gt_kps, jnp.zeros(2))
    assert not np.asarray(t2["pos"]).any()


def test_iou_loss_perfect_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(np.asarray(iou_loss(a, a)), 0.0, atol=1e-6)
    b = jnp.asarray([[20.0, 20.0, 30.0, 30.0]])
    np.testing.assert_allclose(np.asarray(iou_loss(a, b)), 1.0, atol=1e-6)


@pytest.mark.slow
def test_detector_overfits_synthetic():
    model = ScrfdDetector(widths=(8, 16, 24, 32), fpn_width=16, head_width=16, head_depth=1)
    size = (64, 64)
    rng = np.random.default_rng(0)

    imgs = rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([[12.0, 12.0, 44.0, 44.0]], np.float32), (4, 2, 1))
    boxes[:, 1] = 0  # second slot invalid
    kps = np.tile(rng.uniform(16, 40, (1, 1, 5, 2)).astype(np.float32), (4, 2, 1, 1))
    valid = np.tile(np.asarray([1.0, 0.0], np.float32), (4, 1))
    batch = {
        "image": jnp.asarray(imgs),
        "boxes": jnp.asarray(boxes),
        "kps": jnp.asarray(kps),
        "valid": jnp.asarray(valid),
    }

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
    optimizer = create_optimizer({"type": "AdamW", "lr": 5e-3}, gradient_clip=5.0)
    opt_state = optimizer.init(variables["params"])

    step = make_detector_train_step(model, optimizer, size)
    params, stats = variables["params"], variables["batch_stats"]
    losses = []
    for _ in range(30):
        params, stats, opt_state, metrics = step(params, stats, opt_state, batch)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"detector loss did not decrease: {losses[::6]}"
    assert float(metrics["num_pos"]) > 0
