"""Flagship (b4) multi-device training-graph compile coverage.

VERDICT round-2 weak #5: every prior multi-device training test (and the
driver dryrun) used b0, so the b4 pjit grad graph had never been compiled
anywhere. This slow-marked test jits the FULL b4 train step — CombinedLoss,
AdamW, gradient accumulation ≥ 2 — over a 2-device mesh at tiny spatial
dims and takes one real step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.models import DeepfakeDetectionModel
from deepfake_vit_tpu.parallel import make_mesh, shard_batch
from deepfake_vit_tpu.training import (
    TrainState, create_optimizer, make_criterion, make_train_step,
)


@pytest.mark.slow
def test_b4_train_step_compiles_on_mesh():
    mesh = make_mesh(("data",), (2,), jax.devices()[:2])
    model = DeepfakeDetectionModel(variant="b4", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    size = 64  # tiny spatial dims: the graph structure is what's under test
    imgs = np.random.default_rng(0).normal(0, 1, (4, size, size, 3)).astype(np.float32)
    lms = np.random.default_rng(1).uniform(0, size, (4, 5, 2)).astype(np.float32)
    variables = model.init(
        {"params": rng, "dropout": rng}, imgs[:1], lms[:1]
    )
    opt = create_optimizer({"type": "AdamW", "lr": 1e-4}, gradient_clip=1.0)
    crit = make_criterion({"type": "CombinedLoss"})
    state = TrainState.create(
        variables["params"], variables["batch_stats"], opt.init(variables["params"])
    )
    step = make_train_step(
        model, crit, opt, accumulation_steps=2, mesh=mesh, donate=False
    )
    batch = shard_batch(
        {
            "image": imgs,
            "label": np.arange(4, dtype=np.int32) % 2,
            "landmarks": lms,
        },
        mesh,
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(metrics)
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 1
