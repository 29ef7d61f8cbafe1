"""Trainer/loader edge behaviors (early stopping, epoch reshuffle,
empty eval loader, latest-checkpoint discovery)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepfake_vit_tpu.data.dataset import HostLoader
from deepfake_vit_tpu.models import DeepfakeDetectionModel
from deepfake_vit_tpu.training import (
    TrainState,
    Trainer,
    create_optimizer,
    make_criterion,
)
from deepfake_vit_tpu.utils import latest_checkpoint, save_checkpoint


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "image": np.full((4, 4, 3), i, np.float32),
            "label": np.int32(i % 2),
            "image_id": str(i),
            "dataset": "x",
            "quality_score": np.float32(1.0),
        }


def test_host_loader_reshuffles_each_epoch():
    loader = HostLoader(_DS(32), batch_size=8, shuffle=True, seed=3,
                        process_index=0, process_count=1)
    first = [b["image"][:, 0, 0, 0].astype(int).tolist() for b in loader]
    second = [b["image"][:, 0, 0, 0].astype(int).tolist() for b in loader]
    assert first != second  # epoch advanced → different order
    assert sorted(sum(first, [])) == sorted(sum(second, []))  # same coverage

    loader.set_epoch(0)
    again = [b["image"][:, 0, 0, 0].astype(int).tolist() for b in loader]
    assert again == first  # set_epoch restores determinism


def test_early_stopping_counts_and_min_delta(rng):
    model = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=(8,))
    opt = create_optimizer({"type": "AdamW", "lr": 1e-4})
    crit = make_criterion({"type": "CrossEntropy"})
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "landmarks": jnp.asarray(rng.uniform(0, 32, (4, 5, 2)), jnp.float32),
    }
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   batch["image"], batch["landmarks"])
    state = TrainState.create(v["params"], v["batch_stats"], opt.init(v["params"]))
    trainer = Trainer(
        model, state, opt, crit, train_loader=[batch], val_loader=[batch],
        config={"early_stopping_patience": 3, "early_stopping_min_delta": 0.01},
    )
    # improving → no stop
    assert not trainer._early_stopping(1.0)
    assert not trainer._early_stopping(0.9)
    # improvements below min_delta count as stagnation
    assert not trainer._early_stopping(0.895)
    assert not trainer._early_stopping(0.893)
    assert trainer._early_stopping(0.892)  # 3rd stagnant epoch → stop
    # a real improvement resets the counter
    trainer2 = Trainer(
        model, state, opt, crit, train_loader=[batch], val_loader=[batch],
        config={"early_stopping_patience": 2, "early_stopping_min_delta": 0.01},
    )
    assert not trainer2._early_stopping(1.0)
    assert not trainer2._early_stopping(1.0)
    assert not trainer2._early_stopping(0.5)  # reset
    assert not trainer2._early_stopping(0.5)
    assert trainer2._early_stopping(0.5)


def test_evaluator_empty_loader(rng):
    model = DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=(8,))
    crit = make_criterion({"type": "CrossEntropy"})
    from deepfake_vit_tpu.training import Evaluator

    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 5, 2)),
    )
    opt = create_optimizer({"type": "AdamW", "lr": 1e-4})
    state = TrainState.create(v["params"], v["batch_stats"], opt.init(v["params"]))
    out = Evaluator(model, crit).evaluate(state, [])
    assert out["num_samples"] == 0 and np.isnan(out["loss"])


def test_latest_checkpoint_discovery(tmp_path):
    assert latest_checkpoint(tmp_path / "nope") is None
    for e in (0, 1, 2):
        save_checkpoint({"epoch": e, "params": {"w": np.zeros(2)}}, tmp_path, max_keep=0)
    found = latest_checkpoint(tmp_path)
    assert found is not None and "0002" in found.name
