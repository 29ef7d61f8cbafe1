"""Train-step + trainer integration on an 8-device virtual mesh.

Replaces the reference's DummyModel/DummyDataset self-test
(``trainer.py:365-426``) with real pjit shardings: batch split over the
``data`` axis, params replicated, gradient psum inserted by XLA.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfake_vit_tpu.models import DeepfakeDetectionModel
from deepfake_vit_tpu.parallel import data_parallel_mesh, shard_batch
from deepfake_vit_tpu.training import (
    TrainState,
    Trainer,
    create_optimizer,
    create_scheduler,
    get_learning_rate,
    make_criterion,
    make_train_step,
    restore_train_state,
    set_learning_rate,
)
from deepfake_vit_tpu.utils import load_checkpoint


def tiny_model():
    return DeepfakeDetectionModel(variant="b0", classifier_hidden_dims=(16,))


def init_state(model, optimizer, batch):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["image"],
        batch["landmarks"],
    )
    opt_state = optimizer.init(variables["params"])
    return TrainState.create(variables["params"], variables["batch_stats"], opt_state)


def make_batch(rng, n=16, size=32):
    return {
        "image": rng.normal(size=(n, size, size, 3)).astype(np.float32),
        "label": rng.integers(0, 2, size=n).astype(np.int32),
        "landmarks": (rng.uniform(0, 224, size=(n, 5, 2))).astype(np.float32),
    }


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_train_step_runs_and_learns(rng):
    mesh = data_parallel_mesh()
    model = tiny_model()
    optimizer = create_optimizer({"type": "AdamW", "lr": 1e-3}, gradient_clip=1.0)
    criterion = make_criterion({"type": "CombinedLoss"})

    batch_host = make_batch(rng)
    batch = shard_batch(batch_host, mesh)
    state = init_state(model, optimizer, batch_host)
    step = make_train_step(model, criterion, optimizer, mesh=mesh, donate=False)

    key = jax.random.PRNGKey(0)
    state1, metrics1 = step(state, batch, key)
    assert np.isfinite(float(metrics1["loss"]))
    losses = [float(metrics1["loss"])]
    s = state1
    for _ in range(8):
        s, m = step(s, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(s.step) == 9


@pytest.mark.slow
def test_accumulation_matches_full_batch(rng):
    """Grad accumulation over microbatches ≈ one full-batch step (BN stats differ slightly)."""
    mesh = data_parallel_mesh(1)
    model = DeepfakeDetectionModel(
        variant="b0", classifier_hidden_dims=(16,), use_attention=False,
        feature_dropout_rate=0.0, dropout_rate=0.0,
    )
    optimizer = create_optimizer({"type": "SGD", "lr": 1e-2, "momentum": 0.0, "nesterov": False})
    criterion = make_criterion({"type": "CrossEntropy"})
    batch = make_batch(rng, n=8)
    state = init_state(model, optimizer, batch)

    step_full = make_train_step(model, criterion, optimizer, accumulation_steps=1, donate=False)
    step_acc = make_train_step(model, criterion, optimizer, accumulation_steps=2, donate=False)
    key = jax.random.PRNGKey(3)
    s_full, m_full = step_full(state, batch, key)
    s_acc, m_acc = step_acc(state, batch, key)

    # Same data; accumulated-mean loss should be close to full-batch loss
    # (not identical: BatchNorm normalizes per-microbatch, so activations —
    # and hence the loss — legitimately differ; this bounds the divergence).
    assert abs(float(m_full["loss"]) - float(m_acc["loss"])) < 0.35


def test_scheduler_lr_injection():
    optimizer = create_optimizer({"type": "AdamW", "lr": 1e-3})
    params = {"w": jnp.ones((4, 4))}
    opt_state = optimizer.init(params)
    assert get_learning_rate(opt_state) == pytest.approx(1e-3)
    opt_state = set_learning_rate(opt_state, 5e-4)
    assert get_learning_rate(opt_state) == pytest.approx(5e-4)

    sched = create_scheduler({"type": "CosineAnnealingWarmRestarts", "T_0": 10, "T_mult": 2}, 1e-3)
    lrs = [sched.step(e) for e in range(25)]
    assert lrs[0] == pytest.approx(1e-3)        # restart at epoch 0
    assert lrs[10] == pytest.approx(1e-3)       # restart at T_0
    assert min(lrs) >= 1e-6


@pytest.mark.slow
def test_trainer_end_to_end_with_checkpoint(rng, tmp_path):
    mesh = data_parallel_mesh()
    model = tiny_model()
    optimizer = create_optimizer({"type": "AdamW", "lr": 1e-3}, gradient_clip=1.0)
    criterion = make_criterion({"type": "CombinedLoss"})
    batches = [shard_batch(make_batch(rng), mesh) for _ in range(3)]
    state = init_state(model, optimizer, make_batch(rng))
    sched = create_scheduler({"type": "StepLR", "step_size": 1, "gamma": 0.5}, 1e-3)

    trainer = Trainer(
        model, state, optimizer, criterion,
        train_loader=batches, val_loader=batches[:1],
        scheduler=sched,
        config={"num_epochs": 2, "save_freq": 1, "save_dir": str(tmp_path), "print_freq": 100},
        mesh=mesh,
    )
    tracker = trainer.train()
    assert len(tracker.history["train_loss"]) == 2
    assert (tmp_path / "best_model.ckpt").exists()

    # Resume round-trip: restores params bit-exactly.
    ckpts = sorted(tmp_path.glob("checkpoint_epoch_*.ckpt"))
    assert ckpts
    saved = load_checkpoint(ckpts[-1])
    restored = restore_train_state(trainer.state, saved)
    a = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    trainer2 = Trainer(
        model, init_state(model, optimizer, make_batch(rng)), optimizer, criterion,
        train_loader=batches, val_loader=batches[:1], scheduler=sched,
        config={"num_epochs": 2, "save_dir": str(tmp_path)}, mesh=mesh,
    )
    next_epoch = trainer2.resume_from_checkpoint(ckpts[-1])
    assert next_epoch == 2
