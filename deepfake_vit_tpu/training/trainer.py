"""Trainer — the training engine.

Capability parity with reference ``src/training/trainer.py:23-361``:
default config (epochs 100, grad-clip 1.0, accumulation 1, early-stop
patience 15 / min_delta 1e-3, save_freq 5), per-epoch loop of
train → validate → scheduler.step (ReduceLROnPlateau fed val loss) →
checkpoint on save_freq or new best val-accuracy → early stop on stagnant
val loss, rotating checkpoints with a best copy, and full resume
(params/opt_state/scheduler/epoch).

TPU-native engine: the epoch body is one jitted ``train_step`` over a
named mesh; the host loop only feeds sharded batches and reads scalar
metrics, so steps overlap with host data loading via JAX's async dispatch.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..utils.io_utils import load_checkpoint, save_checkpoint
from .evaluator import Evaluator, MetricsTracker
from .optim import LRScheduler, get_learning_rate, set_learning_rate
from .train_state import TrainState, make_train_step

_DEFAULTS = dict(
    num_epochs=100,
    gradient_clip=1.0,
    accumulation_steps=1,
    use_amp=True,
    early_stopping_patience=15,
    early_stopping_min_delta=1e-3,
    save_freq=5,
    print_freq=10,
    max_keep=5,
    save_dir="checkpoints",
    save_best_only=False,
    remat=False,
    tb_dir=None,
)


def _rss_mb() -> float:
    """Resident set size in MB (Linux /proc; 0.0 where unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


class Trainer:
    def __init__(
        self,
        model,
        state: TrainState,
        optimizer,
        criterion: Callable,
        train_loader: Iterable,
        val_loader: Iterable,
        scheduler: Optional[LRScheduler] = None,
        config: Optional[Dict[str, Any]] = None,
        use_landmarks: bool = True,
        mesh=None,
        rng: Optional[jax.Array] = None,
        logger=None,
        augment_fn=None,
    ):
        self.model = model
        self.state = state
        self.optimizer = optimizer
        self.criterion = criterion
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.scheduler = scheduler
        self.mesh = mesh
        self.logger = logger
        self.config = {**_DEFAULTS, **(config or {})}
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        self.train_step = make_train_step(
            model,
            criterion,
            optimizer,
            accumulation_steps=self.config["accumulation_steps"],
            use_landmarks=use_landmarks,
            mesh=mesh,
            augment_fn=augment_fn,
            remat=self.config["remat"],
        )
        self.evaluator = Evaluator(model, criterion, use_landmarks, mesh)
        self.tracker = MetricsTracker()
        # TensorBoard-format event writer (utils/tb_writer.py — no
        # tensorboard package needed); closes the reference's declared-but-
        # never-written runs/ intent.
        self.tb = None
        if self.config.get("tb_dir"):
            from ..utils.tb_writer import SummaryWriter

            self.tb = SummaryWriter(self.config["tb_dir"])

        self._early_stop_best: Optional[float] = None
        self._early_stop_count = 0

    # ------------------------------------------------------------------
    def _log(self, msg: str) -> None:
        (self.logger.info if self.logger else print)(msg)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        # Pin the loader's shuffle order to the epoch index so data order is
        # a pure function of (seed, epoch) — exact-order resume regardless of
        # how many iterators were created or abandoned before this epoch.
        set_epoch = getattr(self.train_loader, "set_epoch", None)
        if callable(set_epoch):
            set_epoch(epoch)
        sums: Dict[str, float] = {}
        n = 0
        t0 = time.perf_counter()
        for i, batch in enumerate(self.train_loader):
            self.state, metrics = self.train_step(self.state, batch, self.rng)
            n += 1
            if (i + 1) % max(self.config["print_freq"], 1) == 0:
                m = jax.device_get(metrics)
                self._log(
                    f"epoch {epoch} step {i + 1}: "
                    f"loss={float(m['loss']):.4f} acc={float(m['accuracy']):.4f}"
                )
            metrics = jax.device_get(metrics)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        elapsed = time.perf_counter() - t0
        if n == 0:
            return {"loss": float("nan"), "accuracy": float("nan"), "epoch_time_s": elapsed}
        out = {k: v / n for k, v in sums.items()}
        out["epoch_time_s"] = elapsed
        out["steps_per_sec"] = n / elapsed if elapsed > 0 else float("nan")
        return out

    def validate(self, epoch: int) -> Dict[str, Any]:
        return self.evaluator.evaluate(self.state, self.val_loader)

    # ------------------------------------------------------------------
    def train(self, start_epoch: int = 0) -> MetricsTracker:
        total_t0 = time.perf_counter()
        num_epochs = self.config["num_epochs"]
        for epoch in range(start_epoch, num_epochs):
            train_metrics = self.train_epoch(epoch)
            val_metrics = self.validate(epoch)

            lr = None
            if self.scheduler is not None:
                lr = self.scheduler.step(epoch + 1, val_metrics.get("loss"))
                self.state = self.state.replace(
                    opt_state=set_learning_rate(self.state.opt_state, lr)
                )
            else:
                lr = get_learning_rate(self.state.opt_state)

            is_best = self.tracker.update(epoch, train_metrics, val_metrics, lr)
            periodic = (epoch + 1) % self.config["save_freq"] == 0
            if is_best or (periodic and not self.config["save_best_only"]):
                self.save_checkpoint(epoch, is_best=is_best)

            rss = _rss_mb()
            if self.tb is not None:
                self.tb.add_scalars(
                    {
                        "train/loss": train_metrics["loss"],
                        "train/accuracy": train_metrics["accuracy"],
                        "val/loss": val_metrics["loss"],
                        "val/accuracy": val_metrics["accuracy"],
                        "val/roc_auc": val_metrics.get("roc_auc", float("nan")),
                        "lr": lr if lr is not None else float("nan"),
                        "host/rss_mb": rss,
                    },
                    step=epoch + 1,
                )
                self.tb.flush()

            self._log(
                f"[epoch {epoch + 1}/{num_epochs}] "
                f"train_loss={train_metrics['loss']:.4f} train_acc={train_metrics['accuracy']:.4f} "
                f"val_loss={val_metrics['loss']:.4f} val_acc={val_metrics['accuracy']:.4f} "
                f"val_auc={val_metrics.get('roc_auc', float('nan')):.4f} "
                f"lr={lr if lr is not None else float('nan'):.2e} "
                f"rss={rss:.0f}MB "
                f"({train_metrics['epoch_time_s']:.1f}s)"
                + (" *best*" if is_best else "")
            )

            if self._early_stopping(val_metrics["loss"]):
                self._log(f"early stopping at epoch {epoch + 1}")
                break

        self._log(f"training done in {time.perf_counter() - total_t0:.1f}s")
        if self.tb is not None:
            self.tb.close()
        self.tracker.summary(self.logger)
        return self.tracker

    def _early_stopping(self, val_loss: float) -> bool:
        min_delta = self.config["early_stopping_min_delta"]
        if self._early_stop_best is None or val_loss < self._early_stop_best - min_delta:
            self._early_stop_best = val_loss
            self._early_stop_count = 0
            return False
        self._early_stop_count += 1
        return self._early_stop_count >= self.config["early_stopping_patience"]

    # ------------------------------------------------------------------
    def save_checkpoint(self, epoch: int, is_best: bool = False) -> Path:
        state_dict = {
            "epoch": epoch,
            "step": int(self.state.step),
            "params": serialization.to_state_dict(self.state.params),
            "batch_stats": serialization.to_state_dict(self.state.batch_stats),
            "opt_state": serialization.to_state_dict(self.state.opt_state),
            "metrics": self.tracker.state_dict(),
            "best_metrics": self.tracker.best_metrics,
            "scheduler": self.scheduler.state_dict() if self.scheduler else None,
            "config": {
                k: v for k, v in self.config.items() if isinstance(v, (int, float, str, bool))
            },
        }
        return save_checkpoint(
            state_dict,
            self.config["save_dir"],
            is_best=is_best,
            max_keep=self.config["max_keep"],
        )

    def resume_from_checkpoint(self, path) -> int:
        """Restore model/opt/scheduler state; returns the next epoch index."""
        ckpt = load_checkpoint(path)
        self.state = restore_train_state(self.state, ckpt)
        if self.scheduler is not None and ckpt.get("scheduler"):
            self.scheduler.load_state_dict(ckpt["scheduler"])
        if ckpt.get("metrics"):
            self.tracker.load_state_dict(_delistify(ckpt["metrics"]))
        epoch = int(ckpt.get("epoch", -1))
        self._log(f"resumed from {path} at epoch {epoch}")
        return epoch + 1


def restore_train_state(
    template: TrainState, ckpt: Dict[str, Any], restore_opt: bool = True
) -> TrainState:
    """Rebuild a TrainState from a checkpoint using ``template``'s structure.

    ``restore_opt=False`` keeps the template's optimizer state — for
    eval-only consumers whose optimizer chain need not match the one that
    produced the checkpoint.
    """
    params = serialization.from_state_dict(template.params, ckpt["params"])
    batch_stats = serialization.from_state_dict(template.batch_stats, ckpt["batch_stats"])
    opt_state = template.opt_state
    if restore_opt:
        opt_state = serialization.from_state_dict(template.opt_state, ckpt["opt_state"])
    step = jnp.asarray(ckpt.get("step", 0), jnp.int32)
    return template.replace(
        step=step, params=params, batch_stats=batch_stats, opt_state=opt_state
    )


def _delistify(obj):
    """msgpack may round-trip dicts of lists with numpy scalars; normalize."""
    if isinstance(obj, dict):
        return {k: _delistify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_delistify(v) for v in obj]
    if isinstance(obj, (np.generic,)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
