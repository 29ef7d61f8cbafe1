"""Optimizer + LR-scheduler factories.

Capability parity with reference ``scripts/train.py:37-110``:
optimizers Adam/AdamW/SGD(momentum, nesterov); schedulers StepLR /
CosineAnnealingLR / ReduceLROnPlateau / CosineAnnealingWarmRestarts with
torch's per-epoch stepping semantics.

TPU-native design: the optimizer is built with ``optax.inject_hyperparams``
so the learning rate lives inside ``opt_state`` — the host updates it once
per epoch (scheduler step) without recompiling the jitted train step, and
ReduceLROnPlateau's data-dependent decision stays host-side where it
belongs (it would otherwise force a device→host sync inside the step).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import optax


def create_optimizer(opt_cfg: Dict[str, Any], gradient_clip: Optional[float] = None):
    """Build an optax transform from the model_config 'optimizer' block."""
    kind = opt_cfg.get("type", "AdamW")
    lr = float(opt_cfg.get("lr", 1e-4))
    wd = float(opt_cfg.get("weight_decay", 1e-4))
    betas = opt_cfg.get("betas", [0.9, 0.999])

    if kind == "Adam":
        base = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=betas[0], b2=betas[1]
        )
    elif kind == "AdamW":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=betas[0], b2=betas[1], weight_decay=wd
        )
    elif kind == "SGD":
        base = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr,
            momentum=float(opt_cfg.get("momentum", 0.9)),
            nesterov=bool(opt_cfg.get("nesterov", True)),
        )
    else:
        raise ValueError(f"unknown optimizer: {kind}")

    if gradient_clip and gradient_clip > 0:
        return optax.chain(optax.clip_by_global_norm(float(gradient_clip)), base)
    return base


def create_optimizer_with_param_groups(
    params,
    base_lr: float = 1e-4,
    group_lr_scale: Optional[Dict[str, float]] = None,
    weight_decay: float = 1e-4,
    gradient_clip: Optional[float] = None,
    frozen_mask=None,
):
    """Discriminative-LR optimizer over stem/blocks/head param groups.

    Capability parity with the reference fine-tune variant's 3-group LR
    policy (``efficientnet.py:255-292``: stem 0.1×, blocks 0.5×, head 1×)
    and its staged freezing (``:219-241``), expressed functionally:
    ``optax.multi_transform`` routes each leaf to its group's AdamW, and an
    optional boolean ``frozen_mask`` (from models.frozen_stage_mask) zeroes
    updates for frozen leaves.
    """
    from ..models.efficientnet import param_group_labels

    scales = {"stem": 0.1, "blocks": 0.5, "head": 1.0, **(group_lr_scale or {})}
    labels = param_group_labels(params)
    transforms = {
        name: optax.inject_hyperparams(optax.adamw)(
            learning_rate=base_lr * scale, weight_decay=weight_decay
        )
        for name, scale in scales.items()
    }
    tx = optax.multi_transform(transforms, labels)
    chain = [tx]
    if frozen_mask is not None:
        chain.append(optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda t: not t, frozen_mask)))
    if gradient_clip and gradient_clip > 0:
        chain.insert(0, optax.clip_by_global_norm(float(gradient_clip)))
    return optax.chain(*chain) if len(chain) > 1 else tx


def set_learning_rate(opt_state, lr: float):
    """Write a new learning rate into an inject_hyperparams opt_state."""

    def _set(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            hp = dict(state.hyperparams)
            hp["learning_rate"] = jax.numpy.asarray(lr, dtype=hp["learning_rate"].dtype)
            return state._replace(hyperparams=hp)
        return state

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        return tuple(_set(s) for s in opt_state)
    return _set(opt_state)


def get_learning_rate(opt_state) -> Optional[float]:
    states = opt_state if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams") else (opt_state,)
    for s in states:
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            return float(s.hyperparams["learning_rate"])
    return None


class LRScheduler:
    """Per-epoch scheduler protocol: ``lr = sched.step(epoch, val_loss)``."""

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.__dict__.update(state)


class StepLR(LRScheduler):
    def __init__(self, base_lr: float, step_size: int = 30, gamma: float = 0.1):
        self.base_lr, self.step_size, self.gamma = base_lr, step_size, gamma

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        return self.base_lr * self.gamma ** (epoch // self.step_size)


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr: float, T_max: int = 50, eta_min: float = 1e-6):
        self.base_lr, self.T_max, self.eta_min = base_lr, T_max, eta_min

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * epoch / self.T_max)
        ) / 2


class CosineAnnealingWarmRestarts(LRScheduler):
    """SGDR: cosine anneal within restart cycles of length T_0·T_mult^i."""

    def __init__(self, base_lr: float, T_0: int = 10, T_mult: int = 2, eta_min: float = 1e-6):
        self.base_lr, self.T_0, self.T_mult, self.eta_min = base_lr, T_0, T_mult, eta_min

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        t_cur, t_i = float(epoch), float(self.T_0)
        while t_cur >= t_i:
            t_cur -= t_i
            t_i *= self.T_mult
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * t_cur / t_i)
        ) / 2


class ReduceLROnPlateau(LRScheduler):
    def __init__(
        self,
        base_lr: float,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 5,
        min_lr: float = 1e-6,
        threshold: float = 1e-4,
    ):
        self.lr = base_lr
        self.mode, self.factor, self.patience = mode, factor, patience
        self.min_lr, self.threshold = min_lr, threshold
        self.best: Optional[float] = None
        self.num_bad = 0

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        if val_loss is None:
            return self.lr
        improved = (
            self.best is None
            or (self.mode == "min" and val_loss < self.best - self.threshold)
            or (self.mode == "max" and val_loss > self.best + self.threshold)
        )
        if improved:
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class ConstantLR(LRScheduler):
    def __init__(self, base_lr: float):
        self.base_lr = base_lr

    def step(self, epoch: int, val_loss: Optional[float] = None) -> float:
        return self.base_lr


def create_scheduler(sched_cfg: Optional[Dict[str, Any]], base_lr: float) -> LRScheduler:
    """Build a scheduler from the model_config 'scheduler' block."""
    if not sched_cfg:
        return ConstantLR(base_lr)
    kind = sched_cfg.get("type", "CosineAnnealingWarmRestarts")
    if kind in (None, "none", "None"):
        return ConstantLR(base_lr)
    if kind == "StepLR":
        return StepLR(base_lr, int(sched_cfg.get("step_size", 30)), float(sched_cfg.get("gamma", 0.1)))
    if kind == "CosineAnnealingLR":
        return CosineAnnealingLR(base_lr, int(sched_cfg.get("T_max", 50)), float(sched_cfg.get("eta_min", 1e-6)))
    if kind == "CosineAnnealingWarmRestarts":
        return CosineAnnealingWarmRestarts(
            base_lr,
            int(sched_cfg.get("T_0", 10)),
            int(sched_cfg.get("T_mult", 2)),
            float(sched_cfg.get("eta_min_restart", sched_cfg.get("eta_min", 1e-6))),
        )
    if kind == "ReduceLROnPlateau":
        return ReduceLROnPlateau(
            base_lr,
            mode=sched_cfg.get("mode", "min"),
            factor=float(sched_cfg.get("factor", 0.5)),
            patience=int(sched_cfg.get("patience", 5)),
            min_lr=float(sched_cfg.get("min_lr", 1e-6)),
        )
    raise ValueError(f"unknown scheduler: {kind}")
