"""LR-scheduler golden parity vs torch.optim.lr_scheduler (the reference's
scheduler factory semantics, scripts/train.py:71-110)."""

import numpy as np
import pytest
import torch

from deepfake_vit_tpu.training import (
    CosineAnnealingLR,
    CosineAnnealingWarmRestarts,
    ReduceLROnPlateau,
    StepLR,
    create_scheduler,
)

BASE_LR = 1e-3
EPOCHS = 40


def _torch_lrs(sched_cls, opt_kwargs, **kwargs):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = sched_cls(opt, **kwargs)
    lrs = []
    for _ in range(EPOCHS):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step(**opt_kwargs) if opt_kwargs else sched.step()
    return lrs


def test_step_lr_parity():
    ref = _torch_lrs(torch.optim.lr_scheduler.StepLR, None, step_size=7, gamma=0.3)
    ours = StepLR(BASE_LR, step_size=7, gamma=0.3)
    got = [ours.step(e) for e in range(EPOCHS)]
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_cosine_annealing_parity():
    ref = _torch_lrs(torch.optim.lr_scheduler.CosineAnnealingLR, None, T_max=15, eta_min=1e-6)
    ours = CosineAnnealingLR(BASE_LR, T_max=15, eta_min=1e-6)
    got = [ours.step(e) for e in range(EPOCHS)]
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_warm_restarts_parity():
    ref = _torch_lrs(
        torch.optim.lr_scheduler.CosineAnnealingWarmRestarts, None, T_0=6, T_mult=2, eta_min=1e-6
    )
    ours = CosineAnnealingWarmRestarts(BASE_LR, T_0=6, T_mult=2, eta_min=1e-6)
    got = [ours.step(e) for e in range(EPOCHS)]
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_reduce_on_plateau_parity():
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3, min_lr=1e-6, threshold=1e-4,
        threshold_mode="abs",
    )
    ours = ReduceLROnPlateau(BASE_LR, mode="min", factor=0.5, patience=3, min_lr=1e-6)

    # plateauing loss sequence: improves, then flat
    losses = [1.0, 0.8, 0.6, 0.6, 0.6, 0.6, 0.6, 0.6, 0.6, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]
    ref_lrs, got_lrs = [], []
    for e, loss in enumerate(losses):
        tsched.step(loss)
        ref_lrs.append(opt.param_groups[0]["lr"])
        got_lrs.append(ours.step(e, loss))
    np.testing.assert_allclose(got_lrs, ref_lrs, rtol=1e-6)


def test_factory_dispatch():
    for cfg, cls in (
        ({"type": "StepLR"}, StepLR),
        ({"type": "CosineAnnealingLR"}, CosineAnnealingLR),
        ({"type": "CosineAnnealingWarmRestarts"}, CosineAnnealingWarmRestarts),
        ({"type": "ReduceLROnPlateau"}, ReduceLROnPlateau),
    ):
        assert isinstance(create_scheduler(cfg, BASE_LR), cls)
