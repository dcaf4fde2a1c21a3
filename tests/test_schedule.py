"""LR schedule vs the actual torch SequentialLR(LinearLR → CosineAnnealing)
oracle the reference uses (train.py:249-260)."""

import numpy as np
import torch

from btsbot_tpu.engine.schedule import lr_at_epoch, make_lr_schedule


def _torch_lrs(base_lr, epochs, warmup):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.SequentialLR(
        opt,
        schedulers=[
            torch.optim.lr_scheduler.LinearLR(
                opt, start_factor=0.01, total_iters=warmup),
            torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=max(1, epochs - warmup), eta_min=base_lr * 0.01),
        ],
        milestones=[warmup],
    )
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


def test_matches_torch_sequential_lr():
    for base_lr, epochs, warmup in [(1e-4, 20, 5), (3e-3, 12, 0),
                                    (1e-4, 8, 1)]:
        expected = _torch_lrs(base_lr, epochs, warmup)
        got = np.array([float(lr_at_epoch(e, base_lr, epochs, warmup))
                        for e in range(epochs)])
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_step_schedule_is_epoch_piecewise():
    config = {"learning_rate": 1e-3, "epochs": 10, "warmup_epochs": 2}
    sched = make_lr_schedule(config, steps_per_epoch=7)
    assert float(sched(0)) == float(sched(6))          # same epoch
    assert float(sched(6)) != float(sched(7))          # epoch boundary
