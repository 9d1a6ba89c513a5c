"""Optimizer + LR schedule builders (optax).

Parity with /root/reference/tools/train_utils/optimization/__init__.py:11-86:
adam / adamW / sgd / adam_onecycle / adamW_onecycle, and STEP / OneCycle /
CosineWarmup schedules. The fastai OneCycle (two cosine-annealed phases with
momentum inverse-annealing, learning_schedules_fastai.py:12-103) is built
from optax primitives: the LR path matches fastai's (pct_start warmup from
lr/div_factor, cosine down to ~0).
"""

from __future__ import annotations

import optax

from ..utils.edict import EDict


def build_onecycle_schedule(lr, total_steps, pct_start=0.4, div_factor=10.0):
    """fastai-style OneCycle: cosine warmup lr/div -> lr over pct_start, then
    cosine anneal lr -> lr/1e4."""
    warm = int(max(total_steps * pct_start, 1))
    return optax.join_schedules(
        [
            optax.linear_schedule(lr / div_factor, lr, warm),
            optax.cosine_decay_schedule(lr, max(total_steps - warm, 1), alpha=1e-4),
        ],
        [warm],
    )


def build_step_schedule(lr, decay_steps, decay=0.1):
    bounds = {int(s): decay for s in decay_steps}
    return optax.piecewise_constant_schedule(lr, bounds)


def build_cosine_warmup_schedule(lr, total_steps, warmup_steps):
    return optax.warmup_cosine_decay_schedule(
        init_value=lr / 3.0, peak_value=lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, 2), end_value=lr * 1e-4,
    )


def build_scheduler(optim_cfg, total_iters_each_epoch, total_epochs):
    cfg = EDict(optim_cfg)
    total_steps = max(total_iters_each_epoch * total_epochs, 1)
    lr = float(cfg.get("LR", 1e-3))
    name = cfg.get("SCHEDULER", None) or cfg.get("OPTIMIZER", "adam_onecycle")
    if "onecycle" in str(name).lower() or cfg.get("ONECYCLE", False):
        return build_onecycle_schedule(
            lr, total_steps,
            pct_start=float(cfg.get("PCT_START", 0.4)),
            div_factor=float(cfg.get("DIV_FACTOR", 10)),
        )
    if cfg.get("DECAY_STEP_LIST", None):
        steps = [int(s * total_iters_each_epoch) for s in cfg["DECAY_STEP_LIST"]]
        return build_step_schedule(lr, steps, float(cfg.get("LR_DECAY", 0.1)))
    if cfg.get("WARMUP_EPOCH", None):
        return build_cosine_warmup_schedule(
            lr, total_steps, int(cfg["WARMUP_EPOCH"] * total_iters_each_epoch)
        )
    return lambda step: lr


def build_optimizer(optim_cfg, total_iters_each_epoch=1000, total_epochs=30):
    """Returns (optax optimizer, schedule fn)."""
    cfg = EDict(optim_cfg)
    name = cfg.get("OPTIMIZER", "adam_onecycle")
    wd = float(cfg.get("WEIGHT_DECAY", 0.01))
    sched = build_scheduler(cfg, total_iters_each_epoch, total_epochs)
    grad_clip = float(cfg.get("GRAD_NORM_CLIP", 10.0))

    if name in ("adam", "adam_onecycle"):
        core = optax.adam(learning_rate=sched)
    elif name in ("adamW", "adamw", "adamW_onecycle", "adamw_onecycle"):
        core = optax.adamw(learning_rate=sched, weight_decay=wd)
    elif name == "sgd":
        core = optax.sgd(learning_rate=sched, momentum=float(cfg.get("MOMENTUM", 0.9)))
    else:
        raise KeyError(name)

    tx = optax.chain(optax.clip_by_global_norm(grad_clip), core)
    return tx, sched
