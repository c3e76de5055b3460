"""Optimizer + LR schedule assembly (optax).

Mirrors the reference training recipe: Adam(lr=5e-4), gradient value-clip 40
(ref: lib/train/trainers/trainer.py:52), and per-epoch LR schedules —
'exponential' lr0 * gamma^(epoch/decay_epochs) (ref: lib/utils/optimizer/
lr_scheduler.py:66-75) or 'multi_step' (milestones, gamma). Epoch is derived
from the step count (epoch = step // ep_iter) so the schedule lives inside
the jitted update.
"""
from __future__ import annotations

import optax
from jax.numpy import minimum as jnp_minimum, where as jnp_where


def make_lr_schedule(cfg):
    base_lr = float(cfg.train.lr)
    sch = cfg.train.scheduler
    ep_iter = max(int(cfg.ep_iter), 1)

    if sch.type == "exponential":
        gamma = float(sch.gamma)
        decay_epochs = float(sch.get("decay_epochs", 1000))

        def schedule(step):
            epoch = step // ep_iter
            return base_lr * gamma ** (epoch / decay_epochs)

    elif sch.type == "multi_step":
        gamma = float(sch.gamma)
        milestones = list(sch.milestones)

        def schedule(step):
            epoch = step // ep_iter
            mult = 1.0
            for m in milestones:
                mult = mult * (gamma ** (epoch >= m))
            return base_lr * mult

    elif sch.type == "warmup_multi_step":
        # ref WarmupMultiStepLR (lib/utils/optimizer/lr_scheduler.py:7-49):
        # linear/constant warmup over warmup_iters epochs, then multi-step
        gamma = float(sch.gamma)
        milestones = list(sch.milestones)
        wf = float(sch.get("warmup_factor", 1.0 / 3))
        wi = float(sch.get("warmup_iters", 5))
        method = sch.get("warmup_method", "linear")

        def schedule(step):
            epoch = step // ep_iter
            if method == "linear":
                alpha = jnp_minimum(epoch / wi, 1.0)
                warm = jnp_where(epoch < wi, wf * (1 - alpha) + alpha, 1.0)
            else:
                warm = jnp_where(epoch < wi, wf, 1.0)
            mult = warm
            for m in milestones:
                mult = mult * (gamma ** (epoch >= m))
            return base_lr * mult

    else:
        raise ValueError(f"unknown scheduler type {sch.type!r}")

    return schedule


def make_optimizer(cfg):
    schedule = make_lr_schedule(cfg)
    clip = float(cfg.get("grad_clip_value", 40.0))
    wd = float(cfg.train.weight_decay)

    opt = cfg.train.optim
    if opt == "adam":
        tx = optax.adam(schedule, eps=1e-8)
    elif opt == "radam":
        # reference vendors RAdam (lib/utils/optimizer/radam.py); optax has it
        tx = optax.radam(schedule, eps=1e-8)
    elif opt == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {opt!r}")

    chain = [optax.clip(clip)]
    if wd > 0 and opt != "sgd":
        chain.append(optax.add_decayed_weights(wd))
    chain.append(tx)
    return optax.chain(*chain), schedule
