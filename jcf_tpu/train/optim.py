"""Optimizers and schedules (optax), matching jittor semantics.

- AdamW(lr 2e-4, betas (0.9, 0.999), wd 1e-2, eps 1e-8) — stage-1
  ``lora_train_vlp.py:946``, stage-2 ``slow_pace.py:1591``.
- CosineAnnealingLR closed form eta_min + (lr-eta_min)(1+cos(pi t/T))/2
  WITHOUT clamping past T (torch/jittor semantics: periodic). The
  reference steps it per batch with T_max=20 (``slow_pace.py:1592,1695``),
  so t counts optimizer steps.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp
import optax


def cosine_annealing_lr(
    base_lr: float, t_max: int, eta_min: float = 0.0
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step):
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * step / t_max)) / 2

    return schedule


def adamw(
    lr: Union[float, Callable] = 2e-4,
    betas: Tuple[float, float] = (0.9, 0.999),
    weight_decay: float = 1e-2,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )
