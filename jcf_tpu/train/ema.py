"""Exponential moving average of a parameter pytree.

The reference defines an EMA class but never wires it into training
(``/root/reference/lora_train_vlp.py:870-904``, constructor commented out
at :934-935). Provided here functionally so it can actually be used:
``ema = ema_update(ema, params, decay)`` after each step; evaluate with the
EMA tree, keep training with the raw tree.
"""

from __future__ import annotations

import jax


def ema_init(params):
    return jax.tree_util.tree_map(lambda x: x, params)


def ema_update(ema, params, decay: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params
    )
