"""Global seeding (the reference's ``set_random_seed``,
``/root/reference/ood.py:678-681`` -> jt.misc.set_global_seed)."""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
