"""Seeding helpers (reference: `efg/data/builder.py:79-100`, `cli/main.py:106-113`).

JAX RNG is explicit (`jax.random.key`), so this seeds only host-side RNGs
(python `random`, numpy) used by the data pipeline, and derives per-process
seeds deterministically.
"""

from __future__ import annotations

import os
import random
from datetime import datetime

import numpy as np


def seed_all_rng(seed: int | None = None) -> int:
    """Seed numpy + python random. With None, derive a fresh seed from time/pid."""
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        ) % (2**31)
    np.random.seed(seed)
    random.seed(seed)
    return seed
