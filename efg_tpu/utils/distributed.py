"""Multi-host process utilities (the reference's `efg/utils/distributed.py`
rank/gather helpers, re-expressed for JAX's single-controller runtime).

In JAX, gradients/metrics sync inside the jitted step via mesh collectives
(`psum` over ICI) — nothing here touches gradient flow. These helpers cover
the *host-side* object plumbing the reference did over a gloo side group
(`efg/utils/distributed.py:107-229`): gathering per-host python objects
(e.g. evaluator predictions) and synchronizing processes.
"""

from __future__ import annotations

import pickle
import random
from typing import Any, List

import numpy as np


def get_world_size() -> int:
    import jax

    return jax.process_count()


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across hosts (no-op single-host)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("efg_tpu.synchronize")


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host; returns a list
    indexed by process. Single-host returns `[data]`.

    Implementation: pickle → uint8 array → pad to global max →
    `process_allgather` over DCN, mirroring the reference's pickle-over-gloo
    approach (`efg/utils/distributed.py:159-190`).
    """
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data, protocol=pickle.HIGHEST_PROTOCOL), dtype=np.uint8)
    size = np.array([payload.size], dtype=np.int64)
    all_sizes = multihost_utils.process_allgather(size).reshape(-1)
    max_size = int(all_sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(all_sizes[i])].tobytes()) for i in range(world)
    ]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather objects on `dst` (others get []). Implemented on top of
    `all_gather`; DCN allgather is the only primitive JAX exposes host-side."""
    out = all_gather(data)
    return out if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed shared by all hosts (reference `distributed.py:252-262`)."""
    seed = random.randint(0, 2**31 - 1)
    if get_world_size() == 1:
        return seed
    from jax.experimental import multihost_utils

    arr = multihost_utils.broadcast_one_to_all(np.array([seed], dtype=np.int64))
    return int(arr[0])
