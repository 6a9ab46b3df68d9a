"""Environment summary for logs (reference `efg/utils/collect_env.py`)."""

from __future__ import annotations

import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import numpy

        lines.append(f"numpy: {numpy.__version__}")
    except ImportError:
        pass
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        lines.append(f"backend: {jax.default_backend()}")
        lines.append(
            "devices: " + ", ".join(str(d) for d in jax.devices())
        )
        lines.append(f"process: {jax.process_index()}/{jax.process_count()}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    try:
        import flax
        import optax

        lines.append(f"flax: {flax.__version__}  optax: {optax.__version__}")
    except ImportError:
        pass
    import efg_tpu

    lines.append(f"efg_tpu: {efg_tpu.__version__}")
    return "\n".join(lines)
