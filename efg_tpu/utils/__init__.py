from efg_tpu.utils.registry import Registry
from efg_tpu.utils.seed import seed_all_rng

__all__ = ["Registry", "seed_all_rng"]
