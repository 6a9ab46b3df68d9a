from efg_tpu.geometry import box_ops_jnp, box_ops_np

__all__ = ["box_ops_np", "box_ops_jnp"]
