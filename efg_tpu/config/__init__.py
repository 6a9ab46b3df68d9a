"""YAML configuration system.

Rebuilds the reference's OmegaConf-based config behavior (reference:
`efg/config/__init__.py:11-132`) as a small self-contained engine:

- recursive ``includes:`` merging with include-key deletion
- ``${oc.env:VAR}`` / ``${oc.env:VAR,default}`` environment resolver and a
  ``${device_count:}`` resolver (local JAX device count)
- cross-file interpolation ``${dataset.pc_range}``
- CLI dotlist overrides (``a.b.c value`` pairs or ``a.b=value``) with
  ``literal_eval`` decoding and ``key[idx]`` list indexing

so that reference playground configs port nearly verbatim.
"""

from efg_tpu.config.config import Config, Configuration, load_yaml, merge_dict

__all__ = ["Config", "Configuration", "load_yaml", "merge_dict"]
