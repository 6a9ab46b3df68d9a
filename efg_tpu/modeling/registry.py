"""Modeling registries (reference `efg/modeling/registry.py:3-7`)."""

from efg_tpu.utils.registry import Registry

BACKBONES = Registry("backbones")
READERS = Registry("readers")
HEADS = Registry("heads")
LOSSES = Registry("losses")
LAYERS = Registry("layers")
