"""Meta-architecture registry and build_model entry point.

Mirrors /root/reference/lib/modeling/meta_arch/build.py:11-16: the one-call
public API ``build_model(cfg) -> DetectorModel``.
"""

from __future__ import annotations

from ...utils import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")


def build_model(cfg):
    name = cfg.MODEL.META_ARCHITECTURE
    return META_ARCH_REGISTRY.get(name)(cfg)
