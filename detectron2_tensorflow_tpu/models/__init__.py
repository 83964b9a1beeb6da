from .meta_arch.build import META_ARCH_REGISTRY, build_model

# Import meta-arch modules for registration side effects.
from .meta_arch import rcnn as _rcnn  # noqa: F401
from .meta_arch import single_stage as _single_stage  # noqa: F401

__all__ = ["build_model", "META_ARCH_REGISTRY"]
