from . import fields, transforms
from .coco import CocoDataset
from .loader import (
    build_dataloader,
    build_native_eval_loader,
    build_native_train_loader,
    native_eval_loader_usable,
    native_train_loader_usable,
    pick_bucket,
)

__all__ = [
    "fields",
    "transforms",
    "CocoDataset",
    "build_dataloader",
    "build_native_eval_loader",
    "native_eval_loader_usable",
    "pick_bucket",
]
