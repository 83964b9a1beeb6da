from . import fields, transforms
from .coco import CocoDataset
from .loader import build_dataloader, pick_bucket

__all__ = ["fields", "transforms", "CocoDataset", "build_dataloader", "pick_bucket"]
