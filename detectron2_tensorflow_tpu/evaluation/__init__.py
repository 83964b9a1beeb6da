from .coco_eval import CocoEvaluator
from .np_masks import paste_masks
from .sem_seg_eval import SemSegEvaluator

__all__ = ["CocoEvaluator", "SemSegEvaluator", "paste_masks"]
