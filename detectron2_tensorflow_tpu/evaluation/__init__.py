from .coco_eval import CocoEvaluator
from .np_masks import paste_masks
from .panoptic_eval import PanopticEvaluator
from .pascal_voc_eval import PascalVocEvaluator
from .sem_seg_eval import SemSegEvaluator
from .visualization import draw_detections, draw_sem_seg

__all__ = [
    "CocoEvaluator",
    "SemSegEvaluator",
    "PanopticEvaluator",
    "PascalVocEvaluator",
    "paste_masks",
    "draw_detections",
    "draw_sem_seg",
]
