from .nms import class_aware_nms, matrix_nms, nms, nms_fixed
from .roi_align import roi_align

__all__ = ["nms", "nms_fixed", "class_aware_nms", "matrix_nms", "roi_align"]
