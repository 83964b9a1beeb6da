from . import boxes as box_ops
from .image_list import ImageList
from .instances import Instances
from .masks import crop_and_resize_masks, paste_masks_in_image

__all__ = [
    "box_ops",
    "ImageList",
    "Instances",
    "paste_masks_in_image",
    "crop_and_resize_masks",
]
