"""Static-shape TPU ops: boxes, resize, NMS, RoI-align, morphology."""
from .boxes import (cxcywh_to_yxyx, decode_boxes, encode_boxes, iou_yxyx,
                    pairwise_iou)
from .morphology import dilate, erode, semantic_smoothing
from .nms import batched_class_aware_nms, class_aware_nms, nms_keep_mask
from .resize import downsample_input, resize_bilinear, resize_like
from .roi_align import (batched_crop_and_resize, crop_and_resize,
                        crop_and_resize_indexed)

__all__ = [
    'cxcywh_to_yxyx', 'decode_boxes', 'encode_boxes', 'pairwise_iou',
    'iou_yxyx', 'resize_bilinear', 'resize_like', 'downsample_input',
    'class_aware_nms', 'batched_class_aware_nms', 'nms_keep_mask',
    'crop_and_resize', 'crop_and_resize_indexed', 'batched_crop_and_resize',
    'erode', 'dilate', 'semantic_smoothing',
]
