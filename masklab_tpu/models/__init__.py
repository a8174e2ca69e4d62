"""Model assembly: detection / instance / semantic paths and MaskLab."""
from .detection import (BoxRegressionSubNet, ClassificationSubNet,
                        FeaturePyramid, assign_boxes, batched_assign_boxes)
from .instance import (MaskSubNet, assign_masks, mask_distribute,
                       pyramid_roi_align, select_by_level, trim_instances)
from .masklab import MaskLab, build_masklab
from .semantic import ASPPNetwork, SegmentationSubNet, assign_seg

__all__ = [
    'FeaturePyramid', 'ClassificationSubNet', 'BoxRegressionSubNet',
    'assign_boxes', 'batched_assign_boxes', 'MaskSubNet', 'mask_distribute',
    'pyramid_roi_align', 'select_by_level', 'assign_masks', 'trim_instances',
    'ASPPNetwork', 'SegmentationSubNet', 'assign_seg', 'MaskLab',
    'build_masklab',
]
