"""Pallas TPU kernels for the hot ops."""
from .nms_kernel import batched_nms_keep_mask_pallas, nms_keep_mask_pallas

__all__ = ['nms_keep_mask_pallas', 'batched_nms_keep_mask_pallas']
