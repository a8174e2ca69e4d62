"""In-graph inference postprocessing: trim, smooth, upsample, mask paste.

Static-shape re-design of the deployment graph tail that
``load_masklab_inference_model_from_h5`` appends (retinamasklab.py:598-643)
plus ``CropAndPadMask`` (misc.py:354-401):

  * per-channel SemanticSmoothing with configured kernels/weights;
  * ``upsample_output`` (misc.py:164-196): boxes rescaled to the original
    resolution and int-cast, confidence x100, masks binarized, semantics
    align-corners-upsampled then thresholded. The reference multiplied
    cx/w by the *height* ratio and cy/h by the *width* ratio (misc.py:179-183)
    — only correct because its downsample preserves aspect; we use the
    per-axis ratios (identical result under aspect-preserving resize);
  * ``crop_and_pad_masks``: each RoI mask resized into its box and pasted
    into full-frame coordinates. The reference's dynamic per-box
    resize+pad becomes two per-box interpolation matmuls (paste = the
    transpose of RoI-align) keeping only boxes with conf >= 50 — the
    threshold works because confidences were scaled x100 (misc.py:367-370).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.morphology import semantic_smoothing
from ..ops.resize import resize_bilinear


def smooth_semantics(seg_pred: jnp.ndarray,
                     kernel_sizes: Sequence[int],
                     weights: Sequence[float]) -> jnp.ndarray:
    """Per-channel erosion/dilation smoothing (retinamasklab.py:619-627)."""
    chans = []
    for idx, (k, w) in enumerate(zip(kernel_sizes, weights)):
        chans.append(semantic_smoothing(seg_pred[..., idx:idx + 1],
                                        kernel_size=int(k), weight=float(w)))
    return jnp.concatenate(chans, axis=-1)


def upsample_output(roi_boxes: jnp.ndarray, roi_masks: jnp.ndarray,
                    semantic: jnp.ndarray,
                    src_hw: Tuple[int, int],
                    dst_hw: Tuple[int, int]):
    """Restore outputs to the original resolution (UpSampleOutput)."""
    ry = dst_hw[0] / src_hw[0]
    rx = dst_hw[1] / src_hw[1]
    cx, cy, w, h, label, conf = [roi_boxes[..., i] for i in range(6)]
    boxes = jnp.stack([
        (cx * rx).astype(jnp.int32), (cy * ry).astype(jnp.int32),
        (w * rx).astype(jnp.int32), (h * ry).astype(jnp.int32),
        label.astype(jnp.int32), (conf * 100).astype(jnp.int32)], axis=-1)
    masks = (roi_masks > 0.5).astype(jnp.int32)
    semantic = resize_bilinear(semantic, dst_hw[0], dst_hw[1],
                               align_corners=True)
    semantic = (semantic > 0.5).astype(jnp.int32)
    return boxes, masks, semantic


def _paste_weights(lo: jnp.ndarray, hi: jnp.ndarray, size: int,
                   mask_size: int) -> jnp.ndarray:
    """[K, size, mask_size] matrix pasting a mask row into [lo, hi).

    Inverse of RoI-align sampling: output pixel y inside [ceil(lo), ceil(hi))
    samples the mask at align-corners position
    (y - ceil(lo)) * (mask_size - 1) / (span - 1), zero outside — matching
    tf.image.resize(..., align_corners=True) into a (span, ...) window then
    tf.pad (misc.py:388-393).
    """
    y = jnp.arange(size, dtype=jnp.float32)[None, :]            # [1, size]
    start = jnp.ceil(lo)[:, None]                                # [K, 1]
    stop = jnp.ceil(hi)[:, None]
    span = jnp.maximum(stop - start, 1.0)
    pos = (y - start) * (mask_size - 1) / jnp.maximum(span - 1.0, 1e-6)
    inside = (y >= start) & (y < stop)
    grid = jnp.arange(mask_size, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))
    return wgt * inside[..., None]


def _paste_edges(det_boxes: jnp.ndarray, image_hw: Tuple[int, int],
                 conf_threshold: float):
    """Shared box->(y1,y2,x1,x2) clipping + adaptive keep flag.

    Mirrors CropAndPadMask (misc.py:366-374): boxes floored at 1, and if
    the best confidence IN THE IMAGE is above ``conf_threshold`` only
    boxes >= it are kept, else everything is.

    Deliberate deviation (same rationale as crack_to_instance's
    per-image bbox): the reference reduced the best confidence over the
    whole BATCH (misc.py:367-370) — fine when a batch is one client's
    frames, but micro-batched/mesh serving co-batches INDEPENDENT
    requests (and zero-pad rows), so a batch-global threshold would let
    one request's confident detection silently blank another request's
    sub-50 masks. The reduce is per image; identical for batch size 1.
    """
    h, w = image_hw
    boxes = jnp.maximum(det_boxes.astype(jnp.float32), 1.0)  # misc.py:374
    conf = det_boxes[..., -1].astype(jnp.float32)            # [..., K]
    best = jnp.max(conf, axis=-1, keepdims=True)
    thr = jnp.where(best > conf_threshold, conf_threshold, -100.0)
    keep = conf >= thr                                       # [..., K]
    cx, cy, bw, bh = (boxes[..., 0], boxes[..., 1],
                      boxes[..., 2], boxes[..., 3])
    x1 = jnp.clip(cx - bw / 2, 0, w)
    x2 = jnp.clip(cx + bw / 2, 0, w)
    y1 = jnp.clip(cy - bh / 2, 0, h)
    y2 = jnp.clip(cy + bh / 2, 0, h)
    return y1, y2, x1, x2, keep.astype(jnp.float32)


def crop_and_pad_masks(det_boxes: jnp.ndarray, roi_masks: jnp.ndarray,
                       image_hw: Tuple[int, int],
                       conf_threshold: float = 50.0) -> jnp.ndarray:
    """Paste RoI masks into full-frame coordinates -> [B, K, H, W].

    det_boxes [B,K,6] in *upsampled* units (conf x100 int). The adaptive
    threshold mirrors CropAndPadMask (misc.py:366-370): if the best conf in
    the batch is above 50, keep boxes >= 50, else keep everything.
    """
    h, w = image_hw
    mh, mw = roi_masks.shape[-2], roi_masks.shape[-1]
    y1, y2, x1, x2, keep = _paste_edges(det_boxes, image_hw, conf_threshold)

    def per_image(y1_, y2_, x1_, x2_, msks, kp):
        wy = _paste_weights(y1_, y2_, h, mh)                 # [K, H, mh]
        wx = _paste_weights(x1_, x2_, w, mw)                 # [K, W, mw]
        m = msks.astype(jnp.float32)
        rows = jnp.einsum('kym,kmn->kyn', wy, m)             # [K, H, mw]
        full = jnp.einsum('kxn,kyn->kyx', wx, rows)          # [K, H, W]
        return full * kp[:, None, None]

    return jax.vmap(per_image)(y1, y2, x1, x2,
                               roi_masks.astype(jnp.float32), keep)


def paste_stats_and_union(det_boxes: jnp.ndarray, roi_masks: jnp.ndarray,
                          image_hw: Tuple[int, int], unit: jnp.ndarray,
                          my_road: jnp.ndarray, num_classes: int,
                          conf_threshold: float = 50.0) -> Dict:
    """Paste statistics + per-class union WITHOUT keeping [B,K,H,W] live.

    The serving graph only consumes the pasted full-frame masks through
    reductions: per-instance analytics (SummaryOutput, misc.py:546-718) and
    the per-class union overlay (DrawInstance, misc.py:466-503). At 1080p
    with K=100 the [B,K,H,W] intermediate is ~800 MB of HBM traffic per
    consumer. Because the paste is separable (full = wy @ mask @ wx^T), the
    *linear* statistics factorize into tiny [K, mh]/[K, mw] contractions
    that never touch H x W, and the thresholded ones (union, my-road
    overlap, vertical extent) are fused into one pass over the pasted
    tensor.

    Args:
      det_boxes: [B, K, 6] upsampled rows (conf x100).
      roi_masks: [B, K, mh, mw] RoI masks (0/1).
      unit: [B, H] metres-per-pixel per row (from the my_road edge fit).
      my_road: [B, H, W] bool.
    Returns dict with pixel/size/horiz/vert/inter/area [B, K] and
      union [B, H, W, C] float 0/1 — identical values to running
      crop_and_pad_masks and reducing it.
    """
    h, w = image_hw
    mh, mw = roi_masks.shape[-2], roi_masks.shape[-1]
    y1, y2, x1, x2, keep = _paste_edges(det_boxes, image_hw, conf_threshold)
    cls = det_boxes[..., 4].astype(jnp.int32)                # [B, K]
    onehot = jax.nn.one_hot(cls, num_classes) * keep[..., None]

    def per_image(y1_, y2_, x1_, x2_, msks, kp, u, road, oh):
        wy = _paste_weights(y1_, y2_, h, mh)                 # [K, H, mh]
        wx = _paste_weights(x1_, x2_, w, mw)                 # [K, W, mw]
        m = msks.astype(jnp.float32)                         # [K, mh, mw]
        u_sq = u * u
        # linear stats: factor through the tiny mask axes
        sy = jnp.sum(wy, axis=1)                             # [K, mh]
        sx = jnp.sum(wx, axis=1)                             # [K, mw]
        u1y = jnp.einsum('y,kym->km', u, wy)                 # [K, mh]
        u2y = jnp.einsum('y,kym->km', u_sq, wy)              # [K, mh]
        msx = jnp.einsum('kmn,kn->km', m, sx)                # [K, mh]
        pixel = kp * jnp.einsum('km,km->k', sy, msx)
        size = kp * jnp.einsum('km,km->k', u2y, msx)
        rowvec = jnp.einsum('km,kmn->kn', u1y, m)            # [K, mw]
        colw = jnp.einsum('kxn,kn->kx', wx, rowvec)          # [K, W]
        horiz = kp * jnp.max(colw, axis=-1)
        # thresholded stats: one pass over the pasted tensor
        rows = jnp.einsum('kym,kmn->kyn', wy, m)             # [K, H, mw]
        full = jnp.einsum('kxn,kyn->kyx', wx, rows)          # [K, H, W]
        th = (full * kp[:, None, None]) > 0.5                # [K, H, W]
        vert = jnp.sum(u[None, :] * jnp.any(th, axis=-1), axis=-1)
        inter = jnp.sum((road[None] & th).astype(jnp.float32), axis=(1, 2))
        area = jnp.sum(th.astype(jnp.float32), axis=(1, 2))
        union = jnp.einsum('khw,kc->hwc', th.astype(jnp.float32), oh)
        return pixel, size, horiz, vert, inter, area, (union > 0.5)

    pixel, size, horiz, vert, inter, area, union = jax.vmap(per_image)(
        y1, y2, x1, x2, roi_masks.astype(jnp.float32), keep, unit,
        my_road, onehot)
    return dict(pixel=pixel, size=size, horiz=horiz, vert=vert,
                inter=inter, area=area,
                union=union.astype(jnp.float32))
