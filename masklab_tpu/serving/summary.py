"""Road-geometry analytics: the SummaryOutput head.

Static-shape re-design of the serving analytics layers (misc.py:506-725):
  * ``crack_to_instance`` — converts the crack semantic channel into one
    synthetic instance row (bbox of nonzero pixels, class id 5, confidence
    min(100 * area, 100)) (misc.py:506-543);
  * ``include_my_road`` — instance ∩ my_road overlap ratio > 10 %
    (misc.py:594-625);
  * ``calculate_instance_size`` — estimates metres-per-pixel per image row
    by least-squares-fitting the my_road left/right edges against the
    default lane width (3.25 m), then integrates per-instance real-world
    area / horizontal / vertical extents (misc.py:628-718). The reference's
    dynamic ``tf.segment_min``/boolean indexing becomes masked row-wise
    min/max and rank-based trimming (drop the first/last 15 % of valid rows)
    with closed-form 2x2 least squares;
  * ``summary_output`` — per-instance analytics rows
    [class, cx, cy, w, h, conf, pixel_count, est_size, horiz_len, vert_len,
    include_my_road] (misc.py:546-591).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5


def crack_to_instance(crack: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """crack [B,H,W] (0/1) -> (det rows [B,1,6], seg masks [B,1,H,W])."""
    b, h, w = crack.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    on = crack > 0
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(on, ys, big), axis=(1, 2))
    ymax = jnp.max(jnp.where(on, ys, -big), axis=(1, 2))
    xmin = jnp.min(jnp.where(on, xs, big), axis=(1, 2))
    xmax = jnp.max(jnp.where(on, xs, -big), axis=(1, 2))
    any_on = jnp.any(on, axis=(1, 2))
    ymin = jnp.where(any_on, ymin, 0.0)
    ymax = jnp.where(any_on, ymax, 0.0)
    xmin = jnp.where(any_on, xmin, 0.0)
    xmax = jnp.where(any_on, xmax, 0.0)
    height = (ymax - ymin).astype(jnp.int32)
    width = (xmax - xmin).astype(jnp.int32)
    cy = ymin.astype(jnp.int32) + height // 2
    cx = xmin.astype(jnp.int32) + width // 2
    class_id = jnp.full_like(cx, 5)
    # semantics of the reference's clip(100*h*w, 0, 100) (misc.py:536):
    # 100 when the crack bbox is non-degenerate, else 0 — computed as a
    # predicate because the int32 product overflows (wraps negative ->
    # conf 0, crack reported absent) once h*w exceeds ~21.4M px, e.g.
    # large-bbox cracks in 8K frames
    conf = jnp.where(height * width > 0, 100, 0)
    det = jnp.stack([cx, cy, width, height, class_id, conf],
                    axis=-1)[:, None, :].astype(jnp.float32)
    return det, crack[:, None].astype(jnp.float32)


def include_my_road(seg: jnp.ndarray, padded_masks: jnp.ndarray,
                    threshold: float = 0.1) -> jnp.ndarray:
    """Instance-overlaps-my-road flag -> [B, K] float 0/1."""
    my_road = (seg[..., 1].astype(jnp.float32) > 0.5)      # [B,H,W]
    inst = padded_masks.astype(jnp.float32) > 0.5          # [B,K,H,W]
    inter = jnp.sum((my_road[:, None] & inst).astype(jnp.float32),
                    axis=(2, 3))
    area = jnp.sum(inst.astype(jnp.float32), axis=(2, 3))
    ioi = inter / (area + EPS)
    return (ioi > threshold).astype(jnp.float32)


def _road_width_per_row(my_road: jnp.ndarray,
                        default_road_size: float) -> jnp.ndarray:
    """metres-per-pixel per image row from the my_road edge fit -> [H]."""
    h, w = my_road.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    on = my_road > 0
    big = jnp.float32(1e9)
    x_min = jnp.min(jnp.where(on, xs, big), axis=1)          # [H]
    x_max = jnp.max(jnp.where(on, xs, -big), axis=1)
    row_has = jnp.any(on, axis=1)
    valid = row_has & (x_min != x_max)

    # drop the first/last 15% of valid rows (noise trim, misc.py:695-703)
    order = jnp.cumsum(valid.astype(jnp.int32))              # rank among valid
    total = order[-1]
    drop = jnp.clip((total.astype(jnp.float32) * 0.15).astype(jnp.int32),
                    1, 2 ** 31 - 1)
    keep = valid & (order > drop) & (order <= total - drop)

    ys = jnp.arange(h, dtype=jnp.float32)
    kf = keep.astype(jnp.float32)

    def fit(targets):
        # least squares x = a*y + b over kept rows; 2x2 closed form
        n = jnp.sum(kf)
        sy = jnp.sum(kf * ys)
        syy = jnp.sum(kf * ys * ys)
        st = jnp.sum(kf * targets)
        syt = jnp.sum(kf * ys * targets)
        det = syy * n - sy * sy
        a = jnp.where(det > 0, (n * syt - sy * st) / (det + EPS), 0.0)
        b = jnp.where(det > 0, (syy * st - sy * syt) / (det + EPS), 0.0)
        return a, b

    la, lb = fit(jnp.where(keep, x_min, 0.0))
    ra, rb = fit(jnp.where(keep, x_max, 0.0))
    pred_left = ys * la + lb
    pred_right = ys * ra + rb
    width_by_row = jnp.clip(pred_right - pred_left, 1.0, jnp.inf)
    return default_road_size / width_by_row


def calculate_instance_size(seg: jnp.ndarray, padded_masks: jnp.ndarray,
                            default_road_size: float = 3.25) -> jnp.ndarray:
    """Per-instance (est_size, horizontal, vertical) -> [B, K, 3]."""
    unit = jax.vmap(lambda m: _road_width_per_row(
        m, default_road_size))(seg[..., 1].astype(jnp.float32))  # [B,H]
    masks = padded_masks.astype(jnp.float32)
    unit_sq = unit ** 2
    instance_size = jnp.sum(unit_sq[:, None, :, None] * masks, axis=(2, 3))
    vertical = jnp.sum(
        unit[:, None, :] * jnp.any(masks > 0.5, axis=-1).astype(jnp.float32),
        axis=-1)
    horizontal = jnp.max(
        jnp.sum(unit[:, None, :, None] * masks, axis=2), axis=-1)
    return jnp.stack([instance_size, horizontal, vertical], axis=-1)


def fused_summary_union(det_boxes: jnp.ndarray, seg: jnp.ndarray,
                        roi_masks: jnp.ndarray,
                        image_hw: Tuple[int, int], num_classes: int,
                        default_road_size: float = 3.25,
                        conf_threshold: float = 50.0):
    """Analytics table + instance-class union, fused over the mask paste.

    Produces exactly ``summary_output(det, seg, crop_and_pad_masks(...))``
    and the class-union canvas that ``draw_instance`` derives, but via
    ``paste_stats_and_union`` so the [B, K, H, W] pasted tensor is reduced
    in one pass instead of being materialized for every consumer (the
    reference materializes CropAndPadMask's output and feeds it to both
    DrawInstance and SummaryOutput: misc.py:354-401, 466-503, 546-591).

    Args:
      det_boxes: [B, K, 6] upsampled detection rows.
      seg: [B, H, W, C_seg] binarized semantics (my_road at 1, crack at 2).
      roi_masks: [B, K, mh, mw] binarized RoI masks.
    Returns:
      (summary [B, K+1, 11], union [B, H, W, num_classes] float 0/1).
    """
    from .postprocess import paste_stats_and_union

    my_road_f = seg[..., 1].astype(jnp.float32)
    unit = jax.vmap(lambda m: _road_width_per_row(
        m, default_road_size))(my_road_f)                    # [B, H]
    stats = paste_stats_and_union(
        det_boxes, roi_masks, image_hw, unit, my_road_f > 0.5,
        num_classes, conf_threshold)

    inst = det_boxes.astype(jnp.float32)
    inc = (stats['inter'] / (stats['area'] + EPS) > 0.1).astype(jnp.float32)
    inst_rows = jnp.stack([
        inst[..., 4], inst[..., 0], inst[..., 1], inst[..., 2],
        inst[..., 3], inst[..., 5], stats['pixel'], stats['size'],
        stats['horiz'], stats['vert'], inc], axis=-1)        # [B, K, 11]

    # synthetic crack row: one [B, 1, H, W] mask — cheap, reuse the
    # unfused reducers
    crack_det, crack_mask = crack_to_instance(seg[..., 2])
    crack_sizes = calculate_instance_size(seg, crack_mask, default_road_size)
    crack_inc = include_my_road(seg, crack_mask)
    crack_pixel = jnp.sum(crack_mask, axis=(2, 3))
    cd = crack_det
    crack_rows = jnp.stack([
        cd[..., 4], cd[..., 0], cd[..., 1], cd[..., 2], cd[..., 3],
        cd[..., 5], crack_pixel, crack_sizes[..., 0], crack_sizes[..., 1],
        crack_sizes[..., 2], crack_inc], axis=-1)            # [B, 1, 11]

    return (jnp.concatenate([inst_rows, crack_rows], axis=1),
            stats['union'])


def summary_output(det_boxes: jnp.ndarray, seg: jnp.ndarray,
                   padded_masks: jnp.ndarray,
                   default_road_size: float = 3.25) -> jnp.ndarray:
    """Analytics table -> [B, K+1, 11] (last row = synthetic crack).

    The reference appended the crack row only when its confidence was
    positive (misc.py:562-568, a dynamic concat); here the slot always
    exists and carries conf 0 (i.e. "absent") when there is no crack.
    """
    crack_det, crack_mask = crack_to_instance(seg[..., 2])
    det = jnp.concatenate([det_boxes.astype(jnp.float32), crack_det], axis=1)
    masks = jnp.concatenate([padded_masks.astype(jnp.float32), crack_mask],
                            axis=1)
    cx, cy, w, h, classes, conf = [det[..., i] for i in range(6)]
    pixel_counts = jnp.sum(masks, axis=(2, 3))
    sizes = calculate_instance_size(seg, masks, default_road_size)
    inc = include_my_road(seg, masks)
    return jnp.stack([classes, cx, cy, w, h, conf, pixel_counts,
                      sizes[..., 0], sizes[..., 1], sizes[..., 2], inc],
                     axis=-1)
