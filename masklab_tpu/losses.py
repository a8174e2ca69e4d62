"""Task losses as pure functions returning per-sample values.

Re-design of engine/losses.py — the reference implemented losses as Keras
Layers whose outputs were summed via ``add_loss(K.mean(...))``
(engine/train.py:98-101); that maps directly onto pure functions feeding a
jitted ``value_and_grad``.

  * class_loss   — focal loss (losses.py:12-50)
  * box_loss     — smooth-L1 with RetinaMask's self-adjusting beta
                   (losses.py:53-114); the moving mean/var live in an
                   explicit ``BoxLossState`` threaded through the train step
                   instead of non-trainable Keras weights
  * mask_loss    — per-RoI BCE on the gt-class channel (losses.py:117-168)
  * seg_loss     — per-class BCE gated by seg-exists flags (losses.py:171-201)

Mask semantics (1 = negative, 0 = positive, -1 = ignore) follow
``split_neg_pos_mask`` (losses.py:251-269). K.epsilon() = 1e-7.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

EPS = 1e-7


def focal_loss(y_true, y_pred, gamma=2.0, alpha=0.25):
    y_pred = jnp.clip(y_pred, EPS, 1.0 - EPS)
    pt = jnp.where(y_true == 1.0, y_pred, 1.0 - y_pred)
    return -alpha * jnp.power(1.0 - pt, gamma) * jnp.log(pt)


def smooth_l1(y_true, y_pred, beta=0.11):
    """Generalized smooth-L1, mean over the last (coordinate) axis.

    Reproduces losses.py:221-234 exactly, including its unusual branch
    condition ``where(l1 - 0.5*beta < beta, l2, l1 - 0.5*beta)``.
    """
    diff = jnp.abs(y_true - y_pred)
    l1 = diff - 0.5 * beta
    l2 = 0.5 * diff ** 2 / beta
    loss = jnp.where(l1 < beta, l2, l1)
    return jnp.mean(loss, axis=-1)


def binary_cross_entropy(y_true, y_pred, label_smoothing=0.0):
    y_true = (1.0 - label_smoothing) * y_true + label_smoothing / 2.0
    return -(y_true * jnp.log(y_pred + EPS)
             + (1.0 - y_true) * jnp.log(1.0 - y_pred + EPS))


def split_neg_pos_mask(mask):
    neg = (mask == 1.0).astype(jnp.float32)
    pos = (mask == 0.0).astype(jnp.float32)
    ignore = (mask != -1.0).astype(jnp.float32)
    return neg, pos, ignore


def class_loss(cls_true, cls_pred, mask, cls_exists,
               weight=1.0, alpha=0.25, gamma=2.0):
    """Focal classification loss -> [B].

    cls_true/cls_pred [B,N,C]; mask [B,N,1]; cls_exists [B,C] per-image
    class-presence flags gating the per-class loss (losses.py:21-41).
    """
    cls_exists = cls_exists.astype(jnp.float32)[:, None, :]
    neg, pos, ignore = split_neg_pos_mask(mask)
    y = (cls_true != 0.0).astype(jnp.float32)
    num_tot = jnp.sum(pos + neg, axis=(1, 2))
    loss = focal_loss(y, cls_pred, gamma, alpha) * cls_exists
    loss = jnp.sum(ignore * loss, axis=(1, 2)) / (num_tot + EPS)
    return weight * loss


class BoxLossState(NamedTuple):
    """Moving statistics of the self-adjusting smooth-L1 beta."""
    moving_mean: jnp.ndarray   # [4], init beta0
    moving_var: jnp.ndarray    # [4], init 0

    @classmethod
    def create(cls, beta: float = 0.11):
        return cls(moving_mean=jnp.full((4,), beta, jnp.float32),
                   moving_var=jnp.zeros((4,), jnp.float32))


def box_loss(loc_true, loc_pred, mask, state: BoxLossState,
             weight=1.0, momentum=0.9, beta=0.11,
             use_adjust=True) -> Tuple[jnp.ndarray, BoxLossState]:
    """Self-adjusting smooth-L1 -> ([B], next_state).

    The reference kept moving mean/var as non-trainable weights updated via
    assign + control_dependencies (losses.py:67-97); here the state is
    explicit. Like the reference, the *current step's updated* mean/var feed
    the clipped beta.
    """
    neg, pos, ignore = split_neg_pos_mask(mask)
    num_pos = jnp.sum(pos, axis=(1, 2))
    if use_adjust:
        offsets = jnp.abs(loc_true - loc_pred) * pos
        mean = jnp.mean(offsets, axis=(0, 1))
        var = jnp.mean((offsets - mean) ** 2, axis=(0, 1))
        next_mean = state.moving_mean * momentum + mean * (1 - momentum)
        next_var = state.moving_var * momentum + var * (1 - momentum)
        state = BoxLossState(next_mean, next_var)
        beta_t = jnp.clip(next_mean - next_var, 1e-3, beta)
    else:
        beta_t = beta
    loss = smooth_l1(loc_true, loc_pred, beta=beta_t)
    loss = jnp.sum(pos[..., 0] * loss, axis=1) / (num_pos + EPS)
    return weight * loss, state


def mask_loss(mask_true, mask_pred, weight=1.0, label_smoothing=0.0):
    """Per-RoI BCE on the gt-class mask channel -> [B].

    mask_true [B,R,h,w] int, values in [0, C] where C marks background /
    unmatched; mask_pred [B,R,h,w,C] sigmoid outputs. Static-shape version
    of losses.py:126-159 (the MoldBatch re-batching disappears: invalid RoIs
    contribute zero and the normalizer counts nonzero per-RoI losses + 1).
    """
    num_classes = mask_pred.shape[-1]
    mask_true = mask_true.astype(jnp.int32)
    roi_class = jnp.min(mask_true, axis=(2, 3))                   # [B,R]
    valid = (roi_class < num_classes).astype(jnp.float32)         # [B,R]
    ch = jnp.clip(roi_class, 0, num_classes - 1)
    pred = jnp.take_along_axis(
        mask_pred, ch[:, :, None, None, None], axis=-1)[..., 0]   # [B,R,h,w]
    true = (mask_true == ch[:, :, None, None]).astype(jnp.float32)
    per_px = binary_cross_entropy(true, pred, label_smoothing)
    per_roi = jnp.mean(per_px, axis=(2, 3)) * valid               # [B,R]
    count = jnp.sum((per_roi != 0).astype(jnp.float32), axis=1)
    loss = jnp.sum(per_roi, axis=1) / (count + 1.0)
    return weight * loss


def seg_loss(seg_true, seg_pred, seg_exists, weight=1.0, label_smoothing=0.0):
    """Per-class BCE gated by seg-exists flags -> [B]."""
    seg_exists = seg_exists.astype(jnp.float32)
    loss = binary_cross_entropy(seg_true, seg_pred, label_smoothing)
    loss = jnp.mean(loss, axis=(1, 2)) * seg_exists                # [B,C]
    return weight * jnp.mean(loss, axis=1)
