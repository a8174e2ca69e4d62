"""Loss / metric functions vs hand-computed reference formulas."""
import numpy as np

import jax.numpy as jnp

from masklab_tpu.losses import (BoxLossState, binary_cross_entropy, box_loss,
                                class_loss, focal_loss, mask_loss, seg_loss,
                                smooth_l1, split_neg_pos_mask)
from masklab_tpu.metrics import (class_binary_iou, confusion_matrix_metric,
                                 detection_iou_metric)


def test_focal_loss_formula():
    y_true = jnp.asarray([1.0, 0.0])
    y_pred = jnp.asarray([0.9, 0.2])
    got = np.asarray(focal_loss(y_true, y_pred, gamma=2.0, alpha=0.25))
    pt = np.asarray([0.9, 0.8])
    want = -0.25 * (1 - pt) ** 2 * np.log(pt)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_reference_branching():
    # reference branch: where(|d| - beta/2 < beta, l2, l1) (losses.py:229-233)
    beta = 0.11
    for d in (0.01, 0.1, 0.2, 1.0):
        got = float(smooth_l1(jnp.asarray([[d]]), jnp.asarray([[0.0]]),
                              beta=beta)[0])
        l1 = abs(d) - 0.5 * beta
        l2 = 0.5 * d ** 2 / beta
        want = l2 if l1 < beta else l1
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_label_smoothing():
    got = float(binary_cross_entropy(jnp.asarray(1.0), jnp.asarray(0.8),
                                     label_smoothing=0.2))
    yt = 0.8 * 1.0 + 0.1
    want = -(yt * np.log(0.8 + 1e-7) + (1 - yt) * np.log(0.2 + 1e-7))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_split_neg_pos_mask():
    mask = jnp.asarray([1.0, 0.0, -1.0])
    neg, pos, ignore = split_neg_pos_mask(mask)
    np.testing.assert_array_equal(np.asarray(neg), [1, 0, 0])
    np.testing.assert_array_equal(np.asarray(pos), [0, 1, 0])
    np.testing.assert_array_equal(np.asarray(ignore), [1, 1, 0])


def test_class_loss_gating():
    # one positive anchor of class 0; class-exists flag off kills the loss
    cls_true = jnp.zeros((1, 2, 3)).at[0, 0, 0].set(1.0)
    cls_pred = jnp.full((1, 2, 3), 0.5)
    mask = jnp.asarray([[[0.0], [1.0]]])
    on = class_loss(cls_true, cls_pred, mask, jnp.ones((1, 3)))
    off = class_loss(cls_true, cls_pred, mask, jnp.zeros((1, 3)))
    assert float(on[0]) > 0
    np.testing.assert_allclose(np.asarray(off), 0.0, atol=1e-6)


def test_box_loss_state_update_and_clip():
    loc_true = jnp.zeros((1, 4, 4))
    loc_pred = jnp.full((1, 4, 4), 0.05)
    mask = jnp.zeros((1, 4, 1))  # all positive
    state = BoxLossState.create(0.11)
    loss, new_state = box_loss(loc_true, loc_pred, mask, state,
                               momentum=0.9, beta=0.11)
    # moving mean moved toward |diff| = 0.05
    want_mean = 0.11 * 0.9 + 0.05 * 0.1
    np.testing.assert_allclose(np.asarray(new_state.moving_mean),
                               want_mean, rtol=1e-5)
    assert float(loss[0]) > 0
    # beta clipped into [1e-3, beta0]
    _, s2 = box_loss(loc_true, loc_pred, mask,
                     BoxLossState(jnp.full((4,), 10.0), jnp.zeros((4,))))
    assert np.isfinite(float(_[0]))


def test_mask_loss_selects_class_channel():
    # one roi of class 1; target mask half fg
    mask_true = np.full((1, 1, 4, 4), 3, np.int32)   # background value C=3
    mask_true[0, 0, :2] = 1                          # class-1 pixels
    mask_pred = np.full((1, 1, 4, 4, 3), 0.5, np.float32)
    mask_pred[0, 0, :2, :, 1] = 0.9                  # good fg pred
    mask_pred[0, 0, 2:, :, 1] = 0.1                  # good bg pred
    loss = float(mask_loss(jnp.asarray(mask_true), jnp.asarray(mask_pred))[0])
    # per-roi mean BCE, then sum / (count_nonzero + 1) — the reference's
    # normalizer (losses.py:156-157) divides by 2 with a single roi
    want = -np.log(0.9 + 1e-7) / 2
    np.testing.assert_allclose(loss, want, rtol=1e-4)
    # unmatched roi (all background) contributes nothing
    empty = np.full((1, 1, 4, 4), 3, np.int32)
    l0 = float(mask_loss(jnp.asarray(empty), jnp.asarray(mask_pred))[0])
    assert l0 == 0.0


def test_seg_loss_exists_gate():
    seg_true = jnp.ones((1, 4, 4, 2))
    seg_pred = jnp.full((1, 4, 4, 2), 0.5)
    on = float(seg_loss(seg_true, seg_pred, jnp.ones((1, 2)))[0])
    half = float(seg_loss(seg_true, seg_pred, jnp.asarray([[1.0, 0.0]]))[0])
    np.testing.assert_allclose(half, on / 2, rtol=1e-5)


def test_class_binary_iou_empty_union_is_one():
    t = jnp.zeros((1, 4, 4, 2))
    p = jnp.zeros((1, 4, 4, 2))
    iou = np.asarray(class_binary_iou(t, p))
    np.testing.assert_allclose(iou, 1.0)


def test_detection_iou_metric_perfect():
    boxes = jnp.asarray([[[10, 10, 6, 6, 0, 1.0],
                          [-1, -1, -1, -1, -1, -1]]], jnp.float32)
    p, r, f = detection_iou_metric(boxes, boxes)
    np.testing.assert_allclose(float(p[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(r[0]), 1.0, atol=1e-5)


def test_confusion_matrix_metric_shapes():
    cls_true = jnp.zeros((1, 6, 3)).at[0, 0, 1].set(1.0)
    cls_pred = jnp.full((1, 6, 3), 0.1).at[0, 0, 1].set(0.9)
    mask = jnp.ones((1, 6, 1)).at[0, 0, 0].set(0.0)
    p, r, a, f = confusion_matrix_metric(cls_true, cls_pred, mask)
    np.testing.assert_allclose(float(p), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(r), 1.0, rtol=1e-5)
