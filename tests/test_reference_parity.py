"""Numeric parity against the REFERENCE implementation itself.

The reference's TF layers (pure math, no pretrained weights) run under the
installed TF with small TF1 shims (tf.log) and stubbed pretrained-model
packages. These tests feed identical inputs to the reference layers and to
our TPU-native ops and compare outputs — the strongest form of the parity
requirement (SURVEY.md §7: "parity harness should compare against the
as-built reference behavior").
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip('tensorflow')


@pytest.fixture(scope='module')
def ref():
    """Import reference layer modules with stubs; skip if impossible."""
    sys.path.insert(0, '/root/reference')
    for name in ('keras_applications', 'keras_applications.resnet_v2',
                 'efficientnet', 'efficientnet.tfkeras', 'thirdparty'):
        mod = types.ModuleType(name)
        sys.modules.setdefault(name, mod)
    sys.modules['keras_applications.resnet_v2'].ResNet101V2 = None
    sys.modules['efficientnet'].tfkeras = sys.modules['efficientnet.tfkeras']
    sys.modules['thirdparty'].Classifiers = None
    if not hasattr(tf, 'log'):
        tf.log = tf.math.log  # TF1 shim used by AssignBoxes
    if not hasattr(np, 'int'):
        np.int = int  # numpy<1.24 alias used by the reference's PriorBoxes
    if not hasattr(tf, 'count_nonzero'):
        tf.count_nonzero = tf.math.count_nonzero  # TF1 shim (MaskLoss)
    try:
        from engine.layers import detection as ref_detection
        from engine.layers import instance as ref_instance
        from engine import losses as ref_losses
    except Exception as exc:  # pragma: no cover - environment dependent
        pytest.skip(f'reference import failed: {exc}')
    return types.SimpleNamespace(detection=ref_detection,
                                 instance=ref_instance,
                                 losses=ref_losses)


RNG = np.random.RandomState(7)


def _boxes(n, scale=200.0):
    return np.stack([RNG.uniform(20, scale, n), RNG.uniform(20, scale, n),
                     RNG.uniform(10, 80, n), RNG.uniform(10, 80, n)],
                    -1).astype(np.float32)


def test_restore_boxes_parity(ref):
    from masklab_tpu.ops.boxes import decode_boxes
    loc = RNG.randn(1, 40, 4).astype(np.float32) * 0.3
    priors = _boxes(40)[None]
    want = ref.detection.RestoreBoxes()([tf.constant(loc),
                                         tf.constant(priors)]).numpy()
    got = np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(priors)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_calculate_iou_parity(ref):
    from masklab_tpu.ops.boxes import pairwise_iou
    a, b = _boxes(12), _boxes(9)
    want = ref.detection.CalculateIOU()([tf.constant(a),
                                         tf.constant(b)]).numpy()
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_assign_boxes_parity(ref):
    """Full anchor-assignment parity on a collision-free scene (the
    reference's duplicate-scatter order is nondeterministic, so gts are
    placed so no anchor threshold-matches two gts)."""
    from masklab_tpu.models.detection import assign_boxes
    priors = _boxes(60, scale=400.0)[None]
    gt = np.full((1, 3, 6), -1.0, np.float32)
    gt[0, 0] = [50, 50, 40, 40, 2, 1.0]
    gt[0, 1] = [300, 300, 60, 30, 0, 1.0]
    want_ct, want_lt, want_am = ref.detection.AssignBoxes(num_classes=5)(
        [tf.constant(gt), tf.constant(priors)])
    got_ct, got_lt, got_am = assign_boxes(jnp.asarray(gt[0]),
                                          jnp.asarray(priors[0]), 5)
    np.testing.assert_allclose(np.asarray(got_am)[:, 0],
                               want_am.numpy()[0, :, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_ct), want_ct.numpy()[0],
                               atol=1e-6)
    # loc targets only meaningful on assigned anchors
    assigned = want_am.numpy()[0, :, 0] == 0
    np.testing.assert_allclose(np.asarray(got_lt)[assigned],
                               want_lt.numpy()[0][assigned],
                               rtol=1e-4, atol=1e-4)


def test_detection_proposal_parity(ref):
    """Two-stage class-aware NMS vs the reference's DetectionProposal."""
    from masklab_tpu.ops.nms import class_aware_nms
    n, c = 120, 5
    boxes = _boxes(n)[None]
    cls = (RNG.rand(1, n, c).astype(np.float32)) ** 2
    layer = ref.detection.DetectionProposal(
        min_confidence=0.3, nms_iou_threshold=0.4, post_iou_threshold=0.6,
        nms_max_output_size=20, max_batch_size=1)
    want = layer([tf.constant(cls), tf.constant(boxes),
                  tf.zeros((1, 64, 64, 3))]).numpy()[0]
    got = np.asarray(class_aware_nms(
        jnp.asarray(cls[0]), jnp.asarray(boxes[0]), min_confidence=0.3,
        nms_iou_threshold=0.4, post_iou_threshold=0.6, max_outputs=20,
        candidates_per_class=n))
    want_rows = {tuple(np.round(r[:5], 3)) for r in want if r[0] != -1}
    got_rows = {tuple(np.round(r[:5], 3)) for r in got if r[0] != -1}
    assert want_rows == got_rows


def test_mask_distribute_parity(ref):
    from masklab_tpu.models.instance import mask_distribute
    boxes = np.concatenate([_boxes(10), RNG.rand(10, 2)], -1)[None]
    boxes = boxes.astype(np.float32)
    boxes[0, -2:] = -1.0
    want = ref.instance.MaskDistribute(max_k=2, base_size=36)(
        tf.constant(boxes)).numpy()
    got = np.asarray(mask_distribute(jnp.asarray(boxes), 2, 36))
    np.testing.assert_allclose(got, want[..., 0], atol=1e-6)


def test_assign_masks_parity(ref):
    from masklab_tpu.models.instance import assign_masks
    h = w = 64
    gt = np.full((1, 2, 6), -1.0, np.float32)
    gt[0, 0] = [24, 24, 20, 20, 1, 1.0]
    gt[0, 1] = [44, 44, 16, 16, 3, 1.0]
    gt_masks = np.zeros((1, 2, h, w), np.float32)
    gt_masks[0, 0, 14:34, 14:34] = 1.0
    gt_masks[0, 1, 36:52, 36:52] = 1.0
    rois = np.full((1, 3, 6), -1.0, np.float32)
    rois[0, 0] = [25, 23, 20, 22, 1, 0.9]     # matches gt0 (same class)
    rois[0, 1] = [44, 44, 18, 18, 0, 0.8]     # class mismatch -> unmatched
    roi_masks_shape = np.zeros((1, 3, 28, 28, 5), np.float32)
    want = ref.instance.AssignMasks()(
        [tf.constant(rois), tf.constant(roi_masks_shape),
         tf.constant(gt), tf.constant(gt_masks)]).numpy()
    got = np.asarray(assign_masks(jnp.asarray(rois), jnp.asarray(gt),
                                  jnp.asarray(gt_masks), (28, 28), 5))
    np.testing.assert_array_equal(got, want)


def test_class_and_seg_loss_layer_parity(ref):
    from masklab_tpu.losses import class_loss, seg_loss
    b, n, c = 2, 30, 5
    cls_true = (RNG.rand(b, n, c) > 0.8).astype(np.float32)
    cls_pred = RNG.rand(b, n, c).astype(np.float32)
    mask = RNG.choice([-1.0, 0.0, 1.0], size=(b, n, 1)).astype(np.float32)
    exists = (RNG.rand(b, c) > 0.3).astype(np.float32)
    want = ref.losses.ClassLoss(weight=300.0, alpha=0.25, gamma=2.0)(
        [tf.constant(cls_true), tf.constant(cls_pred), tf.constant(mask),
         tf.constant(exists)]).numpy()
    got = np.asarray(class_loss(jnp.asarray(cls_true), jnp.asarray(cls_pred),
                                jnp.asarray(mask), jnp.asarray(exists),
                                weight=300.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    seg_true = (RNG.rand(b, 16, 16, 3) > 0.5).astype(np.float32)
    seg_pred = RNG.rand(b, 16, 16, 3).astype(np.float32)
    seg_exists = np.asarray([[1, 1, 0], [1, 0, 1]], np.float32)
    want = ref.losses.SegLoss(weight=0.5)(
        [tf.constant(seg_true), tf.constant(seg_pred),
         tf.constant(seg_exists)]).numpy()
    got = np.asarray(seg_loss(jnp.asarray(seg_true), jnp.asarray(seg_pred),
                              jnp.asarray(seg_exists), weight=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prior_layer_parity(ref):
    """Anchor grid parity vs the reference's runtime PriorLayer."""
    from masklab_tpu.prior import PriorBoxes, generate_priors
    try:
        layer = ref.detection.PriorLayer(
            {'strides': [8, 16], 'sizes': [32, 64],
             'pr_scales': [1.0, 2 ** (1 / 3)], 'pr_ratios': [0.5, 1, 2]},
            padding='same')
        want = layer(tf.zeros((1, 48, 80, 3))).numpy()[0]
    except Exception as exc:
        pytest.skip(f'PriorLayer not runnable here: {exc}')
    prior = PriorBoxes([8, 16], [32, 64], [1.0, 2 ** (1 / 3)], [0.5, 1, 2])
    got = generate_priors(48, 80, prior, padding='same')
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mask_loss_layer_parity(ref):
    from masklab_tpu.losses import mask_loss
    b, r, hh, ww, c = 1, 3, 8, 8, 5
    mask_true = np.full((b, r, hh, ww), c, np.int32)
    mask_true[0, 0, :4] = 1
    mask_true[0, 1, 2:6, 2:6] = 3
    mask_pred = RNG.rand(b, r, hh, ww, c).astype(np.float32)
    try:
        want = ref.losses.MaskLoss(weight=0.01)(
            [tf.constant(mask_true), tf.constant(mask_pred)]).numpy()
    except Exception as exc:
        pytest.skip(f'MaskLoss not runnable here: {exc}')
    got = np.asarray(mask_loss(jnp.asarray(mask_true),
                               jnp.asarray(mask_pred), weight=0.01))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_metrics_parity(ref):
    sys.path.insert(0, '/root/reference')
    try:
        from engine import metrics as ref_metrics
    except Exception as exc:
        pytest.skip(f'metrics import failed: {exc}')
    from masklab_tpu.metrics import class_binary_iou, detection_iou_metric
    seg_true = (RNG.rand(2, 16, 16, 3) > 0.5).astype(np.float32)
    seg_pred = RNG.rand(2, 16, 16, 3).astype(np.float32)
    want = tf.stack(ref_metrics.ClassBinaryIOU(0.5)(
        [tf.constant(seg_true), tf.constant(seg_pred)]), axis=1).numpy()
    got = np.asarray(class_binary_iou(jnp.asarray(seg_true),
                                      jnp.asarray(seg_pred)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    prop = np.full((2, 6, 6), -1.0, np.float32)
    gt = np.full((2, 4, 6), -1.0, np.float32)
    prop[0, 0] = [30, 30, 20, 20, 1, 0.9]
    prop[0, 1] = [100, 100, 30, 30, 0, 0.8]
    gt[0, 0] = [31, 30, 21, 20, 1, 1.0]
    gt[1, 0] = [50, 50, 10, 10, 2, 1.0]
    try:
        wp, wr, wf = ref_metrics.DetectionIOUMetric()(
            [tf.constant(prop), tf.constant(gt)])
        wp, wr, wf = wp.numpy(), wr.numpy(), wf.numpy()
    except Exception as exc:
        pytest.skip(f'DetectionIOUMetric not runnable: {exc}')
    gp, gr, gf = detection_iou_metric(jnp.asarray(prop), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(gp), wp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), wr, rtol=1e-4, atol=1e-5)


def test_semantic_smoothing_parity(ref):
    sys.path.insert(0, '/root/reference')
    # TF1->TF2 signature shim for erosion2d/dilation2d (value, kernel,
    # strides, rates, padding) -> (value, filters, strides, padding,
    # data_format, dilations)
    orig_ero, orig_dil = tf.nn.erosion2d, tf.nn.dilation2d

    def ero(value, kernel, strides, rates, padding):
        return orig_ero(value, kernel, strides=strides, padding=padding,
                        data_format='NHWC', dilations=rates)

    def dil(value, kernel, strides, rates, padding):
        return orig_dil(value, kernel, strides=strides, padding=padding,
                        data_format='NHWC', dilations=rates)

    tf.nn.erosion2d, tf.nn.dilation2d = ero, dil
    try:
        from engine.layers import semantic as ref_semantic
        from masklab_tpu.ops.morphology import semantic_smoothing
        x = RNG.rand(1, 16, 16, 2).astype(np.float32)
        want = ref_semantic.SemanticSmoothing(kernel_size=3, weight=1.5)(
            tf.constant(x)).numpy()
        got = np.asarray(semantic_smoothing(jnp.asarray(x), 3, 1.5))
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        tf.nn.erosion2d, tf.nn.dilation2d = orig_ero, orig_dil


def test_trim_instances_parity(ref):
    """Per-box class-channel selection vs the reference's TrimInstances
    (gather + MoldBatch vs our fixed slots — compare as sets)."""
    from masklab_tpu.models.instance import trim_instances
    roi_boxes = np.full((1, 4, 6), -1.0, np.float32)
    roi_boxes[0, 0] = [30, 30, 20, 20, 1, 0.9]
    roi_boxes[0, 1] = [60, 60, 10, 10, 3, 0.7]
    roi_masks = RNG.rand(1, 4, 6, 6, 5).astype(np.float32)
    want_boxes, want_masks = ref.instance.TrimInstances(
        mold=True, max_batch_size=1)(
        [tf.constant(roi_boxes), tf.constant(roi_masks)])
    want_masks = want_masks.numpy()
    got_boxes, got_masks = trim_instances(jnp.asarray(roi_boxes),
                                          jnp.asarray(roi_masks))
    got_masks = np.asarray(got_masks)
    # reference compacts valid rows first; ours keeps slot positions.
    # compare the valid masks pairwise in order
    np.testing.assert_allclose(got_masks[0, 0], want_masks[0, 0],
                               atol=1e-6)  # class-1 channel of roi 0
    np.testing.assert_allclose(got_masks[0, 1], want_masks[0, 1],
                               atol=1e-6)  # class-3 channel of roi 1


def test_downsample_parity(ref):
    sys.path.insert(0, '/root/reference')
    try:
        from engine.layers import misc as ref_misc
    except Exception as exc:
        pytest.skip(f'misc import failed: {exc}')
    from masklab_tpu.ops.resize import downsample_input
    x = RNG.rand(1, 135, 240, 3).astype(np.float32) * 255
    want = ref_misc.DownSampleInput(target_size=(54, 96))(
        tf.constant(x)).numpy()
    got = np.asarray(downsample_input(jnp.asarray(x), (54, 96)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_road_analytics_parity(ref):
    """CalculateInstanceSize / IncludeMyRoad vs the reference layers.

    The road-width least-squares fit matches to <1% — the residual
    difference comes from the reference's tf.segment_min row indexing
    (misc.py:684-688), which mis-numbers rows when the road does not
    start at row 0; our masked row-extent form indexes rows directly.
    """
    if not hasattr(tf, 'segment_min'):
        tf.segment_min = tf.math.segment_min
        tf.segment_max = tf.math.segment_max
    sys.path.insert(0, '/root/reference')
    try:
        from engine.layers import misc as ref_misc
    except Exception as exc:
        pytest.skip(f'misc import failed: {exc}')
    from masklab_tpu.serving.summary import (calculate_instance_size,
                                             include_my_road)
    seg = np.zeros((1, 64, 64, 3), np.float32)
    for y in range(20, 64):
        seg[0, y, 30 - (y - 20) // 3:34 + (y - 20) // 2, 1] = 1.0
    masks = np.zeros((1, 2, 64, 64), np.float32)
    masks[0, 0, 30:40, 24:34] = 1.0
    masks[0, 1, 50:60, 10:20] = 1.0
    want = ref_misc.CalculateInstanceSize(default_road_size=3.25)(
        [tf.constant(seg), tf.constant(masks)]).numpy()
    got = np.asarray(calculate_instance_size(jnp.asarray(seg),
                                             jnp.asarray(masks)))
    np.testing.assert_allclose(got, want, rtol=0.02)
    want_inc = ref_misc.IncludeMyRoad()([tf.constant(seg),
                                         tf.constant(masks)]).numpy()
    got_inc = np.asarray(include_my_road(jnp.asarray(seg),
                                         jnp.asarray(masks)))
    np.testing.assert_array_equal(got_inc, want_inc)


def test_crack_to_instance_parity(ref):
    sys.path.insert(0, '/root/reference')
    try:
        from engine.layers import misc as ref_misc
    except Exception as exc:
        pytest.skip(f'misc import failed: {exc}')
    from masklab_tpu.serving.summary import crack_to_instance
    crack = np.zeros((1, 48, 64), np.float32)
    crack[0, 10:20, 8:40] = 1.0
    want_det, want_seg = ref_misc.CrackToInstance()(tf.constant(crack))
    got_det, got_seg = crack_to_instance(jnp.asarray(crack))
    np.testing.assert_allclose(np.asarray(got_det), want_det.numpy(),
                               atol=1.0)  # int-cast center rounding
    np.testing.assert_allclose(np.asarray(got_seg), want_seg.numpy())


def test_draw_segmentation_parity(ref):
    sys.path.insert(0, '/root/reference')
    try:
        from engine.layers import misc as ref_misc
    except Exception as exc:
        pytest.skip(f'misc import failed: {exc}')
    from masklab_tpu.serving.visualize import draw_segmentation
    img = (RNG.rand(1, 16, 16, 3) * 255).astype(np.float32)
    seg = (RNG.rand(1, 16, 16, 3) > 0.5).astype(np.float32)
    colors = [[64, 0, 128], [128, 96, 0], [128, 192, 0]]
    want = ref_misc.DrawSegmentation(colors, alpha=0.3)(
        [tf.constant(img), tf.constant(seg)]).numpy()
    got = np.asarray(draw_segmentation(jnp.asarray(img), jnp.asarray(seg),
                                       colors, 0.3))
    np.testing.assert_array_equal(got, want)


def test_loss_helpers_parity(ref):
    from masklab_tpu.losses import binary_cross_entropy, focal_loss, smooth_l1
    yt = (RNG.rand(8, 5) > 0.5).astype(np.float32)
    yp = RNG.rand(8, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(focal_loss(jnp.asarray(yt), jnp.asarray(yp))),
        ref.losses.focal_loss(tf.constant(yt), tf.constant(yp)).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(smooth_l1(jnp.asarray(yt * 3), jnp.asarray(yp))),
        ref.losses.smooth_l1(tf.constant(yt * 3),
                             tf.constant(yp)).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(binary_cross_entropy(jnp.asarray(yt), jnp.asarray(yp),
                                        0.1)),
        ref.losses.binary_cross_entropy(tf.constant(yt), tf.constant(yp),
                                        0.1).numpy(),
        rtol=1e-4, atol=1e-5)
