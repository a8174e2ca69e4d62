"""Weight-transplant numeric parity vs the reference's parameterized Keras
layers (VERDICT round-1 task 1).

Each test instantiates the *reference layer itself* (engine/layers/*,
engine/normalization.py, thirdparty backbones) with random weights,
transplants the weights into the flax module through the structure-
validated converters in masklab_tpu/utils/keras_import.py, feeds both the
same input, and asserts the outputs agree. This proves the conv stacks
themselves — not just the stateless math — are the reference's.
"""
import numpy as np
import pytest

import jax.numpy as jnp

tf = pytest.importorskip('tensorflow')

from masklab_tpu.utils import keras_import as ki  # noqa: E402

RNG = np.random.RandomState(42)


@pytest.fixture(scope='module')
def ref():
    from ref_shim import reference_modules
    try:
        return reference_modules()
    except Exception as exc:  # pragma: no cover - environment dependent
        pytest.skip(f'reference import failed: {exc}')


def randomize(layer, scale=0.1):
    """Randomize every weight (positive values for moving variances)."""
    new = []
    for w in layer.weights:
        name = (getattr(w, 'path', None) or w.name)
        arr = RNG.randn(*w.shape).astype(np.float32) * scale
        if 'moving_variance' in name:
            arr = np.abs(arr) + 0.5
        new.append(arr)
    layer.set_weights(new)


def _x(*shape, scale=1.0):
    return (RNG.randn(*shape) * scale).astype(np.float32)


def assert_close(got, want, tol=1e-5):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol * 10, atol=tol)


# ---------------------------------------------------------------------------
# elementary layers
# ---------------------------------------------------------------------------

def test_group_normalization(ref):
    from masklab_tpu.nn.layers import GroupNorm
    x = _x(2, 8, 8, 32)
    layer = ref.normalization.GroupNormalization(groups=16)
    layer(tf.constant(x))
    randomize(layer)
    want = layer(tf.constant(x)).numpy()
    cur = ki.WeightCursor(ki.weights_of_layer(layer), 'gn')
    params = ki.take_gn(cur)
    cur.finish()
    got = GroupNorm(16).apply({'params': params}, jnp.asarray(x))
    assert_close(got, want)
    # ragged spatial extent (G does not divide H*W — the mask-head 14x14
    # crops) exercises the flat-band fallback + periodic affine table
    xr = _x(2, 14, 14, 32)
    want_r = layer(tf.constant(xr)).numpy()
    got_r = GroupNorm(16).apply({'params': params}, jnp.asarray(xr))
    assert_close(got_r, want_r)


def test_squeeze_excite(ref):
    from masklab_tpu.nn.layers import SqueezeExcite
    x = _x(2, 8, 8, 32)
    layer = ref.misc.SqueezeExcite(ratio=16)
    layer(tf.constant(x))
    randomize(layer)
    want = layer(tf.constant(x)).numpy()
    cur = ki.WeightCursor(ki.weights_of_layer(layer), 'se')
    params = ki.take_squeeze_excite(cur)
    cur.finish()
    got = SqueezeExcite(16.0).apply({'params': params}, jnp.asarray(x))
    assert_close(got, want)


def test_mobile_separable_conv(ref):
    from masklab_tpu.nn.layers import MobileSeparableConv
    x = _x(2, 8, 8, 32)
    layer = ref.misc.MobileSeparableConv2D(32, (3, 3), expand_ratio=4,
                                           groups=16)
    layer(tf.constant(x))
    randomize(layer)
    want = layer(tf.constant(x)).numpy()
    cur = ki.WeightCursor(ki.weights_of_layer(layer), 'msc')
    params = ki.take_mobile_sep(cur)
    cur.finish()
    got = MobileSeparableConv(32, (3, 3), expand_ratio=4.0, groups=16).apply(
        {'params': params}, jnp.asarray(x))
    assert_close(got, want)


def test_atrous_separable_conv(ref):
    from masklab_tpu.nn.layers import AtrousSeparableConv
    x = _x(2, 16, 16, 32)
    layer = ref.semantic.AtrousSeparableConv2D(48, dilation_rate=3, groups=16)
    layer(tf.constant(x))
    randomize(layer)
    want = layer(tf.constant(x)).numpy()
    cur = ki.WeightCursor(ki.weights_of_layer(layer), 'asc')
    params = ki.take_atrous_sep(cur)
    cur.finish()
    got = AtrousSeparableConv(48, dilation_rate=3, groups=16).apply(
        {'params': params}, jnp.asarray(x))
    assert_close(got, want)


# ---------------------------------------------------------------------------
# semantic path
# ---------------------------------------------------------------------------

def test_aspp_network(ref):
    from masklab_tpu.models.semantic import ASPPNetwork
    x = _x(2, 16, 16, 32)
    layer = ref.semantic.ASPPNetwork(num_features=32, atrous_rate=(2, 4),
                                     groups=16)
    layer(tf.constant(x))
    randomize(layer)
    want = layer(tf.constant(x)).numpy()
    params = ki.convert_aspp(ki.weights_of_layer(layer), atrous_rate=(2, 4))
    got = ASPPNetwork(num_features=32, atrous_rate=(2, 4), groups=16).apply(
        {'params': params}, jnp.asarray(x))
    assert_close(got, want)


@pytest.mark.parametrize('use_sep,use_se', [(False, False), (True, True)])
def test_segmentation_subnet(ref, use_sep, use_se):
    from masklab_tpu.models.semantic import SegmentationSubNet
    # concat channels (dec 16 + skip 16) must equal num_features=32 for the
    # separable variant's residual Add — a reference constraint too
    dec = _x(1, 8, 8, 16)
    skip = _x(1, 16, 16, 24)
    layer = ref.semantic.SegmentationSubNet(
        num_depth=2, num_features=32, num_skip_features=16, num_classes=3,
        use_separable_conv=use_sep, expand_ratio=2,
        use_squeeze_excite=use_se, squeeze_ratio=4, groups=16)
    layer([tf.constant(dec), tf.constant(skip)])
    randomize(layer)
    want = layer([tf.constant(dec), tf.constant(skip)]).numpy()
    params = ki.convert_seg_subnet(ki.weights_of_layer(layer), num_depth=2,
                                   use_separable_conv=use_sep,
                                   use_squeeze_excite=use_se)
    got = SegmentationSubNet(
        num_classes=3, num_depth=2, num_features=32, num_skip_features=16,
        use_separable_conv=use_sep, expand_ratio=2.0,
        use_squeeze_excite=use_se, squeeze_ratio=4.0, groups=16).apply(
            {'params': params}, jnp.asarray(dec), jnp.asarray(skip))
    assert_close(got, want)


# ---------------------------------------------------------------------------
# detection path
# ---------------------------------------------------------------------------

def _pyramid_inputs(channels=(24, 40, 64)):
    sizes = [(16, 16), (8, 8), (4, 4)]
    return [_x(1, h, w, c) for (h, w), c in zip(sizes, channels)]


def test_feature_pyramid(ref):
    from masklab_tpu.models.detection import FeaturePyramid
    feats = _pyramid_inputs()
    layer = ref.detection.FeaturePyramid(strides=[8, 16, 32],
                                         num_features=32)
    layer([tf.constant(f) for f in feats])
    randomize(layer)
    want = [t.numpy() for t in layer([tf.constant(f) for f in feats])]
    params = ki.convert_fpn(ki.weights_of_layer(layer), num_levels=3)
    got = FeaturePyramid(num_features=32).apply(
        {'params': params}, [jnp.asarray(f) for f in feats])
    for g, w in zip(got, want):
        assert_close(g, w)


@pytest.mark.parametrize('use_sep,use_se', [(False, False), (False, True),
                                            (True, False)])
def test_classification_subnet(ref, use_sep, use_se):
    from masklab_tpu.models.detection import ClassificationSubNet
    feats = _pyramid_inputs((32, 32, 32))
    layer = ref.detection.ClassificationSubNet(
        num_blocks=3, num_classes=4, num_depth=2, num_features=32,
        num_priors=2, use_separable_conv=use_sep, expand_ratio=2,
        use_squeeze_excite=use_se, squeeze_ratio=4, groups=16)
    layer([tf.constant(f) for f in feats])
    randomize(layer)
    want = layer([tf.constant(f) for f in feats]).numpy()
    params = ki.convert_head_subnet(
        ki.weights_of_layer(layer), num_blocks=3, num_depth=2,
        use_separable_conv=use_sep, use_squeeze_excite=use_se)
    got = ClassificationSubNet(
        num_blocks=3, num_classes=4, num_depth=2, num_features=32,
        num_priors=2, use_separable_conv=use_sep, expand_ratio=2.0,
        use_squeeze_excite=use_se, squeeze_ratio=4.0, groups=16).apply(
            {'params': params}, [jnp.asarray(f) for f in feats])
    assert_close(got, want)


def test_box_regression_subnet(ref):
    from masklab_tpu.models.detection import BoxRegressionSubNet
    feats = _pyramid_inputs((32, 32, 32))
    layer = ref.detection.BoxRegressionSubNet(
        num_blocks=3, num_depth=2, num_features=32, num_priors=2, groups=16)
    layer([tf.constant(f) for f in feats])
    randomize(layer)
    want = layer([tf.constant(f) for f in feats]).numpy()
    params = ki.convert_head_subnet(
        ki.weights_of_layer(layer), num_blocks=3, num_depth=2)
    got = BoxRegressionSubNet(
        num_blocks=3, num_depth=2, num_features=32, num_priors=2,
        groups=16).apply({'params': params},
                         [jnp.asarray(f) for f in feats])
    assert_close(got, want)


# ---------------------------------------------------------------------------
# instance path
# ---------------------------------------------------------------------------

def test_mask_subnet(ref):
    from masklab_tpu.models.instance import MaskSubNet
    crops = [_x(1, 3, 7, 7, 32) for _ in range(2)]
    layer = ref.instance.MaskSubNet(
        num_blocks=2, num_classes=4, num_depth=2, num_features=32, groups=16)
    layer([tf.constant(c) for c in crops])
    randomize(layer)
    want = layer([tf.constant(c) for c in crops]).numpy()  # concat axis=1
    params = ki.convert_mask_subnet(
        ki.weights_of_layer(layer), num_blocks=2, num_depth=2)
    got = MaskSubNet(num_blocks=2, num_classes=4, num_depth=2,
                     num_features=32, groups=16).apply(
        {'params': params}, [jnp.asarray(c) for c in crops])
    got = jnp.concatenate(got, axis=1)
    assert_close(got, want)


# ---------------------------------------------------------------------------
# backbones
# ---------------------------------------------------------------------------

def test_seresnet34_backbone(ref):
    """The production road-config backbone (road_project/train.py:21-63):
    thirdparty pre-activation SE-ResNet34 vs CMResNet, all 5 endpoints."""
    from masklab_tpu.nn.backbone.resnet import seresnet34
    from thirdparty.classification_models.models.resnet import SEResNet34
    m = SEResNet34(input_shape=(96, 96, 3), weights=None, include_top=False)
    taps = ['relu0', 'stage2_unit1_relu1', 'stage3_unit1_relu1',
            'stage4_unit1_relu1', 'relu1']
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 96, 96, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_seresnet34(ki.weights_of_layer(m))
    got = seresnet34().apply({'params': params, 'batch_stats': stats},
                             jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_mobilenet_backbone(ref):
    from masklab_tpu.nn.backbone.mobilenet import MobileNetV1
    m = tf.keras.applications.MobileNet(
        input_shape=(64, 64, 3), include_top=False, weights=None, alpha=1.0)
    taps = [f'conv_pw_{k}_relu' for k in (1, 3, 5, 11, 13)]
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 64, 64, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_mobilenet(ki.weights_of_layer(m))
    got = MobileNetV1().apply({'params': params, 'batch_stats': stats},
                              jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_resnet50_backbone(ref):
    """keras.applications ResNet50 v1 (base.py:190-195): biased convs,
    stride on the first 1x1 ('caffe style'), eps 1.001e-5; the reference
    taps the stage-output relus (base.py:105-111 'activation_{9,21,39,48}'
    = conv{2..5} stack outputs) plus the stem relu as C1."""
    from masklab_tpu.nn.backbone.resnet import resnet50
    m = tf.keras.applications.ResNet50(
        input_shape=(96, 96, 3), include_top=False, weights=None)
    taps = ['conv1_relu', 'conv2_block3_out', 'conv3_block4_out',
            'conv4_block6_out', 'conv5_block3_out']
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 96, 96, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_resnet50(ki.weights_of_layer(m))
    got = resnet50().apply({'params': params, 'batch_stats': stats},
                           jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_backbone_converters_cover_reference_zoo():
    """Registry-keyed maps need a covers-the-registry test (round-3
    lesson): every backbone the REFERENCE can build (base.py:185-316)
    must have an h5 weight converter and a body-name mapping."""
    reference_zoo = ('resnet50', 'resnet50v2', 'resnet101v2', 'resnext50',
                     'seresnet34', 'seresnet50', 'seresnext50', 'vgg16',
                     'mobilenet', 'efficientnetb2', 'efficientnetb3',
                     'efficientnetb4')
    for name in reference_zoo:
        assert name in ki._BACKBONE_CONVERTERS, name


def test_converter_rejects_oversized_topology(ref):
    """A structurally larger checkpoint (resnet101v2 into the resnet50v2
    entry) must fail loudly, not import a silent subset (round-4
    review)."""
    m = tf.keras.applications.ResNet101V2(
        input_shape=(96, 96, 3), include_top=False, weights=None)
    with pytest.raises(ki.ImportMismatch, match='unconsumed'):
        ki.convert_resnet_v2(ki.weights_of_layer(m),
                             stage_blocks=(3, 4, 6, 3))


def test_resnet50v2_backbone(ref):
    """keras_applications resnet_v2 topology (models_factory.py:30): stride
    on each stack's last block, maxpool shortcut, mid-stage preact_relu
    taps (base.py:112-117 — conv4 tapped at block4 of 6)."""
    from masklab_tpu.nn.backbone.resnet import resnet50v2
    m = tf.keras.applications.ResNet50V2(
        input_shape=(96, 96, 3), include_top=False, weights=None)
    taps = ['conv1_conv', 'conv2_block3_preact_relu',
            'conv3_block4_preact_relu', 'conv4_block4_preact_relu',
            'post_relu']
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 96, 96, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_resnet_v2(ki.weights_of_layer(m))
    got = resnet50v2().apply({'params': params, 'batch_stats': stats},
                             jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_resnet101v2_backbone(ref):
    """ResNet101V2 (base.py:204-212): the reference taps the *inner*
    64/128/256-channel ``_1_relu`` of each stack's last block
    (base.py:119-125)."""
    from masklab_tpu.nn.backbone.resnet import resnet101v2
    m = tf.keras.applications.ResNet101V2(
        input_shape=(96, 96, 3), include_top=False, weights=None)
    taps = ['conv1_conv', 'conv2_block3_1_relu', 'conv3_block4_1_relu',
            'conv4_block23_1_relu', 'post_relu']
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 96, 96, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_resnet_v2(ki.weights_of_layer(m),
                                         stage_blocks=(3, 4, 23, 3))
    got = resnet101v2().apply({'params': params, 'batch_stats': stats},
                              jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_resnext50_backbone(ref):
    """engine/backbone/ResNext.py: grouped 3x3 realized as
    DepthwiseConv2D(depth_multiplier=c) + split/reduce/merge
    (ResNext.py:23-77) vs native feature_group_count, all 5 taps
    (base.py:146-153)."""
    from masklab_tpu.nn.backbone.resnet import resnext50
    from engine.backbone.ResNext import ResNeXt50
    m = ResNeXt50(input_shape=(64, 64, 3), include_top=False, weights=None)
    taps = ['conv1_relu', 'conv2_block3_out', 'conv3_block4_out',
            'conv4_block6_out', 'conv5_block3_out']
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 64, 64, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_resnext50(ki.weights_of_layer(m))
    got = resnext50().apply({'params': params, 'batch_stats': stats},
                            jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_vgg16_backbone(ref):
    from masklab_tpu.nn.backbone.vgg import VGG16
    m = tf.keras.applications.VGG16(
        input_shape=(64, 64, 3), include_top=False, weights=None)
    taps = ['block2_conv2', 'block3_conv3', 'block4_conv3', 'block5_conv3',
            'block5_pool']
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    # scale 0.04 keeps activations O(1) through 13 un-normalized convs;
    # at the default 0.1 they reach ~1e2 and f32 accumulation-order noise
    # exceeds the transplant tolerance
    randomize(m, scale=0.04)
    x = _x(1, 64, 64, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, _ = ki.convert_vgg16(ki.weights_of_layer(m))
    got = VGG16().apply({'params': params}, jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_efficientnetb2_backbone(ref):
    """The reference builds EfficientNetB2 from the ``efficientnet``
    package (engine/backbone/base.py:259-279), which is not installable
    offline; keras.applications.EfficientNetB2 implements the same
    TF-TPU architecture with the same layer naming (block{S}{a..}_*) and
    serves as the transplant oracle. Input normalization (the keras
    model's rescaling+normalization layers) is applied by the oracle
    itself and its output fed to the flax model."""
    from masklab_tpu.nn.backbone.efficientnet import efficientnet_b2
    m = tf.keras.applications.EfficientNetB2(
        input_shape=(64, 64, 3), include_top=False, weights=None)
    taps = ['block2a_expand_activation', 'block3a_expand_activation',
            'block4a_expand_activation', 'block6a_expand_activation',
            'top_activation']
    norm_out = m.get_layer('normalization').output
    tap_model = tf.keras.Model(
        m.input, [norm_out] + [m.get_layer(t).output for t in taps])
    for layer in m.layers:
        # keep the input rescaling/normalization constants sane (their
        # 'variance'/'count' weights are not moving_* named)
        if layer.weights and layer.name not in ('normalization',
                                                'rescaling'):
            randomize(layer)
    x = _x(1, 64, 64, 3, scale=60.0) + 120.0  # pixel-range input
    outs = [t.numpy() for t in tap_model(tf.constant(x))]
    x_norm, want = outs[0], outs[1:]
    params, stats = ki.convert_efficientnet(ki.weights_of_layer(m),
                                            width=1.1, depth=1.2)
    got = efficientnet_b2().apply({'params': params, 'batch_stats': stats},
                                  jnp.asarray(x_norm), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def _senet_model(ref, name):
    """Build a vendored senet model (senet.py requires input_tensor +
    original_input, the reference's calling convention, base.py:220-247)."""
    from thirdparty.classification_models.models import senet
    inp = tf.keras.Input((64, 64, 3), name='input')
    return senet.SENet(senet.MODELS_PARAMS[name], input_tensor=inp,
                       include_top=False, weights=None,
                       original_input=inp,
                       backend=tf.keras.backend, layers=tf.keras.layers,
                       models=tf.keras.models, utils=tf.keras.utils)


def _senet_taps(m, indices):
    """Tap layers by Activation build index (5 per block: relu1, relu2,
    SE relu, SE sigmoid, out relu; stem relu is index 0), matching the
    reference's global-counter names activation_{N} (base.py:133-145):
    seresnet50 taps stage outputs (0,15,35,65,80); seresnext50 taps the
    post-conv1 relu inside the next stage's first block (0,16,36,66,80)."""
    acts = [l.name for l in m.layers
            if isinstance(l, tf.keras.layers.Activation)]
    return [acts[i] for i in indices]


def test_seresnet50_backbone(ref):
    """Vendored senet.py SEResNetBottleneck (stride on the first 1x1,
    BN eps ~1e-5, SE before Add) — anonymous layers, order-based
    conversion. Taps by activation index (base.py:133-139)."""
    from masklab_tpu.nn.backbone.resnet import seresnet50
    m = _senet_model(ref, 'seresnet50')
    taps = _senet_taps(m, (0, 15, 35, 65, 80))
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 64, 64, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_senet(ki.weights_of_layer(m), groups=1)
    got = seresnet50().apply({'params': params, 'batch_stats': stats},
                             jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)


def test_seresnext50_backbone(ref):
    """Vendored senet.py SEResNeXtBottleneck: GroupConv2D = 32 sliced
    convs (._common_blocks.py:13-78) vs native feature_group_count."""
    from masklab_tpu.nn.backbone.resnet import seresnext50
    m = _senet_model(ref, 'seresnext50')
    taps = _senet_taps(m, (0, 16, 36, 66, 80))
    tap_model = tf.keras.Model(m.input,
                               [m.get_layer(t).output for t in taps])
    randomize(m)
    x = _x(1, 64, 64, 3)
    want = [t.numpy() for t in tap_model(tf.constant(x))]
    params, stats = ki.convert_senet(ki.weights_of_layer(m), groups=32)
    got = seresnext50().apply({'params': params, 'batch_stats': stats},
                              jnp.asarray(x), train=False)
    for i, name in enumerate(['C1', 'C2', 'C3', 'C4', 'C5']):
        assert_close(got[name], want[i], tol=2e-4)
