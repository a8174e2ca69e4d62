"""Backbone zoo: endpoint strides, extras, preprocessing, freeze masks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu.nn.backbone import (BACKBONE_REGISTRY, BackboneNetwork,
                                     grid_padding, module_frozen)
from masklab_tpu.nn.backbone.preprocess import preprocess_input


def _build(backbone_type, hw=(64, 64), outputs=('C3', 'C4', 'C5', 'P6', 'P7')):
    model = BackboneNetwork(backbone_type=backbone_type,
                            backbone_outputs=outputs, num_features=32)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    return model, variables, out


@pytest.mark.parametrize('backbone_type', ['mobilenet', 'mobilenetv2',
                                           'resnet50', 'seresnet34',
                                           'resnext50'])
def test_endpoint_strides(backbone_type):
    h = 128
    _, _, out = _build(backbone_type, hw=(h, h))
    for name, stride in (('C3', 8), ('C4', 16), ('C5', 32)):
        assert out[name].shape[1] == h // stride, (backbone_type, name)
    assert out['P6'].shape[1] == h // 64
    assert out['P7'].shape[1] == h // 128


def test_all_registry_entries_build():
    for name in BACKBONE_REGISTRY:
        _, _, out = _build(name, hw=(64, 64), outputs=('C3', 'C5'))
        assert set(out) == {'C3', 'C5'}


def test_preprocess_modes():
    x = jnp.full((1, 2, 2, 3), 255.0)
    # mode 2 without mean shift -> [-1, 1]
    y = preprocess_input(x, rgb=False, mean_shift=False, normalize=2)
    np.testing.assert_allclose(np.asarray(y), 1.0)
    # mode 1 -> [0, 1]
    y = preprocess_input(x, rgb=True, mean_shift=False, normalize=1)
    np.testing.assert_allclose(np.asarray(y), 1.0)
    # bgr swap moves channel order
    x2 = jnp.asarray([[[[1.0, 2.0, 3.0]]]])
    y = preprocess_input(x2, rgb=False, mean_shift=False, normalize=0)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], [3.0, 2.0, 1.0])


def test_grid_padding_modes():
    assert grid_padding('mobilenet') == 'valid'
    assert grid_padding('resnet50') == 'same'


def test_freeze_mask_depths():
    # resnet family
    assert module_frozen('resnet50', 'stem', 'C5')
    assert module_frozen('resnet50', 'stage5', 'C5')
    assert not module_frozen('resnet50', 'stage3', 'C2')
    assert module_frozen('resnet50', 'stage2', 'C2')
    assert not module_frozen('resnet50', 'extras_P6_conv', 'C5')
    assert not module_frozen('resnet50', 'stem', 'C0')
    # mobilenet
    assert module_frozen('mobilenet', 'pw5', 'C3')
    assert not module_frozen('mobilenet', 'dw6', 'C3')
    assert module_frozen('mobilenet', 'pw13', 'C5')
    # seresnext50: its C2-C4 taps are post-conv1 relus inside the NEXT
    # stage's first block, so the layer-order cutoff also freezes that
    # block's conv1+bn1 (ADVICE r3)
    assert module_frozen('seresnext50', 'stage3', 'C3')
    assert module_frozen('seresnext50',
                         'stage4/BottleneckBlock_0/Conv_0', 'C3')
    assert module_frozen('seresnext50',
                         'stage4/BottleneckBlock_0/_BN_0', 'C3')
    assert not module_frozen('seresnext50',
                             'stage4/BottleneckBlock_0/Conv_1', 'C3')
    assert not module_frozen('seresnext50',
                             'stage4/BottleneckBlock_1/Conv_0', 'C3')
    assert module_frozen('seresnext50', 'stage5', 'C5')
    assert not module_frozen('seresnext50', 'extras_P6_conv', 'C5')
    # plain resnext50 keeps whole-stage granularity (no inner taps)
    assert not module_frozen('resnext50',
                             'stage4/BottleneckBlock_0/Conv_0', 'C3')
    # seresnet34 C1: the tap is 'relu0' BEFORE stage1 (base.py:127), so
    # stage1_unit1 stays fully trainable — only the stem freezes
    # (round-4 review: the C2-C4 in-unit preact rule must not fire at C1)
    assert module_frozen('seresnet34', 'conv0', 'C1')
    assert module_frozen('seresnet34', 'bn0', 'C1')
    assert not module_frozen('seresnet34', 'stage1_unit1/bn1', 'C1')
    assert not module_frozen('seresnet34', 'stage1_unit1/conv1', 'C1')
    # ...while at C2 the tap is stage2_unit1's preact relu1, so that
    # unit's bn1 (built before it) freezes
    assert module_frozen('seresnet34', 'stage1_unit1/conv1', 'C2')
    assert module_frozen('seresnet34', 'stage2_unit1/bn1', 'C2')
    assert not module_frozen('seresnet34', 'stage2_unit1/conv1', 'C2')
    # efficientnet: C1-C4 taps are the expand activation inside the next
    # stage's first block — its expand Conv_0/_BN_0 freeze too
    # (block2a_expand_conv/bn before block2a_expand_activation)
    assert module_frozen('efficientnetb2', 'stage0_block0/Conv_0', 'C1')
    assert module_frozen('efficientnetb2', 'stage1_block0/Conv_0', 'C1')
    assert module_frozen('efficientnetb2', 'stage1_block0/_BN_0', 'C1')
    assert not module_frozen('efficientnetb2', 'stage1_block0/Conv_1', 'C1')
    assert not module_frozen('efficientnetb2', 'stage1_block1/Conv_0', 'C1')
    assert module_frozen('efficientnetb2', 'stage5_block0/Conv_0', 'C4')
    assert not module_frozen('efficientnetb2', 'stage5_block0/Conv_1', 'C4')
    assert module_frozen('efficientnetb2', 'stage6_block0/Conv_0', 'C5')
    assert module_frozen('efficientnetb2', 'top_conv', 'C5')
    # mobilenetv2 taps are the next stage's first block's INPUT, so
    # whole-stage granularity is exact there
    assert module_frozen('mobilenetv2', 'stage0_block0/Conv_0', 'C1')
    assert not module_frozen('mobilenetv2', 'stage1_block0/Conv_0', 'C1')


@pytest.mark.parametrize('name', ['efficientnetb2', 'efficientnetb3',
                                  'efficientnetb4'])
def test_efficientnet_endpoint_channels(name):
    """Endpoint widths must equal the reference efficientnet package's
    block{2,3,4,6}a_expand_activation / top_activation channel counts
    (engine/backbone/base.py:168-181, 259-279)."""
    from masklab_tpu.nn.backbone import efficientnet as eff
    from masklab_tpu.nn.backbone.efficientnet import ENDPOINT_CHANNELS
    body = getattr(eff, name.replace('efficientnetb', 'efficientnet_b'))()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    # shape-only: no compile/compute needed to check channel widths
    variables = jax.eval_shape(body.init, jax.random.PRNGKey(0), x)
    endpoints = jax.eval_shape(lambda v, x: body.apply(v, x), variables, x)
    for ep, ch in ENDPOINT_CHANNELS[name].items():
        assert endpoints[ep].shape[-1] == ch, (name, ep)


def test_efficientnet_drop_connect():
    """Drop-connect is active in train mode with a 'dropout' rng (zeroes
    whole residual branches per sample) and inactive without one."""
    from masklab_tpu.nn.backbone.efficientnet import EfficientNet
    body = EfficientNet(width=1.0, depth=1.0, drop_connect_rate=0.9)
    x = jnp.ones((4, 64, 64, 3), jnp.float32)
    variables = jax.jit(body.init)(jax.random.PRNGKey(0), x)

    apply_det = jax.jit(lambda v, x: body.apply(
        v, x, train=True, mutable=['batch_stats'])[0]['C5'])
    apply_rng = jax.jit(lambda v, x, r: body.apply(
        v, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': r})[0]['C5'])
    det = apply_det(variables, x)
    r1 = apply_rng(variables, x, jax.random.PRNGKey(1))
    r2 = apply_rng(variables, x, jax.random.PRNGKey(2))
    # no rng -> deterministic (identical to itself); with rng -> stochastic
    np.testing.assert_allclose(np.asarray(det),
                               np.asarray(apply_det(variables, x)))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_batchnorm_collections_exist():
    model, variables, _ = _build('mobilenet', hw=(128, 128))
    assert 'batch_stats' in variables
    # train-mode apply mutates batch stats
    x = jnp.ones((1, 128, 128, 3))
    _, mutated = model.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    assert 'batch_stats' in mutated


def test_preprocess_combos_match_reference_frozen_table():
    """The snake-image preprocessing search (test/backbone_test, notebook
    2) froze one (rgb, mean_shift, normalize) combo per backbone into
    load_backbone (engine/backbone/base.py:190-279). The original
    fixtures are unobtainable offline, so the oracle's OUTPUT — the
    frozen table — is pinned here verbatim; any drift in
    PREPROCESS_COMBOS is a parity break against the reference."""
    from masklab_tpu.nn.backbone.preprocess import PREPROCESS_COMBOS
    reference_frozen = {            # base.py line cited per row
        'resnet50': (False, True, 0),       # :190-193
        'resnet50v2': (True, True, 2),      # :196-199
        'resnet101v2': (True, False, 2),    # :204-207
        'resnext50': (True, True, 2),       # :214-217
        'seresnet50': (True, True, 3),      # :220-223
        'seresnet34': (True, False, 0),     # :229-232
        'seresnext50': (True, True, 3),     # :238-241
        'vgg16': (False, True, 0),          # :247-250
        'mobilenet': (False, False, 2),     # :253-256
        'efficientnetb2': (True, True, 3),  # :259-262
        'efficientnetb3': (True, True, 3),  # :266-269
        'efficientnetb4': (True, True, 3),  # :273-276
    }
    for name, combo in reference_frozen.items():
        assert PREPROCESS_COMBOS[name] == combo, name


# ---- space-to-depth stem (round-5 stem-conv optimization) ----

def test_space_to_depth_stem_matches_direct_conv():
    """The MLPerf s2d transform must be numerically equivalent to the
    direct 7x7/s2/pad-3 conv (same dot products, re-indexed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.nn.backbone.resnet import space_to_depth_stem

    rng = np.random.RandomState(0)
    # (kh, pad): the ResNet 7x7/SAME-3 form and the Keras asymmetric
    # (0,1)+VALID 3x3 form (mobilenet stem / SAME-on-even stems)
    for ksz, pad in (((7, 7), ((3, 3), (3, 3))),
                     ((3, 3), ((0, 1), (0, 1)))):
        for h, w in ((64, 64), (128, 96), (256, 320)):
            x = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)
            k = jnp.asarray(rng.randn(*ksz, 3, 16) * 0.1, jnp.float32)
            direct = jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding=pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            s2d = space_to_depth_stem(x, k, pad)
            assert s2d.shape == direct.shape, (ksz, pad, h, w)
            np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f'{ksz} {pad} {h}x{w}')


def test_stem_conv_module_s2d_path_parity(monkeypatch):
    """StemConv7x7 with MASKLAB_FORCE_S2D must equal its direct path with
    the SAME params (checkpoint compatibility + numerical parity), and
    grads must match (the training path runs through the stem)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.nn.backbone.resnet import StemConv7x7

    mod = StemConv7x7(16, use_bias=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3),
                    jnp.float32)
    monkeypatch.delenv('MASKLAB_FORCE_S2D', raising=False)
    monkeypatch.setenv('MASKLAB_NO_S2D_STEM', '1')
    v = mod.init(jax.random.PRNGKey(0), x)
    assert v['params']['kernel'].shape == (7, 7, 3, 16)   # nn.Conv layout
    direct = mod.apply(v, x)

    def loss_direct(p):
        return jnp.sum(mod.apply({'params': p}, x) ** 2)
    g_direct = jax.grad(loss_direct)(v['params'])

    monkeypatch.delenv('MASKLAB_NO_S2D_STEM')
    monkeypatch.setenv('MASKLAB_FORCE_S2D', '1')
    s2d = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)
    g_s2d = jax.grad(loss_direct)(v['params'])
    for key in ('kernel', 'bias'):
        np.testing.assert_allclose(np.asarray(g_s2d[key]),
                                   np.asarray(g_direct[key]),
                                   rtol=1e-4, atol=1e-4, err_msg=key)

    # odd spatial extent must fall back to the direct conv, same result
    x_odd = x[:, :63, :61, :]
    np.testing.assert_allclose(
        np.asarray(mod.apply(v, x_odd)),
        np.asarray(jax.lax.conv_general_dilated(
            x_odd, v['params']['kernel'], window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            + v['params']['bias']),
        rtol=1e-5, atol=1e-5)
