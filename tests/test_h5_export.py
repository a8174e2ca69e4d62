"""Reference-interchange export (h5 write side) — the capstone in reverse.

The import capstone (test_capstone_parity.py) proves reference h5 ->
flax. These tests prove flax -> reference: random flax params are
transplanted into the reference's own inference network
(engine/retinamasklab.py:420-495) via the generic converter inversion
(utils/keras_export.py), the TF net must reproduce the flax outputs
within 1e-3, and the saved h5 must round-trip back through
``load_reference_h5`` bit-exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip('tensorflow')

from masklab_tpu.config import ModelConfiguration  # noqa: E402
from masklab_tpu.models.masklab import build_masklab  # noqa: E402
from masklab_tpu.utils import keras_export as ke  # noqa: E402
from masklab_tpu.utils import keras_import as ki  # noqa: E402

from test_capstone_parity import IMAGE, OVERRIDES  # noqa: E402


def test_invert_converter_is_exact_inverse(ref):
    """invert(convert(w)) == w bitwise on a real reference layer group."""
    layer = ref.detection.ClassificationSubNet(
        num_blocks=2, num_classes=3, num_depth=2, num_features=32,
        num_priors=2, use_separable_conv=False, use_squeeze_excite=False)
    layer([tf.zeros((1, 8, 8, 32)), tf.zeros((1, 4, 4, 32))])
    weights = ki.weights_of_layer(layer)
    conv = lambda w: ki.convert_head_subnet(  # noqa: E731
        w, num_blocks=2, num_depth=2, use_separable_conv=False,
        use_squeeze_excite=False)
    tree = conv(weights)
    back = ke.invert_converter(conv, weights, tree)
    assert len(back) == len(weights)
    for (name, want), got in zip(weights, back):
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_invert_converter_rejects_mismatched_tree(ref):
    layer = ref.detection.FeaturePyramid(strides=[8, 16], num_features=16)
    layer([tf.zeros((1, 8, 8, 8)), tf.zeros((1, 4, 4, 8))])
    weights = ki.weights_of_layer(layer)
    conv = lambda w: ki.convert_fpn(w, 2)  # noqa: E731
    tree = conv(weights)
    bad = {'wrong': tree}
    with pytest.raises(ki.ImportMismatch):
        ke.invert_converter(conv, weights, bad)


@pytest.fixture(scope='module')
def ref():
    from ref_shim import reference_modules
    try:
        return reference_modules()
    except Exception as exc:  # pragma: no cover - environment dependent
        pytest.skip(f'reference import failed: {exc}')


@pytest.fixture(scope='module')
def exported(tmp_path_factory):
    """Random flax params -> reference inference net (+ saved h5)."""
    from ref_shim import install_shims
    try:
        install_shims()
        import engine.backbone.base as ref_base
        from engine import retinamasklab as rml
        from engine.config import ModelConfiguration as RefConfig
    except Exception as exc:  # pragma: no cover - environment dependent
        pytest.skip(f'reference import failed: {exc}')

    mcfg = ModelConfiguration()
    for group, key, value in OVERRIDES:
        setattr(getattr(mcfg, group), key, value)
    mcfg.compute.nms_candidates_per_class = 512
    model = build_masklab(mcfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3),
                                    jnp.asarray(IMAGE))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # shift the cls output biases so ~24 anchors clear the 0.5 inference
    # threshold — the reference's mask branch cannot run on an empty
    # proposal set (mirrors the import capstone's _shift_cls_bias)
    cls_pred = np.asarray(model.apply(variables, jnp.asarray(IMAGE),
                                      train=False)['cls_pred'])
    logits = np.log(cls_pred / (1.0 - cls_pred))
    q = np.quantile(logits, 1.0 - 24 / logits.size)
    for key, sub in variables['params']['cls_subnet'].items():
        if key.startswith('output_'):
            sub['bias'] = np.asarray(sub['bias']) - q
    flax_out = model.apply(variables, jnp.asarray(IMAGE), train=False)
    n_conf = int((np.asarray(flax_out['cls_pred']) > 0.5).sum())
    assert 1 <= n_conf <= 400, f'{n_conf} confident anchors; retune bias'

    real_mobilenet = ref_base.MobileNet
    ref_base.MobileNet = lambda **kw: real_mobilenet(**{**kw,
                                                        'weights': None})
    try:
        rcfg = RefConfig()
        for group, key, value in OVERRIDES:
            setattr(getattr(rcfg, group), key,
                    list(value) if isinstance(value, tuple) else value)
        backbone_net = rml.build_backbone_network(rcfg)
        det = rml.build_detection_network(rcfg)
        ins = rml.build_instance_network(rcfg)
        sem = rml.build_semantic_network(rcfg)
        ref_model = rml.construct_inference_network(rcfg, backbone_net,
                                                    det, sem, ins)
    finally:
        ref_base.MobileNet = real_mobilenet

    ke.transplant_into_reference(variables, mcfg, ref_model)
    ref_out = [np.asarray(t) for t in ref_model(tf.constant(IMAGE))]

    h5 = str(tmp_path_factory.mktemp('export') / 'exported.h5')
    ke.save_reference_h5(ref_model, h5)
    return variables, flax_out, ref_out, h5, mcfg


def test_export_cls_loc_seg_parity(exported):
    _, flax_out, ref_out, _, _ = exported
    np.testing.assert_allclose(ref_out[0], np.asarray(flax_out['cls_pred']),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ref_out[1], np.asarray(flax_out['loc_pred']),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ref_out[4], np.asarray(flax_out['seg_pred']),
                               rtol=1e-3, atol=1e-3)


def test_export_h5_roundtrips_bitexact(exported):
    """flax params -> reference h5 -> load_reference_h5 == original."""
    variables, _, _, h5, mcfg = exported
    back = ki.load_reference_h5(h5, mcfg)
    want = {'params': variables['params'],
            'batch_stats': variables.get('batch_stats', {})}
    flat_w = ke._tree_leaves_with_paths(want)
    flat_b = ke._tree_leaves_with_paths(
        {'params': back['params'], 'batch_stats': back['batch_stats']})
    assert [p for p, _ in flat_w] == [p for p, _ in flat_b]
    for (path, w), (_, b) in zip(flat_w, flat_b):
        np.testing.assert_array_equal(
            np.asarray(w, np.float32), np.asarray(b, np.float32),
            err_msg='/'.join(map(str, path)))
