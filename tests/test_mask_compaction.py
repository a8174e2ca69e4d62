"""Capacity-bucketed mask branch (MaskSubNet.compact) — exactness vs the
crop-all+select path for every proposal regime, values and gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu.models.instance import (MaskSubNet, mask_distribute,
                                         pyramid_roi_align, select_by_level)

IMAGE_HW = (64, 64)
CROP = (7, 7)


def _boxes(batch=2, k=12, seed=0):
    """Boxes spanning all routing regimes: level 0 dense, level 1 empty,
    level 2 sparse, plus padded rows."""
    rng = np.random.RandomState(seed)
    boxes = np.full((batch, k, 6), -1.0, np.float32)
    for b in range(batch):
        for i in range(k - 2):                 # leave 2 padded rows
            if i < 7:
                size = rng.uniform(8, 30)      # level 0 (< base 36)
            else:
                size = rng.uniform(150, 250)   # level 2 (>= 4*base)
            cx, cy = rng.uniform(10, 54), rng.uniform(10, 54)
            boxes[b, i] = [cx, cy, size, size, rng.randint(4), 0.9]
    return jnp.asarray(boxes)


@pytest.fixture(scope='module')
def setup():
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32),
             jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32),
             jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)]
    boxes = _boxes()
    levels = mask_distribute(boxes, max_k=2)
    subnet = MaskSubNet(num_blocks=3, num_classes=4, num_depth=1,
                        num_features=8, groups=4)
    crops = pyramid_roi_align(feats, boxes, levels, IMAGE_HW, CROP)
    variables = jax.jit(subnet.init)(jax.random.PRNGKey(0), crops)
    return subnet, variables, feats, boxes, levels, crops


def test_levels_cover_regimes(setup):
    _, _, _, _, levels, _ = setup
    lv = np.asarray(levels)
    assert (lv == 0).sum() > 0 and (lv == 1).sum() == 0 \
        and (lv == 2).sum() > 0 and (lv == -1).sum() > 0


def test_compact_matches_select(setup):
    subnet, variables, feats, boxes, levels, crops = setup
    ref = select_by_level(
        jax.jit(lambda v, c, l: subnet.apply(v, c, l))(
            variables, crops, levels), levels)
    got = jax.jit(lambda v: subnet.apply(
        v, feats, boxes, levels, IMAGE_HW, CROP, method='compact'))(
            variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_compact_gradients_match(setup):
    subnet, variables, feats, boxes, levels, crops = setup

    def loss_select(params):
        out = subnet.apply({'params': params}, crops, levels)
        return jnp.sum(select_by_level(out, levels) ** 2)

    def loss_compact(params):
        out = subnet.apply({'params': params}, feats, boxes, levels,
                           IMAGE_HW, CROP, method='compact')
        return jnp.sum(out ** 2)

    g_ref = jax.jit(jax.grad(loss_select))(variables['params'])
    g_got = jax.jit(jax.grad(loss_compact))(variables['params'])
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_compact_init_param_structure_matches(setup):
    """Params initialized through the compact path are interchangeable with
    the crop-all path (same tree, same shapes)."""
    subnet, variables, feats, boxes, levels, _ = setup
    v2 = jax.eval_shape(
        lambda: subnet.init(jax.random.PRNGKey(0), feats, boxes, levels,
                            IMAGE_HW, CROP, method='compact'))
    ref_paths = {jax.tree_util.keystr(p): l.shape for p, l in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    got_paths = {jax.tree_util.keystr(p): l.shape for p, l in
                 jax.tree_util.tree_flatten_with_path(v2)[0]}
    assert ref_paths == got_paths
