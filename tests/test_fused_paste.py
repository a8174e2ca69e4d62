"""Fused paste-reducer parity: paste_stats_and_union / fused_summary_union
must reproduce the unfused crop_and_pad_masks -> summary_output /
draw_instance pipeline exactly (same math, different dataflow)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masklab_tpu.serving.postprocess import crop_and_pad_masks
from masklab_tpu.serving.summary import (_road_width_per_row,
                                         fused_summary_union, summary_output)
from masklab_tpu.serving.visualize import draw_instance, draw_segmentation

B, K, MH, MW, H, W, C = 2, 12, 8, 8, 96, 128, 6


@pytest.fixture(scope='module')
def data():
    rng = np.random.RandomState(7)
    cx = rng.rand(B, K) * W
    cy = rng.rand(B, K) * H
    bw = rng.rand(B, K) * 40 + 4
    bh = rng.rand(B, K) * 40 + 4
    cls = rng.randint(0, C, (B, K)).astype(np.float32)
    conf = rng.rand(B, K) * 100
    # a few padded rows
    for b in range(B):
        cls[b, -2:] = -1
        conf[b, -2:] = -1
    det = jnp.asarray(np.stack([cx, cy, bw, bh, cls, conf], -1), jnp.float32)
    det = jnp.round(det)
    masks = jnp.asarray(rng.rand(B, K, MH, MW) > 0.5, jnp.int32)
    seg = np.zeros((B, H, W, 3), np.int32)
    # my_road trapezoid + some crack pixels
    for b in range(B):
        for y in range(H // 3, H):
            x0 = int(W * 0.5 - (y / H) * W * 0.4)
            x1 = int(W * 0.5 + (y / H) * W * 0.4)
            seg[b, y, x0:x1, 1] = 1
    seg[:, H // 2:H // 2 + 5, W // 2:W // 2 + 9, 2] = 1
    seg[:, :, :, 0] = rng.rand(B, H, W) > 0.8
    return det, masks, jnp.asarray(seg)


def test_summary_matches_unfused(data):
    det, masks, seg = data
    padded = crop_and_pad_masks(det, masks, (H, W))
    ref = summary_output(det, seg, padded)
    got, _ = jax.jit(
        lambda d, s, m: fused_summary_union(d, s, m, (H, W), C))(
            det, seg, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=1e-3)


def test_union_matches_draw_instance(data):
    det, masks, seg = data
    padded = crop_and_pad_masks(det, masks, (H, W))
    colors = [[255, 0, 0]] * C
    base = jnp.zeros((B, H, W, 3), jnp.float32)
    ref_vis = draw_instance(base, det, padded, colors)
    _, union = jax.jit(
        lambda d, s, m: fused_summary_union(d, s, m, (H, W), C))(
            det, seg, masks)
    got_vis = draw_segmentation(base, union, colors)
    assert np.asarray(got_vis == ref_vis).mean() > 0.9999


def test_keep_threshold_regimes(data):
    """Adaptive conf-50 keep: all-below-50 keeps everything."""
    det, masks, seg = data
    low = det.at[..., 5].set(jnp.where(det[..., 5] >= 0,
                                       det[..., 5] % 49, -1.0))
    padded = crop_and_pad_masks(low, masks, (H, W))
    ref = summary_output(low, seg, padded)
    got, _ = fused_summary_union(low, seg, masks, (H, W), C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=1e-3)
