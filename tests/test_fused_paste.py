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


def test_fuzz_shapes_and_regimes():
    """Randomized sweep over K / mask size / image size / confidence
    regimes: the fused reducer must match the unfused pipeline on every
    draw."""
    rng = np.random.RandomState(11)
    for trial in range(6):
        k = int(rng.choice([4, 9, 17]))
        mh = int(rng.choice([6, 8, 14]))
        h = int(rng.choice([64, 96]))
        w = int(rng.choice([80, 128]))
        nc = int(rng.choice([3, 6]))
        cx = rng.rand(2, k) * w
        cy = rng.rand(2, k) * h
        bw = rng.rand(2, k) * (w // 2) + 3
        bh = rng.rand(2, k) * (h // 2) + 3
        cls = rng.randint(-1, nc, (2, k)).astype(np.float32)
        if trial % 2:
            conf = rng.rand(2, k) * 100          # mixed above/below 50
        else:
            conf = rng.rand(2, k) * 45           # all below -> keep all
        det = jnp.asarray(np.round(np.stack([cx, cy, bw, bh, cls, conf],
                                            -1)), jnp.float32)
        masks = jnp.asarray(rng.rand(2, k, mh, mh) > 0.5, jnp.int32)
        seg = np.zeros((2, h, w, 3), np.int32)
        seg[:, h // 3:, w // 4: 3 * w // 4, 1] = 1
        seg[:, :h // 8, :w // 8, 2] = rng.rand(2, h // 8, w // 8) > 0.5
        seg = jnp.asarray(seg)
        padded = crop_and_pad_masks(det, masks, (h, w))
        ref = summary_output(det, seg, padded)
        got, union = fused_summary_union(det, seg, masks, (h, w), nc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=1e-3,
                                   err_msg=f'trial {trial}')
        colors = [[20 * i, 10, 5] for i in range(nc)]
        base = jnp.zeros((2, h, w, 3), jnp.float32)
        ref_vis = draw_instance(base, det, padded, colors)
        got_vis = draw_segmentation(base, union, colors)
        assert np.asarray(got_vis == ref_vis).mean() > 0.9999, trial
