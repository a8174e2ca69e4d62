"""Core flax modules shared across all heads.

TPU-native equivalents of the reference's custom Keras layers:
  * GroupNorm    — engine/normalization.py:12-184 (eps 1e-5, affine)
  * SqueezeExcite — engine/layers/misc.py:24-54
  * MobileSeparableConv — engine/layers/misc.py:57-117 (MobileNetV2
    inverted-residual expand -> depthwise -> squeeze + skip)
  * AtrousSeparableConv — engine/layers/semantic.py:32-90

All modules are NHWC and batch-size independent (GroupNorm everywhere, as in
the reference). Convolutions run in ``dtype`` (float32 or bfloat16) with
float32 parameters; normalization statistics are always float32.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def normal_init(stddev: float = 0.01):
    return nn.initializers.normal(stddev=stddev)


class GroupNorm(nn.Module):
    """The reference's GroupNormalization, bit-for-bit
    (engine/normalization.py:116-160).

    CAUTION — this is NOT textbook GroupNorm. The reference reuses the
    keras-contrib channels-first reshape on channels-last data: the input
    [B,H,W,C] is *flat*-reshaped to [B,G,H,W,C/G], so each "group" is a
    contiguous band of H*W*C/G elements of the flattened feature map
    (mixing spatial rows and channels), statistics reduce over that band,
    and gamma/beta broadcast as [1,G,1,1,C/G] — i.e. the affine is per
    (band, c mod C/G), not per channel. Reference-trained weights only
    make sense under these semantics, so we reproduce them exactly
    (verified by weight transplant in tests/test_weight_transplant.py).
    """
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # clamp so narrow feature stacks (tests, small configs) still
        # normalize; the reference *errors* on channels < groups
        groups = min(self.groups, c)
        if c % groups:
            raise ValueError(f'channels {c} not divisible by {groups} groups')
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        shape = x.shape
        cg = c // groups
        spatial = 1
        for d in shape[1:-1]:
            spatial *= d
        # Performance shape (measured 2.1x on v5e joint inference):
        #  * fast variance — fp32-accumulated E[x], E[x^2] in ONE fused
        #    pass (like flax's use_fast_variance) instead of mean-then-var;
        #  * keep the channel axis MINOR. Reshaping to [B, G, H*W*C/G]
        #    merges C into the band axis and forces XLA to physically
        #    relayout every conv output (NHWC is tiled channel-minor).
        #    When bands align to whole pixels (G | H*W — every real map),
        #    the SAME band is the strip view [B, G, HW/G, C], a free
        #    reinterpretation. The per-(band, c mod C/G) affine becomes a
        #    [G, C] table: table[g, c] = scale[g*cg + c % cg].
        if spatial % groups == 0:
            g = x.reshape(shape[0], groups, spatial // groups, c)
            f32 = g.astype(jnp.float32)
            m1 = jnp.mean(f32, axis=(2, 3), keepdims=True)
            m2 = jnp.mean(jnp.square(f32), axis=(2, 3), keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + 1e-5)
            # normalize + affine in float32 (XLA fuses the whole chain into
            # one elementwise loop, so bf16 inputs pay no extra HBM traffic
            # — only the register math widens); cast once at the end
            y = (f32 - m1) * inv
            table_s = jnp.tile(scale.reshape(groups, cg), (1, c // cg))
            table_b = jnp.tile(bias.reshape(groups, cg), (1, c // cg))
            y = y * table_s[None, :, None, :] + table_b[None, :, None, :]
            return y.reshape(shape).astype(self.dtype)
        # ragged maps (G does not divide H*W — the 14x14 mask-head crops):
        # the round-2 flat-band reshape [B, G, HWC/G] merges channels into
        # the band axis, forcing XLA to physically relayout every crop —
        # measured 13.4 ms for the 4-layer mask-head GN at 800 crops,
        # 3.5x the convs themselves (benchmarks/profile_mask_head.py).
        # Even a [B, HW, C] channel-minor reshape relayouts: W=14 is the
        # sublane dim, tiled-padded to 16, so merging H and W moves every
        # row. This path never reshapes the big tensor at all:
        #   * band sums = a full-window VALID convolution with a constant
        #     0/1 [H, W, C, G] kernel (convs are native NHWC — no layout
        #     change; with d = gcd(band_length, C) every (pixel, d-channel
        #     sub-block) lies entirely in ONE band, so the kernel is exact)
        #   * broadcast-back = a tiny gather m1[:, gmap] fused into the
        #     final elementwise pass (m1 is [B, G], VMEM-resident).
        # The per-band-position affine reduces to index g*cg + c % cg
        # (band length is a multiple of cg, and cg | C).
        if x.ndim == 4:
            b, h, w = shape[0], shape[1], shape[2]
            length = spatial * cg                     # band length
            d = math.gcd(length, c)
            # static index maps (numpy, baked into the graph as constants)
            flat_start = (np.arange(spatial)[:, None] * c
                          + (np.arange(c)[None, :] // d) * d)
            gmap = (flat_start // length).reshape(h, w, c)  # [H,W,C] band id
            onehot = jnp.asarray(
                (gmap[..., None] == np.arange(groups)), jnp.float32)

            def band_sums(v):
                # 0/1 kernel: bf16 operands accumulate exactly in f32 at
                # default precision; f32 operands need HIGHEST (the default
                # rounds them through bf16, and HIGHEST's 6-pass decomposition
                # is exact for a 0/1 kernel)
                prec = (None if v.dtype == jnp.bfloat16
                        else jax.lax.Precision.HIGHEST)
                return jax.lax.conv_general_dilated(
                    v, onehot.astype(v.dtype), (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=jnp.float32,
                    precision=prec)[:, 0, 0, :]

            f32 = x.astype(jnp.float32)
            s1 = band_sums(x)
            # bf16 inputs: square in bf16 (each square rounds at 2^-9 —
            # below bf16 activation resolution; sums still accumulate in
            # f32). f32 inputs: exact f32 squares, so parity tests see
            # flat-band-identical statistics.
            sq = x * x if x.dtype == jnp.bfloat16 else f32 * f32
            s2 = band_sums(sq)
            m1 = s1 / length
            inv = jax.lax.rsqrt(
                jnp.maximum(s2 / length - jnp.square(m1), 0.0) + 1e-5)
            # broadcast-back: indexing m1[:, gmap] lowers to a dynamic
            # gather over [B, G] with a [H, W, C] index tensor — measured
            # ~13 ms for the 4-layer mask-head GN, the entire remaining
            # cost. Expand the per-band stats with ANOTHER constant 0/1
            # convolution instead: a 1x1-spatial input under full padding
            # places m1[n, g] at every output pixel weighted by
            # kernel[h-1-i, w-1-j, g, c] = (band(i, j, c) == g).
            bcast_k = jnp.asarray(
                np.transpose(gmap[::-1, ::-1, :, None] == np.arange(groups),
                             (0, 1, 3, 2)), jnp.float32)

            def band_bcast(v):                        # [B, G] -> [B, H, W, C]
                return jax.lax.conv_general_dilated(
                    v[:, None, None, :], bcast_k, (1, 1),
                    ((h - 1, h - 1), (w - 1, w - 1)),
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    precision=jax.lax.Precision.HIGHEST)

            # fold the affine into the broadcast operands: y = x*A + B with
            # A = inv*scale, B = bias - m1*inv*scale, so the final pass is
            # one fused multiply-add over the big tensor
            sidx = gmap * cg + np.arange(c) % cg      # [H,W,C] affine index
            scale_c = jnp.asarray(scale)[sidx]
            bias_c = jnp.asarray(bias)[sidx]
            a = band_bcast(inv) * scale_c
            y = f32 * a + (bias_c - band_bcast(m1 * inv) * scale_c)
            return y.astype(self.dtype)
        # generic-rank fallback (nothing hot reaches it): flat-band math,
        # identical numerics, pays the relayout
        b = shape[0]
        flat = x.reshape(b, groups, -1)
        f32 = flat.astype(jnp.float32)
        m1 = jnp.mean(f32, axis=-1, keepdims=True)
        m2 = jnp.mean(jnp.square(f32), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + 1e-5)
        g = (f32 - m1) * inv
        length = flat.shape[-1]
        table_s = jnp.tile(scale.reshape(groups, cg), (1, length // cg))
        table_b = jnp.tile(bias.reshape(groups, cg), (1, length // cg))
        g = g * table_s[None] + table_b[None]
        return g.reshape(shape).astype(self.dtype)


class SqueezeExcite(nn.Module):
    """Channel attention: GAP -> bottleneck dense -> sigmoid gate."""
    ratio: float = 16.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        se = jnp.mean(x, axis=(-3, -2))                       # [..., C]
        se = nn.Dense(int(c // self.ratio), use_bias=False,
                      kernel_init=nn.initializers.he_normal(),
                      dtype=self.dtype)(se)
        se = nn.relu(se)
        se = nn.Dense(c, use_bias=False,
                      kernel_init=nn.initializers.glorot_normal(),
                      dtype=self.dtype)(se)
        se = nn.sigmoid(se)
        return x * se[..., None, None, :]


class MobileSeparableConv(nn.Module):
    """Inverted-residual separable conv (expand -> depthwise -> squeeze + skip)."""
    filters: int
    kernel_size: Tuple[int, int] = (3, 3)
    expand_ratio: float = 4.0
    stride: int = 1
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inputs = x
        expanded = int(self.expand_ratio * self.filters)
        x = nn.Conv(expanded, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(expanded, self.kernel_size,
                    strides=(self.stride, self.stride), padding='SAME',
                    feature_group_count=expanded, use_bias=False,
                    dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        return inputs + x


class AtrousSeparableConv(nn.Module):
    """Dilated depthwise 3x3 + GN + ReLU, then pointwise + GN + ReLU."""
    filters: int
    dilation_rate: int = 3
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding='SAME',
                    kernel_dilation=(self.dilation_rate, self.dilation_rate),
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        return nn.relu(x)


class HeadBlock(nn.Module):
    """One depth-stack of a subnet head: ``num_depth`` x
    [SqueezeExcite? -> Conv3x3-ReLU | MobileSeparableConv -> GroupNorm].

    Shared structure of ClassificationSubNet / BoxRegressionSubNet /
    MaskSubNet / SegmentationSubNet bodies (detection.py:109-130 etc.).
    """
    num_depth: int = 4
    num_features: int = 256
    use_separable_conv: bool = False
    expand_ratio: float = 4.0
    use_squeeze_excite: bool = False
    squeeze_ratio: float = 16.0
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_depth):
            if self.use_squeeze_excite:
                x = SqueezeExcite(self.squeeze_ratio, self.dtype)(x)
            if self.use_separable_conv:
                x = MobileSeparableConv(self.num_features, (3, 3),
                                        expand_ratio=self.expand_ratio,
                                        groups=self.groups,
                                        dtype=self.dtype)(x)
            else:
                x = nn.Conv(self.num_features, (3, 3), padding='SAME',
                            kernel_init=normal_init(0.01),
                            dtype=self.dtype)(x)
                x = nn.relu(x)
            x = GroupNorm(self.groups, self.dtype)(x)
        return x
