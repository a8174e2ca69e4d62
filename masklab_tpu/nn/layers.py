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

from typing import Any, Tuple

import jax
import jax.numpy as jnp
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

    Precision: statistics (E[x], E[x^2]) always accumulate in float32;
    the normalize+affine then runs in x.dtype, so bit-for-bit reference
    parity holds for float32 inputs (what the transplant suite checks).
    bfloat16 compute trades ~3 ulp of normalize rounding for keeping the
    whole chain in the fused bf16 elementwise loop (f32-normalize
    measured 594 -> 461 dense img/s at model level, round-3 log).
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
            y = (g - m1.astype(x.dtype)) * inv.astype(x.dtype)
            table_s = jnp.tile(scale.reshape(groups, cg), (1, c // cg))
            table_b = jnp.tile(bias.reshape(groups, cg), (1, c // cg))
            y = (y * table_s[None, :, None, :].astype(x.dtype)
                 + table_b[None, :, None, :].astype(x.dtype))
            return y.reshape(shape).astype(self.dtype)
        # ragged maps (G does not divide H*W — e.g. the 14x14 mask-head
        # crops): on TPU with WIDE channels, a fused Pallas kernel (one
        # HBM pass, band sums by boundary decomposition —
        # ops/pallas/groupnorm_kernel.py; custom_vjp backward reuses the
        # same relayout-free math). Measured crossover: at C=256 the
        # kernel wins 2x standalone and 1.6x in the conv stack (the XLA
        # [N, G, L] relayout is catastrophic there); at C=128 XLA's
        # fused ragged path is already ~memory-bound and the kernel's
        # VPU-bound inner loop LOSES ~5% end-to-end (bench A/B
        # 587.6 -> 560.4 dense, round-3 log) — so only route C >= 256.
        import os
        # crossover measured on INFERENCE (round-3 A/B: C=256 wins 1.6x,
        # C=128 loses 5%); MASKLAB_GN_KERNEL_MIN_C overrides for A/Bs —
        # the train-step balance differs (backward-heavy, and the
        # kernel's custom_vjp backward is relayout-free where XLA's
        # ragged path relayouts both ways)
        min_c = int(os.environ.get('MASKLAB_GN_KERNEL_MIN_C', '256'))
        if (jax.devices()[0].platform == 'tpu' and groups <= spatial
                and c >= min_c
                and not os.environ.get('MASKLAB_NO_PALLAS_GN')):
            from ..ops.pallas.groupnorm_kernel import band_groupnorm
            y = band_groupnorm(x.reshape(shape[0], spatial, c),
                               scale, bias, groups)
            return y.reshape(shape).astype(self.dtype)
        # off-TPU fallback: flat-band reshape, identical math. The affine
        # is applied as a periodic [G, L] table along the flat band — the
        # earlier [B, G, H, W, C/G] reshape put C/G=8 on the minor axis,
        # which lane-pads 16x (a 20 MB mask-head temp cost 378 MB and
        # OOMed the training step across capacity buckets). A fancier
        # zero-relayout variant (band stats as [B, HWC] x [HWC, G]
        # matmuls against a constant band one-hot) measured 16% SLOWER
        # end-to-end — the N=16 GEMMs are too skinny for the MXU.
        flat = x.reshape(shape[0], groups, -1)
        f32 = flat.astype(jnp.float32)
        m1 = jnp.mean(f32, axis=-1, keepdims=True)
        m2 = jnp.mean(jnp.square(f32), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + 1e-5)
        g = (flat - m1.astype(x.dtype)) * inv.astype(x.dtype)
        length = flat.shape[-1]
        # band position p maps to channel g*cg + (p % cg)
        table_s = jnp.tile(scale.reshape(groups, cg), (1, length // cg))
        table_b = jnp.tile(bias.reshape(groups, cg), (1, length // cg))
        g = (g * table_s[None].astype(x.dtype)
             + table_b[None].astype(x.dtype))
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
    The ragged-map GroupNorm inside routes to the flat-band Pallas
    kernel when profitable (see GroupNorm). A whole-layer fused
    conv3x3+relu+bandGN Pallas kernel was A/B'd on hardware in round 4
    and LOST decisively (dense 669 -> 349 img/s — XLA's conv + the
    band-GN kernel beat the hand-fused residency), so the stock
    composition below is the final form (docs/PERFORMANCE.md round 4).
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
        for i in range(self.num_depth):
            if self.use_squeeze_excite:
                x = SqueezeExcite(self.squeeze_ratio, self.dtype)(x)
            if self.use_separable_conv:
                x = MobileSeparableConv(self.num_features, (3, 3),
                                        expand_ratio=self.expand_ratio,
                                        groups=self.groups,
                                        dtype=self.dtype)(x)
                x = GroupNorm(self.groups, self.dtype)(x)
            else:
                x = nn.Conv(self.num_features, (3, 3), padding='SAME',
                            kernel_init=normal_init(0.01),
                            dtype=self.dtype, name=f'Conv_{i}')(x)
                x = nn.relu(x)
                x = GroupNorm(self.groups, self.dtype,
                              name=f'GroupNorm_{i}')(x)
        return x
