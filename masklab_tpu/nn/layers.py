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


def space_to_depth_stem(x: jnp.ndarray, kernel: jnp.ndarray,
                        pad=((3, 3), (3, 3))) -> jnp.ndarray:
    """Stride-2 stem conv as a stride-1 conv on 2x2-packed input — exact.

    A stem conv's 3 input channels pad to 8 MXU sublanes, so XLA's direct
    emitter runs it at ~3-8% efficiency — on the road preset the 7x7 stem
    plus its input relayout copy were 1.85 ms of an 11.6 ms batch, the
    largest non-cond cost in the inference trace (round-5 log). The
    MLPerf-ResNet space-to-depth transform re-indexes the SAME dot
    products: pack input 2x2 blocks into channels ([B,H,W,C] ->
    [B,H/2,W/2,4C]) and regroup the kernel to match, so the conv runs
    stride-1 over 4C channels. Mathematically exact (modulo f32
    accumulation order) for ANY odd/even kernel and padding whose output
    extent is exactly H/2 x W/2.

    Derivation per axis (size K, pad (pl, ph)): y[i] = sum_u
    x_pad[2i + u - pl] W[u]. Substituting u = 2(m - m0) + r - shift with
    m0 = floor(-pl/2), shift = 2*m0 + pl: the packed kernel A[a] = W[a +
    shift] (zeros outside), folded [Mn, 2] -> stride-1 taps over packed
    rows with padding (-m0, m0 + Mn - 1). Covers the ResNet 7x7/SAME-3
    form (packs to [4,4,4C]) and Keras' asymmetric (0,1)+VALID 3x3 form
    (packs to [2,2,4C], the mobilenet stem).
    """
    b, h, w, c = x.shape
    kh, kw, _, f = kernel.shape

    def axis_params(k, pl, ph, extent):
        m0 = -((pl + 1) // 2)                      # floor(-pl/2)
        mn = (k - 1 - pl) // 2 - m0 + 1
        shift = 2 * m0 + pl
        out = (extent + pl + ph - k) // 2 + 1
        if out != extent // 2:
            raise ValueError(
                f'space_to_depth_stem: output extent {out} != packed '
                f'{extent // 2} (k={k}, pad=({pl},{ph}), in={extent})')
        return mn, shift, (-m0, m0 + mn - 1)

    mh, sh, pad_h = axis_params(kh, pad[0][0], pad[0][1], h)
    mw, sw, pad_w = axis_params(kw, pad[1][0], pad[1][1], w)

    def fold(kern, axis, mn, shift, k):
        full = [kern.shape[0], kern.shape[1]]
        full[axis] = 2 * mn
        a = jnp.zeros(tuple(full) + kern.shape[2:], kern.dtype)
        dst = max(0, -shift)
        src = max(0, shift)
        n = min(k - src, 2 * mn - dst)
        sl_dst = [slice(None)] * a.ndim
        sl_dst[axis] = slice(dst, dst + n)
        sl_src = [slice(None)] * kern.ndim
        sl_src[axis] = slice(src, src + n)
        return a.at[tuple(sl_dst)].set(kern[tuple(sl_src)])

    k2 = fold(kernel, 0, mh, sh, kh)               # [2Mh, kw, c, f]
    k2 = fold(k2, 1, mw, sw, kw)                   # [2Mh, 2Mw, c, f]
    k2 = k2.reshape(mh, 2, mw, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(mh, mw, 4 * c, f)

    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=(pad_h, pad_w),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class StemConv(nn.Module):
    """Drop-in for a stride-2 stem ``nn.Conv`` with explicit padding.

    Identical parameter names/shapes/inits to nn.Conv (kernel [kh,kw,C,F],
    optional bias [F]) so checkpoints, h5 transplant, and freeze masks are
    untouched; only the compute is re-expressed. The space-to-depth path
    engages on TPU for even spatial extents (model inputs are /32-floored,
    always even); MASKLAB_NO_S2D_STEM=1 forces the direct conv for A/Bs,
    MASKLAB_FORCE_S2D=1 engages it off-TPU (CPU parity tests).
    """
    features: int = 64
    use_bias: bool = False
    kernel_size: Tuple[int, int] = (7, 7)
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((3, 3), (3, 3))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        c = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            self.kernel_size + (c, self.features),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        use_s2d = (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                   and not os.environ.get('MASKLAB_NO_S2D_STEM')
                   and (jax.devices()[0].platform == 'tpu'
                        or os.environ.get('MASKLAB_FORCE_S2D')))
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if use_s2d:
            y = space_to_depth_stem(xd, kd, self.pad)
        else:
            y = jax.lax.conv_general_dilated(
                xd, kd, window_strides=(2, 2), padding=self.pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


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
