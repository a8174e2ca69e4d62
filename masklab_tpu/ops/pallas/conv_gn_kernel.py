"""Pallas TPU kernel: fused conv3x3 + bias + relu + flat-band GroupNorm.

The mask-head depth stack (HeadBlock on 14x14 RoI crops) spends more
time moving activations than computing them: each layer writes the conv
output to HBM, reads it back for GroupNorm's band statistics, and reads
it again to normalize — and on ragged spatial sizes the [N, G, L] band
reshape is a physical relayout on top (benchmarks/profile_mask_head.py:
convs alone 98% MXU, the stack 3-7x slower than its conv floor).

This kernel runs one whole layer per VMEM residency: the 3x3 conv as
nine accumulated shifted-window matmuls — each a single-contraction 2-D
dot [TN*h*w, C_in] x [C_in, C_out] on the MXU (Mosaic rejects the
one-shot [.., 9, C] x [9, C, C] im2col contraction: "lhs contracting
dims must be of size 1"; the shifted-window form is also lighter on
VMEM, no 9x patch tensor) — bias + relu in registers, then the exact
flat-band GroupNorm of groupnorm_kernel.py on the flattened [TN, Q, C]
result (the same lane-reduce + [TN, Q] x [Q, G] one-hot-matmul
decomposition that kernel runs on hardware). One HBM read, one write
per layer.

Gradients: ``fused_conv_gn`` is a custom_vjp whose backward recomputes
through the equivalent pure-XLA composition — bit-exact math, standard
autodiff; the fusion targets the inference hot path (the train step's
cost is elsewhere, see docs/PERFORMANCE.md round 3, and train/steps.py
wraps its forward in no_fused_conv_gn()).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm_kernel import affine_tables, band_geometry


def _kernel(x_ref, w_ref, cb_ref, low_ref, a0_ref, a1_ref, s_ref, b_ref,
            out_ref, *, h: int, w: int, length: int, eps: float,
            out_dtype):
    x = x_ref[...]                                    # [TN, h, w, C_in]
    tn, _, _, c_in = x.shape
    w9 = w_ref[...]                                   # [9, C_in, C]
    c = w9.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn2 = (((1,), (0,)), ((), ()))                    # plain 2-D matmul
    acc = jnp.zeros((tn * h * w, c), jnp.float32)
    for k in range(9):
        dy, dx = divmod(k, 3)
        win = xp[:, dy:dy + h, dx:dx + w, :].reshape(tn * h * w, c_in)
        acc = acc + jax.lax.dot_general(
            win, w9[k], dn2, preferred_element_type=jnp.float32)
    f = jnp.maximum(acc + cb_ref[...][None, :], 0.0)
    f = f.reshape(tn, h * w, c)                       # [TN, Q, C] f32

    # flat-band GroupNorm — the proven _gn_kernel decomposition verbatim
    low = low_ref[...]                                # [Q, C]
    a0 = a0_ref[...]                                  # [Q, G]
    a1 = a1_ref[...]
    f2 = f * f
    u = jnp.sum(f * low[None], axis=2)                # [TN, Q] low part
    p = jnp.sum(f, axis=2)
    u2 = jnp.sum(f2 * low[None], axis=2)
    p2 = jnp.sum(f2, axis=2)

    def mm(a, b):
        return jax.lax.dot_general(a, b, dn2,
                                   preferred_element_type=jnp.float32)

    bs = mm(u, a0) + mm(p - u, a1)                    # [TN, G]
    bs2 = mm(u2, a0) + mm(p2 - u2, a1)
    m1 = bs / length
    m2 = bs2 / length
    inv = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)
    m_lo, m_hi = mm(m1, a0.T), mm(m1, a1.T)           # [TN, Q]
    i_lo, i_hi = mm(inv, a0.T), mm(inv, a1.T)
    lowb = low[None] > 0.0
    m_e = jnp.where(lowb, m_lo[:, :, None], m_hi[:, :, None])
    i_e = jnp.where(lowb, i_lo[:, :, None], i_hi[:, :, None])
    out = (f - m_e) * i_e * s_ref[...][None] + b_ref[...][None]
    out_ref[...] = out.astype(out_dtype)              # [TN, Q, C]


@functools.partial(jax.jit,
                   static_argnames=('groups', 'eps', 'block_n', 'interpret'))
def conv_gn_pallas(x: jnp.ndarray, kernel: jnp.ndarray, conv_bias,
                   scale: jnp.ndarray, bias: jnp.ndarray, groups: int = 16,
                   eps: float = 1e-5, block_n: int = 8,
                   interpret: bool = False) -> jnp.ndarray:
    """bandGN(relu(conv3x3_SAME(x) + conv_bias)) over [N, h, w, C_in].

    kernel [3, 3, C_in, C_out]; requires groups <= h*w and
    C_out % groups == 0. Spatial must be small enough that the block's
    input window + f32 accumulator fit VMEM (RoI-crop sizes).
    """
    n, h, w, c_in = x.shape
    c = kernel.shape[-1]
    q = h * w
    lowmask, a0, a1, g0, g1 = band_geometry(q, c, groups)
    s_e, b_e = affine_tables(scale.astype(jnp.float32),
                             bias.astype(jnp.float32), q, groups, g0, g1,
                             lowmask)
    w9 = kernel.reshape(9, c_in, c).astype(x.dtype)
    cb = (jnp.zeros((c,), jnp.float32) if conv_bias is None
          else conv_bias.astype(jnp.float32))
    pad = (-n) % block_n
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0))) if pad else x
    grid = (xp.shape[0] // block_n,)
    c3 = lambda i: (0, 0, 0)   # noqa: E731
    c2 = lambda i: (0, 0)      # noqa: E731
    c1 = lambda i: (0,)        # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, length=q * c // groups,
                          eps=eps, out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], q, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, h, w, c_in), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c_in, c), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), c1, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, groups), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, groups), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), c2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, q, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w9, cb, jnp.asarray(lowmask), jnp.asarray(a0), jnp.asarray(a1),
      s_e, b_e)
    out = out.reshape(xp.shape[0], h, w, c)
    return out[:n] if pad else out


def _xla_reference(x, kernel, conv_bias, scale, bias, groups, eps):
    """The exact pure-XLA composition the kernel fuses (for the vjp):
    conv3x3 + bias + relu + flat-band GroupNorm (ragged path math of
    nn/layers.py GroupNorm, f32 statistics)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = jnp.maximum(y + conv_bias.astype(y.dtype), 0.0)
    n, h, w, c = y.shape
    cg = c // groups
    flat = y.reshape(n, groups, -1)
    f32 = flat.astype(jnp.float32)
    m1 = jnp.mean(f32, axis=-1, keepdims=True)
    m2 = jnp.mean(jnp.square(f32), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + eps)
    g = (f32 - m1) * inv
    length = flat.shape[-1]
    table_s = jnp.tile(scale.reshape(groups, cg), (1, length // cg))
    table_b = jnp.tile(bias.reshape(groups, cg), (1, length // cg))
    g = g * table_s[None] + table_b[None]
    return g.reshape(y.shape).astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_conv_gn(x, kernel, conv_bias, scale, bias, groups: int = 16,
                   eps: float = 1e-5):
    interpret = jax.devices()[0].platform != 'tpu'
    return conv_gn_pallas(x, kernel, conv_bias, scale, bias, groups, eps,
                          interpret=interpret)


def fused_conv_gn(x, kernel, conv_bias, scale, bias, groups: int = 16,
                  eps: float = 1e-5):
    """Differentiable fused conv3x3+relu+bandGN (Pallas fwd, XLA bwd).

    ``conv_bias=None`` is normalized to zeros HERE, before the custom_vjp
    boundary, so the backward's XLA recomputation sees the same array
    inputs as the forward (ADVICE r3: a None bias saved in residuals
    would crash ``_xla_reference``'s ``.astype`` under differentiation).
    """
    if conv_bias is None:
        conv_bias = jnp.zeros((kernel.shape[-1],), jnp.float32)
    return _fused_conv_gn(x, kernel, conv_bias, scale, bias, groups, eps)


def _fwd(x, kernel, conv_bias, scale, bias, groups, eps):
    y = _fused_conv_gn(x, kernel, conv_bias, scale, bias, groups, eps)
    return y, (x, kernel, conv_bias, scale, bias)


def _bwd(groups, eps, res, dy):
    x, kernel, conv_bias, scale, bias = res

    def f(x, kernel, conv_bias, scale, bias):
        return _xla_reference(x, kernel, conv_bias, scale, bias, groups,
                              eps)

    _, vjp = jax.vjp(f, x, kernel, conv_bias, scale, bias)
    return vjp(dy)


_fused_conv_gn.defvjp(_fwd, _bwd)
