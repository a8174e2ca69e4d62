"""Pallas TPU kernel: fused flat-band GroupNorm for ragged spatial maps.

The reference's GroupNormalization (engine/normalization.py:116-160)
normalizes contiguous *bands* of the flattened [H*W*C] feature map (see
nn/layers.py GroupNorm docstring). When ``groups`` does not divide
``H*W`` — the 14x14 mask-head crops — band boundaries split pixels, so
XLA's [N, G, L] reshape is a physical relayout and the stats + normalize
passes stream the tensor from HBM three times (~1.2 ms per GN at the
dense mask-head shape; 4 GNs cost more than the convs they normalize,
benchmarks/profile_mask_head.py).

This kernel keeps each crop block VMEM-resident for the whole op — one
HBM read, one write. The band decomposition exploits that each pixel
(row of C channels) spans at most two bands when ``groups <= H*W``:

  * per-pixel low/high partial sums u, v via a static [Q, C] boundary
    mask and lane reductions;
  * band sums as two tiny [TN, Q] x [Q, G] matmuls against static
    band-assignment one-hots A0/A1;
  * the normalize broadcast back as [TN, G] x [G, Q] matmuls plus the
    same boundary mask select;
  * the per-(band, c mod C/G) affine as precomputed [Q, C] gain/shift
    tables (built from the params in XLA outside the kernel).

Statistics accumulate in float32 (matching the XLA path); normalize +
affine run in float32 in-register and cast once on the way out.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def band_geometry(q: int, c: int, groups: int):
    """Static flat-band geometry for a [Q, C] map split into G bands.

    Returns (lowmask [Q, C], A0 [Q, G], A1 [Q, G], g0 [Q], g1 [Q]) where
    element (q, ch) belongs to band ``g0[q]`` when ``lowmask[q, ch]`` and
    ``g1[q]`` otherwise. Requires groups <= Q (each pixel spans at most
    two bands) and C % groups == 0.
    """
    if groups > q:
        raise ValueError(f'band_geometry needs groups <= Q ({groups} > {q})')
    length = q * c // groups
    qi = np.arange(q)
    g0 = (qi * c) // length
    cstar = np.clip(length * (g0 + 1) - c * qi, 0, c)
    g1 = np.minimum(g0 + 1, groups - 1)
    lowmask = (np.arange(c)[None, :] < cstar[:, None]).astype(np.float32)
    a0 = (np.arange(groups)[None, :] == g0[:, None]).astype(np.float32)
    a1 = (np.arange(groups)[None, :] == g1[:, None]).astype(np.float32)
    return lowmask, a0, a1, g0, g1


def affine_tables(scale: jnp.ndarray, bias: jnp.ndarray, q: int,
                  groups: int, g0: np.ndarray, g1: np.ndarray,
                  lowmask: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[Q, C] per-element gain/shift for the periodic band affine.

    The reference affine indexes ``scale[band * cg + p % cg]`` along the
    flat band; since cg | C the phase is ``ch % cg``, so the element
    table is ``scale.reshape(G, cg)[band(q, ch), ch % cg]``.
    """
    c = scale.shape[0]
    cg = c // groups
    tab_s = scale.reshape(groups, cg)
    tab_b = bias.reshape(groups, cg)
    phase = np.tile(np.arange(cg), c // cg)
    low = jnp.asarray(lowmask, bool)
    s_e = jnp.where(low, tab_s[g0][:, phase], tab_s[g1][:, phase])
    b_e = jnp.where(low, tab_b[g0][:, phase], tab_b[g1][:, phase])
    return s_e, b_e


def _gn_kernel(x_ref, low_ref, a0_ref, a1_ref, s_ref, b_ref, out_ref, *,
               length: int, eps: float, out_dtype, fuse_relu: bool):
    f = x_ref[...].astype(jnp.float32)               # [TN, Q, C]
    if fuse_relu:
        f = jnp.maximum(f, 0.0)
    low = low_ref[...]                                # [Q, C]
    a0 = a0_ref[...]                                  # [Q, G]
    a1 = a1_ref[...]
    f2 = f * f
    u = jnp.sum(f * low[None], axis=2)                # [TN, Q] low part
    p = jnp.sum(f, axis=2)
    u2 = jnp.sum(f2 * low[None], axis=2)
    p2 = jnp.sum(f2, axis=2)
    dn = (((1,), (0,)), ((), ()))

    def mm(a, b):
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)

    bs = mm(u, a0) + mm(p - u, a1)                    # [TN, G]
    bs2 = mm(u2, a0) + mm(p2 - u2, a1)
    m1 = bs / length
    m2 = bs2 / length
    inv = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)
    m_lo = mm(m1, a0.T)                               # [TN, Q]
    m_hi = mm(m1, a1.T)
    i_lo = mm(inv, a0.T)
    i_hi = mm(inv, a1.T)
    lowb = low[None] > 0.0
    m_e = jnp.where(lowb, m_lo[:, :, None], m_hi[:, :, None])
    i_e = jnp.where(lowb, i_lo[:, :, None], i_hi[:, :, None])
    y = (f - m_e) * i_e * s_ref[...][None] + b_ref[...][None]
    out_ref[...] = y.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=('groups', 'eps', 'block_n', 'fuse_relu',
                                    'interpret'))
def band_groupnorm_pallas(x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, groups: int = 16,
                          eps: float = 1e-5, block_n: int = 8,
                          fuse_relu: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused ragged-band GroupNorm over [N, Q, C] (Q = flattened H*W).

    Exact flat-band semantics of nn/layers.py GroupNorm's ragged path
    (f32 statistics; normalize in f32 here vs x.dtype there — <=3 ulp in
    bfloat16, bit-equal for float32 inputs). Requires groups <= Q and
    C % groups == 0. ``fuse_relu`` applies relu to the INPUT first (the
    conv -> relu -> GN stack without the intermediate HBM round-trip).
    """
    n, q, c = x.shape
    lowmask, a0, a1, g0, g1 = band_geometry(q, c, groups)
    s_e, b_e = affine_tables(scale.astype(jnp.float32),
                             bias.astype(jnp.float32), q, groups, g0, g1,
                             lowmask)
    pad = (-n) % block_n
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    grid = (xp.shape[0] // block_n,)
    const = lambda i: (0, 0)   # noqa: E731 — broadcast operands
    out = pl.pallas_call(
        functools.partial(_gn_kernel, length=q * c // groups, eps=eps,
                          out_dtype=x.dtype, fuse_relu=fuse_relu),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, q, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, groups), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, groups), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((q, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, q, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, jnp.asarray(lowmask), jnp.asarray(a0), jnp.asarray(a1), s_e, b_e)
    return out[:n] if pad else out


# ---- differentiable wrapper (Pallas forward, relayout-free XLA backward) ----

def _band_sums(t, lowmask, a0, a1):
    """Band sums of [N, Q, C] via the two-band decomposition -> [N, G]."""
    u = jnp.sum(t * lowmask[None], axis=2)            # low-part pixel sums
    p = jnp.sum(t, axis=2)
    dn = (((1,), (0,)), ((), ()))
    mm = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                           preferred_element_type=jnp.float32)
    return mm(u, a0) + mm(p - u, a1)


def _to_pixels(vals, a0, a1):
    """[N, G] band values -> ([N, Q] low-band, [N, Q] high-band)."""
    dn = (((1,), (0,)), ((), ()))
    mm = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                           preferred_element_type=jnp.float32)
    return mm(vals, a0.T), mm(vals, a1.T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def band_groupnorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int = 16, eps: float = 1e-5) -> jnp.ndarray:
    """Differentiable fused ragged-band GroupNorm over [N, Q, C].

    Forward runs the VMEM-resident Pallas kernel (XLA interpret fallback
    off-TPU); backward is exact flat-band GN gradient computed with the
    same relayout-free boundary decomposition.

    A pure-XLA forward variant (same decomposition, elementwise-only on
    the big tensor so XLA fuses it into the producer conv's layout) was
    A/B'd on hardware in round 4 and LOST decisively: dense b16 670.9
    vs 745.8 img/s for this kernel — the one-VMEM-residency stats +
    normalize beats avoiding the custom-call boundary copies at
    mask-head shapes. Deleted after the A/B; see docs/PERFORMANCE.md.
    """
    interpret = jax.devices()[0].platform != 'tpu'
    return band_groupnorm_pallas(x, scale, bias, groups, eps,
                                 interpret=interpret)


def _bgn_fwd(x, scale, bias, groups, eps):
    y = band_groupnorm(x, scale, bias, groups, eps)
    return y, (x, scale, bias)


def _bgn_bwd(groups, eps, res, dy):
    x, scale, bias = res
    n, q, c = x.shape
    length = q * c // groups
    cg = c // groups
    lowmask_np, a0_np, a1_np, g0, g1 = band_geometry(q, c, groups)
    lowmask = jnp.asarray(lowmask_np)
    a0 = jnp.asarray(a0_np)
    a1 = jnp.asarray(a1_np)
    s_e, _ = affine_tables(scale.astype(jnp.float32),
                           bias.astype(jnp.float32), q, groups, g0, g1,
                           lowmask_np)
    f = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    bs = _band_sums(f, lowmask, a0, a1)
    bs2 = _band_sums(f * f, lowmask, a0, a1)
    m1 = bs / length
    m2 = bs2 / length
    inv = jax.lax.rsqrt(jnp.maximum(m2 - m1 * m1, 0.0) + eps)

    def broadcast(vals):
        lo, hi = _to_pixels(vals, a0, a1)
        return jnp.where(lowmask[None] > 0, lo[:, :, None], hi[:, :, None])

    m_e = broadcast(m1)
    i_e = broadcast(inv)
    xhat = (f - m_e) * i_e
    g = dyf * s_e[None]
    sum_g = _band_sums(g, lowmask, a0, a1) / length
    sum_gx = _band_sums(g * xhat, lowmask, a0, a1) / length
    dx = (i_e * (g - broadcast(sum_g) - xhat * broadcast(sum_gx))
          ).astype(x.dtype)
    # affine grads: accumulate over elements sharing (band, c % cg)
    phase_shape = (n, q, c // cg, cg)

    def tab_grad(t):
        lo = (t * lowmask[None]).reshape(phase_shape).sum(2)   # [N, Q, cg]
        hi = (t * (1.0 - lowmask[None])).reshape(phase_shape).sum(2)
        glo = jnp.einsum('nqp,qg->gp', lo, a0)
        ghi = jnp.einsum('nqp,qg->gp', hi, a1)
        return (glo + ghi).reshape(c)
    dscale = tab_grad(dyf * xhat).astype(scale.dtype)
    dbias = tab_grad(dyf).astype(bias.dtype)
    return dx, dscale, dbias


band_groupnorm.defvjp(_bgn_fwd, _bgn_bwd)
