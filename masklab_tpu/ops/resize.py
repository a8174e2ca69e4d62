"""Bilinear resize with TF1 semantics, as MXU-friendly matmuls.

The reference leans on ``tf.compat.v1.image.resize_bilinear`` with
``align_corners=True`` everywhere (FPN upsample, ASPP pooling branch,
DownSampleInput/UpSampleOutput, AssignSeg — engine/layers/misc.py:153,193,306).
A 1-px sampling-convention mismatch destroys mask-IoU parity (SURVEY.md §7
"hard parts" #3), so this module reproduces TF1's exact source-coordinate
formulas:

  * ``align_corners=True``:  src = i * (in - 1) / (out - 1)   (out > 1)
  * ``align_corners=False`` (TF1 legacy, no half-pixel): src = i * in / out

Instead of gathers, the separable interpolation is expressed as two small
dense matmuls (``W_h @ x @ W_w^T``) built from static shapes at trace time —
this maps straight onto the TPU MXU and fuses with surrounding ops.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] bilinear interpolation matrix (TF1 semantics)."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == in_size:
        np.fill_diagonal(w, 1.0)
        return w
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size if not align_corners else 0.0
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        lo = min(max(lo, 0), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = np.float32(src - lo)
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = True) -> jnp.ndarray:
    """Resize ``[..., H, W, C]`` to ``[..., out_h, out_w, C]`` (TF1 bilinear).

    ``out_h`` / ``out_w`` must be Python ints (static under jit) — the
    interpolation matrices become XLA constants.
    """
    import jax
    in_h, in_w = x.shape[-3], x.shape[-2]
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    # HIGHEST precision: interpolation weights must not round to bf16 on the
    # MXU or the TF1 bit-parity target (SURVEY.md §7 hard part #3) is lost.
    hi = jax.lax.Precision.HIGHEST
    if in_h != out_h:
        wh = jnp.asarray(_interp_matrix(in_h, out_h, align_corners))
        x = jnp.einsum('oh,...hwc->...owc', wh, x, precision=hi)
    if in_w != out_w:
        ww = jnp.asarray(_interp_matrix(in_w, out_w, align_corners))
        x = jnp.einsum('ow,...hwc->...hoc', ww, x, precision=hi)
    if jnp.issubdtype(orig_dtype, jnp.floating):
        return x.astype(orig_dtype)
    return x  # integer inputs promote to float, as tf.image.resize_bilinear does


def resize_like(x: jnp.ndarray, target: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """Resize ``x`` to ``target``'s spatial size (ResizeLike, misc.py:296-319)."""
    return resize_bilinear(x, target.shape[-3], target.shape[-2], align_corners)


def downsample_input(images: jnp.ndarray, target_size=(540, 960)) -> jnp.ndarray:
    """Aspect-preserving downscale to fit ``target_size`` (DownSampleInput,
    misc.py:133-161). The output size is static: computed from the static
    input shape with the same min-ratio rule the reference applies at
    runtime. align_corners=True per misc.py:153-154.
    """
    in_h, in_w = images.shape[-3], images.shape[-2]
    ratio = min(target_size[0] / in_h, target_size[1] / in_w)
    out_h = int(ratio * in_h)
    out_w = int(ratio * in_w)
    return resize_bilinear(images.astype(jnp.float32), out_h, out_w,
                           align_corners=True)
