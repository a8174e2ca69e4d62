"""Pallas TPU kernel: greedy NMS keep-mask, fully in VMEM.

The production NMS (ops/nms.py) computes the [K, K] IoU matrix and runs the
greedy fixpoint as XLA matvecs; between iterations the keep vector round-
trips through HBM-visible buffers and each op carries dispatch overhead.
This kernel keeps everything resident in VMEM: the IoU matrix is computed
once with VPU broadcasting, and the fixpoint loop of masked matvecs runs
on the MXU without leaving the chip's fast memory.

Semantics are identical to ops.nms.nms_keep_mask (greedy NMS over score-
sorted boxes, strict iou > threshold suppression, max_outputs cap applied
as first-N-kept). Tested against both the fixpoint and sequential forms.

Grid: one program per batch row, so a [B, K, 4] batch of candidate sets
runs as B independent programs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold: float,
                max_outputs: int):
    boxes = boxes_ref[:].astype(jnp.float32)          # [K, 4] y1 x1 y2 x2
    valid = valid_ref[:].astype(jnp.float32)          # [K, 1]
    k = boxes.shape[0]

    y1, x1, y2, x2 = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    area = (y2 - y1) * (x2 - x1)                      # [K]
    in_h = jnp.maximum(
        0.0, jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :]))
    in_w = jnp.maximum(
        0.0, jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :]))
    inter = in_h * in_w
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)    # [K, K]

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # sup[j, i] = 1 if earlier kept j suppresses i
    sup = jnp.where((iou > iou_threshold) & (row < col), 1.0, 0.0)

    valid_v = valid[:, 0]

    def f(keep):
        hit = jax.lax.dot_general(
            keep[None, :], sup, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        return valid_v * (hit < 0.5).astype(jnp.float32)

    def cond(carry):
        even, odd, it = carry
        return jnp.logical_and(jnp.any(even != odd), it < k)

    def body(carry):
        even, odd, it = carry
        odd = f(even)
        even = f(odd)
        return even, odd, it + 1

    odd0 = f(valid_v)
    even1 = f(odd0)
    even, _, _ = jax.lax.while_loop(cond, body, (even1, odd0, jnp.int32(0)))
    kept = (even > 0.5).astype(jnp.float32)
    # inclusive prefix count via triangular matvec (cumsum has no Pallas
    # TPU lowering): rank[i] = sum_j<=i kept[j]
    tri = jnp.where(row <= col, 1.0, 0.0)                      # [K, K]
    rank = jax.lax.dot_general(
        kept[None, :], tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    keep_ref[:] = ((kept > 0.5) & (rank <= max_outputs))[:, None].astype(
        jnp.int32)


@functools.partial(jax.jit, static_argnames=('iou_threshold', 'max_outputs',
                                             'interpret'))
def nms_keep_mask_pallas(boxes_yxyx: jnp.ndarray, valid: jnp.ndarray,
                         iou_threshold: float, max_outputs: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Pallas form of ops.nms.nms_keep_mask.

    boxes_yxyx [K, 4] (score-sorted), valid [K] bool -> keep [K] bool.
    Use ``interpret=True`` on CPU (tests).
    """
    k = boxes_yxyx.shape[0]
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold,
                          max_outputs=max_outputs),
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_yxyx.astype(jnp.float32),
      valid.astype(jnp.float32)[:, None])
    return out[:, 0] > 0


def batched_nms_keep_mask_pallas(boxes_yxyx: jnp.ndarray,
                                 valid: jnp.ndarray, iou_threshold: float,
                                 max_outputs: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """[B, K, 4] x [B, K] -> [B, K] via vmap over the kernel."""
    return jax.vmap(lambda b, v: nms_keep_mask_pallas(
        b, v, iou_threshold, max_outputs, interpret))(boxes_yxyx, valid)
