"""Pallas TPU kernel: per-segment top-`cap` extraction for candidate_pool.

The sort-free top-k selection (ops/nms.py candidate_pool) needs, per
score row, the top-`cap` elements of every stride-interleaved segment.
In XLA the `cap` rounds of (max, argmax, mask) re-read the [B*C, N] score
tensor from HBM every round (~10 ms at the bench shape); here the row
lives in VMEM for all rounds, so the extraction is VPU-bound and runs in
microseconds.

Layout: the caller reshapes the padded row [N_pad] to [m, s] row-major
(free reinterpretation), so segment j = {j, j+s, j+2s, ...} — reductions
run over the sublane axis m, one program per score row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extract_kernel(x_ref, vals_ref, idx_ref, *, cap: int):
    x = x_ref[0]                                        # [m, s]
    m, s = x.shape
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (m, s), 0)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    work = x.astype(jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)
    for t in range(cap):
        mx = jnp.max(work, axis=0, keepdims=True)       # [1, s]
        eq = work == mx
        # lowest row index among the maxima -> lax.top_k tie order
        am = jnp.min(jnp.where(eq, iota_r, m), axis=0,
                     keepdims=True)                     # [1, s]
        vals_ref[0, t:t + 1, :] = mx
        idx_ref[0, t:t + 1, :] = am * s + lane_j
        work = jnp.where(iota_r == am, neg_inf, work)


@functools.partial(jax.jit, static_argnames=('cap', 'interpret'))
def segment_topk_pallas(x: jnp.ndarray, cap: int,
                        interpret: bool = False):
    """Per-segment top-`cap` of [R, m, s] score rows (segment = column).

    Returns (vals [R, cap, s], idx [R, cap, s]) where idx is the index
    into the flattened [m*s] row (row-major, i.e. original padded order).
    Extraction t of segment j is the (t+1)-th largest element of
    {x[r, j] : r}, ties broken by lowest r.
    """
    r, m, s = x.shape
    vals, idx = pl.pallas_call(
        functools.partial(_extract_kernel, cap=cap),
        out_shape=(jax.ShapeDtypeStruct((r, cap, s), jnp.float32),
                   jax.ShapeDtypeStruct((r, cap, s), jnp.int32)),
        grid=(r,),
        in_specs=[pl.BlockSpec((1, m, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, cap, s), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, cap, s), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x.astype(jnp.float32))
    return vals, idx
