"""Static-shape class-aware two-stage NMS.

XLA re-design of the reference's ``DetectionProposal``
(engine/layers/detection.py:435-578): the TF version filters anchors with
``tf.where``, runs ``tf.image.non_max_suppression`` per (image, class) under
``tf.map_fn``, then a cross-class "post NMS" per image, and re-batches with
``MoldBatch``. None of that is expressible with static shapes, so here:

  1. per class, the top ``candidates_per_class`` anchors by score form a
     fixed-slot candidate pool (the reference considered *all* anchors above
     ``min_confidence``; a static top-k pool is the XLA equivalent and is
     lossless whenever the pool is larger than the number of anchors above
     threshold). At large anchor counts the pool comes from the sort-free
     :func:`candidate_pool` (Pallas segment extraction + exactness
     certificate) instead of ``lax.top_k``'s full variadic sort;
  2. greedy NMS runs as an MXU matvec *fixpoint* (:func:`nms_keep_mask`;
     the K-step sequential loop is kept as :func:`nms_keep_mask_sequential`
     for testing) with identical keep semantics to
     ``tf.image.non_max_suppression``: strict ``iou > threshold`` suppresses,
     ties broken by lower index;
  3. survivors of all classes are merged, sorted by confidence, and a second
     greedy pass with ``post_iou_threshold`` yields the final fixed
     ``[max_outputs, 6]`` slots, padded with -1 like the reference's
     MoldBatch output (misc.py:257).

Outputs are (cx, cy, w, h, class_id, confidence) rows sorted by descending
confidence, matching the reference's final ordering.
"""
from __future__ import annotations

import collections
import contextlib
import threading
from functools import partial

import jax
import jax.numpy as jnp

from .boxes import cxcywh_to_yxyx, iou_yxyx

NEG = jnp.float32(-1.0)

# Composite uint32 sort keys: lexicographic (value desc, index asc) —
# identical tie-breaking to lax.top_k — packed into ONE sortable word.
# A POSITIVE bf16's bit pattern is a uint16 <= 0x7F80 (+inf) MONOTONE in
# the value, so pattern+1 fits 15 bits (rank 0 is reserved for
# non-positives: all of them sit below any positive validity floor, so
# their mutual order is erased by the callers' sub-floor masking), and
# the low 17 bits hold the inverted index for the exact lowest-index
# tie-break. 15 + 17 = 32: the round-3 "composite keys need i64"
# objection dissolves once the value half is bf16 bits instead of f32
# bits. Correct ONLY under the callers' static bf16-exactness guarantee.
_IDX_BITS = 17
_IDX_MASK = (1 << _IDX_BITS) - 1


def _composite_encode(values: jnp.ndarray, indices: jnp.ndarray):
    u = jax.lax.bitcast_convert_type(
        values.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    # NaN (never produced by sigmoid scores, but harmless) collapses
    # with the non-positives: > 0.0 is False for it
    vpart = jnp.where(values > 0.0, u + jnp.uint32(1), jnp.uint32(0))
    mask_i = jnp.uint32(_IDX_MASK)
    # the & mask is wrap insurance on top of the callers' capacity gates
    return (vpart << _IDX_BITS) | ((mask_i - indices.astype(jnp.uint32))
                                   & mask_i)


def _composite_decode(top_key: jnp.ndarray):
    """-> (values f32 with -inf for non-positive ranks, indices int32)."""
    mask_i = jnp.uint32(_IDX_MASK)
    top_i = (mask_i - (top_key & mask_i)).astype(jnp.int32)
    vp = top_key >> _IDX_BITS
    top_v = jnp.where(
        vp > 0,
        jax.lax.bitcast_convert_type(
            (vp - jnp.uint32(1)).astype(jnp.uint16),
            jnp.bfloat16).astype(jnp.float32),
        -jnp.inf)
    return top_v, top_i


def composite_topk(scores: jnp.ndarray, k: int, floor: float):
    """Exact ``lax.top_k`` replacement for bf16-exact scores with a
    positive validity floor: ONE unsigned sort instead of the stable
    two-operand (f32, iota) variadic sort lax.top_k lowers to on TPU
    (the round-3 train trace pays 0.75 ms/step for it at [4, 5, 20460]).

    Entries with score >= floor come back exactly as lax.top_k orders
    them (value desc, index asc); sub-floor slots are masked to (NEG, 0)
    like the candidate-pool fast branch — dead for NMS purposes either
    way. Requires ``scores.shape[-1] <= 2**_IDX_BITS``.
    """
    n = scores.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), scores.shape)
    key = _composite_encode(scores, idx)
    flipped = jax.lax.sort(~key, dimension=-1, is_stable=False)
    top_v, top_i = _composite_decode(~flipped[..., :k])
    dead = top_v < floor
    return (jnp.where(dead, NEG, top_v).astype(scores.dtype),
            jnp.where(dead, 0, top_i))


# trace-time scope stack: (mesh, batch axis name) — see shard_local_nms
_SHARD_SCOPE = []


@contextlib.contextmanager
def shard_local_nms(mesh, axis: str = 'data'):
    """Make candidate_pool's exactness machinery shard-local under ``mesh``.

    Multi-process GSPMD lowers the certificate's global any-reduce +
    ``lax.cond`` into a cross-host collective feeding a replicated
    predicate, which deadlocks over the gloo CPU backend (observed: Gloo
    context init DEADLINE_EXCEEDED in the 2-process train test) — round 2
    fell back to the full-sort ``lax.top_k`` whenever
    ``jax.process_count() > 1``, silently re-paying the 4.33 ms sort the
    pool exists to kill. Entering this scope while tracing instead wraps
    the pool body in ``shard_map`` over the batch axis: every device
    evaluates its OWN certificate and takes its own fast/exact branch with
    zero collectives, so multi-host keeps the sort-free win. Results are
    bitwise identical to the global form (the pool is per-row exact and
    rows never cross shards).
    """
    _SHARD_SCOPE.append((mesh, axis))
    try:
        yield
    finally:
        _SHARD_SCOPE.pop()


def _shard_scope():
    return _SHARD_SCOPE[-1] if _SHARD_SCOPE else (None, None)


def candidate_pool(scores: jnp.ndarray, k: int, floor: float,
                   sort_below: int = 32768, bf16_exact: bool = False):
    """Top-k candidate pool without a full [.., N] sort.

    Equivalent to ``jax.lax.top_k(masked, k)`` *for NMS purposes*: the
    returned pool contains every element with score >= floor that the true
    top-k contains, in identical (score desc, index asc) order; slots
    beyond the valid candidates carry score -1 / index 0 (dead downstream,
    since NMS validity is ``score >= floor``).

    ``lax.top_k`` lowers to a full stable variadic sort on TPU (~4.3 ms
    for [48, 81840] on v5e — measured by trace; it was the single largest
    op in the round-1 inference graph; ``lax.approx_max_k`` is fast but
    drops top elements too often for an exactness certificate to pass in
    dense regimes). Here the selection runs as:

      1. scores are viewed as ~N/128 *stride-interleaved* segments of 128
         and each segment's top-``cap`` elements are extracted with
         ``cap`` rounds of (argmax, mask) — cheap vector reductions;
      2. the ~N/8 candidates are sorted lexicographically by
         (-value, index) — identical tie-breaking to lax.top_k — and
         sliced to k;
      3. a tie-robust exactness certificate on composite (value, index)
         keys: an element can only be missing if its segment truncated
         it, i.e. the segment's last extract has a strictly larger key.
         If no truncating segment's last key exceeds the pool's k-th key
         (which lower-bounds the true k-th), every missing element ranks
         below the top-k. Composite keys are unique, so the thousands of
         exact value ties bf16 scores carry cannot mass-fail the check
         the way a value threshold does;
      4. if the certificate fails (>cap elements ranking above the
         pool's k-th landed in one strided segment — rare by
         construction), ``lax.cond`` falls back to the exact full top_k,
         so the result is exact in every regime.

    Args:
      scores: [..., N], invalid entries pre-masked to a value < floor.
      k: pool size.
      floor: validity threshold (NMS min_confidence).
      bf16_exact: caller's STATIC guarantee that every score value is
        exactly representable in bfloat16 (true whenever the upstream
        network computed them in bf16, whatever dtype they arrive in).
        Enables the single-key composite sort in step 2 — see
        ``_pool_body``.
    Returns:
      (values [..., k], indices [..., k]).
    """
    n = scores.shape[-1]
    # below ~32k anchors the full sort is already sub-millisecond and the
    # extraction+certificate machinery costs more than it saves (train
    # steps at 256 px have ~12k anchors; the 512 px bench has ~82k) —
    # but bf16-exact scores still take the single-key composite sort
    # (safe multi-process too: no cond, no global reduce)
    if n <= max(8 * k, sort_below):
        if bf16_exact and floor > 0.0 and n <= (1 << _IDX_BITS):
            return composite_topk(scores, k, floor)
        return tuple(jax.lax.top_k(scores, k))
    if jax.process_count() > 1:
        # multi-process programs must not evaluate the certificate's
        # global any-reduce + lax.cond (deadlocks GSPMD over gloo — see
        # shard_local_nms). Inside a shard_local_nms scope the pool body
        # runs under shard_map with a per-device certificate and branch;
        # outside one (no mesh knowledge at trace time) fall back to the
        # plain sort-based top_k.
        mesh, axis = _shard_scope()
        parts = mesh.shape[axis] if mesh is not None else 0
        if mesh is None or scores.ndim < 2 or scores.shape[0] % parts:
            return tuple(jax.lax.top_k(scores, k))
        return _pool_sharded(scores, k, floor, mesh, axis, bf16_exact)
    return _pool_body(scores, k=k, floor=floor, bf16_exact=bf16_exact)


def _pool_sharded(scores: jnp.ndarray, k: int, floor: float, mesh, axis,
                  bf16_exact: bool = False):
    """The pool body under shard_map: per-device certificate + branch,
    zero collectives (rows never cross shards, so results are identical
    to the global form)."""
    from jax.sharding import PartitionSpec as P
    spec = P(axis, *([None] * (scores.ndim - 1)))
    body = partial(_pool_body, k=k, floor=floor, bf16_exact=bf16_exact)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec,),
                         out_specs=(spec, spec))(scores)


def _pool_body(scores: jnp.ndarray, k: int, floor: float,
               bf16_exact: bool = False):
    """The sort-free pool on (a shard of) ``scores`` — see candidate_pool."""
    *batch, n = scores.shape
    cap = 16
    m = 128
    s = -(-n // m)                       # segments (stride-interleaved)
    pad = s * m - n
    # strided segmentation: segment j holds elements {j, j+s, j+2s, ...},
    # so runs of confident anchors around one object (contiguous in the
    # [position, anchor] layout) spread across segments instead of
    # overflowing one segment's capacity
    x = jnp.concatenate(
        [scores, jnp.full((*batch, pad), -jnp.inf, scores.dtype)], axis=-1)
    x3 = x.reshape(-1, m, s)             # row-major: column j is strided

    on_tpu = jax.devices()[0].platform == 'tpu'
    if on_tpu:
        from .pallas.topk_kernel import segment_topk_pallas
        vals3, idxs3 = segment_topk_pallas(x3, cap)    # [R, cap, s]
    else:
        # XLA fallback (CPU tests): cap rounds of (max, argmax, mask)
        work = jnp.swapaxes(x3, -1, -2)                # [R, s, m]
        base_idx = (jnp.arange(s, dtype=jnp.int32)[:, None]
                    + jnp.arange(m, dtype=jnp.int32)[None, :] * s)
        iota_m = jnp.arange(m, dtype=jnp.int32)
        vs, ids = [], []
        for _ in range(cap):
            am = jnp.argmax(work, axis=-1)             # [R, s]
            vs.append(jnp.max(work, axis=-1))
            ids.append(jnp.take_along_axis(
                jnp.broadcast_to(base_idx, work.shape),
                am[..., None].astype(jnp.int32), axis=-1)[..., 0])
            work = jnp.where(iota_m == am[..., None], -jnp.inf, work)
        vals3 = jnp.stack(vs, axis=-2)                 # [R, cap, s]
        idxs3 = jnp.stack(ids, axis=-2)
    cand_v = vals3.reshape(*batch, cap * s)
    cand_i = idxs3.reshape(*batch, cap * s)

    # lexicographic (value desc, index asc) candidate order — identical
    # tie-breaking to lax.top_k. With bf16-exact scores the two-operand
    # variadic sort collapses to ONE uint32 key (_composite_encode; the
    # certificate's conservative -inf decode also erases non-positive
    # ranks). The index field must hold every PADDED index (base_idx
    # runs to s*m - 1, not n - 1), hence the gate on s * m.
    use_composite = (bf16_exact and floor > 0.0
                     and s * m <= (1 << _IDX_BITS))
    if use_composite:
        key = _composite_encode(cand_v, cand_i)
        flipped = jax.lax.sort(~key, dimension=-1, is_stable=False)
        top_v, top_i = _composite_decode(~flipped[..., :k])
    else:
        neg, sidx = jax.lax.sort(
            (-cand_v, cand_i), dimension=-1, num_keys=2, is_stable=False)
        top_v = -neg[..., :k]
        top_i = sidx[..., :k]

    # tie-robust exactness certificate on composite (value, index) keys:
    # an element can only be missing from the extraction if its segment
    # truncated it, i.e. the segment's LAST extract has a strictly larger
    # key (keys are unique, so no mass ties at a value threshold — scores
    # quantized through bf16 carry thousands of exact ties). If no
    # truncating segment's last key exceeds the pool's k-th key, every
    # missing element ranks below the pool's k-th, which lower-bounds the
    # true k-th — so the pool provably contains the whole top-k. Segments
    # whose last extract is below `floor` never truncated a valid element.
    lv = vals3[..., cap - 1, :].reshape(*batch, s)
    li = idxs3[..., cap - 1, :].reshape(*batch, s)
    kv = top_v[..., k - 1:k]                                # [.., 1]
    ki = top_i[..., k - 1:k]
    truncating = (lv >= jnp.float32(floor)) & (
        (lv > kv) | ((lv == kv) & (li < ki)))
    certified = ~jnp.any(truncating)

    def fast(args):
        top_v, top_i = args
        dead = top_v < floor
        return (jnp.where(dead, NEG, top_v), jnp.where(dead, 0, top_i))

    def exact(_):
        return tuple(jax.lax.top_k(scores, k))

    return jax.lax.cond(certified, fast, exact, (top_v, top_i))


def nms_keep_mask_sequential(boxes_yxyx: jnp.ndarray, valid: jnp.ndarray,
                             iou_threshold: float,
                             max_outputs: int) -> jnp.ndarray:
    """Reference greedy NMS as a K-step sequential loop (kept for testing
    — see :func:`nms_keep_mask` for the production fixpoint form)."""
    k = boxes_yxyx.shape[0]
    iou = iou_yxyx(boxes_yxyx, boxes_yxyx)                    # [K, K]
    later = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])  # j strictly after i
    suppress_from = (iou > iou_threshold) & later              # [K, K]

    def body(i, carry):
        suppressed, kept, count = carry
        can_keep = valid[i] & (~suppressed[i]) & (count < max_outputs)
        kept = kept.at[i].set(can_keep)
        suppressed = suppressed | (can_keep & suppress_from[i])
        count = count + can_keep.astype(jnp.int32)
        return suppressed, kept, count

    suppressed0 = jnp.zeros((k,), jnp.bool_)
    kept0 = jnp.zeros((k,), jnp.bool_)
    _, kept, _ = jax.lax.fori_loop(0, k, body,
                                   (suppressed0, kept0, jnp.int32(0)))
    return kept


def nms_keep_mask(boxes_yxyx: jnp.ndarray, valid: jnp.ndarray,
                  iou_threshold: float, max_outputs: int) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes as an MXU matvec fixpoint.

    The K-step sequential loop is the TPU bottleneck (each tiny iteration
    costs microseconds of loop overhead). Greedy keep is the unique
    fixpoint of the antitone map

        f(keep)[i] = valid[i] and not exists j<i: keep[j] and iou[j,i] > t,

    and iterating ``g = f(f(keep))`` from keep = valid sandwiches the
    greedy solution from above and below (even iterates >= greedy >= odd
    iterates), converging exactly in O(longest suppression chain)
    iterations — single digits on real data. Each f is one [K, K] x [K]
    matvec on the MXU instead of K loop steps. The ``max_outputs`` cap is
    applied afterwards (keeping the first ``max_outputs`` kept boxes equals
    capped greedy, since suppression only ever flows from kept boxes).
    """
    k = boxes_yxyx.shape[0]
    iou = iou_yxyx(boxes_yxyx, boxes_yxyx)
    later = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])
    # suppress[j, i]: earlier kept j kills i
    sup = ((iou > iou_threshold) & later).astype(jnp.float32)  # [K, K]
    valid_f = valid.astype(jnp.float32)

    def f(keep):
        hit = jnp.einsum('ji,j->i', sup, keep,
                         precision=jax.lax.Precision.HIGHEST)
        return valid_f * (hit < 0.5)

    def cond(carry):
        even, odd, it = carry
        return jnp.logical_and(jnp.any(even != odd), it < k)

    def body(carry):
        even, odd, it = carry
        odd = f(even)
        even = f(odd)
        return even, odd, it + 1

    even0 = valid_f
    odd0 = f(even0)
    even1 = f(odd0)
    even, odd, _ = jax.lax.while_loop(cond, body,
                                      (even1, odd0, jnp.int32(0)))
    kept = even > 0.5
    # cap: first max_outputs kept (in score order) survive
    rank = jnp.cumsum(kept.astype(jnp.int32))
    return kept & (rank <= max_outputs)


def _nms_impl(cls_pred: jnp.ndarray, boxes: jnp.ndarray,
              min_confidence: float,
              nms_iou_threshold: float,
              post_iou_threshold: float,
              max_outputs: int,
              candidates_per_class: int,
              scores_bf16_exact: bool = False) -> jnp.ndarray:
    b, n, num_classes = cls_pred.shape
    kc = min(candidates_per_class, n)
    boxes = boxes.astype(jnp.float32)
    # bf16 upstream scores stay bf16-exact through the f32 cast and the
    # -1.0 masking below — a STATIC guarantee that lets the pool's step-2
    # sort use single-key composite ordering (see _pool_body)
    bf16_exact = scores_bf16_exact or cls_pred.dtype == jnp.bfloat16
    cls_pred = cls_pred.astype(jnp.float32)
    boxes_yxyx = cxcywh_to_yxyx(boxes)                         # pixel coords

    # stage 1: per-class static candidate pools — sort-free selection
    # (lax.top_k's full sort was the largest op in the inference graph)
    scores_t = jnp.swapaxes(cls_pred, 1, 2)                    # [B, C, N]
    masked = jnp.where(scores_t >= min_confidence, scores_t, -1.0)
    top_scores, top_idx = candidate_pool(masked, kc,
                                         floor=min_confidence,
                                         bf16_exact=bf16_exact)  # [B, C, kc]
    top_boxes = jax.vmap(
        lambda bb, ii: bb[ii.reshape(-1)].reshape(num_classes, kc, 4))(
            boxes_yxyx, top_idx)
    top_valid = top_scores >= min_confidence
    kept = jax.vmap(nms_keep_mask, in_axes=(0, 0, None, None))(
        top_boxes.reshape(b * num_classes, kc, 4),
        top_valid.reshape(b * num_classes, kc),
        nms_iou_threshold, max_outputs).reshape(b, num_classes, kc)
    cand_scores = jnp.where(kept, top_scores, -1.0)            # [B, C, kc]

    # stage 2: cross-class post-NMS over all survivors
    class_ids = jnp.broadcast_to(
        jnp.arange(num_classes)[None, :, None], (b, num_classes, kc))
    flat_scores = cand_scores.reshape(b, -1)                   # [B, C*kc]
    flat_idx = top_idx.reshape(b, -1)
    flat_class = class_ids.reshape(b, -1)
    k2 = min(num_classes * kc, num_classes * max_outputs)
    s2_scores, order = jax.lax.top_k(flat_scores, k2)          # [B, k2]
    s2_anchor = jnp.take_along_axis(flat_idx, order, axis=1)
    s2_class = jnp.take_along_axis(flat_class, order, axis=1)
    s2_boxes_yxyx = jax.vmap(lambda bb, ii: bb[ii])(boxes_yxyx, s2_anchor)
    s2_valid = s2_scores >= min_confidence
    kept2 = jax.vmap(nms_keep_mask, in_axes=(0, 0, None, None))(
        s2_boxes_yxyx, s2_valid, post_iou_threshold, max_outputs)

    # compact kept rows (already score-sorted) into the fixed output slots
    final_scores = jnp.where(kept2, s2_scores, -jnp.inf)
    out_scores, out_sel = jax.lax.top_k(final_scores, max_outputs)
    out_valid = jnp.isfinite(out_scores)
    out_anchor = jnp.take_along_axis(s2_anchor, out_sel, axis=1)
    out_boxes = jax.vmap(lambda bb, ii: bb[ii])(boxes, out_anchor)
    out_class = jnp.take_along_axis(s2_class, out_sel, axis=1).astype(
        jnp.float32)

    pad = lambda v: jnp.where(out_valid, v, NEG)
    result = jnp.stack([
        pad(out_boxes[..., 0]), pad(out_boxes[..., 1]),
        pad(out_boxes[..., 2]), pad(out_boxes[..., 3]),
        pad(out_class), pad(jnp.where(out_valid, out_scores, NEG)),
    ], axis=-1)
    # stop_gradient mirrors the reference (detection.py:567)
    return jax.lax.stop_gradient(result)


# Bounded LRU: keys embed live Mesh objects (recreated trainers / tests /
# notebook reuse would otherwise pin every stale mesh + its lowering
# forever). 8 scopes is far above any real process's concurrent meshes;
# eviction only costs a re-jit if an evicted scope comes back.
_NMS_JIT_CACHE: 'collections.OrderedDict' = collections.OrderedDict()
_NMS_JIT_CACHE_MAX = 8
# serving calls NMS from worker threads; the LRU's evict path would
# otherwise race a concurrent lookup into a KeyError
_NMS_JIT_CACHE_LOCK = threading.Lock()


def batched_class_aware_nms(cls_pred: jnp.ndarray, boxes: jnp.ndarray,
                            min_confidence: float = 0.05,
                            nms_iou_threshold: float = 0.4,
                            post_iou_threshold: float = 0.65,
                            max_outputs: int = 100,
                            candidates_per_class: int = 256,
                            scores_bf16_exact: bool = False) -> jnp.ndarray:
    """Batched class-aware two-stage NMS.

    Written natively batched rather than as a vmap of a per-image function
    (only the greedy keep fixpoint is vmapped — a while-loop of [K, K]
    matvecs that batches cleanly), with the per-class candidate pools from
    the sort-free :func:`candidate_pool`.

    Declared non-differentiable via ``custom_jvp`` (zero tangent): the
    reference stop-gradients the proposals anyway (detection.py:567), and
    the Pallas extraction kernel inside has no autodiff rule — without
    this, the trainer's linearization would fail.

    Args:
      cls_pred: [B, N, C] per-anchor per-class sigmoid confidences.
      boxes: [B, N, 4] decoded (cx, cy, w, h) boxes (one set per anchor).
      scores_bf16_exact: STATIC caller guarantee that every confidence is
        bf16-representable (the model computed its sigmoid in bf16 even
        if it handed over f32) — unlocks the candidate pool's single-key
        composite sort. Inferred automatically when cls_pred IS bf16.
    Returns:
      [B, max_outputs, 6] rows (cx, cy, w, h, class, conf), -1-padded.
    """
    # one jit object per shard_local_nms scope: the scope is consulted at
    # TRACE time (candidate_pool), so a single jit's aval-keyed cache
    # would silently reuse a lowering traced under a different scope
    # (e.g. an unscoped eval trace poisoning the scoped train step with
    # the full-sort fallback, or vice versa)
    key = _shard_scope()
    with _NMS_JIT_CACHE_LOCK:
        if key not in _NMS_JIT_CACHE:
            _NMS_JIT_CACHE[key] = jax.jit(
                _nms_jittable, static_argnames=(
                    'min_confidence', 'nms_iou_threshold',
                    'post_iou_threshold', 'max_outputs',
                    'candidates_per_class', 'scores_bf16_exact'))
            while len(_NMS_JIT_CACHE) > _NMS_JIT_CACHE_MAX:
                _NMS_JIT_CACHE.popitem(last=False)
        else:
            _NMS_JIT_CACHE.move_to_end(key)
        fn = _NMS_JIT_CACHE[key]
    return fn(
        cls_pred, boxes, min_confidence=min_confidence,
        nms_iou_threshold=nms_iou_threshold,
        post_iou_threshold=post_iou_threshold, max_outputs=max_outputs,
        candidates_per_class=candidates_per_class,
        scores_bf16_exact=scores_bf16_exact)


def _nms_jittable(cls_pred, boxes, *, min_confidence, nms_iou_threshold,
                  post_iou_threshold, max_outputs, candidates_per_class,
                  scores_bf16_exact=False):
    impl = partial(_nms_impl, min_confidence=min_confidence,
                   nms_iou_threshold=nms_iou_threshold,
                   post_iou_threshold=post_iou_threshold,
                   max_outputs=max_outputs,
                   candidates_per_class=candidates_per_class,
                   scores_bf16_exact=scores_bf16_exact)
    nms = jax.custom_jvp(impl)

    @nms.defjvp
    def _zero_jvp(primals, tangents):
        out = impl(*primals)
        return out, jnp.zeros_like(out)

    return nms(cls_pred, boxes)


def class_aware_nms(cls_pred: jnp.ndarray, boxes: jnp.ndarray,
                    **kwargs) -> jnp.ndarray:
    """Single-image form: [N, C] x [N, 4] -> [max_outputs, 6]."""
    return batched_class_aware_nms(cls_pred[None], boxes[None], **kwargs)[0]
