"""Parity tests of the static-shape TPU ops against the exact TF ops the
reference framework used (tf.compat.v1.image.resize_bilinear,
tf.image.crop_and_resize, tf.image.non_max_suppression)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu.ops import (batched_class_aware_nms, class_aware_nms,
                             crop_and_resize, crop_and_resize_indexed,
                             cxcywh_to_yxyx, decode_boxes, encode_boxes,
                             nms_keep_mask, pairwise_iou, resize_bilinear,
                             semantic_smoothing)

tf = pytest.importorskip('tensorflow')

RNG = np.random.RandomState(0)


# ---------- bilinear resize ----------

@pytest.mark.parametrize('in_hw,out_hw', [
    ((17, 23), (34, 46)), ((64, 64), (16, 16)), ((5, 7), (13, 11)),
    ((32, 48), (33, 49)), ((10, 10), (10, 10)),
])
@pytest.mark.parametrize('align', [True, False])
def test_resize_bilinear_matches_tf1(in_hw, out_hw, align):
    x = RNG.rand(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw,
                                      align_corners=align))
    ref = tf.compat.v1.image.resize_bilinear(
        tf.constant(x), out_hw, align_corners=align).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


# ---------- box ops ----------

def test_decode_encode_roundtrip():
    priors = RNG.uniform(8, 64, size=(40, 4)).astype(np.float32)
    gt = RNG.uniform(10, 50, size=(40, 4)).astype(np.float32)
    deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(priors))
    rec = decode_boxes(deltas, jnp.asarray(priors))
    np.testing.assert_allclose(np.asarray(rec), gt, atol=1e-2, rtol=2e-4)


def test_pairwise_iou_against_numpy():
    a = np.abs(RNG.randn(12, 4)).astype(np.float32) * 20 + 5
    b = np.abs(RNG.randn(9, 4)).astype(np.float32) * 20 + 5
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))

    def to_corners(x):
        return np.stack([x[:, 0] - x[:, 2] / 2, x[:, 1] - x[:, 3] / 2,
                         x[:, 0] + x[:, 2] / 2, x[:, 1] + x[:, 3] / 2], -1)

    ac, bc = to_corners(a), to_corners(b)
    want = np.zeros((12, 9), np.float32)
    for i in range(12):
        for j in range(9):
            ix = max(0, min(ac[i, 2], bc[j, 2]) - max(ac[i, 0], bc[j, 0]))
            iy = max(0, min(ac[i, 3], bc[j, 3]) - max(ac[i, 1], bc[j, 1]))
            inter = ix * iy
            union = a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3] - inter
            want[i, j] = inter / (union + 1e-5)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ---------- crop_and_resize ----------

@pytest.mark.parametrize('crop', [(14, 14), (7, 5), (1, 1), (28, 28)])
def test_crop_and_resize_matches_tf(crop):
    fmap = RNG.rand(1, 24, 31, 8).astype(np.float32)
    boxes = np.stack([
        RNG.uniform(-0.2, 0.8, 16), RNG.uniform(-0.2, 0.8, 16),
        RNG.uniform(0.2, 1.2, 16), RNG.uniform(0.2, 1.2, 16)], -1
    ).astype(np.float32)
    ours = np.asarray(crop_and_resize(jnp.asarray(fmap[0]),
                                      jnp.asarray(boxes), crop))
    ref = tf.image.crop_and_resize(tf.constant(fmap), tf.constant(boxes),
                                   tf.zeros(16, tf.int32), crop).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_crop_and_resize_indexed_matches_tf():
    fmaps = RNG.rand(5, 16, 16, 4).astype(np.float32)
    boxes = RNG.uniform(0, 1, size=(20, 4)).astype(np.float32)
    boxes = np.sort(boxes.reshape(20, 2, 2), axis=1).reshape(20, 4)[:, [0, 2, 1, 3]]
    idx = RNG.randint(0, 5, 20).astype(np.int32)
    ours = np.asarray(crop_and_resize_indexed(
        jnp.asarray(fmaps), jnp.asarray(boxes), jnp.asarray(idx), (14, 14)))
    ref = tf.image.crop_and_resize(fmaps, boxes, idx, (14, 14)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_crop_and_resize_gradients_flow():
    fmap = jnp.asarray(RNG.rand(16, 16, 4).astype(np.float32))
    boxes = jnp.asarray([[0.1, 0.1, 0.6, 0.6]], jnp.float32)
    g = jax.grad(lambda f: crop_and_resize(f, boxes, (7, 7)).sum())(fmap)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


# ---------- NMS ----------

def _random_boxes(n):
    cx = RNG.uniform(20, 200, n)
    cy = RNG.uniform(20, 200, n)
    w = RNG.uniform(10, 60, n)
    h = RNG.uniform(10, 60, n)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


@pytest.mark.parametrize('seed', [1, 2, 3, 4, 5])
def test_fixpoint_nms_matches_sequential(seed):
    from masklab_tpu.ops.nms import nms_keep_mask_sequential
    rng = np.random.RandomState(seed)
    n = 80
    boxes = np.stack([rng.uniform(20, 120, n), rng.uniform(20, 120, n),
                      rng.uniform(10, 80, n), rng.uniform(10, 80, n)],
                     -1).astype(np.float32)
    yxyx = np.asarray(cxcywh_to_yxyx(jnp.asarray(boxes)))
    order = np.argsort(-rng.uniform(0, 1, n), kind='stable')
    yxyx = yxyx[order]
    valid = jnp.asarray(rng.rand(n) > 0.2)
    for thresh, cap in ((0.3, 100), (0.5, 10), (0.7, 5)):
        fx = np.asarray(nms_keep_mask(jnp.asarray(yxyx), valid, thresh, cap))
        seq = np.asarray(nms_keep_mask_sequential(jnp.asarray(yxyx), valid,
                                                  thresh, cap))
        np.testing.assert_array_equal(fx, seq), (seed, thresh, cap)


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_nms_keep_matches_tf(seed):
    rng = np.random.RandomState(seed)
    n = 64
    boxes = _random_boxes(n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores, kind='stable')
    yxyx = np.asarray(cxcywh_to_yxyx(jnp.asarray(boxes)))[order]
    kept = np.asarray(nms_keep_mask(jnp.asarray(yxyx),
                                    jnp.ones(n, bool), 0.5, 100))
    ours = order[np.where(kept)[0]]
    ref = tf.image.non_max_suppression(
        yxyx, scores[order], max_output_size=100, iou_threshold=0.5).numpy()
    ref = order[ref]
    np.testing.assert_array_equal(np.sort(ours), np.sort(ref))


def test_class_aware_nms_reference_semantics():
    """Full two-stage pipeline vs a numpy re-implementation of the
    reference's DetectionProposal logic (detection.py:482-567)."""
    n, c = 200, 5
    boxes = _random_boxes(n)
    cls_pred = RNG.uniform(0, 1, (n, c)).astype(np.float32) ** 3
    min_conf, nms_t, post_t, max_out = 0.3, 0.4, 0.6, 100

    got = np.asarray(class_aware_nms(
        jnp.asarray(cls_pred), jnp.asarray(boxes),
        min_confidence=min_conf, nms_iou_threshold=nms_t,
        post_iou_threshold=post_t, max_outputs=max_out,
        candidates_per_class=n))

    # numpy reference: per-class NMS then cross-class NMS
    yxyx = np.asarray(cxcywh_to_yxyx(jnp.asarray(boxes)))
    survivors = []  # (score, anchor, class)
    for ci in range(c):
        idx = np.where(cls_pred[:, ci] >= min_conf)[0]
        keep = tf.image.non_max_suppression(
            yxyx[idx], cls_pred[idx, ci], max_out, nms_t).numpy()
        for a in idx[keep]:
            survivors.append((cls_pred[a, ci], a, ci))
    survivors.sort(key=lambda t: -t[0])
    s_yxyx = np.stack([yxyx[a] for _, a, _ in survivors])
    s_scores = np.array([s for s, _, _ in survivors], np.float32)
    keep2 = tf.image.non_max_suppression(s_yxyx, s_scores, max_out,
                                         post_t).numpy()
    want = sorted(((survivors[k][1], survivors[k][2]) for k in keep2))

    valid = got[:, 0] != -1
    got_pairs = []
    for row in got[valid]:
        dist = np.abs(boxes - row[:4]).sum(1)
        got_pairs.append((int(np.argmin(dist)), int(row[4])))
    assert sorted(got_pairs) == want


def test_batched_nms_shapes():
    boxes = jnp.asarray(np.stack([_random_boxes(50)] * 3))
    cls = jnp.asarray(RNG.uniform(0, 1, (3, 50, 5)).astype(np.float32))
    out = batched_class_aware_nms(cls, boxes, min_confidence=0.5,
                                  max_outputs=10, candidates_per_class=32)
    assert out.shape == (3, 10, 6)


def test_pool_trim_lossless_in_realistic_regime():
    """The road preset trims the per-class candidate pool 256 -> 128;
    whenever fewer than 128 anchors per class clear min_confidence (every
    realistic road scene — scenes carry ~<=50), the static pool is
    provably lossless, so the trimmed NMS must match the default
    bit-for-bit."""
    rng = np.random.RandomState(7)
    b, n, c = 2, 4000, 5
    boxes = jnp.asarray(np.stack([_random_boxes(n) for _ in range(b)]))
    # ~40 anchors per (image, class) above the 0.05 floor, rest below
    cls = rng.uniform(0.0, 0.04, (b, n, c)).astype(np.float32)
    for bi in range(b):
        for ci in range(c):
            hot = rng.choice(n, 40, replace=False)
            cls[bi, hot, ci] = rng.uniform(0.06, 1.0, 40)
    cls = jnp.asarray(cls)
    kw = dict(min_confidence=0.05, nms_iou_threshold=0.4,
              post_iou_threshold=0.65, max_outputs=100)
    out_128 = np.asarray(batched_class_aware_nms(
        cls, boxes, candidates_per_class=128, **kw))
    out_256 = np.asarray(batched_class_aware_nms(
        cls, boxes, candidates_per_class=256, **kw))
    np.testing.assert_array_equal(out_128, out_256)

    from masklab_tpu.presets import road_project_config
    assert road_project_config().compute.nms_candidates_per_class == 128
    # the trainer's loss-config NMS (floor ~0.05) keeps the full pool —
    # mid-training distributions can clear that floor on >128 anchors
    assert (road_project_config().compute.nms_candidates_per_class_train
            == 256)


def test_trainer_nms_pool_uses_train_knob(monkeypatch):
    """trainer_outputs' loss-path NMS must consume
    compute.nms_candidates_per_class_train (0 = inherit); the inference
    and metric-branch sites keep the inference pool."""
    import masklab_tpu.models.masklab as masklab_mod
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    cfg.backbone.num_features = 16
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 16
        g.num_depth = 1
    cfg.semantic.num_aspp_features = 16
    cfg.detection.nms_max_output_size = 4
    cfg.loss.nms_max_output_size = 4
    cfg.compute.nms_candidates_per_class = 8
    cfg.compute.nms_candidates_per_class_train = 12

    seen = []
    real = masklab_mod.batched_class_aware_nms

    def spy(*args, **kwargs):
        seen.append(kwargs['candidates_per_class'])
        return real(*args, **kwargs)

    monkeypatch.setattr(masklab_mod, 'batched_class_aware_nms', spy)
    model = build_masklab(cfg)
    images = jnp.zeros((1, 64, 64, 3))
    gt = jnp.full((1, 2, 6), -1.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    jax.eval_shape(lambda v: model.apply(v, images, method='trainer_outputs',
                                         gt_boxes=gt, train=False),
                   variables)
    assert 12 in seen and 8 in seen
    seen.clear()
    jax.eval_shape(lambda v: model.apply(v, images), variables)
    assert seen == [8]


# ---------- morphology ----------

def test_semantic_smoothing_is_min_then_max():
    x = RNG.rand(1, 12, 12, 3).astype(np.float32)
    got = np.asarray(semantic_smoothing(jnp.asarray(x), kernel_size=3,
                                        weight=2.0))
    eroded = tf.nn.erosion2d(tf.constant(x), tf.zeros((3, 3, 3)),
                             strides=[1, 1, 1, 1], padding='SAME',
                             data_format='NHWC',
                             dilations=[1, 1, 1, 1]).numpy()
    ref = tf.nn.dilation2d(tf.constant(eroded), tf.zeros((3, 3, 3)),
                           strides=[1, 1, 1, 1], padding='SAME',
                           data_format='NHWC',
                           dilations=[1, 1, 1, 1]).numpy() * 2.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


class TestCandidatePool:
    """candidate_pool == lax.top_k for NMS purposes: identical valid
    (>= floor) prefix in identical order, across regimes."""

    def _check(self, scores, k, floor, bf16_exact=False):
        import jax
        from masklab_tpu.ops.nms import candidate_pool
        ref_v, ref_i = jax.lax.top_k(scores, k)
        got_v, got_i = jax.jit(
            lambda s: candidate_pool(s, k, floor=floor, sort_below=0,
                                     bf16_exact=bf16_exact))(scores)
        ref_valid = np.asarray(ref_v) >= floor
        got_valid = np.asarray(got_v) >= floor
        np.testing.assert_array_equal(ref_valid, got_valid)
        np.testing.assert_array_equal(np.asarray(got_v)[got_valid],
                                      np.asarray(ref_v)[ref_valid])
        np.testing.assert_array_equal(np.asarray(got_i)[got_valid],
                                      np.asarray(ref_i)[ref_valid])

    def test_dense_regime(self):
        rng = np.random.RandomState(0)
        scores = jnp.asarray(rng.rand(4, 3, 20000), jnp.float32)
        masked = jnp.where(scores >= 0.5, scores, -1.0)
        self._check(masked, 64, 0.5)

    def test_sparse_regime(self):
        rng = np.random.RandomState(1)
        scores = jnp.asarray(rng.rand(4, 3, 20000) * 0.2, jnp.float32)
        masked = jnp.where(scores >= 0.5, scores, -1.0)
        self._check(masked, 64, 0.5)

    def test_boundary_few_valid(self):
        rng = np.random.RandomState(2)
        base = rng.rand(2, 2, 20000) * 0.4
        # exactly 50 confident anchors per row
        for b in range(2):
            for c in range(2):
                sel = rng.choice(20000, 50, replace=False)
                base[b, c, sel] = 0.5 + rng.rand(50) * 0.5
        scores = jnp.asarray(base, jnp.float32)
        masked = jnp.where(scores >= 0.5, scores, -1.0)
        self._check(masked, 64, 0.5)

    def test_ties(self):
        rng = np.random.RandomState(3)
        base = rng.choice([0.6, 0.7, 0.8, 0.9], size=(2, 2, 20000))
        scores = jnp.asarray(base, jnp.float32)
        self._check(scores, 64, 0.5)

    def test_overflow_fallback(self):
        # everything identical and above floor -> pool overflows -> must
        # still match top_k exactly via the in-graph fallback
        scores = jnp.full((2, 2, 20000), 0.9, jnp.float32)
        self._check(scores, 64, 0.5)

    def test_clustered_confidents(self):
        # contiguous runs of confident anchors (object peaks) must not
        # overflow the strided segments
        rng = np.random.RandomState(4)
        base = rng.rand(2, 2, 20000) * 0.3
        for b in range(2):
            for c in range(2):
                for start in rng.choice(19000, 5, replace=False):
                    base[b, c, start:start + 60] = 0.5 + rng.rand(60) * 0.5
        scores = jnp.asarray(base, jnp.float32)
        masked = jnp.where(scores >= 0.5, scores, -1.0)
        self._check(masked, 64, 0.5)

    def test_strided_segment_overflow_fallback(self):
        # adversarial: >cap confident elements in ONE strided segment
        # (indices j, j+s, j+2s, ...) must trigger the exact fallback
        n, m = 20000, 128
        s = -(-n // m)
        base = np.zeros((1, 1, n), np.float32)
        j = 3
        for r in range(40):
            if j + r * s < n:
                base[0, 0, j + r * s] = 0.6 + 0.01 * r
        scores = jnp.asarray(base, jnp.float32)
        masked = jnp.where(scores >= 0.5, scores, -1.0)
        self._check(masked, 16, 0.5)

    def test_bf16_quantized_ties_dense(self):
        # the forced-dense bench regime: every anchor confident, scores
        # quantized through bf16 so thousands of exact ties exist — the
        # tie-robust certificate must still pass (fast path) and match
        rng = np.random.RandomState(5)
        raw = 0.6 + rng.rand(2, 3, 30000) * 0.3
        q = np.asarray(jnp.asarray(raw, jnp.bfloat16), np.float32)
        scores = jnp.asarray(q)
        self._check(scores, 256, 0.5)

    def test_fuzz_many_regimes(self):
        # randomized sweep: mixtures of sparse/dense rows, tie-heavy
        # quantization, clustered runs, varying k/floor — every draw must
        # match lax.top_k's valid prefix exactly
        rng = np.random.RandomState(42)
        for trial in range(12):
            n = int(rng.choice([9000, 20000, 33000]))
            k = int(rng.choice([32, 64, 128]))
            floor = float(rng.choice([0.3, 0.5, 0.7]))
            kind = trial % 4
            if kind == 0:      # iid dense
                base = rng.rand(2, 2, n)
            elif kind == 1:    # mostly sparse
                base = rng.rand(2, 2, n) * floor * 0.9
                idx = rng.choice(n, 30, replace=False)
                base[..., idx] = floor + rng.rand(30) * (1 - floor)
            elif kind == 2:    # tie-heavy (bf16 quantized)
                raw = floor + rng.rand(2, 2, n) * (1 - floor)
                base = np.asarray(jnp.asarray(raw, jnp.bfloat16),
                                  np.float32)
            else:              # clustered confident runs
                base = rng.rand(2, 2, n) * floor * 0.8
                for b in range(2):
                    for c in range(2):
                        for start in rng.choice(n - 200, 4, replace=False):
                            run = rng.randint(20, 120)
                            base[b, c, start:start + run] = (
                                floor + rng.rand(run) * (1 - floor))
            scores = jnp.asarray(base, jnp.float32)
            masked = jnp.where(scores >= floor, scores, -1.0)
            self._check(masked, k, floor)

    def test_sharded_pool_matches_topk_and_is_sort_free(self):
        # the multi-process form (shard_map body, per-device certificate —
        # ops/nms.py shard_local_nms) must match lax.top_k exactly and
        # compile without an O(N) score sort, proven on the virtual
        # 8-device mesh
        import re
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from masklab_tpu.ops.nms import _pool_sharded
        from masklab_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=8)
        rng = np.random.RandomState(6)
        n = 81840
        # quantize for ties; one row gets an adversarial overflowing
        # strided segment so at least one device takes the exact branch
        base = rng.rand(8, 2, n).astype(np.float32).round(2)
        s = -(-n // 128)
        base[5, 0, 3::s] = np.linspace(1.5, 2.0, base[5, 0, 3::s].size)
        scores = jax.device_put(jnp.asarray(base),
                                NamedSharding(mesh, P('data')))
        fn = jax.jit(lambda x: _pool_sharded(x, 256, 0.05, mesh, 'data'))
        txt = fn.lower(scores).compile().as_text()
        big = [ln for ln in txt.splitlines()
               if re.search(r'sort.*\[[^]]*81[0-9]{3}', ln)]
        assert not big, big[:2]
        got_v, got_i = jax.block_until_ready(fn(scores))
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(base), 256)
        valid = np.asarray(ref_v) >= 0.05
        assert valid.all()
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))

    def test_no_full_sort_in_compiled_nms_at_bench_scale(self):
        # regression guard: at bench-scale anchor counts the compiled
        # single-process NMS must select candidates via the sort-free
        # pool — no O(N) variadic sort of the score tensor
        import jax
        from masklab_tpu.ops.nms import batched_class_aware_nms
        n = 81840
        scores = jnp.zeros((1, n, 2), jnp.float32)
        boxes = jnp.zeros((1, n, 4), jnp.float32)
        fn = jax.jit(lambda s, b: batched_class_aware_nms(
            s, b, min_confidence=0.5, candidates_per_class=256))
        txt = fn.lower(scores, boxes).as_text()
        import re
        big_sorts = [ln for ln in txt.splitlines()
                     if re.search(r'sort.*\[[^]]*81[0-9]{3}', ln)]
        assert not big_sorts, big_sorts[:2]


class TestCompositeKeyPool:
    """candidate_pool's single-key composite sort (``bf16_exact=True``):
    when the caller statically guarantees bf16-representable scores, the
    step-2 (value desc, index asc) order packs into ONE uint32 key
    (15-bit monotone bf16 pattern + 17-bit inverted index) and the
    two-operand variadic sort becomes a single-operand sort. Must match
    ``lax.top_k``'s valid prefix exactly in every regime."""

    def _quant(self, arr):
        return np.asarray(jnp.asarray(arr, jnp.bfloat16), np.float32)

    def _check(self, scores, k, floor):
        TestCandidatePool._check(self, scores, k, floor, bf16_exact=True)

    def test_dense_bf16_ties(self):
        # the forced-dense bench regime: every anchor confident, heavy
        # exact ties from bf16 quantization
        rng = np.random.RandomState(10)
        q = self._quant(0.5 + rng.rand(2, 3, 40000) * 0.5)
        self._check(jnp.asarray(q), 256, 0.5)

    def test_sparse(self):
        rng = np.random.RandomState(11)
        base = self._quant(rng.rand(2, 2, 40000) * 0.2)
        masked = jnp.where(jnp.asarray(base) >= 0.5, jnp.asarray(base), -1.0)
        self._check(masked, 64, 0.5)

    def test_boundary_few_valid(self):
        rng = np.random.RandomState(12)
        base = rng.rand(2, 2, 40000) * 0.4
        for b in range(2):
            for c in range(2):
                sel = rng.choice(40000, 50, replace=False)
                base[b, c, sel] = 0.5 + rng.rand(50) * 0.5
        base = self._quant(base)
        masked = jnp.where(jnp.asarray(base) >= 0.5, jnp.asarray(base), -1.0)
        self._check(masked, 64, 0.5)

    def test_adversarial_segment_overflow_falls_back(self):
        # >cap confident elements in ONE strided segment: the certificate
        # must trip and the exact fallback must produce top_k parity
        n, m = 40000, 128
        s = -(-n // m)
        base = np.zeros((1, 1, n), np.float32)
        for r in range(40):
            if 3 + r * s < n:
                base[0, 0, 3 + r * s] = 0.6 + 0.01 * r
        base = self._quant(base)
        masked = jnp.where(jnp.asarray(base) >= 0.5, jnp.asarray(base), -1.0)
        self._check(masked, 16, 0.5)

    def test_index_tiebreak_exact_at_pool_boundary(self):
        # a plateau of identical values straddling the k-th slot: the
        # selected subset is determined ONLY by the index tie-break
        base = np.full((1, 1, 40000), 0.25, np.float32)
        plateau = self._quant(np.float32(0.75))
        base[0, 0, 17::97] = plateau             # ~412 identical values
        masked = jnp.where(jnp.asarray(base) >= 0.5, jnp.asarray(base), -1.0)
        self._check(masked, 64, 0.5)

    def test_values_above_two_and_inf_stay_exact(self):
        # monotonicity of the packed key holds for ALL positive bf16
        # values (up to +inf) — no range premise to violate
        rng = np.random.RandomState(13)
        base = self._quant(rng.rand(1, 2, 40000) * 3.0)
        base[0, 0, 7] = np.inf
        masked = jnp.where(jnp.asarray(base) >= 0.5, jnp.asarray(base), -1.0)
        self._check(masked, 64, 0.5)

    def test_sharded_composite_pool_matches_topk(self):
        # bf16_exact threads through the shard_map form: per-device
        # composite sort, exact top_k parity on the 8-device mesh
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from masklab_tpu.ops.nms import _pool_sharded
        from masklab_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=8)
        rng = np.random.RandomState(14)
        n = 40000
        base = self._quant(0.4 + rng.rand(8, 2, n) * 0.6)
        scores = jax.device_put(jnp.asarray(base),
                                NamedSharding(mesh, P('data')))
        fn = jax.jit(lambda x: _pool_sharded(x, 128, 0.5, mesh, 'data',
                                             bf16_exact=True))
        got_v, got_i = jax.block_until_ready(fn(scores))
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(base), 128)
        valid = np.asarray(ref_v) >= 0.5
        np.testing.assert_array_equal(
            np.asarray(got_v)[valid], np.asarray(ref_v)[valid])
        np.testing.assert_array_equal(
            np.asarray(got_i)[valid], np.asarray(ref_i)[valid])

    def test_model_level_bf16_nms_takes_composite_path(self):
        # wiring guard: batched_class_aware_nms with bf16 cls_pred (the
        # production compute dtype) must lower the candidate sort as the
        # single-operand composite form at bench-scale anchor counts
        import re
        import jax
        from masklab_tpu.ops.nms import batched_class_aware_nms
        n = 81840
        scores = jnp.zeros((1, n, 2), jnp.bfloat16)
        boxes = jnp.zeros((1, n, 4), jnp.float32)
        fn = jax.jit(lambda s, b: batched_class_aware_nms(
            s, b, min_confidence=0.5, candidates_per_class=256,
            scores_bf16_exact=True))
        txt = fn.lower(scores, boxes).as_text()
        arities = [len([a for a in args.split(',') if a.strip()])
                   for args in re.findall(r'"stablehlo.sort"\(([^)]*)\)',
                                          txt)]
        assert arities, 'no sort found in the lowered NMS'
        # every sort in the program is single-operand: the pool candidate
        # sort is the composite-key form, and no two-operand
        # (value, index) variadic sort remains anywhere
        assert max(arities) == 1, arities

    def test_composite_topk_small_n_matches_topk(self):
        # the small-n path (train steps: ~20k anchors < sort_below) also
        # takes the single-key sort when bf16-exact — exact top_k parity
        # on the valid prefix across regimes
        import jax
        from masklab_tpu.ops.nms import composite_topk
        rng = np.random.RandomState(15)
        cases = [
            self._quant(0.5 + rng.rand(2, 5, 20460) * 0.5),   # dense
            self._quant(rng.rand(2, 5, 20460) * 0.3),         # sparse
        ]
        plateau = np.full((1, 1, 20460), 0.25, np.float32)
        plateau[0, 0, 17::97] = self._quant(np.float32(0.75))
        cases.append(plateau)
        inf_case = self._quant(rng.rand(1, 2, 20460) * 3.0)
        inf_case[0, 0, 7] = np.inf
        cases.append(inf_case)
        for base in cases:
            scores = jnp.asarray(base)
            ref_v, ref_i = jax.lax.top_k(scores, 256)
            got_v, got_i = jax.jit(
                lambda s: composite_topk(s, 256, 0.5))(scores)
            valid = np.asarray(ref_v) >= 0.5
            got_valid = np.asarray(got_v) >= 0.5
            np.testing.assert_array_equal(valid, got_valid)
            np.testing.assert_array_equal(np.asarray(got_v)[valid],
                                          np.asarray(ref_v)[valid])
            np.testing.assert_array_equal(np.asarray(got_i)[valid],
                                          np.asarray(ref_i)[valid])

    def test_composite_topk_value_exactly_at_floor_is_valid(self):
        # >= floor is the validity contract: a score EQUAL to the floor
        # must survive the dead-slot masking
        from masklab_tpu.ops.nms import composite_topk
        floor = float(np.asarray(jnp.asarray(0.5, jnp.bfloat16)))
        base = np.full((1, 8192), 0.1, np.float32)
        base[0, 3] = floor
        got_v, got_i = composite_topk(jnp.asarray(base), 4, floor)
        assert float(got_v[0, 0]) == floor and int(got_i[0, 0]) == 3
        assert (np.asarray(got_v[0, 1:]) == -1.0).all()

    def test_small_n_pool_routes_composite(self):
        # candidate_pool's sub-sort_below path lowers single-operand when
        # bf16-exact (the train-step sort this replaces was two-operand)
        import re
        import jax
        from masklab_tpu.ops.nms import candidate_pool
        scores = jnp.zeros((4, 5, 20460), jnp.float32)
        fn = jax.jit(lambda s: candidate_pool(
            s, 256, floor=0.05, bf16_exact=True))
        txt = fn.lower(scores).as_text()
        arities = [len([a for a in args.split(',') if a.strip()])
                   for args in re.findall(r'"stablehlo.sort"\(([^)]*)\)',
                                          txt)]
        assert arities and max(arities) == 1, arities

    def test_compiled_sort_is_single_operand(self):
        # the HLO proof: with bf16_exact the candidate order comes from a
        # single-operand uint32 sort; without it, from the two-operand
        # (value, index) variadic sort
        import jax
        from masklab_tpu.ops.nms import candidate_pool

        n = 40000
        scores = jnp.zeros((1, 1, n), jnp.float32)

        import re

        def sort_arities(bf16_exact):
            fn = jax.jit(lambda s: candidate_pool(
                s, 64, floor=0.5, sort_below=0, bf16_exact=bf16_exact))
            txt = fn.lower(scores).as_text()
            return [len(m.split(',')) for m in
                    re.findall(r'"stablehlo.sort"\(([^)]*)\)', txt)]

        composite = sort_arities(True)
        assert composite and max(composite) == 1, composite
        legacy = sort_arities(False)
        assert 2 in legacy, legacy



def test_nms_jit_cache_is_scope_keyed():
    """A trace cached under one shard_local_nms scope must not be reused
    under another (round-3 review: an unscoped eval trace could silently
    poison the scoped train step with the full-sort fallback)."""
    import numpy as np
    from masklab_tpu.ops import nms as nms_mod
    from masklab_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    cls_pred = jnp.asarray(rng.rand(8, 64, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([rng.uniform(30, 90, (8, 64)), rng.uniform(30, 90, (8, 64)),
                  rng.uniform(5, 40, (8, 64)), rng.uniform(5, 40, (8, 64))],
                 -1).astype(np.float32))
    nms_mod._NMS_JIT_CACHE.clear()
    out_plain = nms_mod.batched_class_aware_nms(cls_pred, boxes,
                                                max_outputs=8,
                                                candidates_per_class=16)
    assert len(nms_mod._NMS_JIT_CACHE) == 1
    mesh = make_mesh(data=8, model=1)
    with nms_mod.shard_local_nms(mesh):
        out_scoped = nms_mod.batched_class_aware_nms(
            cls_pred, boxes, max_outputs=8, candidates_per_class=16)
    assert len(nms_mod._NMS_JIT_CACHE) == 2, (
        'scoped call reused the unscoped jit entry')
    # and the results agree (the scope changes lowering, not semantics)
    np.testing.assert_allclose(np.asarray(out_plain),
                               np.asarray(out_scoped), atol=1e-6)


def test_nms_jit_cache_is_bounded():
    """The scope-keyed cache embeds live Mesh objects in its keys; without
    a bound, every recreated trainer/test mesh is pinned forever (ADVICE
    r3). Oldest entries must be evicted past the cap."""
    import numpy as np
    from masklab_tpu.ops import nms as nms_mod
    from masklab_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    cls_pred = jnp.asarray(rng.rand(8, 64, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([rng.uniform(30, 90, (8, 64)), rng.uniform(30, 90, (8, 64)),
                  rng.uniform(5, 40, (8, 64)), rng.uniform(5, 40, (8, 64))],
                 -1).astype(np.float32))
    nms_mod._NMS_JIT_CACHE.clear()
    for _ in range(nms_mod._NMS_JIT_CACHE_MAX + 3):
        mesh = make_mesh(data=8, model=1)  # fresh Mesh = fresh scope key
        with nms_mod.shard_local_nms(mesh):
            nms_mod.batched_class_aware_nms(cls_pred, boxes, max_outputs=8,
                                            candidates_per_class=16)
    assert len(nms_mod._NMS_JIT_CACHE) <= nms_mod._NMS_JIT_CACHE_MAX
    # most recent scope survived; re-calling it does not grow the cache
    with nms_mod.shard_local_nms(mesh):
        nms_mod.batched_class_aware_nms(cls_pred, boxes, max_outputs=8,
                                        candidates_per_class=16)
    assert len(nms_mod._NMS_JIT_CACHE) <= nms_mod._NMS_JIT_CACHE_MAX
    nms_mod._NMS_JIT_CACHE.clear()
