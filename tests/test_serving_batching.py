"""Server-side micro-batching + checkpoint hot-reload (serving/batching.py
— the TF-Serving batching-scheduler and version-polling roles,
serving.py:42-109 / road_project/setup/serving.py:75-84)."""
import os
import threading
import time

import numpy as np
import pytest

from masklab_tpu.serving.batching import (CheckpointWatcher, MicroBatcher,
                                          _next_bucket)


def _marked_image(i, hw=(8, 8)):
    img = np.zeros(hw + (3,), np.uint8)
    img[0, 0, 0] = i
    return img


def _fake_predict(calls):
    def predict(images):
        calls.append(images.shape[0])
        # per-image marker so routing is checkable
        return {'marker': images[:, 0, 0, 0].astype(np.int32),
                'shape_h': np.full(images.shape[0], images.shape[1])}
    return predict


def test_next_bucket():
    assert _next_bucket(1, (1, 2, 4, 8)) == 1
    assert _next_bucket(3, (1, 2, 4, 8)) == 4
    assert _next_bucket(8, (1, 2, 4, 8)) == 8
    assert _next_bucket(11, (1, 2, 4, 8)) == 8


def test_concurrent_submits_coalesce_and_route():
    calls = []
    mb = MicroBatcher(_fake_predict(calls), max_batch=8, window_ms=30.0)
    try:
        results = {}
        barrier = threading.Barrier(8)

        def worker(i):
            barrier.wait()
            results[i] = mb.submit(_marked_image(i))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(results) == 8
        for i, out in results.items():
            assert out['marker'].shape == (1,)
            assert int(out['marker'][0]) == i
        # 8 concurrent requests inside one window must not become 8
        # device calls
        assert len(calls) < 8
        assert sum(calls) >= 8
    finally:
        mb.close()


def test_batch_padded_to_bucket():
    calls = []
    mb = MicroBatcher(_fake_predict(calls), max_batch=8, window_ms=40.0)
    try:
        results = {}
        barrier = threading.Barrier(3)

        def worker(i):
            barrier.wait()
            results[i] = mb.submit(_marked_image(i))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(results) == 3
        # 3 requests pad to the 4-bucket (compile-count bound); allow the
        # scheduler to have split them across windows
        assert all(b in (1, 2, 4) for b in mb.batch_sizes)
    finally:
        mb.close()


def test_mixed_resolutions_never_share_a_batch():
    calls = []
    mb = MicroBatcher(_fake_predict(calls), max_batch=8, window_ms=30.0)
    try:
        results = {}
        barrier = threading.Barrier(6)

        def worker(i):
            hw = (8, 8) if i % 2 == 0 else (16, 16)
            barrier.wait()
            results[i] = mb.submit(_marked_image(i, hw))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        for i, out in results.items():
            want_h = 8 if i % 2 == 0 else 16
            assert int(out['shape_h'][0]) == want_h
    finally:
        mb.close()


def test_submit_propagates_predict_errors():
    def boom(images):
        raise RuntimeError('device on fire')

    mb = MicroBatcher(boom, max_batch=4, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match='device on fire'):
            mb.submit(_marked_image(1))
    finally:
        mb.close()


def test_failing_bucket_is_evicted_and_requests_degrade():
    """A bucket whose first batch raises (e.g. a device/compile failure
    on the big-batch lowering — the round-3 max_batch=16 death) must not
    fail the requests OR the dispatcher: the bucket is evicted and the
    group retries at smaller buckets (VERDICT r3 weak #5)."""
    calls = []

    def predict(images):
        calls.append(images.shape[0])
        if images.shape[0] >= 4:
            raise RuntimeError('XLA compile failed for batch 4')
        return {'marker': images[:, 0, 0, 0].astype(np.int32)}

    mb = MicroBatcher(predict, max_batch=4, window_ms=30.0)
    try:
        results = {}
        barrier = threading.Barrier(4)

        def worker(i):
            barrier.wait()
            results[i] = mb.submit(_marked_image(i))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        # every request was answered, correctly routed, despite the
        # 4-bucket failing
        assert len(results) == 4
        for i, out in results.items():
            assert int(out['marker'][0]) == i
        # the failed bucket is suspended: nothing >= 4 is tried again
        # within the cooldown
        assert all(b < 4 for b in mb.eligible_buckets())
        results2 = {}
        barrier2 = threading.Barrier(4)

        def worker2(i):
            barrier2.wait()
            results2[i] = mb.submit(_marked_image(i + 10))

        threads = [threading.Thread(target=worker2, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(results2) == 4
        assert max(calls[calls.index(4) + 1:]) < 4
    finally:
        mb.close()


def test_suspension_retry_degrades_never_escalates():
    """After a cold bucket fails, the retry must move to a strictly
    SMALLER bucket. Without the retry cap, a 3-request group failing at
    bucket 4 would re-resolve against eligible (1, 2, 8) and ESCALATE to
    a brand-new batch-8 compile (round-4 review finding)."""
    calls = []

    def predict(images):
        calls.append(images.shape[0])
        if images.shape[0] == 4:
            raise RuntimeError('compile failed for batch 4')
        return {'marker': images[:, 0, 0, 0].astype(np.int32)}

    mb = MicroBatcher(predict, max_batch=8, window_ms=30.0)
    try:
        results = {}
        barrier = threading.Barrier(3)

        def worker(i):
            barrier.wait()
            results[i] = mb.submit(_marked_image(i))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(results) == 3
        for i, out in results.items():
            assert int(out['marker'][0]) == i
        assert 8 not in calls, (
            f'retry escalated to a larger bucket: calls={calls}')
        assert 4 in calls and max(calls[calls.index(4) + 1:]) <= 2
    finally:
        mb.close()


def test_dispatcher_survives_system_exit_from_predict():
    """SystemExit out of predict must fan out to the waiters like any
    other failure — escaping _run would kill the dispatcher thread and
    hang every later submit() forever (round-4 review finding)."""
    def boom(images):
        raise SystemExit(3)

    mb = MicroBatcher(boom, max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(SystemExit):
            mb.submit(_marked_image(1))
        # the dispatcher thread is still alive and serving
        assert mb._thread.is_alive()
        with pytest.raises(SystemExit):
            mb.submit(_marked_image(2))
    finally:
        mb.close()


def test_suspended_bucket_reinstates_after_cooldown():
    """A bucket that failed its FIRST run (possibly a transient outage at
    compile time) is probed again after the cooldown instead of being
    lost until restart (round-4 review finding)."""
    state = {'fail': True}
    calls = []

    def predict(images):
        calls.append(images.shape[0])
        if images.shape[0] >= 4 and state['fail']:
            raise RuntimeError('outage during first batch-4 run')
        return {'marker': images[:, 0, 0, 0].astype(np.int32)}

    mb = MicroBatcher(predict, max_batch=4, window_ms=30.0,
                      evict_cooldown_s=0.3)
    try:
        def wave(offset):
            results = {}
            barrier = threading.Barrier(4)

            def worker(i):
                barrier.wait()
                results[i] = mb.submit(_marked_image(i + offset))

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=10)
            return results

        first = wave(0)
        assert len(first) == 4
        assert all(b < 4 for b in mb.eligible_buckets())
        state['fail'] = False          # the outage ends
        time.sleep(0.35)               # cooldown expires
        assert 4 in mb.eligible_buckets()
        second = wave(10)
        assert len(second) == 4
        for i, out in second.items():
            assert int(out['marker'][0]) == i + 10
        # the reinstated bucket actually served a batch-4 group again
        assert 4 in calls[calls.index(4) + 1:]
        assert 4 in mb.eligible_buckets()
    finally:
        mb.close()


def test_warm_bucket_transient_failure_propagates_without_suspension():
    """A bucket that has served before (lowering proven) must NOT be
    suspended by a later transient failure — the error reaches the
    caller and the topology is unchanged, so a tunnel blip cannot walk
    the server down to batch-1-forever (round-4 review finding)."""
    state = {'fail': False}

    def predict(images):
        if state['fail']:
            raise RuntimeError('UNAVAILABLE: tunnel blip')
        return {'marker': images[:, 0, 0, 0].astype(np.int32)}

    mb = MicroBatcher(predict, max_batch=2, window_ms=20.0)
    try:
        def pair(offset, collect):
            barrier = threading.Barrier(2)
            errors = {}

            def worker(i):
                barrier.wait()
                try:
                    collect[i] = mb.submit(_marked_image(i + offset))
                except RuntimeError as exc:
                    errors[i] = exc

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=10)
            return errors

        ok = {}
        assert not pair(0, ok) and len(ok) == 2    # warms bucket 2
        state['fail'] = True
        errs = pair(10, {})
        assert len(errs) == 2                      # propagated, not hung
        assert 2 in mb.eligible_buckets()          # no suspension
        state['fail'] = False
        ok2 = {}
        assert not pair(20, ok2) and len(ok2) == 2  # bucket 2 still serves
    finally:
        mb.close()


def test_bucket_one_failure_propagates_not_hangs():
    """When even batch 1 fails there is nothing to degrade to: the error
    must reach the waiter (never a hang or a dispatcher death)."""
    def boom(images):
        raise RuntimeError('dead at any size')

    mb = MicroBatcher(boom, max_batch=4, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match='dead at any size'):
            mb.submit(_marked_image(1))
        # dispatcher survived: a second submit still gets the error, not
        # a hang
        with pytest.raises(RuntimeError, match='dead at any size'):
            mb.submit(_marked_image(2))
    finally:
        mb.close()


class _FakePredictor:
    def __init__(self):
        self.variables = {'params': np.float32(-1.0)}


def test_checkpoint_watcher_swaps_best(tmp_path):
    pred = _FakePredictor()
    restored = []

    def restore(path):
        restored.append(path)
        # leaf must be a jax-compatible type (device_put runs on it)
        return {'params': np.float32(float(
            os.path.basename(path).split('-')[0]))}

    w = CheckpointWatcher(pred, str(tmp_path), restore=restore)
    assert not w.check_once()                      # empty dir
    os.makedirs(tmp_path / '1.50000-00')
    assert w.check_once()
    assert float(pred.variables['params']) == 1.5
    assert not w.check_once()                      # unchanged
    os.makedirs(tmp_path / '0.70000-01')           # better loss appears
    assert w.check_once()
    assert float(pred.variables['params']) == pytest.approx(0.7)
    assert w.current.endswith('0.70000-01')
    # a WORSE checkpoint must not displace the current best
    os.makedirs(tmp_path / '2.00000-02')
    assert not w.check_once()
    assert float(pred.variables['params']) == pytest.approx(0.7)


def test_checkpoint_watcher_thread_polls(tmp_path):
    pred = _FakePredictor()
    w = CheckpointWatcher(
        pred, str(tmp_path), poll_s=0.05,
        restore=lambda p: {'params': np.float32(float(
            os.path.basename(p).split('-')[0]))})
    w.start()
    try:
        os.makedirs(tmp_path / '0.90000-00')
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if float(pred.variables['params']) == pytest.approx(0.9):
                break
            time.sleep(0.05)
        assert float(pred.variables['params']) == pytest.approx(0.9)
    finally:
        w.stop()
