"""bench.py capture robustness (VERDICT r3 weak #1).

The driver records bench.py's output verbatim; round 3's number was lost to
a transient TPU-tunnel outage at capture time. These tests pin the two
defenses: bounded retry around first device acquisition, and a parseable
JSON error line as the LAST stdout line on terminal failure.
"""
import json

import pytest

import bench


class _FlakyDevices:
    """jax.devices() stand-in: raises `fails` transient errors, then works."""

    def __init__(self, fails, msg):
        self.fails = fails
        self.msg = msg
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fails:
            raise RuntimeError(self.msg)
        return ['fake-device']


def _probe_ok(monkeypatch):
    monkeypatch.setattr(bench, '_probe_backend_subprocess',
                        lambda timeout_s: (True, ''))


def test_acquire_devices_retries_transient(monkeypatch):
    import jax
    _probe_ok(monkeypatch)
    flaky = _FlakyDevices(
        2, "Unable to initialize backend 'axon': UNAVAILABLE: "
           'TPU backend setup/compile error (Unavailable).')
    monkeypatch.setattr(jax, 'devices', flaky)
    out = bench._acquire_devices(budget_s=5.0, first_wait=0.01)
    assert out == ['fake-device']
    assert flaky.calls == 3


def test_acquire_devices_raises_nontransient_immediately(monkeypatch):
    import jax
    _probe_ok(monkeypatch)
    flaky = _FlakyDevices(99, 'some config bug, not an outage')
    monkeypatch.setattr(jax, 'devices', flaky)
    with pytest.raises(RuntimeError, match='config bug'):
        bench._acquire_devices(budget_s=5.0, first_wait=0.01)
    assert flaky.calls == 1  # no retry burned on a real bug


def test_acquire_devices_respects_budget(monkeypatch):
    import jax
    _probe_ok(monkeypatch)
    flaky = _FlakyDevices(99, 'UNAVAILABLE: tunnel down')
    monkeypatch.setattr(jax, 'devices', flaky)
    with pytest.raises(RuntimeError, match='UNAVAILABLE'):
        bench._acquire_devices(budget_s=0.05, first_wait=0.01)
    assert flaky.calls >= 2  # retried at least once before giving up


def test_acquire_devices_survives_init_hang(monkeypatch):
    """Round-4 outage shape: backend init HANGS instead of raising. The
    killable subprocess probe must bound each attempt and keep the
    in-process backend untouched until a probe succeeds."""
    import jax
    probes = {'n': 0}

    def fake_probe(timeout_s):
        probes['n'] += 1
        if probes['n'] <= 2:
            return False, f'backend init hang (> {timeout_s:.0f}s, killed)'
        return True, ''

    devices_calls = {'n': 0}

    def fake_devices():
        devices_calls['n'] += 1
        return ['fake-device']

    monkeypatch.setattr(bench, '_probe_backend_subprocess', fake_probe)
    monkeypatch.setattr(jax, 'devices', fake_devices)
    out = bench._acquire_devices(budget_s=5.0, first_wait=0.01)
    assert out == ['fake-device']
    assert probes['n'] == 3
    assert devices_calls['n'] == 1  # never touched while probes failed


def test_acquire_devices_hang_exhausts_budget(monkeypatch):
    import jax
    monkeypatch.setattr(
        bench, '_probe_backend_subprocess',
        lambda timeout_s: (False, 'backend init hang (> 1s, killed)'))
    monkeypatch.setattr(jax, 'devices',
                        lambda: pytest.fail('must not init in-process'))
    with pytest.raises(RuntimeError, match='hang'):
        bench._acquire_devices(budget_s=0.05, first_wait=0.01)


def test_run_emits_parseable_json_error_line(monkeypatch, capsys):
    def boom():
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(bench, 'main', boom)
    with pytest.raises(SystemExit) as exc_info:
        bench.run()
    assert exc_info.value.code == 1
    captured = capsys.readouterr()
    last_line = captured.out.strip().splitlines()[-1]
    parsed = json.loads(last_line)
    assert parsed['value'] is None
    assert 'UNAVAILABLE' in parsed['error']
    assert parsed['metric'].startswith('masklab_joint_inference')
