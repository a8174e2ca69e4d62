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


def test_acquire_devices_retries_transient(monkeypatch):
    import jax
    flaky = _FlakyDevices(
        2, "Unable to initialize backend 'axon': UNAVAILABLE: "
           'TPU backend setup/compile error (Unavailable).')
    monkeypatch.setattr(jax, 'devices', flaky)
    out = bench._acquire_devices(budget_s=5.0, first_wait=0.01)
    assert out == ['fake-device']
    assert flaky.calls == 3


def test_acquire_devices_raises_nontransient_immediately(monkeypatch):
    import jax
    flaky = _FlakyDevices(99, 'some config bug, not an outage')
    monkeypatch.setattr(jax, 'devices', flaky)
    with pytest.raises(RuntimeError, match='config bug'):
        bench._acquire_devices(budget_s=5.0, first_wait=0.01)
    assert flaky.calls == 1  # no retry burned on a real bug


def test_acquire_devices_respects_budget(monkeypatch):
    import jax
    flaky = _FlakyDevices(99, 'UNAVAILABLE: tunnel down')
    monkeypatch.setattr(jax, 'devices', flaky)
    with pytest.raises(RuntimeError, match='UNAVAILABLE'):
        bench._acquire_devices(budget_s=0.05, first_wait=0.01)
    assert flaky.calls >= 2  # retried at least once before giving up


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
