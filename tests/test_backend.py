"""minimd_tpu.backend.wait_for_backend: probe-in-subprocess contract."""

import pytest

import minimd_tpu.backend as backend


def test_wait_returns_when_probe_succeeds(monkeypatch):
    monkeypatch.setattr(backend, "_PROBE", "pass")
    backend.wait_for_backend(budget_s=30.0, probe_timeout_s=30.0)


def test_wait_raises_after_budget(monkeypatch):
    monkeypatch.setattr(backend, "_PROBE", "raise SystemExit(3)")
    monkeypatch.setattr(backend.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="no JAX backend"):
        backend.wait_for_backend(budget_s=0.0, probe_timeout_s=30.0)
