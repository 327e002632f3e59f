"""bench.py's wedged-tunnel init retry (fresh-process re-exec semantics)."""

import os
import sys
import types

import pytest


@pytest.fixture()
def bench_module(monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # Stub jax.devices with a failing init; record execv instead of exec'ing.
    fake_jax = types.ModuleType("jax")

    def _boom():
        raise RuntimeError("simulated wedged tunnel")

    fake_jax.devices = _boom
    monkeypatch.setitem(sys.modules, "jax", fake_jax)
    calls = []
    monkeypatch.setattr(os, "execv", lambda exe, argv: calls.append((exe, argv)))
    monkeypatch.setenv("BENCH_INIT_RETRY_SLEEP", "0.01")
    return bench, calls


def test_retry_reexecs_and_decrements(bench_module, monkeypatch):
    bench, calls = bench_module
    monkeypatch.setenv("BENCH_INIT_RETRIES", "2")
    bench._require_tpu_with_retry()
    assert len(calls) == 1
    exe, argv = calls[0]
    assert exe == sys.executable and argv[0] == sys.executable
    assert os.environ["BENCH_INIT_RETRIES"] == "1"


def test_exhausted_retries_reraise(bench_module, monkeypatch):
    bench, calls = bench_module
    monkeypatch.setenv("BENCH_INIT_RETRIES", "0")
    with pytest.raises(RuntimeError, match="simulated wedged tunnel"):
        bench._require_tpu_with_retry()
    assert not calls


def test_healthy_backend_passes_through(bench_module, monkeypatch):
    bench, calls = bench_module
    sys.modules["jax"].devices = lambda: ["fake-device"]
    assert bench._require_tpu_with_retry() == ["fake-device"]
    assert not calls
