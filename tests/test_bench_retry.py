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


def test_midrun_transport_error_reexecs(bench_module, monkeypatch):
    """Round-4 verdict item 1: an UNAVAILABLE raised from compile/execute
    (not init) must also re-exec, with the long mid-run backoff."""
    bench, calls = bench_module
    monkeypatch.setenv("BENCH_RUN_RETRIES", "3")
    monkeypatch.setenv("BENCH_RUN_RETRY_SLEEP", "0.01")

    def boom_run():
        raise RuntimeError(
            "UNAVAILABLE: http://127.0.0.1:8083/remote_compile: transport: "
            "Connection Failed: Connect error: Connection refused")

    monkeypatch.setattr(bench, "_run", boom_run)
    bench.main()
    assert len(calls) == 1
    assert os.environ["BENCH_RUN_RETRIES"] == "2"


def test_midrun_real_failure_reraises(bench_module, monkeypatch):
    """Quality-gate/logic failures must NOT be retried as outages."""
    bench, calls = bench_module
    monkeypatch.setenv("BENCH_RUN_RETRIES", "3")

    def boom_run():
        raise AssertionError("validity trace diverges from reference")

    monkeypatch.setattr(bench, "_run", boom_run)
    with pytest.raises(AssertionError, match="diverges"):
        bench.main()
    assert not calls


def test_midrun_exhausted_retries_reraise(bench_module, monkeypatch):
    bench, calls = bench_module
    monkeypatch.setenv("BENCH_RUN_RETRIES", "0")

    def boom_run():
        raise RuntimeError("UNAVAILABLE: transport: Socket closed")

    monkeypatch.setattr(bench, "_run", boom_run)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.main()
    assert not calls


def test_cert_failure_default_falls_back_to_fast(bench_module, monkeypatch):
    """A tripped corridor certificate on the DEFAULT config must re-exec
    with BENCH_PIPELINE=fast (a slower exact capture beats a voided one),
    not crash the driver's mandatory artifact."""
    bench, calls = bench_module
    monkeypatch.delenv("BENCH_PIPELINE", raising=False)
    bench._corridor_fallback(3)
    assert len(calls) == 1
    assert os.environ["BENCH_PIPELINE"] == "fast"


def test_cert_failure_explicit_corridor_asserts(bench_module, monkeypatch):
    """An EXPLICIT BENCH_PIPELINE=corridor run keeps the hard assert so
    the certificate stays testable."""
    bench, calls = bench_module
    monkeypatch.setenv("BENCH_PIPELINE", "corridor")
    with pytest.raises(AssertionError, match="corridor certificate"):
        bench._corridor_fallback(2)
    assert not calls


def test_transport_classifier():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    yes = [
        RuntimeError("UNAVAILABLE: remote_compile: Connection refused"),
        RuntimeError("transport: Socket closed"),
        OSError("Connection reset by peer"),
        RuntimeError("DEADLINE_EXCEEDED: remote_execute"),
    ]
    no = [
        AssertionError("validity trace diverges from reference"),
        ValueError("unknown second_attempt mode 'x'"),
        FileNotFoundError("assets/bench_oracle.npz"),
    ]
    assert all(bench._is_transport_error(e) for e in yes)
    assert not any(bench._is_transport_error(e) for e in no)
