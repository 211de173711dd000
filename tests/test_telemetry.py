"""Telemetry service parity (reference telemetry/service.py + decorators.py):
singleton lifecycle, zero-overhead disabled path, span recording with
status/error, file exporter JSONL, otlp graceful fallback."""

from __future__ import annotations

import json

import pytest

from bm25_index_tool_spark.telemetry import (
    TelemetryConfig,
    TelemetryService,
    traced,
)


@pytest.fixture(autouse=True)
def _reset():
    TelemetryService.reset()
    yield
    TelemetryService.reset()


def test_disabled_is_passthrough():
    calls = []

    @traced("op")
    def f(x):
        calls.append(x)
        return x + 1

    assert f(1) == 2
    svc = TelemetryService.get_instance()
    assert svc.spans_recorded == 0 and calls == [1]


def test_file_exporter_records_spans(tmp_path):
    out = tmp_path / "spans.jsonl"
    svc = TelemetryService.get_instance()
    svc.initialize(
        TelemetryConfig(enabled=True, exporter="file", file_path=str(out))
    )

    @traced("unit.op", kind="test")
    def ok():
        return 42

    @traced("unit.bad")
    def bad():
        raise ValueError("boom")

    assert ok() == 42
    with pytest.raises(ValueError):
        bad()
    svc.shutdown()

    spans = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert [s["name"] for s in spans] == ["unit.op", "unit.bad"]
    assert spans[0]["status"] == "ok"
    assert spans[0]["attributes"] == {"kind": "test"}
    assert spans[0]["duration_sec"] >= 0
    assert spans[1]["status"] == "error"
    assert "ValueError: boom" in spans[1]["error"]


def test_otlp_falls_back_without_sdk(capsys):
    svc = TelemetryService.get_instance()
    svc.initialize(TelemetryConfig(enabled=True, exporter="otlp"))
    # sandbox has no opentelemetry package → console fallback
    assert svc._config.exporter == "console"

    @traced("fallback.op")
    def f():
        return 1

    f()
    err = capsys.readouterr().err
    assert "falling back to console" in err
    span = json.loads(
        [ln for ln in err.splitlines() if ln.startswith("{")][-1]
    )
    assert span["name"] == "fallback.op" and span["status"] == "ok"


def test_env_config(monkeypatch, tmp_path):
    monkeypatch.setenv("BM25_SPARK_TELEMETRY", "true")
    monkeypatch.setenv("BM25_SPARK_TELEMETRY_EXPORTER", "file")
    monkeypatch.setenv(
        "BM25_SPARK_TELEMETRY_FILE", str(tmp_path / "t.jsonl")
    )
    cfg = TelemetryConfig.from_env()
    assert cfg.enabled and cfg.exporter == "file"
    assert cfg.file_path.endswith("t.jsonl")
