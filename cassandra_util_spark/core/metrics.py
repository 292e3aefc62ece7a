"""Metrics + tracing hooks — the CQLMetrics / CQLTracer analog
(cql-wrapper ``CQLSession.scala:105-164``, ``CQLTracer.scala:11-19``,
``CallbackTracer.scala:12-36``).

Spark-side equivalents:
- per-query timers and success/failure counters via a
  ``QueryExecutionListener``;
- in-plan row counters via ``DataFrame.observe`` (the kept/dropped counters
  of ``FilteringSSTableScanner``) — zero extra passes;
- statement classification (query class / table extraction for metric names)
  via the same regex approach the reference uses
  (``CQLStatement.scala:42-47,93-107``).
"""

from __future__ import annotations

import re
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

_QUERY_CLASS = re.compile(
    r"^\s*(select|insert|update|delete|truncate|create|alter|drop)\b", re.IGNORECASE
)
_TABLE_REF = re.compile(
    r"\b(?:from|into|update|table)\s+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)",
    re.IGNORECASE,
)


def query_class(sql: str) -> str:
    m = _QUERY_CLASS.match(sql)
    return m.group(1).lower() if m else "other"


def table_ref(sql: str) -> Optional[str]:
    m = _TABLE_REF.search(sql)
    return m.group(1).lower() if m else None


@dataclass
class MetricsRegistry:
    """Counters + timers keyed by metric name (the tracker registry)."""

    counters: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    timers: dict[str, list[float]] = field(default_factory=lambda: defaultdict(list))

    def incr(self, name: str, n: int = 1) -> None:
        self.counters[name] += n

    def time(self, name: str, seconds: float) -> None:
        self.timers[name].append(seconds)

    def timer_stats(self, name: str) -> dict[str, float]:
        vals = self.timers.get(name, [])
        if not vals:
            return {"count": 0}
        return {
            "count": len(vals),
            "total_s": sum(vals),
            "mean_s": sum(vals) / len(vals),
            "max_s": max(vals),
        }


class Tracer:
    """Wraps any engine action in a user callback pair — the CallbackTracer.

    >>> with tracer.trace("retention.run"):
    ...     job.run()
    """

    def __init__(self, registry: MetricsRegistry, on_complete: Optional[Callable[[str, float, Optional[BaseException]], None]] = None):
        self.registry = registry
        self.on_complete = on_complete

    def trace(self, name: str):
        tracer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.monotonic()
                tracer.registry.incr(f"{name}.outstanding")
                return self

            def __exit__(self, exc_type, exc, tb):
                dt = time.monotonic() - self.t0
                tracer.registry.counters[f"{name}.outstanding"] -= 1
                tracer.registry.time(f"{name}.exec_s", dt)
                tracer.registry.incr(f"{name}.{'failure' if exc else 'success'}")
                if tracer.on_complete:
                    tracer.on_complete(name, dt, exc)
                return False

        return _Ctx()


def observed_counts(df: DataFrame, keep: Column, name: str = "retention") -> tuple[DataFrame, Observation]:
    """Attach kept/convicted counters to a plan — evaluated during whatever
    action consumes the DataFrame, no extra pass (statusReport analog)."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.when(keep, 1)).alias("kept"),
        F.count(F.when(~keep, 1)).alias("convicted"),
        F.count(F.lit(1)).alias("total"),
    )
    return out, obs
