"""Operator timing / execution log (SURVEY A17).

The reference wraps each operator call in ``time.time()`` and appends
lines like ``"filter(...) -> N rows in X ms"`` (app.py:489-495,
1387-1391) with a 1000 ms warning threshold (app.py:12). Here the same
capability is a small context helper around Spark *actions* (laziness
means transformations cost ~0; only actions execute), plus plan capture
via ``explain``.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

PERFORMANCE_WARNING_MS = 1000  # reference app.py:12


@dataclass
class LogEntry:
    op: str
    rows: int | None
    ms: float

    @property
    def slow(self) -> bool:
        return self.ms > PERFORMANCE_WARNING_MS

    def __str__(self) -> str:
        rows = "?" if self.rows is None else self.rows
        flag = "  [SLOW]" if self.slow else ""
        return f"{self.op} -> {rows} rows in {self.ms:.1f} ms{flag}"


@dataclass
class ExecutionLog:
    entries: list[LogEntry] = field(default_factory=list)

    def record(self, op: str, rows: int | None, ms: float) -> LogEntry:
        e = LogEntry(op, rows, ms)
        self.entries.append(e)
        return e

    def timed_count(self, op: str, df: DataFrame) -> int:
        """Force the plan with count() and record wall time + row count."""
        t0 = time.perf_counter()
        n = df.count()
        self.record(op, n, (time.perf_counter() - t0) * 1000)
        return n

    def render(self) -> str:
        return "\n".join(str(e) for e in self.entries)


@contextmanager
def timed_action(log: ExecutionLog, op: str):
    """Time an arbitrary action block: ``with timed_action(log, 'collect'): ...``"""
    t0 = time.perf_counter()
    yield
    log.record(op, None, (time.perf_counter() - t0) * 1000)


def observe_metrics(df: DataFrame, name: str, **metrics):
    """Attach zero-cost pipeline metrics to a plan (``df.observe``): the
    aggregates compute during the NEXT action with no extra pass — the
    scale-correct replacement for ``timed_count``'s second job. Returns
    ``(df, Observation)``; read ``observation.get`` after any action.

    Example::

        df, obs = observe_metrics(df, "ingest", rows=F.count(F.lit(1)))
        df.write.parquet(...)   # any action
        obs.get                 # {"rows": ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    exprs = [v.alias(k) for k, v in metrics.items()]
    return df.observe(obs, *exprs), obs
