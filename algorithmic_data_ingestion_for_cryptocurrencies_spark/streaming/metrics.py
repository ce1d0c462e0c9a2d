"""Dependency-free observability surface (reference parity:
``algo-data-ingestion/app/ingestion_service/metrics.py:14-20`` counters
/ histograms, ``monitoring/alert.rules.yml`` alert rules).

The reference exports ``prometheus_client`` metrics over HTTP; this
engine renders the same Prometheus **exposition text format** without
the dependency and exports via the node-exporter *textfile collector*
pattern (:meth:`MetricsRegistry.write_textfile`) — the standard
pull-path for batch/driver processes, and trivially swappable for an
HTTP handler since :meth:`MetricsRegistry.render` returns the exact
scrape payload.

Three feeds populate the registry:

- :class:`Counter` / :class:`Histogram` — direct instrumentation
  (ingest requests, rows written), mirroring the reference's metric
  names and label sets.
- :class:`MicroBatchMetricsListener` — a Spark
  ``StreamingQueryListener`` that turns every micro-batch progress
  event into counters/histograms (rows, batch duration, per-query
  labels): the Spark-native replacement for the reference's
  request-span instrumentation.
- :func:`export_job_metrics` — projects
  :class:`..scheduler.JobMetrics` snapshots (runs, failures,
  durations) into the registry on each scrape/write.

``monitoring/alert_rules.yml`` in the repo root carries the
translated alert rules over these metric names.
"""

from __future__ import annotations

import math
import threading
from collections.abc import Iterable, Mapping, Sequence

DEFAULT_BUCKETS = (0.02, 0.05, 0.1, 0.25, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0)


def _escape(v: str) -> str:
    return v.replace("\\", r"\\").replace("\n", r"\n").replace('"', r'\"')


def _labels_str(names: Sequence[str], values: Sequence[str]) -> str:
    if not names:
        return ""
    inner = ",".join(
        f'{n}="{_escape(str(v))}"' for n, v in zip(names, values)
    )
    return "{" + inner + "}"


def _fmt(x: float) -> str:
    if x == math.inf:
        return "+Inf"
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


class Counter:
    """Monotonic counter with a fixed label-name set."""

    def __init__(self, name: str, help: str, labelnames: Sequence[str] = ()):
        self.name = name
        self.help = help
        self.labelnames = tuple(labelnames)
        self._values: dict[tuple[str, ...], float] = {}
        self._lock = threading.Lock()

    def inc(self, labels: Mapping[str, str] | None = None, n: float = 1.0) -> None:
        if n < 0:
            raise ValueError("counters only go up")
        key = self._key(labels)
        with self._lock:
            self._values[key] = self._values.get(key, 0.0) + n

    def _key(self, labels: Mapping[str, str] | None) -> tuple[str, ...]:
        labels = labels or {}
        if set(labels) != set(self.labelnames):
            raise ValueError(
                f"{self.name}: expected labels {self.labelnames}, got {tuple(labels)}"
            )
        return tuple(str(labels[n]) for n in self.labelnames)

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} counter"]
        for key in sorted(self._values):
            out.append(
                f"{self.name}{_labels_str(self.labelnames, key)} "
                f"{_fmt(self._values[key])}"
            )
        return out


class Gauge(Counter):
    """Last-value gauge (same storage, settable)."""

    def set(self, value: float, labels: Mapping[str, str] | None = None) -> None:
        with self._lock:
            self._values[self._key(labels)] = float(value)

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} gauge"]
        for key in sorted(self._values):
            out.append(
                f"{self.name}{_labels_str(self.labelnames, key)} "
                f"{_fmt(self._values[key])}"
            )
        return out


class Histogram:
    """Cumulative-bucket histogram (Prometheus semantics: ``le``
    buckets are cumulative and always include ``+Inf``; ``_sum`` and
    ``_count`` ride along)."""

    def __init__(
        self,
        name: str,
        help: str,
        labelnames: Sequence[str] = (),
        buckets: Iterable[float] = DEFAULT_BUCKETS,
    ):
        self.name = name
        self.help = help
        self.labelnames = tuple(labelnames)
        self.buckets = tuple(sorted(set(buckets))) + (math.inf,)
        self._counts: dict[tuple[str, ...], list[int]] = {}
        self._sums: dict[tuple[str, ...], float] = {}
        self._lock = threading.Lock()

    def observe(self, value: float, labels: Mapping[str, str] | None = None) -> None:
        labels = labels or {}
        if set(labels) != set(self.labelnames):
            raise ValueError(
                f"{self.name}: expected labels {self.labelnames}, got {tuple(labels)}"
            )
        key = tuple(str(labels[n]) for n in self.labelnames)
        with self._lock:
            counts = self._counts.setdefault(key, [0] * len(self.buckets))
            for i, b in enumerate(self.buckets):
                if value <= b:
                    counts[i] += 1
            self._sums[key] = self._sums.get(key, 0.0) + value

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} histogram"]
        for key in sorted(self._counts):
            counts = self._counts[key]
            for b, c in zip(self.buckets, counts):
                names = (*self.labelnames, "le")
                out.append(
                    f"{self.name}_bucket{_labels_str(names, (*key, _fmt(b)))} {c}"
                )
            base = _labels_str(self.labelnames, key)
            out.append(f"{self.name}_sum{base} {_fmt(self._sums[key])}")
            out.append(f"{self.name}_count{base} {counts[-1]}")
        return out


class MetricsRegistry:
    """Collects metrics and renders one scrape payload."""

    def __init__(self):
        self._metrics: list = []
        self._collectors: list = []  # callables run at render time

    def register(self, metric):
        self._metrics.append(metric)
        return metric

    def counter(self, name, help, labelnames=()):
        return self.register(Counter(name, help, labelnames))

    def gauge(self, name, help, labelnames=()):
        return self.register(Gauge(name, help, labelnames))

    def histogram(self, name, help, labelnames=(), buckets=DEFAULT_BUCKETS):
        return self.register(Histogram(name, help, labelnames, buckets))

    def add_collector(self, fn) -> None:
        """``fn(registry)`` runs before each render — the hook
        :func:`export_job_metrics` uses to pull scheduler snapshots."""
        self._collectors.append(fn)

    def render(self) -> str:
        for fn in self._collectors:
            fn(self)
        lines: list[str] = []
        for m in self._metrics:
            lines.extend(m.render())
        return "\n".join(lines) + "\n"

    def write_textfile(self, path: str) -> None:
        """Atomic write for the node-exporter textfile collector (the
        collector ignores partially-written files only if the write is
        rename-atomic)."""
        import os

        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.render())
        os.replace(tmp, path)


def export_job_metrics(scheduler, registry: MetricsRegistry) -> None:
    """Project :class:`..scheduler.JobScheduler` job metrics into
    Prometheus metrics at render time (reference parity for the
    APScheduler listener counters, ``scheduler/main.py:296-323``)."""
    runs = registry.counter(
        "scheduler_job_runs_total", "Job runs by job and status.",
        ("job", "status"),
    )
    dur = registry.gauge(
        "scheduler_job_duration_seconds",
        "Job run duration stats by job.", ("job", "stat"),
    )

    def collect(_reg):
        for name, snap in scheduler.metrics().items():
            ok = snap["runs"] - snap["failures"]
            # counters are monotone: set absolute via internal store
            runs._values[(name, "ok")] = float(ok)
            runs._values[(name, "error")] = float(snap["failures"])
            for stat in ("mean", "min", "max", "last"):
                dur.set(snap[f"duration_{stat}"], {"job": name, "stat": stat})

    registry.add_collector(collect)


class MicroBatchMetricsListener:
    """Spark ``StreamingQueryListener`` bridging micro-batch progress
    into the registry: input rows (counter), batch duration and
    processing rate (histograms), active-query gauge. Attach with
    ``spark.streams.addListener(listener)``."""

    def __new__(cls, registry: MetricsRegistry):
        # subclass lazily so importing this module never needs a JVM
        from pyspark.sql.streaming import StreamingQueryListener

        class _Impl(StreamingQueryListener):
            def __init__(self, reg: MetricsRegistry):
                self.rows = reg.counter(
                    "stream_input_rows_total",
                    "Input rows processed by query name.", ("query",),
                )
                self.batch_s = reg.histogram(
                    "stream_batch_duration_seconds",
                    "Micro-batch wall duration by query name.", ("query",),
                )
                self.active = reg.gauge(
                    "stream_active_queries", "Currently active queries.",
                )
                self.active.set(0.0)
                # r14 (verdict #6): state-store size observability.
                # The r13 unbounded-state bug (dropDuplicates under a
                # watermark never evicting) was only caught by reading
                # numRowsRemoved by hand; these expose the same
                # signals continuously so a monotone state gauge with
                # a flat removed-counter is visible on a dashboard.
                self.state_rows = reg.gauge(
                    "stream_state_rows",
                    "State-store rows by query and stateful operator.",
                    ("query", "operator"),
                )
                self.state_removed = reg.counter(
                    "stream_state_rows_removed_total",
                    "State rows evicted by watermark, by query/operator.",
                    ("query", "operator"),
                )
                self.state_updated = reg.counter(
                    "stream_state_rows_updated_total",
                    "State rows written, by query/operator.",
                    ("query", "operator"),
                )

            def onQueryStarted(self, event):
                with self.active._lock:
                    cur = self.active._values.get((), 0.0)
                self.active.set(cur + 1)

            def onQueryProgress(self, event):
                p = event.progress
                name = p.name or p.id
                self.rows.inc({"query": str(name)}, float(p.numInputRows))
                batch_ms = (p.durationMs or {}).get("triggerExecution", 0)
                self.batch_s.observe(batch_ms / 1000.0, {"query": str(name)})
                for op in (p.stateOperators or []):
                    labels = {
                        "query": str(name),
                        "operator": str(
                            getattr(op, "operatorName", "") or "state"
                        ),
                    }
                    self.state_rows.set(float(op.numRowsTotal), labels)
                    self.state_removed.inc(labels, float(op.numRowsRemoved))
                    self.state_updated.inc(labels, float(op.numRowsUpdated))

            def onQueryTerminated(self, event):
                with self.active._lock:
                    cur = self.active._values.get((), 0.0)
                self.active.set(max(0.0, cur - 1))

            def onQueryIdle(self, event):
                pass

        return _Impl(registry)
