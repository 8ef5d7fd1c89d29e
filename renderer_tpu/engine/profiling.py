"""Named-span profiling: the reference's `profiling::scope!` facade analog.

The reference annotates ~150 sites with profiling scopes and renders a live
span tree with µs timings (reference: examples/sandbox/src/main.rs:704-847).
Here `span("name")` accumulates wall-clock durations per name with nesting
depth; `report()` returns the same collapsible-tree data the sandbox shows.
Device work is asynchronous, so spans that must measure device time call
`block_until_ready` explicitly (only in profiling mode, never in the hot
path).
"""

from __future__ import annotations

import time
from contextlib import contextmanager, nullcontext
from dataclasses import dataclass, field

# one shared no-op context for disabled profilers: nullcontext is stateless
# (enter returns None, exit returns False), so reusing a single instance is
# safe and keeps a disabled span at dict-lookup cost in the frame loop
_NULL_SPAN = nullcontext()


@dataclass
class Span:
    name: str
    depth: int
    total_s: float = 0.0
    count: int = 0


class Profiler:
    def __init__(self, enabled: bool = True, trace_events: int = 0) -> None:
        """trace_events > 0 additionally retains the last N individual span
        events (name, start, duration) for `export_chrome_trace` — the
        reference's profile-with-tracing subscriber drains raw spans the
        same way (examples/sandbox/src/main.rs:30-36,312-318); the
        aggregated tree (report/format) stays the default."""
        self.enabled = enabled
        self._spans: dict[tuple[int, str], Span] = {}
        self._depth = 0
        self._order: list[tuple[int, str]] = []
        self._events = None
        if trace_events:
            from collections import deque

            self._events = deque(maxlen=trace_events)

    def span(self, name: str):
        if not self.enabled:
            return _NULL_SPAN
        return self._span(name)

    @contextmanager
    def _span(self, name: str):
        key = (self._depth, name)
        if key not in self._spans:
            self._spans[key] = Span(name, self._depth)
            self._order.append(key)
        self._depth += 1
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self._depth -= 1
            s = self._spans[key]
            s.total_s += dt
            s.count += 1
            if self._events is not None:
                self._events.append((name, start, dt))

    def export_chrome_trace(self, path: str) -> int:
        """Write the retained span events as Chrome trace-event JSON
        (load in chrome://tracing or https://ui.perfetto.dev) — requires
        `trace_events` at construction. Returns the number of events
        written. Complete ('X') events; nesting is reconstructed by the
        viewer from the time intervals."""
        import json

        events = [
            {"name": n, "ph": "X", "ts": s * 1e6, "dur": d * 1e6,
             "pid": 0, "tid": 0}
            for (n, s, d) in (self._events or ())
        ]
        with open(path, "w") as f:
            json.dump({"traceEvents": events, "displayTimeUnit": "ms"}, f)
        return len(events)

    def reset(self) -> None:
        self._spans.clear()
        self._order.clear()
        if self._events is not None:
            self._events.clear()

    def snapshot(self, label: str) -> None:
        """Move the accumulated spans into a named section and reset — the
        sandbox splits its span tree into 'startup' and 'latest frame'
        sections this way (main.rs:315-319,532-542)."""
        if not hasattr(self, "sections"):
            self.sections: dict[str, list[Span]] = {}
        self.sections[label] = self.report()
        self._spans = {}
        self._order = []

    def report(self) -> list[Span]:
        return [self._spans[k] for k in self._order]

    def format(self) -> str:
        lines = []
        for label, spans in getattr(self, "sections", {}).items():
            lines.append(f"[{label}]")
            for s in spans:
                mean_us = 1e6 * s.total_s / max(s.count, 1)
                lines.append(f"  {'  ' * s.depth}{s.name}: {mean_us:.1f} µs ×{s.count}")
        for s in self.report():
            mean_us = 1e6 * s.total_s / max(s.count, 1)
            lines.append(f"{'  ' * s.depth}{s.name}: {mean_us:.1f} µs ×{s.count}")
        return "\n".join(lines)
