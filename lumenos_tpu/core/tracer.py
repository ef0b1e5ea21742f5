"""Span-tree wall-clock tracer, the benchmark output system.

Mirrors reference core/tracer.go: nested spans print their duration with
indentation on end(); bench tables are parsed from these lines. Extends the
reference with a structured ``collect()`` dump for machine-readable bench
output (bench.py).
"""

from __future__ import annotations

import time
from typing import Optional


class Span:
    _records: list[tuple[str, float]] = []

    def __init__(self, name: str, parent: Optional["Span"] = None, message: str | None = None):
        self.name = name
        self.parent = parent
        self.depth = 0 if parent is None else parent.depth + 1
        self.start_time = time.perf_counter()
        self.duration: float | None = None
        if message:
            print("  " * self.depth + message, flush=True)

    def end(self, newline: bool = False) -> float:
        self.duration = time.perf_counter() - self.start_time
        print(f"{'  ' * self.depth}{self.name} ({self.duration:.3f}s)", flush=True)
        Span._records.append((self.name, self.duration))
        if newline:
            print(flush=True)
        return self.duration

    def __enter__(self) -> "Span":
        return self

    def __exit__(self, *exc) -> None:
        if self.duration is None:
            self.end()

    @classmethod
    def reset_records(cls) -> None:
        cls._records = []

    @classmethod
    def collect(cls) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, dur in cls._records:
            out[name] = out.get(name, 0.0) + dur
        return out


def start_span(name: str, parent: Optional[Span] = None, message: str | None = None) -> Span:
    return Span(name, parent, message)
