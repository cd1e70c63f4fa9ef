"""Named timer registry with the reference's CSV export contract.

≙ TimerDatabase + TimerGPU (framework/rendering/timer_database.hpp:10-37,
timer_gpu.cpp:13-31): named per-stage timers accumulating mean/min/max, CSV
writers with one column per timer (timer_database.cpp:59-121). GL timestamp
queries become wall-clock spans around device work with an explicit
``block_until_ready`` on end() when a device value is passed (the JAX
dispatch is async, like the GL queries).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class _Timer:
    total: float = 0.0
    count: int = 0
    vmin: float = float("inf")
    vmax: float = 0.0
    _start: float = 0.0
    last: float = 0.0

    def begin(self) -> None:
        self._start = time.perf_counter()

    def end(self, sync=None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._start
        self.last = dt
        self.total += dt
        self.count += 1
        self.vmin = min(self.vmin, dt)
        self.vmax = max(self.vmax, dt)
        return dt

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class TimerDatabase:
    """Singleton like the reference's (timer_database.hpp:13)."""

    _instance: "TimerDatabase | None" = None

    def __init__(self):
        self.timers: dict[str, _Timer] = {}

    @classmethod
    def instance(cls) -> "TimerDatabase":
        if cls._instance is None:
            cls._instance = TimerDatabase()
        return cls._instance

    def add_timer(self, name: str) -> None:
        self.timers.setdefault(name, _Timer())

    def begin(self, name: str) -> None:
        self.timers.setdefault(name, _Timer()).begin()

    def end(self, name: str, sync=None) -> float:
        return self.timers[name].end(sync)

    @contextlib.contextmanager
    def scope(self, name: str, sync=None):
        """``with db.scope("2integrate"): ...`` — begin/end around a block."""
        self.begin(name)
        try:
            yield
        finally:
            self.end(name, sync)

    def duration(self, name: str) -> float:
        return self.timers[name].last

    def mean(self, name: str) -> float:
        return self.timers[name].mean

    # CSV contract (timer_database.cpp:59-121): given "<dir>/<name>,<date>,
    # <time>.csv", each writer emits "<dir>/{mean|min|max}_<file>" holding a
    # header row `timer,"n1","n2",...` and a value row `<name>,v1,v2,...`
    # with times in milliseconds
    def _write(self, file_name: str, getter, prefix: str) -> None:
        import os

        directory, filename = os.path.split(file_name)
        name = filename.split(",")[0]
        names = sorted(self.timers)
        out_path = os.path.join(directory, prefix + filename)
        with open(out_path, "w") as f:
            f.write("timer" + "".join(f',"{n}"' for n in names) + "\n")
            f.write(
                name
                + "".join(f",{getter(self.timers[n]) * 1e3:.6f}" for n in names)
                + "\n"
            )

    def write_mean(self, path: str) -> None:
        self._write(path, lambda t: t.mean, "mean_")

    def write_min(self, path: str) -> None:
        self._write(path, lambda t: (t.vmin if t.count else 0.0), "min_")

    def write_max(self, path: str) -> None:
        self._write(path, lambda t: t.vmax, "max_")

    def reset(self) -> None:
        self.timers.clear()
