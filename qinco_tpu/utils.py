"""Small shared utilities: timers, formatting, chunking helpers.

Timer semantics mirror the reference's wall-clock instrumentation
(reference: qinco/metrics.py:182-286) so per-phase reports stay
comparable; on TPU, callers must fence with ``jax.block_until_ready``
before stopping a timer (the reference uses ``.item()`` CUDA syncs).
"""

from __future__ import annotations

import time


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def format_time(t: float, ms: bool = False) -> str:
    hours, t = divmod(t, 3600)
    minutes, seconds = divmod(t, 60)
    ms_str = f".{int((seconds - int(seconds)) * 1000):03}" if ms else ""
    return f"{int(hours):02}:{int(minutes):02}:{int(seconds):02}{ms_str}"


def format_memory(mem: float) -> str:
    for shift, unit in ((40, "T"), (30, "G"), (20, "M"), (10, "K")):
        if mem >= 2**shift:
            return f"{mem / (2 ** shift):.1f}{unit}"
    return f"{mem:.1f}b"


class Timer:
    """Accumulating wall-clock timer usable as a context manager."""

    def __init__(self, ms: bool = False, elapsed: float = 0.0):
        self.elapsed = elapsed
        self.start_at: float | None = None
        self.show_ms = ms

    def start(self, reset: bool = False) -> None:
        if reset:
            self.reset()
        else:
            assert self.start_at is None, "Timer already running"
        self.start_at = time.time()

    def reset(self) -> None:
        self.elapsed = 0.0
        if self.start_at is not None:
            self.start_at = time.time()

    def stop(self) -> float:
        self.elapsed += time.time() - self.start_at
        self.start_at = None
        return self.get()

    def running(self) -> bool:
        return self.start_at is not None

    def get(self) -> float:
        if self.running():
            return self.elapsed + time.time() - self.start_at
        return self.elapsed

    def s(self, digits: int = 3) -> str:
        return f"{self.get():.{digits}f}s"

    def ms(self) -> str:
        return format_time(self.get(), ms=True)

    def __str__(self) -> str:
        return format_time(self.get(), self.show_ms)

    __repr__ = __str__

    def __enter__(self) -> "Timer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def __call__(self, reset: bool = False) -> "Timer":
        if reset:
            self.reset()
        return self


class TimersManager:
    """Named group of timers (reference: qinco/metrics.py:255-286)."""

    def __init__(self, *names: str):
        self._timers: dict[str, Timer] = {}
        self.add(*names)

    def add(self, *names: str) -> None:
        for name in names:
            self._timers.setdefault(name, Timer())

    def __getattr__(self, name: str) -> Timer:
        try:
            return self.__dict__["_timers"][name]
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name: str) -> Timer:
        return self._timers[name]

    def names(self) -> list[str]:
        return list(self._timers)

    def sum(self) -> Timer:
        return Timer(elapsed=sum(t.get() for t in self._timers.values()))

    def state_dict(self) -> dict:
        return {name: t.get() for name, t in self._timers.items()}

    def load_state_dict(self, state: dict) -> None:
        for name, val in state.items():
            self.add(name)
            self._timers[name].elapsed = val

    def __str__(self) -> str:
        return " ".join(f"T_{n}={t}" for n, t in self._timers.items())
