"""Tracing/profiling helpers (SURVEY.md §5: the reference has only tqdm bars).

Wraps ``jax.profiler`` trace annotation and provides throughput accounting in
the benchmark's units (registrations/min, voxel-resamples/sec).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """Annotate a region for the TPU profiler (shows up in xprof/tensorboard)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Throughput:
    """Accumulates wall time + work counters for benchmark reporting."""

    voxels_resampled: int = 0
    registrations: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def add(self, voxels: int = 0, registrations: int = 0) -> None:
        self.voxels_resampled += voxels
        self.registrations += registrations

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    def report(self) -> dict:
        s = max(self.seconds, 1e-9)
        return {
            "seconds": round(s, 4),
            "registrations_per_min": round(60.0 * self.registrations / s, 3),
            "voxel_resamples_per_sec": round(self.voxels_resampled / s, 1),
        }
