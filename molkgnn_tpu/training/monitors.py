"""Metric monitors / observability sinks.

Reference contract: monitors.py (C16) — a ``MetricMonitor`` callback base
reporting scalars at step/epoch boundaries, with one subclass per metric
(loss, logAUC x2, AUC, PPV, accuracy, RMSE, F1) and ``_no_dropout`` twins.
Here a single generic monitor covers all keys (the twins appear naturally
as ``*_no_dropout`` entries from the train_metric dual evaluation), and the
backend is pluggable: stdout, JSONL file, or any callable — the reference's
ClearML reporting is one more callable away and off by default exactly as
in the reference (entry.py:372 hardcodes use_clearml=False).

Also provides the jax.profiler trace hook the reference lacks (SURVEY §5:
"tracing: none"): wrap any training region to capture a TPU trace viewable
in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Dict, List, Optional


class MetricMonitor:
    """Collects per-epoch scalar dicts and forwards them to sinks."""

    def __init__(self, sinks: Optional[List[Callable]] = None):
        self.sinks = sinks or []
        self.history: List[Dict[str, float]] = []

    def on_epoch_end(self, epoch: int, metrics: Dict[str, float]) -> None:
        record = {"epoch": epoch, **metrics}
        self.history.append(record)
        for sink in self.sinks:
            sink(record)


def stdout_sink(record: Dict[str, float]) -> None:
    shown = {
        k: (round(v, 5) if isinstance(v, float) else v)
        for k, v in record.items()
    }
    print(f"[monitor] {shown}", flush=True)


def jsonl_sink(path: str) -> Callable:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def sink(record: Dict[str, float]) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")

    return sink


def throughput_sink(edges_per_epoch: int) -> Callable:
    """Derives the north-star edges/s counter from epoch wall time."""

    def sink(record: Dict[str, float]) -> None:
        t = record.get("epoch_time_s")
        if t:
            record["edges_per_s"] = edges_per_epoch / t

    return sink


class RelayBackendError(RuntimeError):
    """Raised when an operation is unsafe on a tunneled/relay TPU backend."""


def _is_relay_backend() -> bool:
    """True when the active JAX backend reaches the TPU through a relay
    (the 'axon' experimental platform). ``jax.profiler.start_trace`` HANGS
    on that backend and — because the TPU grant is single-tenant — the
    hung process wedges the chip for every later process (measured:
    recovery took a 10-minute no-probe quiet period after hours of
    degraded service). Detected from the live backend, not env vars, so
    in-process platform overrides are respected."""
    try:
        import jax

        return jax.default_backend().lower() in ("axon",)
    except Exception:  # noqa: BLE001 — no jax, no relay
        return False


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = True, force: bool = False):
    """jax.profiler trace region (view with TensorBoard's profile plugin).

    Refuses to start on a relay-tunneled backend (see
    :func:`_is_relay_backend`) unless ``force=True``: the trace hangs
    there and wedges the single-tenant TPU grant for hours. For
    schedule/overlap evidence on this environment, inspect compiled HLO
    on the CPU backend instead (benchmarks/profile_halo.py pattern).
    """
    if not enabled:
        yield
        return
    if _is_relay_backend() and not force:
        raise RelayBackendError(
            "profiler_trace refused: jax.profiler.start_trace hangs on the"
            " relay ('axon') TPU backend and wedges the single-tenant grant."
            " Profile on the CPU backend (JAX_PLATFORMS=cpu) or inspect"
            " compiled HLO (benchmarks/profile_halo.py); pass force=True"
            " only if you accept losing the chip."
        )
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Tiny wall-clock scope timer (the reference's run-time prints,
    entry.py:384-393, as a utility)."""

    def __init__(self):
        self.t0 = time.time()

    def elapsed(self) -> float:
        return time.time() - self.t0

    def formatted(self) -> str:
        s = self.elapsed()
        return f"{s / 3600:.0f}h{(s % 3600) / 60:.0f}m{s % 60:.0f}s"
