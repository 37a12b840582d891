"""The --debug --profile schedule must match the reference's torch.profiler
schedule(wait=3, warmup=3, active=5, repeat=2) (shape_engine.py:201-224):
two traced 5-step windows, each preceded by 3 untraced wait + 3 warmup
steps, then exit."""

import jax
import pytest

from zeroshape_tpu.runtime.logging import MetricLogger
from zeroshape_tpu.runtime.shape_engine import Runner


def test_profiler_schedule_windows(monkeypatch, tmp_path):
    events = []
    monkeypatch.setattr(
        jax.profiler, "start_trace", lambda d: events.append(("start", d))
    )
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: events.append(("stop",)))
    monkeypatch.chdir(tmp_path)

    r = object.__new__(Runner)
    r._loss_buf = []
    r.it = 0
    r.train_metric_logger = MetricLogger()

    steps_ran = 0
    with pytest.raises(SystemExit):
        for _ in range(100):
            r._profiler_schedule()
            steps_ran += 1

    # wait 3 + warmup 3 + active 5 = 11 per window, 2 windows, exit on 23rd
    assert steps_ran == 22
    starts = [e for e in events if e[0] == "start"]
    stops = [e for e in events if e[0] == "stop"]
    assert len(starts) == 2 and len(stops) == 2
    assert starts[0][1].endswith("window_0")
    assert starts[1][1].endswith("window_1")
    # start/stop alternate: window 0 closes before window 1 opens
    order = [e[0] for e in events]
    assert order == ["start", "stop", "start", "stop"]


def test_profiler_close_flushes_open_window(monkeypatch, tmp_path):
    """A run shorter than the schedule (trace opened, never closed by the
    exit branch) must still write its window: _profiler_close drains queued
    work and stops the trace exactly once."""
    events = []
    monkeypatch.setattr(
        jax.profiler, "start_trace", lambda d: events.append(("start", d))
    )
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: events.append(("stop",)))
    monkeypatch.chdir(tmp_path)

    r = object.__new__(Runner)
    r._loss_buf = []
    r.it = 0
    r.train_metric_logger = MetricLogger()

    for _ in range(7):  # wait 3 + warmup 3 + first traced step: trace open
        r._profiler_schedule()
    assert [e[0] for e in events] == ["start"]
    r._profiler_close()
    assert [e[0] for e in events] == ["start", "stop"]
    r._profiler_close()  # idempotent: nothing left open
    assert [e[0] for e in events] == ["start", "stop"]
